package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.Similarity

/** GridDot native expression: equals the higher-order-function fold on
  * arbitrary float vectors, in both codegen and interpreted paths. */
class GridDotSpec extends AnyFunSuite with SparkTestBase {

  private lazy val _ = GraftFunctions.register(spark)

  private def viaSpark(a: Seq[Float], b: Seq[Float], codegen: Boolean): (Long, Long) = {
    GraftFunctions.register(spark)
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    try {
      val df = Seq((a, b)).toDF("a", "b")
        .select(
          call_function("grid_dot", col("a"), col("b")).as("native"),
          Similarity.dotFold(col("a"), col("b")).as("fold"))
      val r = df.head()
      (r.getLong(0), r.getLong(1))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("matches the fold implementation on hand cases (codegen on/off)") {
    val cases = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),       // 32·1e9
      (Seq(-1.5f, 0.25f), Seq(2.0f, -8.0f)),                  // negatives
      (Seq.empty[Float], Seq.empty[Float]),                   // empty
      (Seq(0.1f, 0.2f), Seq(0.3f, 0.7f)))                     // inexact floats
    for ((a, b) <- cases; cg <- Seq(true, false)) {
      val (native, fold) = viaSpark(a, b, cg)
      assert(native == fold, s"a=$a b=$b codegen=$cg")
    }
  }

  test("property: native == fold for random vectors") {
    val genVec = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))
    (0 until 30).foreach { i =>
      val a = genVec.apply(Gen.Parameters.default, Seed(i * 2L)).get
      val b = genVec.apply(Gen.Parameters.default, Seed(i * 2L + 1)).get
      val (native, fold) = viaSpark(a, b, codegen = true)
      assert(native == fold, s"seed=$i")
    }
  }

  test("mismatched-length vectors yield NULL, not a prefix dot") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
      .select(call_function("grid_dot", col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("self dot = grid squared norm, non-negative") {
    val (native, _) = viaSpark(Seq(0.5f, -0.5f, 2.0f), Seq(0.5f, -0.5f, 2.0f), codegen = true)
    assert(native == 250000000L + 250000000L + 4000000000L)
  }

  private def tokenStats(text: String, codegen: Boolean) = {
    GraftFunctions.register(spark)
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    try Seq(text).toDF("text")
      .select(expr("token_stats(text)").as("st"))
      .select("st.vocab", "st.n_hapax", "st.top_token", "st.top_count", "st")
      .head()
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("token_stats: vocab/hapax/top with lexicographic tie-break (codegen on/off)") {
    for (cg <- Seq(true, false)) {
      // "b b a a c": counts {a:2, b:2, c:1} — tie on 2 → lowest token "a"
      val r = tokenStats("  B b a A c ", cg)
      assert(r.getLong(0) == 3L, s"vocab cg=$cg")
      assert(r.getLong(1) == 1L, s"hapax cg=$cg")
      assert(r.getString(2) == "a", s"top tie-break cg=$cg")
      assert(r.getLong(3) == 2L, s"top count cg=$cg")
    }
  }

  test("token_stats: all-whitespace doc yields NULL (the no-rows analogue)") {
    for (cg <- Seq(true, false)) {
      val r = tokenStats("   \t  ", cg)
      assert(r.isNullAt(4), s"cg=$cg")
    }
  }

  test("stop_hits: equals the HOF filter form, per language, codegen on/off") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    GraftFunctions.register(spark)
    val docs = Seq(
      "The quick brown fox is a fox of the woods",
      "der hund und die katze ist nicht da",
      "  LE chat ET la   souris est\tla  ", // case, multi-ws, repeats
      "", "   \t ", "y el es la the in").toDF("text")
    for (cg <- Seq(true, false)) {
      val prev = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", cg.toString)
      try {
        val r = docs.select(
          call_function("stop_hits", col("text"), lit(TextAnalysis.stopSpec)).as("k"),
          TextAnalysis.hits(TextAnalysis.stop("en")).as("en"),
          TextAnalysis.hits(TextAnalysis.stop("de")).as("de"),
          TextAnalysis.hits(TextAnalysis.stop("fr")).as("fr"),
          TextAnalysis.hits(TextAnalysis.stop("es")).as("es")).collect()
        r.foreach { row =>
          val k = row.getSeq[Int](0)
          assert(k == Seq(row.getInt(1), row.getInt(2), row.getInt(3), row.getInt(4)),
            s"cg=$cg row=$row")
        }
      } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    }
  }

  test("token_stats: equals the relational explode/window form on real docs") {
    import spark.implicits._
    val docs = Seq(
      ("d1", "the cat sat on the mat the end"),
      ("d2", "x"),
      ("d3", "alpha beta alpha beta gamma")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("gds_docs")
    GraftFunctions.register(spark)
    val native = docs
      .select(col("doc_id"), expr("token_stats(text)").as("st"))
      .filter(col("st").isNotNull)
      .select(col("doc_id"), col("st.vocab"), col("st.n_hapax"),
        col("st.top_token"), col("st.top_count"))
      .orderBy("doc_id").collect().toSeq
    val relational = spark.sql(
      """WITH tok AS (SELECT doc_id, explode(split(lower(trim(text)), '\\s+')) AS t
        |            FROM gds_docs),
        |cnt AS (SELECT doc_id, t, COUNT(*) AS c FROM tok WHERE t <> '' GROUP BY 1,2),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, t) rn
        |       FROM cnt)
        |SELECT doc_id, COUNT(*) AS vocab, COUNT(CASE WHEN c=1 THEN 1 END) AS n_hapax,
        |       MAX(CASE WHEN rn=1 THEN t END) AS top_token,
        |       MAX(CASE WHEN rn=1 THEN c END) AS top_count
        |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin).collect().toSeq
    assert(native.map(_.toString) == relational.map(_.toString))
  }

  test("stop_hits: malformed list specs fail at analysis time, not misalign at runtime") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("hello world").toDF("text")
    // trailing '|' = an empty language list: before the r3 ADVICE fix,
    // String.split dropped the trailing empty segment and every later
    // getItem(i) silently read the wrong language's count
    val trailing = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("stop_hits", col("text"), lit("a,b|c,d|"))).collect()
    }
    assert(trailing.getMessage.contains("empty list"))
    val doubled = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("stop_hits", col("text"), lit("a||b"))).collect()
    }
    assert(doubled.getMessage.contains("empty list"))
    // a foldable-but-NULL spec used to pass checkInputDataTypes and NPE
    // in the lazy `sets` initializer at runtime
    val nul = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("stop_hits", col("text"),
        lit(null).cast("string"))).collect()
    }
    assert(nul.getMessage.contains("NULL"))
  }

  test("ngram_stats: equals the relational position-join form; NULL under n tokens") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val docs = Seq(
      ("d1", "a b a b a"),          // bigrams: "a b"×2, "b a"×2 → tie, binary-lowest wins
      ("d2", "x y  z"),             // double space: tokens stay consecutive
      ("d3", "solo"),               // < 2 tokens → NULL
      ("d4", "  lead trail  "),     // trim + empty-token filtering
      ("d5", "w w w w")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("ngs_docs")
    val native = docs
      .select(col("doc_id"), expr("ngram_stats(text, 2)").as("st"))
      .filter(col("st").isNotNull)
      .select(col("doc_id"), col("st.n_grams"), col("st.n_distinct"),
        col("st.top_gram"), col("st.top_count"))
      .orderBy("doc_id").collect().toSeq
    val relational = spark.sql(
      """WITH tok AS (
        |  SELECT doc_id, t, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS j
        |  FROM (SELECT doc_id, posexplode(split(lower(trim(text)), '\\s+')) AS (i, t)
        |        FROM ngs_docs) WHERE t <> ''),
        |bg AS (SELECT a.doc_id, concat(a.t, ' ', b.t) AS g
        |       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.j = a.j + 1),
        |cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, g) rn FROM cnt)
        |SELECT doc_id, SUM(c) AS n_grams, COUNT(*) AS n_distinct,
        |       MAX(CASE WHEN rn = 1 THEN g END) AS top_gram,
        |       MAX(CASE WHEN rn = 1 THEN c END) AS top_count
        |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin).collect().toSeq
    assert(native.map(_.toString) == relational.map(_.toString))
    assert(!native.exists(_.getString(0) == "d3")) // below n → NULL → dropped
    // trigram sanity: "a b a b a" has 3 trigrams, 2 distinct
    val tri = docs.filter(col("doc_id") === "d1")
      .select(expr("ngram_stats(text, 3)").as("st")).head()
    val st = tri.getStruct(0)
    assert(st.getLong(0) == 3L && st.getLong(1) == 2L && st.getString(2) == "a b a")
  }

  test("kmv_kth: partition-count invariant, NULL kth below k, sane estimate") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = (0 until 5000).map(i => ("t", s"u$i")).toDF("k", "u")
      .withColumn("h", graft.operators.Dedup.h60(col("u")))
    // the k-smallest-distinct set is partition-order free, so the
    // map-side partial + merge path must equal the single-buffer path
    def run(parts: Int) = df.repartition(parts).groupBy("k")
      .agg(call_function("kmv_kth", col("h"), lit(64)).as("s"))
      .select("s.*").head()
    val (r1, r8) = (run(1), run(8))
    assert(r1 == r8)
    assert(r1.getLong(0) == 64)
    val est = 63.0 * 1152921504606846976.0 / r1.getLong(1).toDouble
    assert(est > 2500 && est < 10000, s"est=$est") // 5000 ± sketch error (k=64 ⇒ ~12.5%)
    // fewer distinct values than k: everything kept, kth stays NULL
    val small = (0 until 10).map(i => ("t", s"u${i % 5}")).toDF("k", "u")
      .withColumn("h", graft.operators.Dedup.h60(col("u")))
      .groupBy("k").agg(call_function("kmv_kth", col("h"), lit(64)).as("s"))
      .select("s.*").head()
    assert(small.getLong(0) == 5 && small.isNullAt(1)) // dedup'd, below k
  }

  test("token_stats: two instances in one codegen scope compile (fresh temp name)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // non-nullable child (coalesce with a literal) ⇒ nullSafeExec emits
    // the snippet with NO enclosing block; subexpression elimination off
    // ⇒ both instances land in the same codegen scope. Before the r3
    // ADVICE fix the fixed-name `Object r` declared twice was a Janino
    // compile failure (masked as a silent interpreted fallback —
    // codegen.fallback=false makes it throw instead).
    val prevFb = spark.conf.get("spark.sql.codegen.fallback")
    val prevSe = spark.conf.get("spark.sql.subexpressionElimination.enabled")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.subexpressionElimination.enabled", "false")
    try {
      val r = Seq(("b a b", 1)).toDF("text", "k")
        .select(
          expr("token_stats(coalesce(text, ''))").getField("vocab").as("v"),
          expr("token_stats(coalesce(text, ''))").getField("top_token").as("t"))
        .head()
      assert(r.getLong(0) == 2L)
      assert(r.getString(1) == "b")
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFb)
      spark.conf.set("spark.sql.subexpressionElimination.enabled", prevSe)
    }
  }
}
