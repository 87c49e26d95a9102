package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.functions.{GraftFunctions, PiiScrub}

/** text_metrics / pii_scrub native kernels: pinned field-for-field equal
  * to the expression forms they replaced (the ta02/ta03/ta07/ta08 hot
  * paths), in both codegen and interpreted paths, on edge-case fixtures
  * the synthetic corpus never exercises.
  */
class TextKernelsSpec extends AnyFunSuite with SparkTestBase {

  /** Edge cases: empty, whitespace-only (space vs tab — Spark's trim
    * strips only ASCII spaces, so a bare tab yields leading/trailing
    * empty split fields), leading/trailing separators, mixed-class BPE
    * runs, unicode (non-ASCII counts as punct; é is outside [A-Za-z]),
    * repeated tokens for the distinct count, and case folding. */
  private val fixtures = Seq(
    "",
    " ",
    "\t",
    " \t \n ",
    "hello world",
    "  leading and trailing  ",
    "\ttab\tseparated\ttokens\n",
    "Repeat repeat REPEAT rePeat",
    "a1b2c3 mixed runs 42 abc123def",
    "punct!!! lots, of; punct... (here) [ok]?",
    "unicode café touché über naïve 世界",
    "line\nbreaks\r\nandvertical\ftabs",
    "single",
    "a b c d e f g a b c",
    "....", "@@@", "123 456 789",
    "MiXeD CaSe ToKeNs mixed case tokens")

  private def withCodegen[T](on: Boolean)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", on.toString)
    try f finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("text_metrics == the four expression forms it replaced (codegen on/off)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val ws = split(lower(trim(col("text"))), "\\s+")
    val bpe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
    for (cg <- Seq(true, false)) withCodegen(cg) {
      val rows = fixtures.toDF("text")
        .select(
          col("text"),
          call_function("text_metrics", col("text")).as("tm"),
          size(ws).as("e_ws"),
          size(array_distinct(ws)).as("e_distinct"),
          size(regexp_extract_all(col("text"), lit(bpe), lit(0))).as("e_bpe"),
          length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")).as("e_punct"))
        .collect()
      rows.foreach { r =>
        val tm = r.getAs[Row]("tm")
        val text = r.getAs[String]("text")
        assert(tm.getAs[Int]("n_ws_tokens") == r.getAs[Int]("e_ws"),
          s"n_ws_tokens codegen=$cg text=${text.take(40)}")
        assert(tm.getAs[Int]("n_distinct_tokens") == r.getAs[Int]("e_distinct"),
          s"n_distinct_tokens codegen=$cg text=${text.take(40)}")
        assert(tm.getAs[Int]("n_bpe_tokens") == r.getAs[Int]("e_bpe"),
          s"n_bpe_tokens codegen=$cg text=${text.take(40)}")
        assert(tm.getAs[Int]("n_punct") == r.getAs[Int]("e_punct"),
          s"n_punct codegen=$cg text=${text.take(40)}")
      }
    }
  }

  /** Property fuzz: random strings over an alphabet chosen to stress
    * every class boundary the kernels reason about — ASCII letters and
    * digits, each Java-regex whitespace char, punctuation, and
    * non-ASCII (including an astral code point, which regex classes
    * match as ONE code point but UTF-16 stores as two chars). */
  private val fuzzAlphabet: Seq[String] =
    Seq("a", "B", "z", "0", "7", " ", "\t", "\n", "", "\f", "\r",
      ".", ",", "@", "-", "_", "!", "é", "ß", "世", "😀")

  private def fuzzStrings(n: Int): Seq[String] = {
    import org.scalacheck.{Gen, rng}
    val g = Gen.chooseNum(0, 40).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(fuzzAlphabet)).map(_.mkString))
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, rng.Seed(i.toLong)))
  }

  test("property: text_metrics == expression forms on 200 random strings") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val ws = split(lower(trim(col("text"))), "\\s+")
    val bpe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
    val rows = fuzzStrings(200).toDF("text")
      .select(
        col("text"),
        call_function("text_metrics", col("text")).as("tm"),
        size(ws).as("e_ws"),
        size(array_distinct(ws)).as("e_distinct"),
        size(regexp_extract_all(col("text"), lit(bpe), lit(0))).as("e_bpe"),
        length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")).as("e_punct"))
      .collect()
    rows.foreach { r =>
      val tm = r.getAs[Row]("tm")
      val t = r.getAs[String]("text")
      assert(tm.getAs[Int]("n_ws_tokens") == r.getAs[Int]("e_ws"), s"ws <$t>")
      assert(tm.getAs[Int]("n_distinct_tokens") == r.getAs[Int]("e_distinct"), s"distinct <$t>")
      assert(tm.getAs[Int]("n_bpe_tokens") == r.getAs[Int]("e_bpe"), s"bpe <$t>")
      assert(tm.getAs[Int]("n_punct") == r.getAs[Int]("e_punct"), s"punct <$t>")
    }
  }

  test("property: pii_scrub == regexp column program on 200 random PII-ish strings") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // splice PII-shaped fragments into random noise so matches actually occur
    val frags = Seq("a@b.co", "1.2.3.4", "555-123-4567", "x@10.1.2.3",
      "999.999.999.999", "12-345-6789", "user.name+tag@host-name.org")
    val base = fuzzStrings(200)
    val spliced = base.zipWithIndex.map { case (s, i) =>
      if (i % 3 == 0) s + " " + frags(i % frags.length) + " " + s else s }
    val E = PiiScrub.EmailPat; val I = PiiScrub.Ipv4Pat; val P = PiiScrub.PhonePat
    val rows = spliced.toDF("text")
      .select(
        col("text"),
        call_function("pii_scrub", col("text")).as("ps"),
        regexp_count(col("text"), lit(E)).as("e_email"),
        regexp_count(col("text"), lit(I)).as("e_ipv4"),
        regexp_count(col("text"), lit(P)).as("e_phone"),
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          E, "[EMAIL]"), I, "[IP]"), P, "[PHONE]").as("e_redacted"))
      .collect()
    rows.foreach { r =>
      val ps = r.getAs[Row]("ps")
      val t = r.getAs[String]("text")
      assert(ps.getAs[Int]("n_email") == r.getAs[Int]("e_email"), s"email <$t>")
      assert(ps.getAs[Int]("n_ipv4") == r.getAs[Int]("e_ipv4"), s"ipv4 <$t>")
      assert(ps.getAs[Int]("n_phone") == r.getAs[Int]("e_phone"), s"phone <$t>")
      assert(ps.getAs[String]("redacted") == r.getAs[String]("e_redacted"), s"redacted <$t>")
    }
  }

  test("property: hand-compiled PII matchers == java.util.regex on 5000 adversarial strings") {
    // driver-side fuzz of scan (the span automaton) against scanRegex
    // (the retired 5-pass Matcher form) — a denser, PII-shaped alphabet
    // than the column fuzz, hammering the backtracking corners: octet
    // overrun ("1234.5.6.7"), boundary chemistry ("com1.2.3.4", "_1.2"),
    // domain backtracking ("a@b.co.uk", "a@b.com1.2.3.4"), adjacent and
    // run-sharing '@'s, phone \b tails
    val alphabet = Seq("a", "b", "Z", "0", "1", "9", ".", "-", "@", "_",
      "%", "+", " ", "[", "]", "co", "com", "12", "123", "555-", "@b.",
      ".4", "1.2.3.4", "a@b.co", "555-867-5309", "x")
    val rnd = new scala.util.Random(20260815L)
    val cases = Seq("a@b.com1.2.3.4", "1234.5.6.7", "1.2.3.4.5",
      "a@@b.com", "a@b a@c.com", "a@b.co.x@d.com", "x_1.2.3.4_y",
      "555-867-53090", "0555-867-5309", ".a@-.co", "@.co", "a@b.c") ++
      (0 until 5000).map { _ =>
        (0 until (1 + rnd.nextInt(12))).map(_ =>
          alphabet(rnd.nextInt(alphabet.length))).mkString }
    for (t <- cases) {
      val got = PiiScrub.scan(t)
      val exp = PiiScrub.scanRegex(t)
      assert((got.getInt(0), got.getInt(1), got.getInt(2),
        got.getUTF8String(3).toString, got.getInt(4)) == exp, s"<$t>")
    }
  }

  test("text_metrics: null in, null out") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("text")
      .select(call_function("text_metrics", col("text"))).head()
    assert(r.isNullAt(0))
  }

  /** PII fixtures include the adversarial shapes where fusing count and
    * replace naively would diverge from the chained column program: an
    * IPv4 inside an email's domain (counted by the independent n_ipv4
    * scan, but gone from the string the IPv4 REPLACE sees, because the
    * email pass already redacted it) and digits straddling redaction
    * boundaries. */
  private val piiFixtures = Seq(
    "no pii here at all",
    "",
    "contact user5@mail.example.com from 10.5.0.5 call 555-867-5309",
    "user@10.2.3.4 ip-in-email-domain",
    "two emails a@b.co and c.d+e@f-g.org on one line",
    "555-123-4567 and 555-123-4567 twice, 1.2.3.4 once",
    "overlapping-ish 10.0.0.1.2.3.4.5 runs",
    "trailing dot email a@b.com. and (1.2.3.4) parenthesized",
    "not-an-ip 1234.5.6.7 and almost-phone 12-345-6789",
    "e@mail.co,10.1.1.1,555-000-1111 comma packed")

  test("pii_scrub == the 9-pass regexp column program (codegen on/off)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val E = PiiScrub.EmailPat; val I = PiiScrub.Ipv4Pat; val P = PiiScrub.PhonePat
    for (cg <- Seq(true, false)) withCodegen(cg) {
      val rows = piiFixtures.toDF("text")
        .select(
          col("text"),
          call_function("pii_scrub", col("text")).as("ps"),
          regexp_count(col("text"), lit(E)).as("e_email"),
          regexp_count(col("text"), lit(I)).as("e_ipv4"),
          regexp_count(col("text"), lit(P)).as("e_phone"),
          regexp_replace(regexp_replace(regexp_replace(col("text"),
            E, "[EMAIL]"), I, "[IP]"), P, "[PHONE]").as("e_redacted"))
        .withColumn("e_clean",
          ((regexp_count(col("e_redacted"), lit(E)) +
            regexp_count(col("e_redacted"), lit(I)) +
            regexp_count(col("e_redacted"), lit(P))) === 0).cast("int"))
        .collect()
      rows.foreach { r =>
        val ps = r.getAs[Row]("ps")
        val text = r.getAs[String]("text")
        assert(ps.getAs[Int]("n_email") == r.getAs[Int]("e_email"),
          s"n_email codegen=$cg text=$text")
        assert(ps.getAs[Int]("n_ipv4") == r.getAs[Int]("e_ipv4"),
          s"n_ipv4 codegen=$cg text=$text")
        assert(ps.getAs[Int]("n_phone") == r.getAs[Int]("e_phone"),
          s"n_phone codegen=$cg text=$text")
        assert(ps.getAs[String]("redacted") == r.getAs[String]("e_redacted"),
          s"redacted codegen=$cg text=$text")
        assert(ps.getAs[Int]("clean") == r.getAs[Int]("e_clean"),
          s"clean codegen=$cg text=$text")
      }
    }
  }

  test("pii_scrub: null in, null out") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("text")
      .select(call_function("pii_scrub", col("text"))).head()
    assert(r.isNullAt(0))
  }

  test("clf_margin == the HOF aggregate form with poly131 (codegen on/off)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // small odd dim so collisions actually happen; weights non-uniform
    val dim = 7
    val w = (0 until dim).map(i => (i * 37 - 100).toLong)
    val wLit = typedlit(w)
    for (cg <- Seq(true, false)) withCodegen(cg) {
      val df = fixtures.toDF("text")
      val got = df.select(
        call_function("clf_margin", col("text"), wLit).as("cm")).collect()
      val exp = fixtures.map { text =>
        val ts = text.trim.toLowerCase.split("\\s+", -1).filter(_.nonEmpty)
        (ts.length,
          ts.map(t => w((graft.functions.ClfMargin.poly131(t) % dim).toInt)).sum)
      }
      got.map(r => (r.getStruct(0).getInt(0), r.getStruct(0).getLong(1)))
        .zip(exp).foreach { case (g, e) =>
          assert(g == e, s"codegen=$cg")
        }
    }
    // poly131 pinned against the oracle's list_reduce fold: the DuckDB
    // expression for 'abc' evaluates to 1677554 (verified constant)
    assert(graft.functions.ClfMargin.poly131("abc") == 1677554L)
    // null in, null out
    val r = Seq[Option[String]](None).toDF("text")
      .select(call_function("clf_margin", col("text"), wLit)).head()
    assert(r.isNullAt(0))
  }

  test("clf_margin rejects empty weights at analysis, not per-row at execution") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("some text").toDF("text")
        .select(call_function("clf_margin", col("text"),
          typedlit(Seq.empty[Long]))).collect()
    }
    assert(e.getMessage.contains("must not be empty"))
  }
  test("tok_split == split(lower(trim(text)), '\\s+') on edge fixtures (codegen on/off)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    for (cg <- Seq(true, false)) withCodegen(cg) {
      val rows = fixtures.toDF("text")
        .select(col("text"),
          call_function("tok_split", col("text")).as("k"),
          split(lower(trim(col("text"))), "\\s+").as("e"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1).toList == r.getSeq[String](2).toList,
          s"codegen=$cg <${r.getAs[String]("text")}>")
      }
    }
  }

  test("tok_split schema == split schema exactly (incl. containsNull)") {
    // Spark 4.1.2's StringSplit declares ArrayType(StringType,
    // containsNull = false); tok_split must match or element nullability
    // drifts in derived schemas vs the regex split it replaces
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("a b").toDF("text")
      .select(
        call_function("tok_split", col("text")).as("k"),
        split(lower(trim(col("text"))), "\\s+").as("e"))
    assert(df.schema("k").dataType == df.schema("e").dataType,
      s"${df.schema("k").dataType} != ${df.schema("e").dataType}")
  }

  test("property: tok_split == regex split on 400 random strings") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = fuzzStrings(400).toDF("text")
      .select(col("text"),
        call_function("tok_split", col("text")).as("k"),
        split(lower(trim(col("text"))), "\\s+").as("e"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1).toList == r.getSeq[String](2).toList,
        s"<${r.getAs[String]("text")}>")
    }
  }

  test("property: tok_split kernel == Pattern.split on 5000 adversarial strings") {
    // direct kernel-vs-java.util.regex pin, no Spark in the loop — the
    // same discipline as the PII matcher fuzz. Alphabet is the fuzz
    // alphabet (covers every Java \s char, multi-byte and astral code
    // points); Pattern.split(limit -1) over trim+lower is the exact
    // operator chain the old `ws` compiled to.
    import org.apache.spark.unsafe.types.UTF8String
    val p = java.util.regex.Pattern.compile("\\s+")
    val rnd = new scala.util.Random(4242)
    val strs = (0 until 5000).map { _ =>
      val len = rnd.nextInt(60)
      (0 until len).map(_ => fuzzAlphabet(rnd.nextInt(fuzzAlphabet.size))).mkString
    }
    val ts = graft.functions.TokSplit(
      org.apache.spark.sql.catalyst.expressions.Literal("x"))
    strs.foreach { raw =>
      val u = UTF8String.fromString(raw)
      val expect = p.split(u.trim().toLowerCase().toString, -1).toSeq
      val got = ts.kernel(u)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .array.map(_.asInstanceOf[UTF8String].toString).toSeq
      assert(got == expect, s"<$raw>")
    }
  }

  test("tok_split: null in, null out") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("text")
      .select(call_function("tok_split", col("text"))).head()
    assert(r.isNullAt(0))
  }

  // ------------------------------------------------------------ gate_stats

  /** The fused gate kernel vs the THREE retired kernels it replaces,
    * field for field — including ngram_stats' NULL-under-n-tokens case
    * folded to (0, 0). A word planted in two lists ("is" below) pins the
    * bitmask merge (one probe serving several lists). */
  private def gateStatsParity(texts: Seq[String], spec: String, n: Int): Unit = {
    import spark.implicits._
    for (cg <- Seq(true, false)) withCodegen(cg) {
      val rows = texts.toDF("text")
        .select(
          col("text"),
          call_function("gate_stats", col("text"), lit(spec), lit(n)).as("gs"),
          call_function("text_metrics", col("text")).as("tm"),
          call_function("stop_hits", col("text"), lit(spec)).as("sh"),
          (if (n > 0) call_function("ngram_stats", col("text"), lit(n))
           else lit(null)).as("ng"))
        .collect()
      rows.foreach { r =>
        val t = r.getAs[String]("text")
        val gs = r.getAs[Row]("gs")
        val tm = r.getAs[Row]("tm")
        assert(gs.getAs[Int]("n_ws_tokens") == tm.getAs[Int]("n_ws_tokens"),
          s"n_ws_tokens codegen=$cg <$t>")
        assert(gs.getAs[Int]("n_punct") == tm.getAs[Int]("n_punct"),
          s"n_punct codegen=$cg <$t>")
        assert(gs.getSeq[Int](gs.fieldIndex("hits")).toList ==
          r.getSeq[Int](r.fieldIndex("sh")).toList,
          s"hits codegen=$cg <$t>")
        val ng = if (r.isNullAt(r.fieldIndex("ng"))) null else r.getAs[Row]("ng")
        val (eg, ed) =
          if (n == 0 || ng == null) (0L, 0L)
          else (ng.getAs[Long]("n_grams"), ng.getAs[Long]("n_distinct"))
        assert(gs.getAs[Long]("n_grams") == eg, s"n_grams codegen=$cg <$t>")
        assert(gs.getAs[Long]("n_distinct") == ed, s"n_distinct codegen=$cg <$t>")
      }
    }
  }

  test("gate_stats == text_metrics + stop_hits + ngram_stats on fixtures (codegen on/off)") {
    GraftFunctions.register(spark)
    gateStatsParity(fixtures, graft.operators.TextAnalysis.stopSpec, 2)
    // a word in TWO lists exercises the bitmask merge; n = 3 a wider gram
    gateStatsParity(fixtures, "is,a,of|is,das|the", 3)
    // n = 0: the gram window is skipped (ta02's subset)
    gateStatsParity(fixtures, "the,of,and,to,in,is,a", 0)
    // an EMPTY spec word ("the,,of") maps the empty token: stop_hits
    // counts every empty split field against it (a "\t" doc tokenizes
    // to ["", ""]), so gate_stats must probe empty fields too — the
    // review-caught divergence this line pins
    gateStatsParity(fixtures, "the,,of|is", 2)
  }

  test("property: gate_stats == retired kernels on 400 random strings") {
    GraftFunctions.register(spark)
    gateStatsParity(fuzzStrings(400), graft.operators.TextAnalysis.stopSpec, 2)
  }

  test("property: poly131Utf8 == poly131 on 5000 adversarial strings") {
    // the byte-decoding fold vs the String codePointAt fold, over the
    // whitespace/astral alphabet (tok_split fuzz discipline): the UTF-8
    // decoder must yield identical code points incl. astral (4-byte)
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(77)
    (0 until 5000).foreach { _ =>
      val len = rnd.nextInt(30)
      val s = (0 until len)
        .map(_ => fuzzAlphabet(rnd.nextInt(fuzzAlphabet.size))).mkString
      assert(graft.functions.ClfMargin.poly131Utf8(UTF8String.fromString(s)) ==
        graft.functions.ClfMargin.poly131(s), s"<$s>")
    }
  }

  test("gate_stats: null in, null out") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("text")
      .select(call_function("gate_stats", col("text"),
        lit("the,of"), lit(2))).head()
    assert(r.isNullAt(0))
  }

  test("gateDf (fused gate_stats) == gateDfLegacy (three kernels), row for row") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // documents-shaped fixture relation: every gate edge in one table —
    // too-short docs, no-lang-signal docs, a repetitive doc (dup 2-grams
    // past 0.3), low-quality punct soup, and a clean keeper
    val docs = (fixtures ++ Seq(
      "the big cat of a small dog and some bird to every " +
        "fish in deep pond is quite blue plus red house near tall tree", // keep
      ("the quick brown fox " * 12).trim,                  // repetitive
      "zz yy xx ww vv uu tt ss rr qq pp oo nn mm",         // no lang signal
      "is !!!!!!!!!! ?????????? ,,,,,,,,,, ;;;;;;;;;; " +
        ".......... {{{{{{{{{{ }}}}}}}}}} (((((((((( ))))))))))")) // low quality
      .zipWithIndex
      .map { case (t, i) => (i.toLong, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val cols = Seq("doc_id", "n_tokens", "lang_max", "dup_frac", "score",
      "drop_reason")
    val a = graft.operators.TextAnalysis.gateDf(docs)
      .select(cols.map(col): _*).orderBy("doc_id").collect().toSeq
    val b = graft.operators.TextAnalysis.gateDfLegacy(docs)
      .select(cols.map(col): _*).orderBy("doc_id").collect().toSeq
    assert(a == b)
    // the fixture really exercises all four drop reasons + keep
    val reasons = a.map(_.getAs[String]("drop_reason")).toSet
    assert(reasons == Set("too_short", "no_lang_signal", "repetitive",
      "low_quality", "keep"))
  }

  test("simhash60_text == simhash60(tokens_h60(text)) (codegen on/off, fuzz, nulls)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val texts = fixtures ++ fuzzStrings(300)
    for (cg <- Seq(true, false)) withCodegen(cg) {
      val rows = texts.toDF("text")
        .select(col("text"),
          call_function("simhash60_text", col("text")).as("fused"),
          call_function("simhash60",
            call_function("tokens_h60", col("text"))).as("composed"))
        .collect()
      rows.foreach { r =>
        assert(r.getLong(1) == r.getLong(2),
          s"codegen=$cg text=<${r.getString(0).take(40)}>")
      }
      // null-in/null-out, matching the composed chain
      val nr = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
        .select(call_function("simhash60_text", col("text"))).collect()
      assert(nr.head.isNullAt(0))
    }
  }

}
