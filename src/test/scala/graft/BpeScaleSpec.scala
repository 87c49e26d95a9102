package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** The model-scale BPE contracts (r10 verdict #2/#3):
  *  (a) the mapPartitions merge fold is EXACTLY the fence-string
  *      replace-chain semantics — pinned by running the old chain form
  *      (rebuilt here, column-by-column) against the fold on the real
  *      test corpus's word dict;
  *  (b) batched training at k=1 is exactly sequential training;
  *  (c) a 32k-row merges table loads through bpeWordsFrom/ta17With —
  *      no per-merge expression depth, no vocab-sized plan literal —
  *      and, when its applicable prefix is the learned table, serves
  *      the identical encode.
  */
class BpeScaleSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val Sep = "\u0001"

  private def wordDict = {
    TextAnalysis // touch the object before using col-based helpers
    Tables.documents(spark, dir)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
  }

  test("fold ≡ replace-chain on the corpus word dict at BpeRounds=8") {
    val mg = TextAnalysis.bpeMerges(spark, dir).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(mg.nonEmpty)
    val words = wordDict.distinct()
    // the pre-r11 form: one literal replace per merge over the fenced
    // symbol string (fine at 8 merges — the point of the fold is that
    // this form cannot scale to 32k)
    var enc: org.apache.spark.sql.Column = concat(lit(Sep),
      array_join(regexp_extract_all(col("tok"), lit("."), lit(0)), Sep + Sep),
      lit(Sep))
    mg.foreach { case (l, r) =>
      enc = replace(enc, lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep))
    }
    val chain = words
      .select(col("tok"), split(trim(enc, Sep), Sep + Sep).as("subs"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val fold = TextAnalysis.bpeWords(spark, dir).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(fold.keySet == chain.keySet)
    for ((tok, subs) <- chain)
      assert(fold(tok) == subs, s"fold != chain for '$tok'")
  }

  test("batched training k=1 ≡ sequential bpeMerges") {
    val seq = TextAnalysis.bpeMerges(spark, dir).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val bat = TextAnalysis
      .bpeMergesBatched(spark, wordDict, rounds = TextAnalysis.BpeRounds, k = 1)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(bat == seq)
  }

  test("batched training k=4: contiguous ranks, per-scan symbol-disjoint, loadable") {
    var scans = 0
    val perScan = scala.collection.mutable.ArrayBuffer.empty[Int]
    val mgDf = TextAnalysis.bpeMergesBatched(spark, wordDict, rounds = 8, k = 4,
      onScan = (_, admitted, _) => { scans += 1; perScan += admitted })
    val mg = mgDf.orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(mg.map(_._1).toSeq == (1L to mg.length.toLong))
    assert(scans < mg.length, "batching did not reduce scan count")
    // replay the greedy admission: within a scan, no symbol or surface
    // repeats
    var idx = 0
    for (n <- perScan) {
      val batch = mg.slice(idx, idx + n); idx += n
      val syms = batch.flatMap { case (_, l, r) => Seq(l, r, l + r) }
      assert(syms.distinct.length == syms.length,
        s"scan batch not symbol-disjoint: ${batch.mkString(",")}")
    }
    // the artifact loads and encodes every dict word (reconstruction)
    val lex = TextAnalysis.bpeWordsFrom(spark, wordDict.distinct(), mgDf)
      .collect()
    assert(lex.nonEmpty)
    for (r <- lex)
      assert(r.getSeq[String](1).mkString("") == r.getString(0))
  }

  test("a 32k-row merges table loads; learned-prefix padding serves the identical encode") {
    import spark.implicits._
    val learned = TextAnalysis.bpeMerges(spark, dir).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // pad to 32768 rows with well-formed but never-adjacent pairs (the
    // padding symbols don't occur in any corpus word), ranks contiguous
    val padded = learned ++
      ((learned.length + 1) to 32768).map(i => (i.toLong, s"①x$i", s"②y$i"))
    val mgDf = padded.toDF("rank", "l", "r")
    val words = wordDict.distinct()
    val t0 = System.nanoTime()
    val lex32k = TextAnalysis.bpeWordsFrom(spark, words, mgDf)
    val rows = lex32k.collect()
    info(f"32k-merge lexicon over ${rows.length} words in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    // inapplicable padding is a no-op: subs and ids equal the learned
    // 8-merge lexicon's (padding ids start at alphabet + 8, unused)
    val base = TextAnalysis.bpeWords(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getSeq[String](1), r.getSeq[Long](2))).toMap
    assert(rows.length == base.size)
    for (r <- rows) {
      val (tok, subs, ids) = (r.getString(0), r.getSeq[String](1), r.getSeq[Long](2))
      assert((subs, ids) == base(tok), s"32k lexicon diverged for '$tok'")
    }
    // and the serving query runs unchanged through the swap hook
    val viaSwap = TextAnalysis.ta17With(spark, dir, lex32k).collect()
    val viaBase = TextAnalysis.ta17(spark, dir).collect()
    assert(viaSwap.map(_.toString).toSeq == viaBase.map(_.toString).toSeq)
  }
}
