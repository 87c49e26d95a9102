package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Broadcast-lexicon kernels (BpeDocStats / VocabDocStats): pinned
  * row-for-row equal to the explode→join→aggregate / typedlit-probe forms
  * they replaced (the ta16/ta17/ta18/sp11 hot paths), in both codegen and
  * interpreted paths, INCLUDING on a partial lexicon where the retired
  * inner join's miss-dropping semantics bite.
  */
class LexKernelsSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def withCodegen[T](on: Boolean)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", on.toString)
    try f finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  /** Schema-and-multiset equality — exceptAll both ways requires the
    * column types to line up exactly, so a kernel field-type drift
    * (int vs long) fails loudly, not just a value diff. */
  private def assertSame(kernel: DataFrame, reference: DataFrame): Unit = {
    assert(kernel.schema == reference.schema,
      s"schema drift: ${kernel.schema} vs ${reference.schema}")
    assert(kernel.exceptAll(reference).isEmpty, "kernel rows not in reference")
    assert(reference.exceptAll(kernel).isEmpty, "reference rows not in kernel")
  }

  test("ta17 kernel plan == explode/join/agg form on the full lexicon (codegen on/off)") {
    val enc = TextAnalysis.bpeWords(spark, dir)
    for (cg <- Seq(true, false)) withCodegen(cg) {
      assertSame(
        TextAnalysis.ta17With(spark, dir, enc),
        TextAnalysis.ta17ExplodeWith(spark, dir, enc))
    }
  }

  test("ta17 kernel plan == explode/join/agg form on a PARTIAL lexicon") {
    // Half the lexicon (deterministic hash split): misses must vanish
    // from n_tokens/n_bpe, contribute no ids8 entries, and all-miss docs
    // must drop entirely — the inner join + groupBy semantics.
    val partial = TextAnalysis.bpeWords(spark, dir)
      .filter(Dedup.h60(col("tok")) % 2 === 0)
    val kernelForm = TextAnalysis.ta17With(spark, dir, partial)
    assertSame(kernelForm, TextAnalysis.ta17ExplodeWith(spark, dir, partial))
    // the partial lexicon must actually exercise the miss path
    val full = TextAnalysis.ta17With(spark, dir, TextAnalysis.bpeWords(spark, dir))
    val (kTok, fTok) = (
      kernelForm.agg(sum("n_tokens")).head.getLong(0),
      full.agg(sum("n_tokens")).head.getLong(0))
    assert(kTok < fTok, s"partial lexicon dropped nothing ($kTok vs $fTok)")
  }

  test("bpeDocCounts kernel plan == explode_outer/left-join/sum form") {
    for (cg <- Seq(true, false)) withCodegen(cg) {
      assertSame(
        TextAnalysis.bpeDocCounts(spark, dir),
        TextAnalysis.bpeDocCountsJoin(spark, dir))
    }
  }

  test("ta16 kernel plan == typedlit-probe form on the corpus vocab (codegen on/off)") {
    val vocab = TextAnalysis.vocabLayer(spark, dir)
    for (cg <- Seq(true, false)) withCodegen(cg) {
      assertSame(
        TextAnalysis.ta16With(spark, dir, vocab),
        TextAnalysis.ta16LitWith(spark, dir, vocab))
    }
  }

  test("ta16 kernel plan == typedlit form on a tiny vocab (OOV hash fallback hot)") {
    // 3-word vocab: nearly every token takes the h60-fallback id, so a
    // kernel/column h60 drift of even one bit fails the ids8 compare.
    import spark.implicits._
    val tiny = Seq(("the", 0L), ("of", 1L), ("und", 2L)).toDF("tok", "id")
    assertSame(
      TextAnalysis.ta16With(spark, dir, tiny),
      TextAnalysis.ta16LitWith(spark, dir, tiny))
  }

  test("LexKernels.h60 == the column h60 (md5/conv) on adversarial tokens") {
    import spark.implicits._
    val toks = Seq("", "a", "the", "café", "世界", "ALLCAPS", "123",
      "a-b_c.d", "", "ffffffffffffffff", "zzzzzzz")
    val fromCol = toks.toDF("t").select(col("t"), Dedup.h60(col("t")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    toks.foreach { t =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      assert(graft.functions.LexKernels.h60(u) == fromCol(t),
        s"h60 drift on '$t'")
    }
  }
}
