package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupPrepare}

/** The kepts singleton prune (r16): the by-shingle kept relation drops
  * df-1 rows at write time because they cannot form a self-join pair.
  * Pins, on the real sf0.001 corpus:
  *  (a) the layer is EXACTLY the df ≥ 2 subset of the unpruned kept
  *      relation, with the denormalized per-doc count `n` still taken
  *      over ALL kept shingles (including the pruned singletons);
  *  (b) dd04's output equals the pair self-join composed over the
  *      UNPRUNED kept relation (the oracle's definition, recomputed
  *      here engine-side).
  */
class KeptsPruneSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** The unpruned kept relation with denominators — the pre-r16 layer
    * body, recomputed from the same upstream layers. */
  private def unprunedKept = {
    val sh = DedupPrepare.shingles3(spark, dir)
    val df = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val kept = sh.join(df.filter(col("df") <= DedupPrepare.DfCut)
      .select(col("s")), Seq("s"))
    val n = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    kept.join(n, Seq("doc_id")).select(col("s"), col("doc_id"), col("n"))
  }

  test("kepts == df>=2 subset of the unpruned kept relation, n unpruned") {
    val unpruned = unprunedKept
    val df2 = unpruned.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select(col("s"))
    val expected = unpruned.join(df2, Seq("s"))
      .select(col("s"), col("doc_id"), col("n"))
    val got = DedupPrepare.keptByShingle(spark, dir)
      .select(col("s"), col("doc_id"), col("n"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "kepts layer != df>=2 subset with unpruned denominators")
    // the prune actually prunes something on this corpus (guards the
    // test against a fixture where df-1 rows vanish for other reasons)
    assert(got.count() < unpruned.count(),
      "expected df-1 singletons to exist and be pruned at sf0.001")
  }

  test("dd04 == the pair self-join over the UNPRUNED kept relation") {
    val kept = unprunedKept
    val expected = kept.as("a").hint("merge").join(kept.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"),
        max(col("a.n")).as("n1"), max(col("b.n")).as("n2"))
      .withColumn("jaccard", col("c").cast("double") /
        (col("n1") + col("n2") - col("c")).cast("double"))
      .select(col("d1"), col("d2"), col("c").as("n_common"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("d1"), col("d2"))
      .limit(20)
    val got = Dedup.dd04(spark, dir)
    assert(got.collect().map(_.toSeq).toSeq ==
      expected.collect().map(_.toSeq).toSeq,
      "dd04 over the pruned layer != unpruned composition")
  }
}
