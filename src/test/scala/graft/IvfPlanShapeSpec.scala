package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Structural pin on the IVF membership BUILD plan (r13 verdict
  * watch-item): the layer is built with per-cell `row_number` rank-cap
  * windows, the shape dd01/mm05 were deliberately de-windowed from —
  * acceptable here ONLY because Catalyst's InferWindowGroupLimit bounds
  * each rank map-side (≤ cap rows per cell leave a task before the
  * exchange), so a degenerate giant cell can never funnel the whole
  * assignment through one rank task. `ensure`'s guard only refuses
  * UNPARTITIONED windows; this spec pins the group-limit shape so a
  * refactor that re-introduces an unbounded per-key rank (e.g. an
  * `rn > cap` branch that forces the full rank to materialize) fails a
  * named test instead of shipping a scale regression.
  */
class IvfPlanShapeSpec extends AnyFunSuite with SparkTestBase {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_ivfshape").toString
    val docs = (0 until 1400).map(i =>
      (i.toLong, s"doc $i body text", "en", "u", 15L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4).write.parquet(s"$d/documents.parquet")
    // a skewed hot cell (identical vectors, > BucketCap members) plus
    // scattered uniques: the exact corpus shape the cap+spill exists for
    val hotVec = Array.fill(8)(0.5f).toSeq
    val hot = (0 until 1100).map(i => (i.toLong, hotVec, 0))
    val rest = (0 until 300).map { i =>
      (2000L + i,
        (0 until 8).map(j => 0.1f + (((i * 2654435761L + j * 40503L) % 997L) / 997.0f)),
        1 + i % 4)
    }
    (hot ++ rest).toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .repartition(4).write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("membership build: every rank-cap window is WindowGroupLimit-bounded") {
    val b = Similarity.ivfMembersBuild(spark, dir, pool = false)
    // no unpartitioned window anywhere in the build plan (ensure()'s
    // guard, re-checked here on the un-pooled plan)
    assert(PlanAudit.unpartitionedWindows(b.kept).isEmpty)
    val (windows, groupLimits) = PlanAudit.windowNodeCensus(b.kept)
    assert(windows > 0, "expected rank windows in the membership build")
    // InferWindowGroupLimit inserts a Partial node below the exchange and
    // a Final node above it for every bounded rank window: if any window
    // lost its bound (rank consumed other than `rn <= cap`), the
    // group-limit count drops below 2 per window
    assert(groupLimits >= 2 * windows,
      s"rank windows not group-limit bounded: $windows windows, " +
        s"$groupLimits WindowGroupLimit nodes")
  }

  test("membership semantics survive the anti-join overflow rewrite") {
    val b = Similarity.ivfMembersBuild(spark, dir, pool = false)
    val cap = Dedup.BucketCap.toLong
    val perCell = b.kept.groupBy("cell").count().collect()
    assert(perCell.forall(_.getLong(1) <= cap))
    // the hot cell was capped and its overflow spilled out: total kept
    // equals the assignment size (capacity 2 cells × 1000 ≥ 1400 here —
    // nothing lost on this corpus), primaries are the lowest vec_ids
    val assignN = b.assign.count()
    assert(b.kept.count() == assignN)
    val primMax = b.kept.filter(col("sp") === 0)
      .groupBy("cell").agg(max("vec_id").as("mx"), count(lit(1)).as("n"))
      .collect()
    for (r <- primMax; if r.getLong(2) == cap)
      // a full cell kept exactly the lowest `cap` of its primaries: the
      // max kept primary must be smaller than every spilled-out vec_id
      // that was assigned to this cell
      assert(b.assign.filter(col("cell") === r.getInt(0))
        .join(b.kept.filter(col("sp") === 0).select("vec_id"),
          Seq("vec_id"), "left_anti")
        .agg(min("vec_id")).head().getLong(0) > r.getLong(1))
  }
}
