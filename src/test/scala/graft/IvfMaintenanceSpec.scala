package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupPrepare, LayerMaintenance, Similarity}

/** Append maintenance of the IVF vector index (r13 verdict #1): an
  * embeddings ingest batch must be absorbed at BATCH cost — assign to
  * the FROZEN centroids via the map-side argmin kernel, admit into the
  * membership layer under the standing cap/spill rule, recluster only
  * on the drift trigger — instead of forcing the full k-means rebuild
  * every batch.
  *
  * Append ≢ literal rebuild here by design (a rebuild re-learns the
  * centroids; a serving index must not retract standing members), so
  * this spec pins the CONTRACT instead:
  *  (a) appended assignment rows equal an independent frozen-centroid
  *      argmin recomputed in the spec (grid-exact arithmetic);
  *  (b) no standing member is displaced, every cell stays ≤ cap, and
  *      the batch-stamped truncation audit reconciles;
  *  (c) probes through the ensure() alias see the appended index;
  *  (d) a replayed batch heals idempotently;
  *  (e) the drift trigger forces a full recluster whose result equals
  *      a from-scratch build on the grown corpus.
  */
class IvfMaintenanceSpec extends AnyFunSuite with SparkTestBase {

  private def vecOf(i: Long): Seq[Float] =
    (0 until 8).map(j => 0.1f + (((i * 2654435761L + j * 40503L) % 997L) / 997.0f))

  private def writeVecs(dir: String, rows: Seq[(Long, Seq[Float], Int)],
      mode: String): Unit = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .repartition(4).write.mode(mode).parquet(s"$dir/embeddings.parquet")
  }

  private def writeDocs(dir: String, n: Long): Unit = {
    import spark.implicits._
    (0L until n).map(i => (i, s"doc $i body", "en", "u", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** Independent frozen-centroid argmin (the oracle arithmetic: grid-L2
    * over the centroid table, tie cell asc) — recomputed WITHOUT the
    * kernel, as the cross-check for (a). */
  private def expectedAssign(dir: String,
      batch: Seq[(Long, Seq[Float], Int)]): Map[Long, Int] = {
    val cent = Similarity.ivfCent(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val byCell = cent.groupBy(_._1).view.mapValues { rs =>
      val a = new Array[Double](8)
      rs.foreach { case (_, p, c) => a(p) = c }
      a
    }.toMap
    def grid(p: Double): Long =
      (if (p >= 0) math.floor(p * 1e9 + 0.5) else math.ceil(p * 1e9 - 0.5)).toLong
    batch.map { case (id, v, _) =>
      val best = byCell.toSeq.map { case (cell, c) =>
        // per-term grid products, exactly the kernel/oracle arithmetic:
        // n2 and cn2 are sums of gridded squares, dot a sum of gridded
        // cross terms (float element widened to double first)
        val d2 = v.map(x => grid(x.toDouble * x.toDouble)).sum -
          2L * v.zipWithIndex.map { case (x, j) => grid(x.toDouble * c(j)) }.sum +
          c.map(x => grid(x * x)).sum
        (d2, cell)
      }.min
      id -> best._2
    }.toMap
  }

  test("vector ingest: frozen-centroid assign, cap-respecting admit, alias, replay, drift") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfm").toString
    writeDocs(dir, 50L)
    val v1 = (0L until 1200L).map(i => (i, vecOf(i), (i % 5).toInt))
    writeVecs(dir, v1, "overwrite")
    // prime the standing index
    Similarity.ivfMembers(spark, dir).count()
    val assignBefore = Similarity.ivfAssign(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val memBefore = Similarity.ivfMembers(spark, dir)
      .select("cell", "vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet

    // ingest a fresh batch
    val batch = (9000L until 9100L).map(i => (i, vecOf(i * 7 + 3), 0))
    writeVecs(dir, batch, "append")
    import spark.implicits._
    val batchDf = batch.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val report = LayerMaintenance.appendIngestVectors(spark, dir, batchDf)
    assert(report.map(r => (r.family, r.action)).toSet ==
      Set(("ivfassign", "appended"), ("ivfmem", "appended"),
        ("ivfcent", "frozen")), report.toString)

    // (a) appended assignment == independent frozen-centroid argmin
    val assignAfter = Similarity.ivfAssign(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(assignAfter.size == v1.size + batch.size)
    assert(assignAfter.view.filterKeys(_ < 9000L).toMap == assignBefore,
      "standing assignment changed")
    val exp = expectedAssign(dir, batch)
    for ((id, cell) <- exp)
      assert(assignAfter(id) == cell, s"vec $id: kernel/spec argmin differ")

    // (b) membership: standing members intact, cells ≤ cap, audit adds up
    val memAfter = Similarity.ivfMembers(spark, dir)
      .select("cell", "vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(memBefore.subsetOf(memAfter), "standing member displaced")
    val perCell = Similarity.ivfMembers(spark, dir)
      .groupBy("cell").count().collect()
    assert(perCell.forall(_.getLong(1) <= Dedup.BucketCap.toLong))
    val audit = spark.table(
      DedupPrepare.capAuditName(physicalOf("ivfmem", dir)))
      .filter(col("layer") === "ivfmem/append@9000")
      .collect()
    assert(audit.length == 1)
    val a = audit.head
    assert(a.getAs[Long]("rows_in") == batch.size.toLong)
    assert(a.getAs[Long]("rows_kept") + a.getAs[Long]("rows_dropped") ==
      batch.size.toLong)
    assert(a.getAs[Long]("rows_kept") ==
      (memAfter.size - memBefore.size).toLong)

    // (c) a probe through ensure() sees the appended index
    val probe = Similarity.ss02(spark, dir)
    assert(probe.count() == 50)

    // (d) replay: the same batch re-delivered heals without change
    val r2 = LayerMaintenance.ingestVectorBatch(spark, batchDf, dir)
    assert(r2.map(_.action).forall(a => a == "replayed" || a == "frozen"),
      r2.toString)
    assert(Similarity.ivfAssign(spark, dir).count() ==
      (v1.size + batch.size).toLong)
    assert(Similarity.ivfMembers(spark, dir)
      .select("cell", "vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet == memAfter)

    // (e) drift: a batch that outgrows the frozen geometry reclusters,
    // and the rebuilt index equals a from-scratch build on corpus v2
    val big = (20000L until 27000L).map(i => (i, vecOf(i * 13 + 1), 1))
    writeVecs(dir, big, "append")
    val bigDf = big.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val r3 = LayerMaintenance.appendIngestVectors(spark, dir, bigDf)
    assert(r3.map(_.action) == Seq("reclustered"), r3.toString)
    val dirB = java.nio.file.Files.createTempDirectory("graft_ivfm_b").toString
    writeDocs(dirB, 50L)
    writeVecs(dirB, v1 ++ batch ++ big, "overwrite")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).sorted.toSeq
    assert(rows(Similarity.ivfAssign(spark, dir)) ==
      rows(Similarity.ivfAssign(spark, dirB)),
      "reclustered assignment != from-scratch")
    assert(rows(Similarity.ivfMembers(spark, dir).select("cell", "vec_id")) ==
      rows(Similarity.ivfMembers(spark, dirB).select("cell", "vec_id")),
      "reclustered membership != from-scratch")
  }

  private def physicalOf(fam: String, dir: String): String = {
    // resolve THIS corpus's standing physical table of an IVF family by
    // catalog scan (any k) — scoped by the dir tag, because the suite
    // shares one session and other specs mint their own ivf tables
    val safe = dir.replaceAll("[^A-Za-z0-9]", "_").takeRight(24).toLowerCase
    val names = spark.catalog.listTables().collect().map(_.name).toSeq
    names.find(n => n.contains(s"graft_prep_${fam}_") && n.contains(safe) &&
      n.matches(s".*_[0-9a-f]{8}_k\\d+[rc].*")).getOrElse(
      sys.error(s"no standing $fam table for $dir"))
  }

  test("maintainVectorStream: micro-batches absorb into the standing index") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfs").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_ivfs_ck").toString
    writeDocs(dir, 20L)
    val v1 = (0L until 800L).map(i => (i, vecOf(i), 0))
    writeVecs(dir, v1, "overwrite")
    Similarity.ivfMembers(spark, dir).count()

    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float], Int)](spark)
    val q = LayerMaintenance.maintainVectorStream(spark,
      mem.toDF().toDF("vec_id", "embedding", "label")
        .withColumn("embedding", col("embedding").cast("array<float>")),
      dir, ck)
    try {
      mem.addData((5000L until 5040L).map(i => (i, vecOf(i + 11), 1)))
      q.processAllAvailable()
      mem.addData((6000L until 6030L).map(i => (i, vecOf(i + 17), 2)))
      q.processAllAvailable()
    } finally q.stop()

    assert(Similarity.ivfAssign(spark, dir).count() == 870L)
    assert(spark.read.parquet(s"$dir/embeddings.parquet").count() == 870L)
    // every streamed vector is probe-visible membership (no cell was
    // near cap on this corpus)
    val mem2 = Similarity.ivfMembers(spark, dir)
      .filter(col("vec_id") >= 5000L).count()
    assert(mem2 == 70L)
  }
}
