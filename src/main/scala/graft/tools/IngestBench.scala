package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{LayerMaintenance, Similarity}

/** Dev tool: measures incremental-ingest cost vs the full layer rebuild
  * it replaces (r8 verdict #4's "append ≪ rebuild" evidence, recorded
  * in SCALING.md). Splits the source corpus into v1 + a top-id batch,
  * builds v1's maintained layers (incl. the decoded-pixel layer since
  * r14), ingests the batch, compacts, then builds the full corpus from
  * scratch for the reference time. A second section does the same for
  * the EMBEDDINGS corpus and the IVF index (r13 verdict #1): build the
  * index on v1, append a vector batch (frozen-centroid assign + capped
  * admit), and compare against the full k-means rebuild.
  *
  * Usage: runMain graft.tools.IngestBench [srcDir] [batchDocs] [batchVecs]
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("testdata/sf1.0")
    val batchN = args.lift(1).map(_.toInt).getOrElse(500)
    val batchV = args.lift(2).map(_.toInt).getOrElse(500)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val corpus = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val full = java.nio.file.Files.createTempDirectory("graft_full").toString
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val cut = docs.select("doc_id").orderBy(desc("doc_id")).limit(batchN)
      .agg(min("doc_id")).head().getLong(0)
    docs.filter(col("doc_id") < cut).write.parquet(s"$corpus/documents.parquet")
    val batch = docs.filter(col("doc_id") >= cut)

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"TIMER $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    t("build_v1")(LayerMaintenance.ensureMaintained(spark, corpus))
    batch.write.mode("append").parquet(s"$corpus/documents.parquet")
    t(s"append_ingest_${batchN}docs") {
      LayerMaintenance.appendIngest(spark, corpus, batch).foreach(d =>
        println(f"  ${d.family}%-14s ${d.action}%-9s ${d.rows}%8d rows ${d.secs}%6.2f s"))
    }
    t("compact") {
      LayerMaintenance.compact(spark, corpus).foreach(d =>
        println(f"  ${d.family}%-14s ${d.action}%-9s ${d.rows}%8d rows ${d.secs}%6.2f s"))
    }
    docs.write.parquet(s"$full/documents.parquet")
    t("full_rebuild_v2")(LayerMaintenance.ensureMaintained(spark, full))

    // ------------------------------------------------ IVF vector ingest
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val vcut = emb.select("vec_id").orderBy(desc("vec_id")).limit(batchV)
      .agg(min("vec_id")).head().getLong(0)
    emb.filter(col("vec_id") < vcut)
      .write.parquet(s"$corpus/embeddings.parquet")
    val vbatch = emb.filter(col("vec_id") >= vcut)
    t("build_ivf_v1")(Similarity.ivfMembers(spark, corpus).count())
    vbatch.write.mode("append").parquet(s"$corpus/embeddings.parquet")
    t(s"append_ingest_${batchV}vecs") {
      LayerMaintenance.appendIngestVectors(spark, corpus, vbatch).foreach(d =>
        println(f"  ${d.family}%-14s ${d.action}%-11s ${d.rows}%8d rows ${d.secs}%6.2f s"))
    }
    emb.write.parquet(s"$full/embeddings.parquet")
    t("full_ivf_rebuild_v2")(Similarity.ivfMembers(spark, full).count())
    spark.stop()
  }
}
