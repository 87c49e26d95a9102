package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r11 verdict #4): the ivfpq recall/cost curve on the
  * clustered corpus. The r11 audit read ivfpq 0.22 vs ivf2 0.54 despite
  * ss07's exact top-32 rerank — hypothesis: the ADC shortlist starves
  * the rerank. Sweeps nprobe ∈ {1,2,4} × shortlist ∈ {32,128}, reports
  * per-setting mean recall@5 against the exact brute-force baseline
  * plus the DETERMINISTIC cost (ADC-scanned candidate rows per query,
  * shortlist width = raw-vector rerank reads per query) and indicative
  * wall seconds; writes the curve as a JSON artifact.
  *
  * Usage: runMain graft.tools.IvfPqSweep <sfDir> <corpusTag> <outJson>
  */
object IvfPqSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1.0-clust")
    val tag = args.lift(1).getOrElse(sfDir)
    val outPath = args.lift(2).getOrElse("IVFPQ_SWEEP.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity

    val exact = Similarity.ss01(spark, sfDir)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nq = exact.map(_._1).size
    println(s"[sweep] $tag exact baseline: ${exact.size} pairs over $nq queries")

    // r14 (verdict #5): the r13 corpus-proportional cells moved the
    // operating point (~500-member cells); sweep the shortlist up to 512
    // at nprobe 1/2 to find where ADC ranking error stops starving the
    // exact rerank
    val settings = for (np <- Seq(1, 2); sl <- Seq(32, 128, 256, 512))
      yield (np, sl)
    val rows = settings.map { case (np, sl) =>
      val candPerQ = Similarity.ivfPqCandidates(spark, sfDir, np).count().toDouble / nq
      val t0 = System.nanoTime()
      val got = Similarity.ivfPq(spark, sfDir, np, sl)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val wall = (System.nanoTime() - t0) / 1e9
      val recall = got.count(exact).toDouble / exact.size
      println(f"[sweep] nprobe=$np sl=$sl recall@5=$recall%.3f " +
        f"adc_rows_per_q=$candPerQ%.0f rerank_reads_per_q=$sl wall=$wall%.1f s")
      (np, sl, recall, candPerQ, wall)
    }
    val json = rows.map { case (np, sl, r, c, w) =>
      s"""{"nprobe":$np,"shortlist":$sl,"recall5":$r,""" +
      s""""adc_rows_per_query":$c,"rerank_reads_per_query":$sl,""" +
      s""""wall_sec":${f"$w%.2f"}}"""
    }.mkString("[", ",", "]")
    val out = s"""{"sf":${graft.Json.quote(tag)},"queries":$nq,""" +
      s""""exact_pairs":${exact.size},"grid":$json}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (out + "\n").getBytes("UTF-8"))
    println(s"[sweep] -> $outPath")
    spark.stop()
  }
}
