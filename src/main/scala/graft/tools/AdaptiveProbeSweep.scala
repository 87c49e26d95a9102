package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Similarity}

/** Dev tool: the r15 ADAPTIVE-ROUTING sweep (r14 verdict Missing #2).
  * On a given corpus, measures recall@5 vs the exact brute-force
  * baseline and MEAN PROBED CELLS per query for:
  *   - the static dial np ∈ {1, 2, 4} (the r14 operating guidance), and
  *   - distance-ratio-stop adaptive routing at β ∈ {1.0625, 1.125,
  *     1.25, 1.5, 2.0} with npMax = 4 (β values chosen
  *     binary-representable so the engine and the DuckDB oracle share
  *     the exact stop boundary).
  * One JSON line per config. Run on BOTH the natural-BoW corpus (the
  * manifold geometry where np1 recall was 0.40) and the clustered
  * sf1.0 fixture (where the 0.98 guard must not move) — the adopted
  * operating point is Similarity.AdaptiveBeta/AdaptiveNpMax.
  * usage: AdaptiveProbeSweep <sfDir>
  */
object AdaptiveProbeSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    // exact ground truth: brute-force top-5 per query, engine tie-break
    val e = Tables.embeddings(spark, sfDir)
    val el = e.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("x", col("x").cast("double")).persist()
    val vnorm = el.groupBy(col("vec_id"))
      .agg(sum(Dedup.gridL(col("x") * col("x"))).as("vn2")).persist()
    val qel = el.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("pos"), col("x").as("qx"))
    val exact = qel.join(el.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("x", "nx"), Seq("pos"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(Dedup.gridL(col("qx") * col("nx"))).as("dot"))
      .join(vnorm.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("vn2", "qn2"), Seq("query_id"))
      .join(vnorm.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("vn2", "nn2"), Seq("neighbor_id"))
      .withColumn("cosine", col("dot").cast("double") /
        (sqrt(col("qn2").cast("double")) * sqrt(col("nn2").cast("double"))))
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id")).persist()
    val nQ = exact.select("query_id").distinct().count()

    def report(label: String, best: org.apache.spark.sql.DataFrame): Unit = {
      val probes = best.groupBy(col("query_id"))
        .agg(count(lit(1)).as("np"))
      val meanProbes = probes.agg(avg(col("np"))).head().getDouble(0)
      val served = Similarity.ivfOver(spark, sfDir, best)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(served, Seq("query_id", "neighbor_id")).count()
      val recall = hits.toDouble / (nQ * 5.0)
      println(f"""{"config":"$label","recall_at_5":$recall%.4f,""" +
        f""""mean_probes":$meanProbes%.3f,"n_queries":$nQ,""" +
        s""""sf":"${sfDir.split('/').last}"}""")
    }

    for (np <- Seq(1, 2, 4))
      report(s"static_np$np", Similarity.bestCells(spark, sfDir, np))
    for (beta <- Seq(1.0625, 1.125, 1.25, 1.5, 2.0))
      report(s"adaptive_b$beta",
        Similarity.bestCellsAdaptive(spark, sfDir, npMax = 4, beta = beta))
    spark.stop()
  }
}
