package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage-by-stage timing of ta14's probe pipeline. */
object Ta14Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val ws = split(lower(trim(col("text"))), "\\s+")
    val tks = filter(ws, x => x =!= "")
    val docs = graft.Tables.documents(spark, dir)
    val bg = docs.select(col("doc_id"), tks.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(sequence(lit(2), size(col("t")))).as("i"), col("t"))
      .select(col("doc_id"),
        element_at(col("t"), col("i") - 1).as("t1"),
        element_at(col("t"), col("i")).as("t2"))
    t("scan_tokenize")(docs.select(col("doc_id"), size(tks).as("n")))
    t("bg_extract")(bg)
    t("bg_repart")(bg.repartition(col("doc_id")))
    for (_ <- 1 to 2) t("bg_agg_direct")(bg.groupBy("doc_id").agg(count(lit(1))))
    spark.stop()
  }
}
