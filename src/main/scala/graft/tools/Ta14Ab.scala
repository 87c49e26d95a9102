package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch (r11): A/B of ta14's repartition-sharing-point plan vs
  * the per-branch partial-aggregate plan, plus an exact result-equality
  * check between the two. */
object Ta14Ab {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"AB $label rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    // equality first (cheap corpus assumed warm layers)
    val a = graft.operators.TextAnalysis.ta14(spark, dir)
    val b = graft.operators.TextAnalysis.ta14Partial(spark, dir)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"AB exact-equality diff rows = $diff")
    t("ta14_current")(graft.operators.TextAnalysis.ta14(spark, dir))
    t("ta14_partial")(graft.operators.TextAnalysis.ta14Partial(spark, dir))
    spark.stop()
  }
}
