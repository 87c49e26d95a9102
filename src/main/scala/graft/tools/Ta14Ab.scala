package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (r11→r12): A/B of ta14's repartition-sharing-point plan
  * ([[graft.operators.TextAnalysis.ta14With]]) vs the per-branch
  * partial-aggregate plan ta14 now ships, plus an exact result-equality
  * check between the two. The committed r12 run (sf10, warm layers,
  * idle box): diff rows 0; current 32.7/32.3/32.0 s vs partial
  * 28.7/26.9/26.8 s — the partial plan was adopted as ta14. */
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
    import graft.operators.TextAnalysis
    // the two forms against the SAME model tables/head the shipped
    // query serves (ta14 == partialWith(head) since the r12 adoption)
    def sharing() = {
      val head = TextAnalysis.bigramHead(spark, dir)
      val coversAll = head.count() < TextAnalysis.BigramHeadK
      TextAnalysis.ta14With(spark, dir,
        TextAnalysis.uniProb(spark, dir),
        TextAnalysis.bigramProb(spark, dir), Some((head, coversAll)))
    }
    def t(label: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"AB $label rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    // equality first (cheap corpus assumed warm layers)
    val a = sharing()
    val b = TextAnalysis.ta14(spark, dir)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"AB exact-equality diff rows = $diff")
    t("ta14_sharing")(sharing())
    t("ta14_partial")(TextAnalysis.ta14(spark, dir))
    spark.stop()
  }
}
