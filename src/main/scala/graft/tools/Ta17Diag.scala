package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: exact-equality diff of ta17's kernel plan vs the retired
  * explode-join plan at a given sf (the check LexAb lacked — the sf10
  * oracle caught a ta17/ta18 divergence). usage: Ta17Diag <sfDir> */
object Ta17Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val enc = graft.operators.TextAnalysis.bpeWords(spark, sfDir)
    val a = graft.operators.TextAnalysis.ta17With(spark, sfDir, enc)
    val b = graft.operators.TextAnalysis.ta17ExplodeWith(spark, sfDir, enc)
    println("kernel\\explode = " + a.exceptAll(b).count())
    println("explode\\kernel = " + b.exceptAll(a).count())
    a.exceptAll(b).show(5, false)
    b.exceptAll(a).show(5, false)
    spark.stop()
  }
}
