package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run named queries 3× (cold + 2 warm) to separate planning/
  * codegen overhead from execution. usage: MicroBench <sfDir> <q>... */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
