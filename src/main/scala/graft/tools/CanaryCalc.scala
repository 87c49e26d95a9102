package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev scratch: print the Bench calibration canary's checksum + wall a
  * few times (used once to pin Bench.CanaryChecksum; kept so the
  * constant stays reproducible). */
object CanaryCalc {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val c = graft.Bench.canaryChecksumOf(spark)
      println(f"CANARY run$i chk=$c wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
