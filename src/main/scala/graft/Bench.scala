package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop write materializes the FULL plan (count() would let Catalyst
      // eliminate the final sort and prune every expensive projected
      // column — timing an optimizer-gutted query). Failures are recorded
      // as -1.0 so a broken query can never read as a speedup.
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case NonFatal(e) =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => Json.quote(k) + ":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val nFailed = results.values.count(_ < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$nFailed,"sf":${Json.quote(sfDir)}}""")
    spark.stop()
  }
}
