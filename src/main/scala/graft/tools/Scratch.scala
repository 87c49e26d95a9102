package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: isolate where a query's wall time goes (scan vs
  * expression vs sort). Not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1.0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }

    val ev = graft.Tables.events(spark, sfDir)
    time("scan-only (noop)") {
      ev.select("event_id", "event_type", "props")
        .write.format("noop").mode("overwrite").save()
    }
    time("json-parse no sort") {
      ev.withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .filter(col("k") > 80)
        .select("event_id", "event_type", "k")
        .write.format("noop").mode("overwrite").save()
    }
    time("full q13 (with sort)") {
      graft.SparkEntry.queries("q13_json_extract")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("persist before sort") {
      spark.catalog.clearCache()
      val parsed = ev
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .filter(col("k") > 80)
        .select("event_id", "event_type", "k")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try parsed.orderBy("event_id")
        .write.format("noop").mode("overwrite").save()
      finally parsed.unpersist(blocking = false)
    }
    spark.stop()
  }
}
