package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.DedupPrepare

/** A/B harness for the dd04 growth curve (r7 verdict #7): the shipped
  * inverted-index dd04 scans Σ df² candidate mass (measured 9× for 10×
  * data at sf10); the CANDIDATE PREGATE variant generates pairs from the
  * LSH band layer first (dd03's candidate machinery, Σ bucket² mass)
  * and exact-Jaccards only those pairs over the df-cut shingle universe.
  *
  * The pregate changes SEMANTICS from exact to approximate top-20 (a
  * pair both LSH-invisible and high-Jaccard would be missed), so the
  * A/B also diffs the result rows — a switch is only interesting if the
  * answer survives on the benchmark corpus.
  *
  * Usage: runMain graft.tools.AbDd04 <sfDir>
  */
object AbDd04 {

  /** dd04's semantics with dd03's LSH candidate pregate in front — the
    * measured winner shipped as [[graft.operators.Dedup.dd12]]. */
  def dd04Pregated(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.dd12(s, dir)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/sf1.0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(df: => DataFrame): Unit = {
      val samples = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: median ${samples.sorted.apply(1)}%.2f s  (${samples.map(x => f"$x%.2f").mkString(", ")})")
    }

    // layers first so both variants time pure query cost
    DedupPrepare.keptByShingle(spark, dir).count()
    DedupPrepare.keptByDoc(spark, dir).count()
    DedupPrepare.lshBands(spark, dir).count()

    time("dd04 shipped (inverted index)") {
      graft.operators.Dedup.dd04(spark, dir)
    }
    time("dd04 pregated (LSH candidates)") { dd04Pregated(spark, dir) }

    val a = graft.operators.Dedup.dd04(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = dd04Pregated(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    println(s"result rows equal: ${a == b}")
    if (a != b) {
      println(s"only in shipped:  ${(a.toSet -- b.toSet).toSeq.sorted.take(10)}")
      println(s"only in pregated: ${(b.toSet -- a.toSet).toSeq.sorted.take(10)}")
    }
    spark.stop()
  }
}
