package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import graft.Tables

/** Dev tool: same-box A/B for r12 verdict #5 — dd05's two-kernel chain
  * `simhash60(tokens_h60(text))` (an UnsafeArrayData of token hashes
  * materialized per doc only to be folded immediately) vs the fused
  * one-kernel `simhash60_text(text)`. Exact equality checked FIRST
  * (exceptAll both ways), then 3 noop-write reps per variant.
  * usage: Dd05Ab <sfDir>
  */
object Dd05Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def sig(e: String): DataFrame =
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), expr(e).as("simhash"))

    val composed = sig("simhash60(tokens_h60(text))")
    val fused = sig("simhash60_text(text)")
    val d1 = fused.exceptAll(composed).count()
    val d2 = composed.exceptAll(fused).count()
    println(s"equality: fused\\composed=$d1 composed\\fused=$d2")
    require(d1 == 0 && d2 == 0, "fused simhash diverges from composed")

    def run(label: String, mk: => DataFrame): Unit =
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }

    run("sig_composed", sig("simhash60(tokens_h60(text))"))
    run("sig_fused", sig("simhash60_text(text)"))
    run("dd05_shipped", graft.SparkEntry.queries("dd05_simhash_sig")(spark, sfDir))
    spark.stop()
  }
}
