package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.TextAnalysis

/** Dev tool: same-box A/B of the broadcast-lexicon kernel plans (r12)
  * against the retired forms they replaced — ta16 (typedlit element_at
  * probes), ta17 (explode → broadcast join → per-doc agg), bpeDocCounts
  * (explode_outer → left join → sum; the ta18/sp11 count source) — plus
  * end-to-end timings of the shipped ta16/ta17/ta18/sp11 for the
  * SCALING.md record. noop writes (full plan, no sink), layers warmed
  * first, 3 reps each. usage: LexAb <sfDir>
  */
object LexAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(label: String, mk: => DataFrame): Unit =
      (1 to 3).foreach { i =>
        // presentation caches (Present.pooled) would otherwise poison
        // reps 2..3 — each rep must pay the full pipeline
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }

    // warm the layers so the A/B measures the query, not the build
    TextAnalysis.bpeWords(spark, sfDir).count()
    TextAnalysis.vocabLayer(spark, sfDir).count()

    val enc = TextAnalysis.bpeWords(spark, sfDir)
    val vocab = TextAnalysis.vocabLayer(spark, sfDir)

    run("ta16_kernel", TextAnalysis.ta16With(spark, sfDir, vocab))
    run("ta16_typedlit", TextAnalysis.ta16LitWith(spark, sfDir, vocab))
    run("ta17_kernel", TextAnalysis.ta17With(spark, sfDir, enc))
    run("ta17_explode", TextAnalysis.ta17ExplodeWith(spark, sfDir, enc))
    run("bpeDocCounts_kernel", TextAnalysis.bpeDocCounts(spark, sfDir))
    run("bpeDocCounts_join", TextAnalysis.bpeDocCountsJoin(spark, sfDir))
    run("ta18_shipped", graft.SparkEntry.queries("ta18_bpe_length_histogram")(spark, sfDir))
    run("sp11_shipped", graft.SparkEntry.queries("sp11_bpe_pack")(spark, sfDir))
    spark.stop()
  }
}
