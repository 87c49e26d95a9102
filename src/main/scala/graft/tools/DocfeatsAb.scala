package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.operators.{Dedup, DedupPrepare, Sampling, TextAnalysis, TextFeatures}

/** Dev tool: same-box A/B for r15 — the shared per-doc text-feature
  * layer (docfeats + vocab + the id-keyed model tables). Compares each
  * layer-served query (dd01/dd05/sp03/ta12/ta13/ta14) against its
  * preserved pre-layer legacy plan. Exact equality FIRST (exceptAll
  * both ways), then 3 noop-write reps per variant with the cache
  * cleared per rep; layer build costs are drained and printed
  * separately so the amortization math is explicit (tokenize+encode
  * once vs re-tokenize per query). usage: DocfeatsAb <sfDir>
  */
object DocfeatsAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // force the layer chain up front and price it (vocab -> docfeats ->
    // uniprobid/biprobid/bigheadid; the legacy model tables build when
    // the legacy side first runs and are priced by the same drain)
    val t0 = System.nanoTime()
    TextFeatures.docFeats(spark, sfDir).count()
    TextFeatures.biProbId(spark, sfDir).count()
    TextFeatures.bigHeadId(spark, sfDir).count()
    println(f"layer_first_touch: ${(System.nanoTime() - t0) / 1e9}%.2fs " +
      s"(builds: ${DedupPrepare.drainBuildLog().map {
        case (k, sec) => f"$k=$sec%.2fs" }.mkString(", ")})")

    for ((name, shipped, legacy) <- Seq[
        (String, () => DataFrame, () => DataFrame)](
      ("dd01", () => Dedup.dd01(spark, sfDir),
        () => Dedup.dd01Legacy(spark, sfDir)),
      ("dd05", () => Dedup.dd05(spark, sfDir),
        () => Dedup.dd05Legacy(spark, sfDir)),
      ("sp03", () => Sampling.sp03(spark, sfDir),
        () => Sampling.sp03Over(Tables.documents(spark, sfDir))),
      ("ta12", () => TextAnalysis.ta12(spark, sfDir),
        () => TextAnalysis.ta12Legacy(spark, sfDir)),
      ("ta13", () => TextAnalysis.ta13(spark, sfDir),
        () => TextAnalysis.ta13With(spark, sfDir,
          TextAnalysis.clfWeights(spark, sfDir))),
      ("ta14", () => TextAnalysis.ta14(spark, sfDir),
        () => TextAnalysis.ta14Legacy(spark, sfDir)))) {
      val d1 = shipped().exceptAll(legacy()).count()
      val d2 = legacy().exceptAll(shipped()).count()
      println(s"$name equality: shipped\\legacy=$d1 legacy\\shipped=$d2")
      require(d1 == 0 && d2 == 0, s"$name layer plan diverges from legacy")
      val legacyBuilds = DedupPrepare.drainBuildLog()
      if (legacyBuilds.nonEmpty)
        println(s"  (legacy-side builds: ${legacyBuilds.map {
          case (k, sec) => f"$k=$sec%.2fs" }.mkString(", ")})")
      for ((label, mk) <- Seq(s"${name}_layer" -> shipped,
          s"${name}_legacy" -> legacy); i <- 1 to 3) {
        spark.catalog.clearCache()
        val t = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        println(f"$label run$i: ${(System.nanoTime() - t) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
