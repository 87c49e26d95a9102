package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{DedupPrepare, Multimodal}

/** Dev tool: same-box A/B for r12 verdict #1 — the decoded-pixel built
  * layer. Compares the shipped layer-served mm04/mm05 against the
  * pre-layer plans (decode re-run per query, preserved as
  * `mm04Legacy`/`mm05Legacy`). Exact equality FIRST (exceptAll both
  * ways), then 3 noop-write reps per variant; the layer build cost is
  * drained and printed separately so the amortization math is explicit
  * (build once vs decode per query). usage: MmAb <sfDir>
  */
object MmAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // force the layer build up front and price it
    val t0 = System.nanoTime()
    Multimodal.pixelLayer(spark, sfDir).count()
    println(f"layer_first_touch: ${(System.nanoTime() - t0) / 1e9}%.2fs " +
      s"(builds: ${DedupPrepare.drainBuildLog().map {
        case (k, sec) => f"$k=$sec%.2fs" }.mkString(", ")})")

    for ((name, shipped, legacy) <- Seq[
        (String, () => DataFrame, () => DataFrame)](
      ("mm01", () => Multimodal.mm01(spark, sfDir),
        () => Multimodal.mm01Legacy(spark, sfDir)),
      ("mm02", () => Multimodal.mm02(spark, sfDir),
        () => Multimodal.mm02Legacy(spark, sfDir)),
      ("mm03", () => Multimodal.mm03(spark, sfDir),
        () => Multimodal.mm03Legacy(spark, sfDir)),
      ("mm04", () => Multimodal.mm04(spark, sfDir),
        () => Multimodal.mm04Legacy(spark, sfDir)),
      ("mm05", () => Multimodal.mm05(spark, sfDir),
        () => Multimodal.mm05Legacy(spark, sfDir)))) {
      val d1 = shipped().exceptAll(legacy()).count()
      val d2 = legacy().exceptAll(shipped()).count()
      println(s"$name equality: shipped\\legacy=$d1 legacy\\shipped=$d2")
      require(d1 == 0 && d2 == 0, s"$name layer plan diverges from legacy")
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
