package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.Tables
import graft.operators.TextAnalysis

/** Dev tool: same-box A/B of the fused gate_stats kernel (r12) against
  * the retired three-kernel gate composition — gateDf (ta08/cp01's
  * column program: text_metrics + stop_hits + ngram_stats, each a full
  * tokenize pass) vs the fused one-pass form — plus the shipped
  * ta08/ta02 end-to-end timings for the SCALING.md record. Exact
  * equality is checked FIRST (exceptAll both ways over the gate
  * columns), then noop writes, 3 reps each. usage: GateAb <sfDir>
  */
object GateAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // NB: no spark.driver.memory here — in local mode the driver heap is
    // this JVM's -Xmx (build.sbt javaOptions), and a builder config after
    // JVM start is a silent no-op
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val cols = Seq("doc_id", "n_tokens", "lang_max", "dup_frac", "score",
      "drop_reason").map(col)
    def gate(mk: DataFrame => DataFrame): DataFrame =
      mk(Tables.documents(spark, sfDir)).select(cols: _*)

    // exact equality first — an A/B of two non-identical plans is noise
    val fused = gate(TextAnalysis.gateDf)
    val legacy = gate(TextAnalysis.gateDfLegacy)
    val d1 = fused.exceptAll(legacy).count()
    val d2 = legacy.exceptAll(fused).count()
    println(s"equality: fused\\legacy=$d1 legacy\\fused=$d2")
    require(d1 == 0 && d2 == 0, "fused gate diverges from legacy gate")

    def run(label: String, mk: => DataFrame): Unit =
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }

    run("gate_fused", gate(TextAnalysis.gateDf))
    run("gate_legacy", gate(TextAnalysis.gateDfLegacy))
    run("ta08_shipped", graft.SparkEntry.queries("ta08_quality_gate")(spark, sfDir))
    run("ta02_shipped", graft.SparkEntry.queries("ta02_quality_score")(spark, sfDir))
    spark.stop()
  }
}
