package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: runs the ss05 recall audit (every ANN variant vs the
  * exact brute-force baseline, recall@5 per query) on a given corpus
  * dir and writes the per-query rows + mean-recall summary as a JSON
  * artifact tagged with the corpus it measured. The r10 verdict's #6:
  * on the default isotropic corpus the audit measures the DATA (all
  * coarse quantizers ~chance); gen_sf.py --clustered-emb gives the
  * index real structure to learn, and this artifact records the
  * separation (expect ivf1/ivf2/ivfpq >> lsh/pq there).
  *
  * Usage: runMain graft.tools.Ss05Audit <sfDir> <corpusTag> <outJson>
  */
object Ss05Audit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1.0")
    val tag = args.lift(1).getOrElse(sfDir)
    val outPath = args.lift(2).getOrElse("SS05_AUDIT.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rows = graft.operators.Similarity.ss05(spark, sfDir)
      .orderBy("query_id").collect()
    val recallCols = Seq("recall_ivf1", "recall_ivf2", "recall_lsh",
      "recall_pq", "recall_ivfpq")
    val schema = rows.headOption.map(_.schema).getOrElse(
      sys.error("ss05 returned no rows"))
    def jRow(r: org.apache.spark.sql.Row): String =
      schema.fields.map { f =>
        val v = r.get(schema.fieldIndex(f.name))
        s"${graft.Json.quote(f.name)}:$v"
      }.mkString("{", ",", "}")
    val means = recallCols.map { c =>
      val xs = rows.map(r => r.getDouble(r.fieldIndex(c)))
      s"${graft.Json.quote(c)}:${xs.sum / xs.length}"
    }.mkString("{", ",", "}")
    val json =
      s"""{"sf":${graft.Json.quote(tag)},""" +
      s""""rows":${rows.map(jRow).mkString("[", ",", "]")},""" +
      s""""mean_recall":$means}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    println(s"[ss05-audit] $tag -> $outPath mean=$means")
    spark.stop()
  }
}
