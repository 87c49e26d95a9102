package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-family registries; every entry with an
  * `oracle` is hash-checked by the driver against DuckDB at sf0.01.
  */
object SparkEntry {

  /** All registered engine queries, one per implemented operator family. */
  def registry: Seq[Q] =
    graft.operators.Relational.qs ++
      graft.operators.AsOfJoin.qs ++
      graft.operators.Dedup.qs ++
      graft.operators.Similarity.qs ++
      graft.operators.TextAnalysis.qs ++
      graft.operators.Multimodal.qs ++
      graft.operators.Sampling.qs ++
      graft.operators.Curation.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.Relational.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    // a name collision across family registries would silently shadow a
    // query (and drop its oracle check) — fail loudly instead
    val dupes = registry.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
    registry.map(q => q.name -> q.run).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
