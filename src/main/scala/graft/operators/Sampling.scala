package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Deterministic dataset-curation operators (north-star extension, no
  * reference counterpart): train/val/test split assignment and
  * stratified downsampling. Both key on the portable 60-bit content
  * hash ([[Dedup.h60]]) of the STABLE doc id — never on RNG — so the
  * assignment is reproducible across runs, engines, and cluster sizes,
  * and a re-run after appending data never reshuffles existing docs
  * between splits (the property that makes hash-splits the standard over
  * randomSplit in training pipelines).
  *
  * Scale posture: both are pure map-side column programs over the scan
  * (the split/keep decision is a projection); only the audit counts
  * aggregate, shuffling once on a tiny key space.
  */
object Sampling {

  /** Split bucket in [0, 100): hash of the id string, salted so the
    * split assignment is independent of any other h60-derived key. */
  private def bucket = Dedup.h60(concat(lit("split:"), col("doc_id"))) % 100L

  private val bucketSql =
    s"${Dedup.h60Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100"

  private val keepSql =
    s"${Dedup.h60Sql("'sample:' || CAST(doc_id AS VARCHAR)")} % 100 < 20"

  // ---------------------------------------------------------------- sp01
  /** Deterministic 90/5/5 train/val/test assignment per doc. */
  def sp01(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("bucket", bucket.cast("int"))
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val")
          .otherwise("test"))
      .select("doc_id", "lang", "bucket", "split")
      .orderBy("doc_id")

  val sp01Sql: String =
    s"""SELECT doc_id, lang,
       |       CAST($bucketSql AS INT) AS bucket,
       |       CASE WHEN $bucketSql < 90 THEN 'train'
       |            WHEN $bucketSql < 95 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- sp02
  /** Stratified deterministic 20% sample with an audit: per (lang,
    * split-kept?) — total docs, kept docs, and the exact kept ratio.
    * The keep decision is the same hash family (different salt), so
    * sampling composes independently with the split assignment.
    */
  def sp02(s: SparkSession, dir: String): DataFrame = {
    val keep = (Dedup.h60(concat(lit("sample:"), col("doc_id"))) % 100L) < 20L
    Tables.documents(s, dir)
      .withColumn("kept", keep.cast("int"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("kept")).cast("long").as("n_kept"))
      .withColumn("kept_ratio",
        col("n_kept").cast("double") / col("n_docs").cast("double"))
      .orderBy("lang")
  }

  val sp02Sql: String =
    s"""SELECT lang, COUNT(*) AS n_docs,
      |       CAST(SUM(CASE WHEN $keepSql THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |       CAST(SUM(CASE WHEN $keepSql THEN 1 ELSE 0 END) AS DOUBLE)
      |         / CAST(COUNT(*) AS DOUBLE) AS kept_ratio
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Registry of this family. */
  val qs: Seq[Q] = Seq(
    Q("sp01_split_assign", "deterministic hash 90/5/5 train/val/test split", sp01, Some(sp01Sql)),
    Q("sp02_stratified_sample", "stratified 20% hash sample + audit counts", sp02, Some(sp02Sql)),
  )
}
