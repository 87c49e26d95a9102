package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** The end-to-end curation manifest (north-star capstone): ONE relation
  * that records, for every document, whether it ships in the training
  * corpus and — if not — the first pipeline stage that dropped it. This
  * is the artifact a production curation run actually publishes: the
  * keep/drop decisions of the quality gate ([[TextAnalysis.ta08]]),
  * exact-dup canonicalization (dd01's normalized signature, min-doc_id
  * keeper) and train-side decontamination (sp03's rule, transposed:
  * a TRAIN doc whose content also appears in the held-out splits is
  * dropped from training — the eval copy stays) composed with a fixed
  * stage precedence, so downstream drop-reason breakdowns are stable.
  *
  * Stage precedence IS the semantics: gate reasons (content-intrinsic)
  * beat `exact_dup` (corpus-relative) beat `contaminated`
  * (split-relative) — a gibberish doc that is also a dup reports the
  * gate reason, and reason counts are invariant to re-splitting.
  */
object Curation {

  /** cp01: per-doc manifest row — (doc_id, split, reason, keep).
    *
    * Scale posture: the gate is evaluated INLINE off the scan
    * ([[TextAnalysis.gateDf]] — map-side, same recompute-over-rejoin
    * choice as ta08 itself); the two corpus-relative signals — the
    * min-doc_id keeper and the does-any-eval-doc-share-this-sig bit —
    * come out of ONE sig-keyed aggregate (Catalyst does not share the
    * subplan, so a separate keeper table and eval-sig relation would
    * each rescan and re-md5 the corpus; at sf10 that third scan was
    * ~1/3 of the query), and the manifest join rides the same `sig`
    * partitioning. Whole manifest = gate scan + one sig aggregate +
    * one sig join + the presentation sort — no doc_id-keyed rejoin.
    */
  def cp01(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val d = Tables.documents(s, dir)
      .withColumn("bucket", Sampling.bucket)
      .withColumn("sig",
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ").cast("binary")))
    val sigStats = d.groupBy(col("sig")).agg(
      min(col("doc_id")).as("keeper"),
      max((col("bucket") >= 90).cast("int")).as("in_eval"))
    TextAnalysis.gateDf(d)
      .join(sigStats, Seq("sig"))
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val").otherwise("test"))
      .withColumn("reason",
        when(col("drop_reason") =!= "keep", col("drop_reason"))
          .when(col("doc_id") =!= col("keeper"), "exact_dup")
          .when(col("split") === "train" && col("in_eval") === 1,
            "contaminated")
          .otherwise("keep"))
      .withColumn("keep", (col("reason") === "keep").cast("int"))
      .select("doc_id", "split", "reason", "keep")
      .orderBy("doc_id")
  }

  /** Oracle: the ta08 oracle verbatim as the gate stage (its ORDER BY
    * is harmless in a derived table), plus the sig keeper and eval-sig
    * CTEs — the same three stages, same precedence. */
  val cp01Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, ${Sampling.bucketSql} AS bucket,
       |         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS sig
       |  FROM documents),
       |g AS (SELECT doc_id, drop_reason FROM (${TextAnalysis.ta08Sql}) t),
       |k AS (SELECT sig, MIN(doc_id) AS keeper FROM d GROUP BY sig),
       |e AS (SELECT DISTINCT sig FROM d WHERE bucket >= 90)
       |SELECT d.doc_id,
       |       CASE WHEN bucket < 90 THEN 'train'
       |            WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
       |       CASE WHEN g.drop_reason <> 'keep' THEN g.drop_reason
       |            WHEN d.doc_id <> k.keeper THEN 'exact_dup'
       |            WHEN bucket < 90 AND e.sig IS NOT NULL THEN 'contaminated'
       |            ELSE 'keep' END AS reason,
       |       CAST(CASE WHEN g.drop_reason <> 'keep' THEN g.drop_reason
       |            WHEN d.doc_id <> k.keeper THEN 'exact_dup'
       |            WHEN bucket < 90 AND e.sig IS NOT NULL THEN 'contaminated'
       |            ELSE 'keep' END = 'keep' AS INT) AS keep
       |FROM d JOIN g USING (doc_id)
       |       JOIN k USING (sig)
       |       LEFT JOIN e ON d.sig = e.sig
       |ORDER BY d.doc_id""".stripMargin

  /** Registry of this family. */
  val qs: Seq[Q] = Seq(
    Q("cp01_corpus_manifest",
      "end-to-end keep/drop manifest: gate > exact_dup > contaminated",
      cp01, Some(cp01Sql)),
  )
}
