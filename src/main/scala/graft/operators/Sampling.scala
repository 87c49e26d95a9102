package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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
  private[operators] def bucket = Dedup.h60(concat(lit("split:"), col("doc_id"))) % 100L

  private[operators] val bucketSql =
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

  // ---------------------------------------------------------------- sp03
  /** Exact decontamination: test/val-split docs whose NORMALIZED content
    * (lowercased, whitespace-collapsed — the dd01 signature) also occurs
    * in the train split. The standard pre-training hygiene check; run it
    * after sp01 and before training. One row per contaminated eval doc
    * with the smallest colliding train doc and the collision count.
    *
    * Scale posture: one shuffle on the content signature (the train side
    * aggregates to distinct signatures first, so a heavily duplicated
    * train doc can't fan out the join).
    */
  def sp03(s: SparkSession, dir: String): DataFrame =
    // served from the docfeats layer since r15: the content signature
    // (the same normalized-text md5 dd01 keys on — the query's
    // dominant map-side cost) is read back as a pruned bucketed scan;
    // the split hash keys on doc_id alone, so the text column is never
    // touched. sp03Over stays as the composition/parity anchor.
    sp03FromSigs(TextFeatures.docFeats(s, dir)
      .select(col("doc_id"), col("sig")))

  /** [[sp03]] over a precomputed (doc_id, sig) relation. */
  private def sp03FromSigs(sigs: DataFrame): DataFrame = {
    val docs = sigs.withColumn("bucket", bucket)
    val train = docs.filter(col("bucket") < 90)
      .groupBy(col("sig"))
      .agg(min(col("doc_id")).as("train_doc_id"), count(lit(1)).as("n_train"))
    docs.filter(col("bucket") >= 90)
      .select(col("doc_id"), col("sig"),
        when(col("bucket") < 95, "val").otherwise("test").as("split"))
      .join(train, Seq("sig"))
      .select(col("doc_id"), col("split"), col("train_doc_id"), col("n_train"))
      .orderBy("doc_id")
  }

  /** (doc_id, bucket) for any docs-shaped relation — the split hash,
    * exposed for composition and specs. */
  def sp01Buckets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), bucket.cast("int").as("bucket"))

  /** [[sp03]] over any docs-shaped relation. */
  def sp03Over(d: DataFrame): DataFrame = {
    val docs = d
      .withColumn("bucket", bucket)
      .withColumn("sig",
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ").cast("binary")))
    val train = docs.filter(col("bucket") < 90)
      .groupBy(col("sig"))
      .agg(min(col("doc_id")).as("train_doc_id"), count(lit(1)).as("n_train"))
    docs.filter(col("bucket") >= 90)
      .select(col("doc_id"), col("sig"),
        when(col("bucket") < 95, "val").otherwise("test").as("split"))
      .join(train, Seq("sig"))
      .select(col("doc_id"), col("split"), col("train_doc_id"), col("n_train"))
      .orderBy("doc_id")
  }

  val sp03Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, $bucketSql AS bucket,
       |         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS sig
       |  FROM documents),
       |train AS (SELECT sig, MIN(doc_id) AS train_doc_id,
       |                 COUNT(*) AS n_train
       |          FROM d WHERE bucket < 90 GROUP BY sig)
       |SELECT doc_id,
       |       CASE WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
       |       train_doc_id, n_train
       |FROM d JOIN train USING (sig)
       |WHERE bucket >= 90
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- sp04
  /** Fuzzy decontamination by n-gram overlap — the standard eval-set
    * hygiene check when exact match ([[sp03]]) is too blunt (GPT-3/PaLM
    * style: an eval doc is contaminated when a large share of its
    * n-grams also occur anywhere in the train split; word 3-grams here,
    * matching the corpus' dd-family shingle size). One row per eval doc
    * with ≥1 colliding gram: gram counts, overlap ratio, and the
    * contaminated flag at ≥ 0.5 overlap.
    *
    * Scale posture: reads the materialized shingle layer
    * ([[DedupPrepare.shingles3]] — no re-shingling), aggregates the
    * train side to DISTINCT gram hashes first (a duplicated train gram
    * cannot fan out the join), then one shuffle on the gram hash and a
    * per-eval-doc aggregate. The split assignment is the same salted
    * doc_id hash as sp01 — map-side, no join against the split table.
    */
  def sp04(s: SparkSession, dir: String): DataFrame = {
    val sh = DedupPrepare.shingles3(s, dir)
      .withColumn("bucket", bucket)
      .withColumn("g", Dedup.h60(col("s")))
    val trainG = sh.filter(col("bucket") < 90).select(col("g")).distinct()
    val evalG = sh.filter(col("bucket") >= 90)
      .select(col("doc_id"),
        when(col("bucket") < 95, "val").otherwise("test").as("split"), col("g"))
    val totals = evalG.groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_grams"))
    val hits = evalG.join(trainG, Seq("g"))
      .groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_hit"))
    totals.join(hits, Seq("doc_id", "split"))
      .withColumn("overlap_ratio",
        col("n_hit").cast("double") / col("n_grams").cast("double"))
      .withColumn("contaminated",
        (col("overlap_ratio") >= 0.5).cast("int"))
      .select("doc_id", "split", "n_grams", "n_hit", "overlap_ratio", "contaminated")
      .orderBy("doc_id")
  }

  val sp04Sql: String =
    s"""WITH ${Dedup.shinglesSqlCte(3)},
       |gr AS (SELECT doc_id, $bucketSql AS bucket,
       |             ${Dedup.h60Sql("s")} AS g
       |      FROM sh),
       |train AS (SELECT DISTINCT g FROM gr WHERE bucket < 90),
       |ev AS (SELECT doc_id,
       |              CASE WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split, g
       |       FROM gr WHERE bucket >= 90),
       |totals AS (SELECT doc_id, split, COUNT(*) AS n_grams FROM ev GROUP BY 1, 2),
       |hits AS (SELECT doc_id, split, COUNT(*) AS n_hit
       |         FROM ev JOIN train USING (g) GROUP BY 1, 2)
       |SELECT doc_id, split, n_grams, n_hit,
       |       CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE) AS overlap_ratio,
       |       CAST(CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE) >= 0.5 AS INT) AS contaminated
       |FROM totals JOIN hits USING (doc_id, split)
       |ORDER BY doc_id""".stripMargin

  /** Registry of this family. */
  // ---------------------------------------------------------------- sp05
  /** Temporal split + leakage audit — the OTHER standard split for
    * sequential data (hash splits like sp01 leak the future into
    * training when rows are events): train = before the cutoff, eval =
    * at/after it, audited per event_type with the count of users whose
    * history STRADDLES the boundary (`users_both`) — exactly the users a
    * per-user model would leak through. Cutoff = 2024-01-22, ~70% of the
    * testdata's event month.
    *
    * Scale posture: one shuffle to (event_type, user_id) with map-side
    * partial sums, then a second aggregate on the tiny event_type key
    * space; never a distinct over raw events.
    */
  def sp05(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit(java.sql.Timestamp.valueOf("2024-01-22 00:00:00"))
    Tables.events(s, dir)
      .withColumn("is_train", (col("ts") < cutoff).cast("int"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("is_train")).as("n_tr"),
        (count(lit(1)) - sum(col("is_train"))).as("n_ev"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("n_tr")).cast("long").as("n_train"),
        sum(col("n_ev")).cast("long").as("n_eval"),
        count(when(col("n_tr") > 0, 1)).as("users_train"),
        count(when(col("n_ev") > 0, 1)).as("users_eval"),
        count(when(col("n_tr") > 0 && col("n_ev") > 0, 1)).as("users_both"))
      .orderBy("event_type")
  }

  val sp05Sql: String =
    """WITH pu AS (
      |  SELECT event_type, user_id,
      |         SUM(CASE WHEN ts < TIMESTAMP '2024-01-22 00:00:00' THEN 1 ELSE 0 END) AS n_tr,
      |         SUM(CASE WHEN ts >= TIMESTAMP '2024-01-22 00:00:00' THEN 1 ELSE 0 END) AS n_ev
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type,
      |       CAST(SUM(n_tr) AS BIGINT) AS n_train,
      |       CAST(SUM(n_ev) AS BIGINT) AS n_eval,
      |       COUNT(CASE WHEN n_tr > 0 THEN 1 END) AS users_train,
      |       COUNT(CASE WHEN n_ev > 0 THEN 1 END) AS users_eval,
      |       COUNT(CASE WHEN n_tr > 0 AND n_ev > 0 THEN 1 END) AS users_both
      |FROM pu GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- sp06
  /** One row of the pack fold: (doc, its pack group, its token count). */
  final case class PackRow(doc_id: Long, lang: String, shard: Long, n_tokens: Int)

  /** Sequence packing: greedily pack docs into fixed token-budget bins
    * ([[PackCap]] whitespace tokens) — the step that turns a curated
    * corpus into training sequences. Deterministic by construction:
    * docs are packed in doc_id order within (lang, shard), where
    * shard = doc_id / [[PackShard]]; a doc that would overflow the open
    * bin closes it (an oversize doc sits in a bin alone). Two properties
    * make this the production shape rather than a toy:
    *
    *  - bounded task size: a pack group never exceeds [[PackShard]]
    *    docs, so parallelism GROWS with the corpus (langs × shards)
    *    instead of serializing per lang — the greedy fold is inherently
    *    sequential only within a group;
    *  - append-stability: appended docs get higher doc_ids, so they land
    *    in the newest shard and greedy packing is prefix-stable — a
    *    re-run after append never repacks (re-shuffles training
    *    sequences of) already-shipped shards.
    *
    * Bin totals are emitted from the fold itself (the bin buffer is
    * bounded by the cap), so there is no second windowed pass over the
    * corpus: one repartition exchange + the presentation sort.
    */
  val PackCap = 256
  val PackShard = 100000L

  def sp06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        expr(s"doc_id div $PackShard").as("shard"),
        regexp_count(col("text"), lit("\\S+")).as("n_tokens"))
      .as[PackRow]
    packFold(s, toks, PackCap)
  }

  /** The greedy packing fold, parameterized on the token-count source
    * and bin cap — sp06 feeds whitespace counts, [[sp11]] feeds BPE
    * model-token counts; the fold itself (and its scale properties) is
    * identical. */
  private def packFold(s: SparkSession,
      toks: org.apache.spark.sql.Dataset[PackRow], cap: Int): DataFrame = {
    import s.implicits._
    toks
      .repartition(col("lang"), col("shard"))
      .sortWithinPartitions("lang", "shard", "doc_id")
      .mapPartitions { it =>
        // header-carry fold (the W3 pattern): bin state resets on group
        // change; rows of the open bin buffer until it closes, so bin
        // totals come out of the fold with no windowed second pass
        val buf = scala.collection.mutable.ArrayBuffer.empty[PackRow]
        var lang: String = null
        var shard = -1L
        var seq = 0
        var fill = 0
        def flush(): Iterator[(Long, String, Long, Int, Int, Long, Int)] = {
          val (lg, sh, sq, tot, n) = (lang, shard, seq, fill.toLong, buf.size)
          val rows = buf.toVector.map(r =>
            (r.doc_id, lg, sh, r.n_tokens, sq, tot, n))
          buf.clear(); rows.iterator
        }
        def open(r: PackRow, newGroup: Boolean): Unit = {
          if (newGroup) { lang = r.lang; shard = r.shard; seq = 0 }
          else seq += 1
          fill = r.n_tokens; buf += r
        }
        val main = it.flatMap { r =>
          if (lang == null) { open(r, newGroup = true); Iterator.empty }
          else if (r.lang != lang || r.shard != shard) {
            val closed = flush(); open(r, newGroup = true); closed
          } else if (fill + r.n_tokens <= cap) {
            fill += r.n_tokens; buf += r; Iterator.empty
          } else { val closed = flush(); open(r, newGroup = false); closed }
        }
        main ++ (if (buf.nonEmpty) flush() else Iterator.empty)
      }
      .toDF("doc_id", "lang", "shard", "n_tokens", "seq_id", "seq_tokens",
        "n_in_seq")
      .orderBy("doc_id")
  }

  /** The same greedy fold as a recursive CTE (the dd08 oracle pattern):
    * step rn → rn+1 within each (lang, shard) carries (seq_id, fill). */
  val sp06Sql: String =
    s"""WITH RECURSIVE t AS (
      |  SELECT doc_id, lang, doc_id // $PackShard AS shard,
      |         CAST(len(regexp_extract_all(text, '\\S+')) AS INT) AS n_tokens,
      |         ROW_NUMBER() OVER (PARTITION BY lang, doc_id // $PackShard
      |                            ORDER BY doc_id) AS rn
      |  FROM documents),
      |pack AS (
      |  SELECT doc_id, lang, shard, n_tokens, rn, 0 AS seq_id,
      |         n_tokens AS fill
      |  FROM t WHERE rn = 1
      |  UNION ALL
      |  SELECT t.doc_id, t.lang, t.shard, t.n_tokens, t.rn,
      |         CASE WHEN p.fill + t.n_tokens <= $PackCap THEN p.seq_id
      |              ELSE p.seq_id + 1 END AS seq_id,
      |         CASE WHEN p.fill + t.n_tokens <= $PackCap
      |              THEN p.fill + t.n_tokens
      |              ELSE t.n_tokens END AS fill
      |  FROM pack p
      |  JOIN t ON t.lang = p.lang AND t.shard = p.shard
      |        AND t.rn = p.rn + 1)
      |SELECT doc_id, lang, shard, n_tokens, seq_id,
      |       CAST(SUM(n_tokens) OVER (PARTITION BY lang, shard, seq_id)
      |            AS BIGINT) AS seq_tokens,
      |       CAST(COUNT(*) OVER (PARTITION BY lang, shard, seq_id)
      |            AS INT) AS n_in_seq
      |FROM pack ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- sp11
  /** Packing cap of the BPE-measured variant, in MODEL tokens: sp06's
    * 256-whitespace-token bins at the corpus fertility (~3.8 BPE tokens
    * per word, see ta17) correspond to ~1024 model tokens — the unit a
    * training run actually budgets (seq_len is defined over model
    * tokens, not words). */
  val BpePackCap = 1024

  /** sp11: sp06's greedy sequence packing with the budget measured in
    * BPE MODEL TOKENS (ta17's lexicon) instead of whitespace words —
    * the tokenizer-parameterized packing a real pretraining pipeline
    * runs: bins are context windows, so their fill must be counted in
    * the same unit the model consumes. Same fold, same determinism and
    * append-stability; since r15 the count source is the docfeats
    * histogram probe ([[graft.operators.TextAnalysis.bpeDocCountsLayered]]
    * — no text scan, bit-identical counts, DocFeatsSpec pins ≡), so the
    * extra cost over sp06 is one vocab-sized broadcast + the per-doc sum. */
  def sp11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = graft.operators.TextAnalysis.bpeDocCountsServe(s, dir)
      .select(col("doc_id"), col("lang"),
        expr(s"doc_id div $PackShard").as("shard"),
        col("n_bpe").cast("int").as("n_tokens"))
      .as[PackRow]
    packFold(s, toks, BpePackCap)
  }

  /** Oracle: sp06's recursive fold verbatim, with `t` fed from the BPE
    * per-doc counts (the shared ta17 training prefix) and the cap in
    * model tokens. */
  val sp11Sql: String =
    s"""WITH RECURSIVE ${graft.operators.TextAnalysis.bpePrefixSql},
      |${graft.operators.TextAnalysis.bpeCntSql},
      |t AS (
      |  SELECT doc_id, lang, doc_id // $PackShard AS shard,
      |         CAST(n_bpe AS INT) AS n_tokens,
      |         ROW_NUMBER() OVER (PARTITION BY lang, doc_id // $PackShard
      |                            ORDER BY doc_id) AS rn
      |  FROM bpecnt),
      |pack AS (
      |  SELECT doc_id, lang, shard, n_tokens, rn, 0 AS seq_id,
      |         n_tokens AS fill
      |  FROM t WHERE rn = 1
      |  UNION ALL
      |  SELECT t.doc_id, t.lang, t.shard, t.n_tokens, t.rn,
      |         CASE WHEN p.fill + t.n_tokens <= $BpePackCap THEN p.seq_id
      |              ELSE p.seq_id + 1 END AS seq_id,
      |         CASE WHEN p.fill + t.n_tokens <= $BpePackCap
      |              THEN p.fill + t.n_tokens
      |              ELSE t.n_tokens END AS fill
      |  FROM pack p
      |  JOIN t ON t.lang = p.lang AND t.shard = p.shard
      |        AND t.rn = p.rn + 1)
      |SELECT doc_id, lang, shard, n_tokens, seq_id,
      |       CAST(SUM(n_tokens) OVER (PARTITION BY lang, shard, seq_id)
      |            AS BIGINT) AS seq_tokens,
      |       CAST(COUNT(*) OVER (PARTITION BY lang, shard, seq_id)
      |            AS INT) AS n_in_seq
      |FROM pack ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- sp07
  /** Mixture resampling: downsample each language to hit a TARGET
    * mixture (en:de:fr:es = 40:30:20:10 here — the domain-weighting
    * step every pretraining recipe runs before packing). Down-sampling
    * only: the binding language keeps everything (rate 1) and every
    * other language's keep-rate is derated so the KEPT corpus matches
    * the target ratios as closely as integer hashing allows. The keep
    * decision is the salted-h60 family (no RNG): reproducible across
    * engines and cluster sizes. Emits the per-language audit row a
    * pipeline logs: observed count, weight, exact keep-rate, kept
    * count, achieved share.
    *
    * Scale posture: one count aggregate on the tiny lang key space; the
    * rate table broadcasts back against the scan for the map-side keep
    * decision; the windows (binding-ratio min, kept total) run over the
    * lang-cardinality-bounded audit relation, never the corpus.
    */
  /** The target-domain weight of a language (en:de:fr:es = 40:30:20:10)
    * — shared by sp07 and the cp02 pipeline composition. */
  private[operators] def mixWeight: org.apache.spark.sql.Column =
    when(col("lang") === "en", 40L).when(col("lang") === "de", 30L)
      .when(col("lang") === "fr", 20L).when(col("lang") === "es", 10L)
      .otherwise(0L)

  /** Per-language keep-rate table (lang, rate, thr) for any docs-shaped
    * relation, per the sp07 derating rule: the binding language keeps
    * everything, every other language derates to the target mixture.
    * The windows run over the lang-cardinality-bounded count relation,
    * never the corpus. */
  private[operators] def mixRates(docs: DataFrame): DataFrame = {
    // binding-ratio min as a 1-row aggregate broadcast back (the
    // q01/q15 grand-total pattern): an empty-partition window here
    // sprayed "WindowExec: No Partition Defined" warnings through every
    // run composing this rate table, drowning any FUTURE real
    // single-partition regression in noise (r7 verdict #2)
    // lang-cardinality-bounded (one row per distinct lang); persisted
    // because the totals crossJoin reads it on BOTH branches and
    // Catalyst shares no subplans — without it the corpus groupBy
    // re-expands per branch (the connectedComponents pairs precedent)
    val counts = Present.pooled(
      docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .withColumn("weight", mixWeight))
    val scale = counts.agg(
      min(when(col("weight") > 0,
        col("n_docs").cast("double") / col("weight").cast("double"))).as("scale"))
    counts.crossJoin(broadcast(scale))
      .withColumn("rate",
        when(col("weight") > 0,
          least(lit(1.0),
            (col("weight").cast("double") * col("scale")) /
              col("n_docs").cast("double"))).otherwise(lit(0.0)))
      .withColumn("thr", round(col("rate") * 1e6).cast("long"))
  }

  def sp07(s: SparkSession, dir: String): DataFrame = {
    val rated = mixRates(Tables.documents(s, dir))
      .select("lang", "n_docs", "weight", "rate", "thr")
    val kept = Tables.documents(s, dir)
      .join(broadcast(rated), Seq("lang"))
      .filter(Dedup.h60(concat(lit("mix:"), col("doc_id"))) % 1000000L < col("thr"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
    // audit is lang-bounded but its kept branch scans the corpus — the
    // persist keeps the totals crossJoin from scanning it twice
    val audit = Present.pooled(
      rated.join(kept, Seq("lang"), "left")
        .withColumn("n_kept", coalesce(col("n_kept"), lit(0L))))
    val tot = audit.agg(sum(col("n_kept")).as("tot_kept"))
    audit.crossJoin(broadcast(tot))
      .withColumn("achieved_share",
        col("n_kept").cast("double") / col("tot_kept").cast("double"))
      .select("lang", "n_docs", "weight", "rate", "n_kept", "achieved_share")
      .orderBy("lang")
  }

  private[operators] val mixWSql =
    """CASE lang WHEN 'en' THEN 40 WHEN 'de' THEN 30
      |          WHEN 'fr' THEN 20 WHEN 'es' THEN 10 ELSE 0 END""".stripMargin

  val sp07Sql: String =
    s"""WITH c AS (SELECT lang, COUNT(*) AS n_docs,
       |                  CAST($mixWSql AS BIGINT) AS weight
       |           FROM documents GROUP BY lang),
       |r AS (SELECT lang, n_docs, weight,
       |             CASE WHEN weight > 0
       |                  THEN least(CAST(1.0 AS DOUBLE),
       |                       (CAST(weight AS DOUBLE) *
       |                        MIN(CASE WHEN weight > 0 THEN CAST(n_docs AS DOUBLE)
       |                                 / CAST(weight AS DOUBLE) END) OVER ())
       |                       / CAST(n_docs AS DOUBLE))
       |                  ELSE CAST(0.0 AS DOUBLE) END AS rate
       |      FROM c),
       |k AS (SELECT d.lang, COUNT(*) AS n_kept
       |      FROM documents d JOIN r ON d.lang = r.lang
       |      WHERE ${Dedup.h60Sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000000
       |            < CAST(ROUND(rate * 1e6) AS BIGINT)
       |      GROUP BY d.lang)
       |SELECT r.lang, n_docs, weight, rate,
       |       COALESCE(n_kept, 0) AS n_kept,
       |       CAST(COALESCE(n_kept, 0) AS DOUBLE)
       |         / CAST(SUM(COALESCE(n_kept, 0)) OVER () AS DOUBLE) AS achieved_share
       |FROM r LEFT JOIN k ON r.lang = k.lang
       |ORDER BY r.lang""".stripMargin

  // ---------------------------------------------------------------- sp08
  /** Deterministic epoch-varied global shuffle order — the "shuffle the
    * corpus before training" step, as a reproducible PERMUTATION rather
    * than an RNG sort: each (epoch, doc) gets a position in
    * [1, N], the order is the salted content hash (salt includes the
    * epoch, so every epoch is a fresh permutation), and the whole
    * assignment is a pure function of (epoch, doc_id) — re-runs, other
    * engines, and different cluster sizes produce the identical order.
    *
    * Scale posture — global ROW_NUMBER is a single-partition window, so
    * the position is assembled the distributed way: hash-shard the
    * permutation space ([[ShufShards]] shards = the hash mod the shard
    * count), count per (epoch, shard) (one tiny-keyspace aggregate),
    * prefix-sum those counts into shard offsets on the 2×[[ShufShards]]-row
    * audit relation, broadcast the offsets back, and rank WITHIN each
    * shard (a bounded-partition window). Global position = shard offset
    * + within-shard rank; ordering by (shard, h, doc_id) is exactly the
    * oracle's one global sort. Shard count is the task-size knob: tasks
    * are ~N/shards docs; raise it with the corpus.
    */
  val ShufShards = 256L
  val ShufEpochs = 2

  def sp08(s: SparkSession, dir: String): DataFrame = {
    val h = Dedup.h60(concat(lit("shuf:"), col("epoch"), lit(":"), col("doc_id")))
    val keyed = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(array((0 until ShufEpochs).map(lit): _*)).as("epoch"))
      .withColumn("h", h)
      .withColumn("shard", (col("h") % ShufShards).cast("int"))
    val wOff = Window.partitionBy(col("epoch")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("epoch"), col("shard"))
      .agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(wOff), lit(0L)))
      .select("epoch", "shard", "off")
    val wIn = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("h"), col("doc_id"))
    keyed.join(broadcast(offsets), Seq("epoch", "shard"))
      .withColumn("pos",
        (col("off") + org.apache.spark.sql.functions.row_number().over(wIn))
          .cast("long"))
      .select("doc_id", "epoch", "shard", "pos")
      .orderBy("epoch", "pos")
  }

  private val shufHSql =
    Dedup.h60Sql("'shuf:' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")

  val sp08Sql: String =
    s"""WITH e AS (SELECT doc_id, epoch
       |           FROM documents CROSS JOIN (VALUES (0), (1)) AS ep(epoch)),
       |h AS (SELECT doc_id, epoch, $shufHSql AS h FROM e)
       |SELECT doc_id, epoch,
       |       CAST(h % $ShufShards AS INT) AS shard,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY epoch
       |                               ORDER BY h % $ShufShards, h, doc_id)
       |            AS BIGINT) AS pos
       |FROM h ORDER BY epoch, pos""".stripMargin

  // ---------------------------------------------------------------- sp09
  /** Per-source contribution cap — the anti-domination rule every crawl
    * pipeline runs: no single source may exceed [[CapFrac]] of the
    * corpus, so a source over the cap is derated to exactly the cap
    * while everyone else keeps rate 1. Same deterministic salted-h60
    * keep decision as sp07 (different salt, so the rules compose
    * independently); emits the per-source audit row. cap_docs =
    * floor(total × CapFrac) is computed in IEEE doubles on both
    * engines, so the boundary is bit-identical.
    *
    * Scale posture: one count aggregate on the source key space; the
    * windows (corpus total) run over the source-cardinality-bounded
    * audit relation; the rate table broadcasts back against the scan
    * for the map-side keep decision.
    */
  val CapFrac = 0.10

  def sp09(s: SparkSession, dir: String): DataFrame = {
    // both grand totals via the q01/q15 broadcast-totals join — see
    // the mixRates note on the r7 verdict's warning-noise finding
    // source-cardinality-bounded; persisted for the same two-branch
    // reuse reason as mixRates' counts
    val counts = Present.pooled(
      Tables.documents(s, dir)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs")))
    val totDocs = counts.agg(sum(col("n_docs")).as("tot_docs"))
    val rated = counts.crossJoin(broadcast(totDocs))
      .withColumn("cap_docs",
        floor(col("tot_docs").cast("double") * CapFrac).cast("long"))
      .withColumn("rate",
        least(lit(1.0),
          col("cap_docs").cast("double") / col("n_docs").cast("double")))
      .withColumn("thr", round(col("rate") * 1e6).cast("long"))
    val kept = Tables.documents(s, dir)
      .join(broadcast(rated.select(col("source"), col("thr"))), Seq("source"))
      .filter(Dedup.h60(concat(lit("cap:"), col("doc_id"))) % 1000000L < col("thr"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    val audit = Present.pooled(
      rated.join(kept, Seq("source"), "left")
        .withColumn("n_kept", coalesce(col("n_kept"), lit(0L))))
    val totKept = audit.agg(sum(col("n_kept")).as("tot_kept"))
    audit.crossJoin(broadcast(totKept))
      .withColumn("kept_share",
        col("n_kept").cast("double") / col("tot_kept").cast("double"))
      .select("source", "n_docs", "cap_docs", "rate", "n_kept", "kept_share")
      .orderBy("source")
  }

  val sp09Sql: String =
    s"""WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
       |r AS (SELECT source, n_docs,
       |             CAST(FLOOR(CAST(SUM(n_docs) OVER () AS DOUBLE) * 0.10)
       |                  AS BIGINT) AS cap_docs
       |      FROM c),
       |r2 AS (SELECT source, n_docs, cap_docs,
       |              least(CAST(1.0 AS DOUBLE),
       |                    CAST(cap_docs AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS rate
       |       FROM r),
       |k AS (SELECT d.source, COUNT(*) AS n_kept
       |      FROM documents d JOIN r2 ON d.source = r2.source
       |      WHERE ${Dedup.h60Sql("'cap:' || CAST(doc_id AS VARCHAR)")} % 1000000
       |            < CAST(ROUND(rate * 1e6) AS BIGINT)
       |      GROUP BY d.source)
       |SELECT r2.source, n_docs, cap_docs, rate,
       |       COALESCE(n_kept, 0) AS n_kept,
       |       CAST(COALESCE(n_kept, 0) AS DOUBLE)
       |         / CAST(SUM(COALESCE(n_kept, 0)) OVER () AS DOUBLE) AS kept_share
       |FROM r2 LEFT JOIN k ON r2.source = k.source
       |ORDER BY r2.source""".stripMargin

  // ---------------------------------------------------------------- sp10
  /** Temperature-scaled source balancing — the multinomial
    * q_s ∝ (n_s/N)^τ mixture rule (the data-balancing step of the
    * LLaMA/XLM-R pretraining recipes): temperature τ < 1 flattens the
    * source distribution so head crawls stop dominating and tail
    * sources are relatively upweighted, without a hand-written target
    * table (sp07 covers the fixed-target form). Down-sampling only,
    * like sp07: the binding source keeps everything (rate 1) and every
    * other source derates so the KEPT corpus hits the temperature
    * shares as closely as integer hashing allows; the rate folds to
    * `least(1, w_s · min_t(n_t/w_t) / n_s)` (the normalizer cancels —
    * sp07's binding-ratio form). The keep decision is the salted-h60
    * family (salt "temp:"), composing independently with
    * sp01/sp02/sp07/sp09.
    *
    * Engine parity: pow is the one transcendental — its result is
    * floor(x·1e6+0.5)-gridded into integer micro-weights immediately
    * (the ta12/ta13 transcendental treatment: per-value libm ulp skew
    * would have to straddle a 1e-6 grid boundary to flip anything);
    * every downstream value (shares, rates, thresholds) is a
    * fixed-shape IEEE expression over those integers, identical in
    * both engines.
    *
    * Scale posture: two tiny-keyspace aggregates (source counts, kept
    * counts); grand totals via the q01/q15 broadcast-totals crossJoin,
    * never a corpus window; the (source, thr) rate table broadcasts
    * back against the scan for the map-side keep decision.
    */
  val MixTemperature = 0.7

  def sp10(s: SparkSession, dir: String): DataFrame = {
    // source-cardinality-bounded; pooled for the same two-branch reuse
    // reason as mixRates' counts (totals crossJoin reads both branches)
    val counts = Present.pooled(
      Tables.documents(s, dir)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs")))
    val totDocs = counts.agg(sum(col("n_docs")).as("tot_docs"))
    val weighted = Present.pooled(
      counts.crossJoin(broadcast(totDocs))
        .withColumn("p_obs",
          col("n_docs").cast("double") / col("tot_docs").cast("double"))
        .withColumn("w_micro",
          floor(pow(col("p_obs"), MixTemperature) * 1e6 + 0.5).cast("long")))
    // ONE aggregate for both grand scalars (r15 opt: two separate 1-row
    // aggs cost two passes over the pooled counts and two sequential
    // broadcast stages; sum and min fold in the same pass — values, and
    // therefore every downstream rate/threshold, are bit-identical)
    val tots = weighted.agg(sum(col("w_micro")).as("tot_w"),
      min(col("n_docs").cast("double") / col("w_micro").cast("double")).as("scale"))
    val rated = weighted.crossJoin(broadcast(tots))
      .withColumn("target_share",
        col("w_micro").cast("double") / col("tot_w").cast("double"))
      .withColumn("rate",
        least(lit(1.0),
          col("w_micro").cast("double") * col("scale") /
            col("n_docs").cast("double")))
      .withColumn("thr", floor(col("rate") * 1e6 + 0.5).cast("long"))
    val kept = Tables.documents(s, dir)
      .join(broadcast(rated.select(col("source"), col("thr"))), Seq("source"))
      .filter(Dedup.h60(concat(lit("temp:"), col("doc_id"))) % 1000000L < col("thr"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    val audit = Present.pooled(
      rated.join(kept, Seq("source"), "left")
        .withColumn("n_kept", coalesce(col("n_kept"), lit(0L))))
    val totKept = audit.agg(sum(col("n_kept")).as("tot_kept"))
    audit.crossJoin(broadcast(totKept))
      .withColumn("achieved_share",
        col("n_kept").cast("double") / col("tot_kept").cast("double"))
      .select("source", "n_docs", "p_obs", "w_micro", "target_share", "rate",
        "n_kept", "achieved_share")
      .orderBy("source")
  }

  val sp10Sql: String =
    s"""WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
       |w AS (SELECT source, n_docs,
       |             CAST(n_docs AS DOUBLE)
       |               / CAST(SUM(n_docs) OVER () AS DOUBLE) AS p_obs
       |      FROM c),
       |w2 AS (SELECT source, n_docs, p_obs,
       |              CAST(FLOOR(pow(p_obs, $MixTemperature) * 1e6 + 0.5) AS BIGINT) AS w_micro
       |       FROM w),
       |r AS (SELECT source, n_docs, p_obs, w_micro,
       |             CAST(w_micro AS DOUBLE)
       |               / CAST(SUM(w_micro) OVER () AS DOUBLE) AS target_share,
       |             least(CAST(1.0 AS DOUBLE),
       |                   CAST(w_micro AS DOUBLE) *
       |                   MIN(CAST(n_docs AS DOUBLE) / CAST(w_micro AS DOUBLE)) OVER ()
       |                   / CAST(n_docs AS DOUBLE)) AS rate
       |      FROM w2),
       |k AS (SELECT d.source, COUNT(*) AS n_kept
       |      FROM documents d JOIN r ON d.source = r.source
       |      WHERE ${Dedup.h60Sql("'temp:' || CAST(doc_id AS VARCHAR)")} % 1000000
       |            < CAST(FLOOR(rate * 1e6 + 0.5) AS BIGINT)
       |      GROUP BY d.source)
       |SELECT r.source, n_docs, p_obs, w_micro, target_share, rate,
       |       COALESCE(n_kept, 0) AS n_kept,
       |       CAST(COALESCE(n_kept, 0) AS DOUBLE)
       |         / CAST(SUM(COALESCE(n_kept, 0)) OVER () AS DOUBLE) AS achieved_share
       |FROM r LEFT JOIN k ON r.source = k.source
       |ORDER BY r.source""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("sp01_split_assign", "deterministic hash 90/5/5 train/val/test split", sp01, Some(sp01Sql)),
    Q("sp02_stratified_sample", "stratified 20% hash sample + audit counts", sp02, Some(sp02Sql)),
    Q("sp03_contamination_exact", "test/val docs whose content occurs in train", sp03, Some(sp03Sql)),
    Q("sp04_contamination_ngram", "eval docs by train n-gram overlap ratio", sp04, Some(sp04Sql)),
    Q("sp05_temporal_split_audit", "time-cutoff split + straddling-user leakage audit", sp05, Some(sp05Sql)),
    Q("sp06_sequence_pack", "greedy token-budget packing into training sequences", sp06, Some(sp06Sql)),
    Q("sp07_mixture_resample", "downsample languages to a target mixture + audit", sp07, Some(sp07Sql)),
    Q("sp08_shuffle_order", "deterministic epoch-varied global shuffle permutation", sp08, Some(sp08Sql)),
    Q("sp09_source_cap", "per-source contribution cap (anti-domination derate)", sp09, Some(sp09Sql)),
    Q("sp10_temperature_mixture", "temperature-scaled source balancing (p^tau derate + audit)", sp10, Some(sp10Sql)),
    Q("sp11_bpe_pack", "sp06 sequence packing with the budget in BPE model tokens", sp11, Some(sp11Sql)),
  )
}
