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

  /** The manifest as a BUILT ARTIFACT: a production curation run
    * publishes its manifest once per corpus and every consumer probes
    * it, so the gate pass, the sig aggregate and the manifest join are
    * paid at layer-write time ([[DedupPrepare.ensure]], doc_id-bucketed)
    * — cp01 becomes a near-free read and cp02's two derivations of the
    * kept set (mixture rates + the mixture filter — Catalyst shares no
    * subplans) each read the table instead of re-running the gate.
    * Also carries the whitespace token count the packer needs. The gate
    * thresholds and split fractions are fixed operator constants; if
    * they ever become parameters they must join the variant tag. */
  private def manifestBody(s: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val d = docs
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
      .withColumn("n_tokens", regexp_count(col("text"), lit("\\S+")))
      .select("doc_id", "lang", "split", "reason", "keep", "n_tokens")
  }

  private def manifest(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "manifest", dir,
      () => manifestBody(s, Tables.documents(s, dir)),
      Seq("doc_id"), Seq("doc_id"))

  /** The PREVIOUS corpus version's published manifest: cp01's exact
    * stages over the standing corpus alone (the cp04 split — the
    * doc_id % [[BatchMod]] == [[BatchRes]] batch is "today's crawl",
    * everything else was already in the corpus when v1 shipped). Its
    * own built artifact: in production yesterday's manifest isn't
    * recomputed, it's read. */
  private def manifestV1(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "cp05m1", dir,
      () => manifestBody(s, Tables.documents(s, dir)
        .filter((col("doc_id") % BatchMod) =!= BatchRes)),
      Seq("doc_id"), Seq("doc_id"),
      // the batch split is baked into this layer's rows: the constants
      // must join the fingerprint or a changed split silently reuses a
      // stale v1 manifest across JVMs
      variant = s"_m${BatchMod}r$BatchRes")

  /** cp01: per-doc manifest row — (doc_id, split, reason, keep). A read
    * of the materialized manifest layer plus the presentation sort; the
    * write-time plan is gate scan + ONE sig-keyed aggregate + one sig
    * join (a separate keeper table and eval-sig relation each re-scanned
    * and re-md5'd the corpus — at sf10 that third scan was ~1/3 of the
    * query). */
  def cp01(s: SparkSession, dir: String): DataFrame =
    manifest(s, dir)
      .select("doc_id", "split", "reason", "keep")
      .orderBy("doc_id")

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

  // ---------------------------------------------------------------- cp02
  /** One row of the cp02 pack fold: a train-split keeper with its
    * epoch-0 shuffle key. */
  final case class BatchRow(doc_id: Long, lang: String, shard: Int,
      h: Long, n_tokens: Int)

  /** cp02: the TRAINING BATCHES — the artifact the whole engine exists
    * to produce. Composes the pipeline end-to-end: the cp01 manifest's
    * train-split keepers (gate pass, exact-dup canonical, not
    * contaminated) → sp07 mixture derating (rates computed on the KEPT
    * train corpus — derate after cleaning, or the dropped docs skew the
    * mixture) → the epoch-0 sp08 shuffle key → sp06-style greedy
    * packing into [[Sampling.PackCap]]-token sequences, packed in
    * SHUFFLE order within each shuffle shard (the real pipeline packs
    * the shuffled stream, not doc_id order). Every stage is the same
    * deterministic hash family as its standalone operator, so the
    * composition is reproducible bit-for-bit and each stage's
    * standalone oracle doubles as a component test of this one.
    *
    * Scale posture: gate inline off the scan; ONE sig-keyed aggregate +
    * join (cp01's shape); mixture rates broadcast back (lang-bounded
    * relation); the pack fold repartitions once on the shuffle shard
    * and folds sorted runs — shard count is the task-size knob exactly
    * as in sp08. No corpus-sized window, no driver-side loop.
    *
    * Deliberately NOT append-stable, unlike sp06: mixture rates and
    * the shuffle permutation are functions of the whole corpus, so an
    * appended batch re-derives the batches — which is correct for this
    * artifact (a new corpus version IS a new training order; packing
    * yesterday's shuffle against today's corpus would be a bug). The
    * append-stable packing for incremental shipping is sp06.
    */
  def cp02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val kept = manifest(s, dir)
      .filter(col("reason") === "keep" && col("split") === "train")
      .select(col("doc_id"), col("lang"), col("n_tokens"))
    val rates = Sampling.mixRates(kept).select("lang", "thr")
    val h = Dedup.h60(concat(lit("shuf:0:"), col("doc_id")))
    val mixed = kept
      .join(broadcast(rates), Seq("lang"))
      .filter(Dedup.h60(concat(lit("mix:"), col("doc_id"))) % 1000000L < col("thr"))
      .withColumn("h", h)
      .withColumn("shard", (col("h") % Sampling.ShufShards).cast("int"))
      .select(col("doc_id"), col("lang"), col("shard"), col("h"), col("n_tokens"))
      .as[BatchRow]
    mixed
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "h", "doc_id")
      .mapPartitions { it =>
        // the sp06 header-carry fold, grouped by shuffle shard and
        // ordered by the shuffle key: bin totals come out of the fold
        val buf = scala.collection.mutable.ArrayBuffer.empty[BatchRow]
        var shard = -1
        var any = false
        var seq = 0
        var fill = 0
        def flush(): Iterator[(Long, String, Int, Int, Int, Long, Int)] = {
          val (sh, sq, tot, n) = (shard, seq, fill.toLong, buf.size)
          val rows = buf.toVector.map(r =>
            (r.doc_id, r.lang, sh, r.n_tokens, sq, tot, n))
          buf.clear(); rows.iterator
        }
        def open(r: BatchRow, newGroup: Boolean): Unit = {
          if (newGroup) { shard = r.shard; seq = 0 } else seq += 1
          fill = r.n_tokens; buf += r
        }
        val main = it.flatMap { r =>
          if (!any) { any = true; open(r, newGroup = true); Iterator.empty }
          else if (r.shard != shard) {
            val closed = flush(); open(r, newGroup = true); closed
          } else if (fill + r.n_tokens <= Sampling.PackCap) {
            fill += r.n_tokens; buf += r; Iterator.empty
          } else { val closed = flush(); open(r, newGroup = false); closed }
        }
        main ++ (if (buf.nonEmpty) flush() else Iterator.empty)
      }
      .toDF("doc_id", "lang", "shard", "n_tokens", "seq_id", "seq_tokens",
        "n_in_seq")
      .orderBy("doc_id")
  }

  /** Oracle: the cp01 stages as CTEs filtered to the train keepers, the
    * sp07 rate rule on that kept relation, the sp08 epoch-0 hash, and
    * the sp06 recursive-CTE greedy fold per shuffle shard. */
  val cp02Sql: String =
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id, lang, text, ${Sampling.bucketSql} AS bucket,
       |         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS sig
       |  FROM documents),
       |g AS (SELECT doc_id, drop_reason FROM (${TextAnalysis.ta08Sql}) t0),
       |k AS (SELECT sig, MIN(doc_id) AS keeper FROM d GROUP BY sig),
       |e AS (SELECT DISTINCT sig FROM d WHERE bucket >= 90),
       |keep AS (
       |  SELECT d.doc_id, d.lang,
       |         CAST(len(regexp_extract_all(text, '\\S+')) AS INT) AS n_tokens
       |  FROM d JOIN g USING (doc_id) JOIN k USING (sig)
       |         LEFT JOIN e ON d.sig = e.sig
       |  WHERE g.drop_reason = 'keep' AND d.doc_id = k.keeper
       |        AND d.bucket < 90 AND e.sig IS NULL),
       |c AS (SELECT lang, COUNT(*) AS n_docs,
       |             CAST(${Sampling.mixWSql} AS BIGINT) AS weight
       |      FROM keep GROUP BY lang),
       |r AS (SELECT lang,
       |             CASE WHEN weight > 0
       |                  THEN least(CAST(1.0 AS DOUBLE),
       |                       (CAST(weight AS DOUBLE) *
       |                        MIN(CASE WHEN weight > 0 THEN CAST(n_docs AS DOUBLE)
       |                                 / CAST(weight AS DOUBLE) END) OVER ())
       |                       / CAST(n_docs AS DOUBLE))
       |                  ELSE CAST(0.0 AS DOUBLE) END AS rate
       |      FROM c),
       |mixed AS (
       |  SELECT keep.* FROM keep JOIN r USING (lang)
       |  WHERE ${Dedup.h60Sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000000
       |        < CAST(ROUND(rate * 1e6) AS BIGINT)),
       |t AS (
       |  SELECT doc_id, lang, n_tokens,
       |         CAST(h % ${Sampling.ShufShards} AS INT) AS shard,
       |         ROW_NUMBER() OVER (PARTITION BY h % ${Sampling.ShufShards}
       |                            ORDER BY h, doc_id) AS rn
       |  FROM (SELECT *, ${Dedup.h60Sql("'shuf:0:' || CAST(doc_id AS VARCHAR)")} AS h
       |        FROM mixed)),
       |pack AS (
       |  SELECT doc_id, lang, shard, n_tokens, rn, 0 AS seq_id,
       |         n_tokens AS fill
       |  FROM t WHERE rn = 1
       |  UNION ALL
       |  SELECT t.doc_id, t.lang, t.shard, t.n_tokens, t.rn,
       |         CASE WHEN p.fill + t.n_tokens <= ${Sampling.PackCap} THEN p.seq_id
       |              ELSE p.seq_id + 1 END AS seq_id,
       |         CASE WHEN p.fill + t.n_tokens <= ${Sampling.PackCap}
       |              THEN p.fill + t.n_tokens
       |              ELSE t.n_tokens END AS fill
       |  FROM pack p
       |  JOIN t ON t.shard = p.shard AND t.rn = p.rn + 1)
       |SELECT doc_id, lang, shard, n_tokens, seq_id,
       |       CAST(SUM(n_tokens) OVER (PARTITION BY shard, seq_id)
       |            AS BIGINT) AS seq_tokens,
       |       CAST(COUNT(*) OVER (PARTITION BY shard, seq_id)
       |            AS INT) AS n_in_seq
       |FROM pack ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- cp03
  /** The SpanK-token-span duplication fraction at or above which a doc is
    * dropped as `span_dup`: a mostly-duplicated document contributes
    * almost no novel tokens even when no single whole-doc twin exists
    * (the doc-level signal of Lee et al.'s span-level pass). The sf
    * corpus is bimodal around this cut — span-carrying docs measure
    * dup_frac ≥ 0.92, everything else 0. */
  val SpanDupMax = 0.5

  /** Manifest v2 — cp01's stages composed with the FULL dedup stack
    * (r7 verdict #4: the near-dup machinery and span stats never fed the
    * capstone). Stage precedence, first match wins:
    *   gate reasons (content-intrinsic)
    *   > `exact_dup`  (not the sig-group's min-doc_id keeper)
    *   > `near_dup`   (in a dd08 LSH cluster, not its dd09 quality
    *                   keeper — doc-level dedup runs exact THEN near)
    *   > `span_dup`   (dd11-style dup_frac ≥ [[SpanDupMax]], computed
    *                   over the POST-doc-level-dedup survivors only —
    *                   the span-level pass runs after doc-level dedup,
    *                   so dropped twins' spans don't count)
    *   > `contaminated` (train doc whose content appears in eval splits)
    *   > keep.
    * A cluster whose quality keeper is itself gate-dropped ships NO
    * member — deliberate and conservative: every other member is a
    * near-dup of rejected content. Same built-artifact form as cp01
    * (the cluster closure, keeper argmax and span stats are paid once
    * at layer-write time); carries span_dup_frac as the signal column
    * (named apart from the gate's own within-doc bigram dup_frac).
    */
  private def manifestV2(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "manifest2", dir, () => {
      graft.functions.GraftFunctions.register(s)
      val d = Tables.documents(s, dir)
        .withColumn("bucket", Sampling.bucket)
        .withColumn("sig",
          md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ").cast("binary")))
      val sigStats = d.groupBy(col("sig")).agg(
        min(col("doc_id")).as("keeper"),
        max((col("bucket") >= 90).cast("int")).as("in_eval"))
      // the materialized cluster layer (r8): the CC fixpoint is paid
      // once per corpus by whichever of dd08/dd09/cp03 runs first
      val clusters = Dedup.shingleClusters(s, dir)
        .select(col("doc_id"), col("cluster_id"))
      val quality = TextAnalysis.ta02(s, dir).select(col("doc_id"), col("score"))
      val scored = clusters.join(quality, Seq("doc_id"))
      val best = scored.groupBy(col("cluster_id"))
        .agg(max(col("score")).as("ks"))
      val keepers = scored.join(best, Seq("cluster_id"))
        .filter(col("score") === col("ks"))
        .groupBy(col("cluster_id")).agg(min(col("doc_id")).as("keeper_id"))
      val base = TextAnalysis.gateDf(d)
        .join(sigStats, Seq("sig"))
        .join(clusters, Seq("doc_id"), "left")
        .join(keepers, Seq("cluster_id"), "left")
      // the span pass runs on the POST-doc-level-dedup corpus (Lee et
      // al.'s ordering): only survivors' spans count, so a near-dup
      // KEEPER isn't span-dropped merely because its own dropped twins
      // carry the same spans — which would annihilate whole families
      val surv = base.filter(col("drop_reason") === "keep" &&
          col("doc_id") === col("keeper") &&
          (col("cluster_id").isNull || col("doc_id") === col("keeper_id")))
        .select("doc_id")
      val spans = Dedup.spanStatsOf(
          DedupPrepare.spanPositions(s, dir).join(surv, Seq("doc_id")))
        .select(col("doc_id"), col("dup_frac").as("span_dup_frac"))
      base
        .join(spans, Seq("doc_id"), "left")
        .withColumn("span_dup_frac", coalesce(col("span_dup_frac"), lit(0.0)))
        .withColumn("split",
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "val").otherwise("test"))
        .withColumn("reason",
          when(col("drop_reason") =!= "keep", col("drop_reason"))
            .when(col("doc_id") =!= col("keeper"), "exact_dup")
            .when(col("cluster_id").isNotNull && col("doc_id") =!= col("keeper_id"),
              "near_dup")
            .when(col("span_dup_frac") >= SpanDupMax, "span_dup")
            .when(col("split") === "train" && col("in_eval") === 1,
              "contaminated")
            .otherwise("keep"))
        .withColumn("keep", (col("reason") === "keep").cast("int"))
        .select("doc_id", "lang", "split", "reason", "keep", "span_dup_frac")
    }, Seq("doc_id"), Seq("doc_id"))

  /** cp03: the v2 manifest rows — cp01's shape plus the near-dup and
    * span-dup stages and the span_dup_frac signal column. */
  def cp03(s: SparkSession, dir: String): DataFrame =
    manifestV2(s, dir)
      .select("doc_id", "split", "reason", "keep", "span_dup_frac")
      .orderBy("doc_id")

  /** Oracle: cp01's stage CTEs + the dd03 verified-pair chain, the dd08
    * recursive closure, the dd09 keeper argmax and the dd11 span-frac
    * chain — all composed into the one precedence CASE. */
  lazy val cp03Sql: String = {
    val reason =
      s"""CASE WHEN g.drop_reason <> 'keep' THEN g.drop_reason
         |            WHEN d.doc_id <> k.keeper THEN 'exact_dup'
         |            WHEN lab.cluster_id IS NOT NULL AND d.doc_id <> kp.keeper_id THEN 'near_dup'
         |            WHEN COALESCE(spanfrac.dup_frac, 0.0) >= $SpanDupMax THEN 'span_dup'
         |            WHEN bucket < 90 AND e.sig IS NOT NULL THEN 'contaminated'
         |            ELSE 'keep' END""".stripMargin
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id, ${Sampling.bucketSql} AS bucket,
       |         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS sig
       |  FROM documents),
       |g AS (SELECT doc_id, drop_reason FROM (${TextAnalysis.ta08Sql}) t),
       |k AS (SELECT sig, MIN(doc_id) AS keeper FROM d GROUP BY sig),
       |e AS (SELECT DISTINCT sig FROM d WHERE bucket >= 90),
       |${Dedup.dd03PairsCte},
       |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
       |          UNION ALL SELECT d2, d1 FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
       |  UNION
       |  SELECT e2.a, r.b FROM edges e2 JOIN reach r ON e2.b = r.a),
       |lab AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
       |nq AS (SELECT doc_id, score FROM (${TextAnalysis.ta02Sql}) tq),
       |nsc AS (SELECT lab.doc_id, lab.cluster_id, nq.score
       |        FROM lab JOIN nq USING (doc_id)),
       |nbest AS (SELECT cluster_id, MAX(score) AS ks FROM nsc GROUP BY cluster_id),
       |kp AS (SELECT cluster_id, MIN(doc_id) AS keeper_id
       |       FROM nsc JOIN nbest USING (cluster_id)
       |       WHERE score = ks GROUP BY cluster_id),
       |surv AS (SELECT d.doc_id
       |         FROM d JOIN g USING (doc_id) JOIN k USING (sig)
       |              LEFT JOIN lab ON d.doc_id = lab.doc_id
       |              LEFT JOIN kp ON lab.cluster_id = kp.cluster_id
       |         WHERE g.drop_reason = 'keep' AND d.doc_id = k.keeper
       |               AND (lab.cluster_id IS NULL OR d.doc_id = kp.keeper_id)),
       |${Dedup.spanFracSqlCte(Some("surv"))}
       |SELECT d.doc_id,
       |       CASE WHEN bucket < 90 THEN 'train'
       |            WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
       |       $reason AS reason,
       |       CAST($reason = 'keep' AS INT) AS keep,
       |       COALESCE(spanfrac.dup_frac, 0.0) AS span_dup_frac
       |FROM d JOIN g USING (doc_id)
       |       JOIN k USING (sig)
       |       LEFT JOIN e ON d.sig = e.sig
       |       LEFT JOIN lab ON d.doc_id = lab.doc_id
       |       LEFT JOIN kp ON lab.cluster_id = kp.cluster_id
       |       LEFT JOIN spanfrac ON d.doc_id = spanfrac.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- cp04
  /** cp04: INCREMENTAL batch ingest — "today's crawl vs yesterday's
    * corpus": decide per NEW document whether it is an exact duplicate
    * of a corpus document, a verified near-duplicate of one, or fresh —
    * WITHOUT recomputing anything corpus-sized at query time. The fixture
    * split is deterministic (`doc_id % 10 == 7` is the incoming batch,
    * the rest is the standing corpus).
    *
    * This is the shape that makes dedup viable at 100 TB: a daily crawl
    * is ~0.1% of the corpus, so re-running dd01/dd03 over the union per
    * ingest (corpus-sized work per batch) is the canonical scale-killer.
    * Instead the standing corpus publishes two BUILT ARTIFACTS — the
    * exact-signature keeper manifest (sig-bucketed, [[corpusKeepers]])
    * and the capped LSH band index (the dedup family's OWN
    * [[DedupPrepare.lshBands]] layer, partition-filtered to the corpus
    * half) — and every per-batch stage is batch-sized: batch sigs probe
    * the keeper manifest (one batch-sized shuffle onto sig buckets),
    * batch band rows probe the band index on its (b, bh) bucketing, and
    * only surviving candidates pay the exact shingle-Jaccard verify
    * (dd03's ≥ 0.2 rule, corpus shingles read from the doc_id-bucketed
    * layer). Decision precedence: drop_exact > drop_neardup > ingest;
    * `match_id` is the exact keeper, else the smallest verified corpus
    * near-match; band candidates that FAIL the verify still ingest (and
    * are visible in `n_cand` vs `n_near`).
    *
    * The band index is capped per (b, bh) over the WHOLE table before
    * the corpus filter (the cap is the layer's write-time semantics, and
    * yesterday's index was of course built before today's batch was
    * known — the oracle mirrors cap-then-filter exactly). Intra-batch
    * duplicates are out of scope by design: the batch self-dedups with
    * dd01 before probing (the stages compose; running both is the full
    * ingest chain, and this operator pins the corpus-probe half).
    */
  private[operators] val BatchMod = 10
  private[operators] val BatchRes = 7

  private def isBatchCol = (col("doc_id") % BatchMod) === BatchRes

  /** The standing corpus's exact-dup manifest: (sig, exact_keeper),
    * bucketed+sorted by sig — published once per corpus version, probed
    * by every ingest batch. */
  private def corpusKeepers(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "cp04keeper", dir,
      // r15 opt: sig from the docfeats layer (bit-identical md5 formula,
      // DocFeatsSpec's dd01 pin) instead of a corpus text scan — the
      // build reads two pruned columns of a bucketed table
      () => TextFeatures.docFeats(s, dir)
        .filter((col("doc_id") % BatchMod) =!= BatchRes)
        .select(col("doc_id"), col("sig"))
        .groupBy(col("sig")).agg(min(col("doc_id")).as("exact_keeper")),
      Seq("sig"), Seq("sig"), variant = s"_m${BatchMod}r$BatchRes")

  def cp04(s: SparkSession, dir: String): DataFrame = {
    val bands = DedupPrepare.lshBands(s, dir)
    val corpusBands = bands.filter((col("doc_id") % BatchMod) =!= BatchRes)
    val batchBands = bands.filter(isBatchCol)
    // candidate probe: both sides read the same (b, bh)-bucketed layer —
    // co-partitioned, no exchange; distinct shuffles candidate-sized data
    val cand = batchBands.as("x").join(corpusBands.as("y"),
        col("x.b") === col("y.b") && col("x.bh") === col("y.bh"))
      .select(col("x.doc_id").as("d"), col("y.doc_id").as("m"))
      .distinct()
    // exact shingle-Jaccard verify (dd03's rule) on candidates only;
    // shingle counts and rows ride the doc_id-bucketed layer
    val sh = DedupPrepare.shingles3(s, dir)
    val n = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("s1"), col("d") === col("s1.doc_id"))
      .join(sh.as("s2"), col("m") === col("s2.doc_id") && col("s1.s") === col("s2.s"))
      .groupBy(col("d"), col("m")).agg(count(lit(1)).as("c"))
    val ver = inter
      .join(n.as("n1"), col("d") === col("n1.doc_id"))
      .join(n.as("n2"), col("m") === col("n2.doc_id"))
      .filter(col("c").cast("double") /
        (col("n1.n") + col("n2.n") - col("c")).cast("double") >= 0.2)
      .select(col("d"), col("m"))
    val candAgg = cand.groupBy(col("d")).agg(count(lit(1)).as("n_cand"))
    val nearAgg = ver.groupBy(col("d"))
      .agg(min(col("m")).as("near_id"), count(lit(1)).as("n_near"))
    // batch sigs from the docfeats layer (r15 opt — bit-identical md5
    // formula, DocFeatsSpec's dd01 pin; was a batch text scan + md5 per
    // query); the keeper manifest join shuffles only the batch onto the
    // layer's sig buckets
    val batchSig = TextFeatures.docFeats(s, dir).filter(isBatchCol)
      .select(col("doc_id"), col("sig"))
    batchSig
      .join(corpusKeepers(s, dir), Seq("sig"), "left")
      .join(candAgg.withColumnRenamed("d", "doc_id"), Seq("doc_id"), "left")
      .join(nearAgg.withColumnRenamed("d", "doc_id"), Seq("doc_id"), "left")
      .withColumn("n_cand", coalesce(col("n_cand"), lit(0L)))
      .withColumn("n_near", coalesce(col("n_near"), lit(0L)))
      .withColumn("match_id",
        when(col("exact_keeper").isNotNull, col("exact_keeper"))
          .otherwise(col("near_id")))
      .withColumn("decision",
        when(col("exact_keeper").isNotNull, "drop_exact")
          .when(col("n_near") > 0, "drop_neardup")
          .otherwise("ingest"))
      .select("doc_id", "n_cand", "n_near", "match_id", "decision")
      .orderBy("doc_id")
  }

  /** Oracle: the band-layer CTE (cap-then-filter, exactly the layer's
    * write-time semantics) + the dd03 verify rule + the keeper manifest,
    * composed into the one decision CASE. */
  val cp04Sql: String =
    s"""WITH ${Dedup.bandsSqlCte},
       |cb AS (SELECT * FROM bl WHERE doc_id % $BatchMod <> $BatchRes),
       |bb AS (SELECT * FROM bl WHERE doc_id % $BatchMod = $BatchRes),
       |cand AS (SELECT DISTINCT bb.doc_id AS d, cb.doc_id AS m
       |         FROM bb JOIN cb ON bb.b = cb.b AND bb.bh = cb.bh),
       |n AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT d, m, COUNT(*) AS c
       |          FROM cand JOIN sh s1 ON d = s1.doc_id
       |                    JOIN sh s2 ON m = s2.doc_id AND s1.s = s2.s
       |          GROUP BY d, m),
       |ver AS (SELECT d, m
       |        FROM inter JOIN n n1 ON d = n1.doc_id JOIN n n2 ON m = n2.doc_id
       |        WHERE CAST(c AS DOUBLE) / CAST(n1.n + n2.n - c AS DOUBLE) >= 0.2),
       |sigs AS (SELECT doc_id,
       |                md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS sig
       |         FROM documents),
       |ck AS (SELECT sig, MIN(doc_id) AS exact_keeper FROM sigs
       |       WHERE doc_id % $BatchMod <> $BatchRes GROUP BY sig),
       |bs AS (SELECT doc_id, sig FROM sigs WHERE doc_id % $BatchMod = $BatchRes),
       |ca AS (SELECT d, COUNT(*) AS n_cand FROM cand GROUP BY d),
       |na AS (SELECT d, MIN(m) AS near_id, COUNT(*) AS n_near FROM ver GROUP BY d)
       |SELECT bs.doc_id,
       |       CAST(COALESCE(ca.n_cand, 0) AS BIGINT) AS n_cand,
       |       CAST(COALESCE(na.n_near, 0) AS BIGINT) AS n_near,
       |       CASE WHEN ck.exact_keeper IS NOT NULL THEN ck.exact_keeper
       |            ELSE na.near_id END AS match_id,
       |       CASE WHEN ck.exact_keeper IS NOT NULL THEN 'drop_exact'
       |            WHEN COALESCE(na.n_near, 0) > 0 THEN 'drop_neardup'
       |            ELSE 'ingest' END AS decision
       |FROM bs LEFT JOIN ck USING (sig)
       |        LEFT JOIN ca ON bs.doc_id = ca.d
       |        LEFT JOIN na ON bs.doc_id = na.d
       |ORDER BY bs.doc_id""".stripMargin

  // ---------------------------------------------------------------- cp05
  /** cp05: CORPUS VERSION DIFF — what did ingesting today's batch
    * change? Compares the standing corpus's published manifest (v1 —
    * [[manifestV1]], cp04's corpus slice) with the post-ingest corpus's
    * (v2 — [[manifest]], the full corpus) and emits ONLY the docs whose
    * status differs: `added` (the batch itself, with the reason each
    * new doc got) and `changed` (standing docs the batch re-labeled).
    * The changed rows are the audit that matters in production — a new
    * doc can displace an exact-dup keeper (smaller doc_id, same sig:
    * yesterday's keeper flips keep → exact_dup) and a batch doc landing
    * in an eval bucket newly CONTAMINATES standing train docs that
    * share its content — i.e. today's crawl can silently invalidate
    * yesterday's training set, and this diff is where that surfaces.
    *
    * Scale posture: both sides are doc_id-bucketed built artifacts
    * (published manifests, not recomputations), so the diff is one
    * co-partitioned join over two layer reads with a change-sized
    * result — the shape of a daily audit job, not a corpus rebuild.
    * The gate is content-intrinsic so per-doc rows agree across
    * versions; only the corpus-relative stages (keeper, eval-sig
    * contamination) can flip, which is exactly what the diff isolates.
    */
  def cp05(s: SparkSession, dir: String): DataFrame = {
    val v1 = manifestV1(s, dir)
      .select(col("doc_id"), col("reason").as("v1_reason"), col("keep").as("k1"))
    val v2 = manifest(s, dir)
      .select(col("doc_id"), col("reason").as("v2_reason"), col("keep").as("k2"))
    v2.join(v1, Seq("doc_id"), "left")
      .filter(col("v1_reason").isNull || col("v1_reason") =!= col("v2_reason"))
      .withColumn("status",
        when(col("v1_reason").isNull, "added").otherwise("changed"))
      .withColumn("keep_delta",
        (col("k2") - coalesce(col("k1"), lit(0))).cast("int"))
      .select("doc_id", "status", "v1_reason", "v2_reason", "keep_delta")
      .orderBy("doc_id")
  }

  /** One manifest version's CTE chain, suffixed: cp01's d/k/e stages
    * over a filtered documents set plus the per-version reason CASE
    * (the shared per-doc gate CTE `g` is joined in, computed once). */
  private def mverCtes(suf: String, where: String): String = {
    val reason =
      s"""CASE WHEN g.drop_reason <> 'keep' THEN g.drop_reason
         |            WHEN d$suf.doc_id <> k$suf.keeper THEN 'exact_dup'
         |            WHEN bucket < 90 AND e$suf.sig IS NOT NULL THEN 'contaminated'
         |            ELSE 'keep' END""".stripMargin
    s"""d$suf AS (
       |  SELECT doc_id, ${Sampling.bucketSql} AS bucket,
       |         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS sig
       |  FROM documents$where),
       |k$suf AS (SELECT sig, MIN(doc_id) AS keeper FROM d$suf GROUP BY sig),
       |e$suf AS (SELECT DISTINCT sig FROM d$suf WHERE bucket >= 90),
       |m$suf AS (SELECT d$suf.doc_id, $reason AS reason
       |          FROM d$suf JOIN g USING (doc_id) JOIN k$suf USING (sig)
       |               LEFT JOIN e$suf ON d$suf.sig = e$suf.sig)""".stripMargin
  }

  /** Oracle: the cp01 stages twice (v1 = corpus slice, v2 = full),
    * one shared gate CTE, diffed to added/changed rows. */
  lazy val cp05Sql: String =
    s"""WITH g AS (SELECT doc_id, drop_reason
       |           FROM (${TextAnalysis.ta08Sql}) t),
       |${mverCtes("1", s" WHERE doc_id % $BatchMod <> $BatchRes")},
       |${mverCtes("2", "")}
       |SELECT m2.doc_id,
       |       CASE WHEN m1.reason IS NULL THEN 'added'
       |            ELSE 'changed' END AS status,
       |       m1.reason AS v1_reason, m2.reason AS v2_reason,
       |       CAST(CAST(m2.reason = 'keep' AS INT)
       |            - COALESCE(CAST(m1.reason = 'keep' AS INT), 0)
       |            AS INT) AS keep_delta
       |FROM m2 LEFT JOIN m1 ON m2.doc_id = m1.doc_id
       |WHERE m1.reason IS NULL OR m1.reason <> m2.reason
       |ORDER BY m2.doc_id""".stripMargin

  /** Per-row MinHash band columns bh0..bh3 — VALUE-IDENTICAL to the
    * batch layer's ([[Dedup]] `minhashSigFromShingles`, spec-pinned) but
    * computed entirely map-side with array higher-order functions: the
    * shingle set via `transform` + `array_distinct`, each of the 16
    * universal-hash minima via `array_min(transform(...))`. No groupBy,
    * no distinct shuffle — which is what makes it legal in an
    * APPEND-MODE STREAM (a streaming aggregation would demand watermarks
    * and break the one-row-in/one-row-out probe contract). Docs with <3
    * tokens have no shingles → NULL bands (never a band hit). */
  private[graft] def bandCols(text: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] = {
    val P = 2147483647L
    val ws = graft.functions.GraftFunctions.tokSplit(text)
    val sh = when(size(ws) >= 3,
      array_distinct(transform(sequence(lit(1), size(ws) - 2),
        i => concat_ws(" ",
          element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))))
    val hh = transform(sh, s0 => Dedup.h60(s0) % P)
    val mhs = (0 to 15).map(i => array_min(transform(hh,
      v => (lit(1L + 604271L * i) * v + lit(7L + 202409L * i)) % P)))
    (0 to 3).map(b => Dedup.h60(
      concat_ws(",", mhs(b * 4), mhs(b * 4 + 1), mhs(b * 4 + 2), mhs(b * 4 + 3))))
  }

  /** The ONLINE half of cp04: probe a STREAM of arriving documents
    * against the standing corpus's built indexes — the sig-bucketed
    * keeper manifest and the (b, bh) band layer — with stream-static
    * joins only. Per arriving doc: `drop_exact` (normalized content
    * already in the corpus), `flag_near` (shares an LSH band bucket with
    * a corpus doc — the cheap synchronous signal; the exact Jaccard
    * VERIFY is corpus-shingle-sized and stays in the async batch pass,
    * cp04), or `ingest`. Every stream-side column is map-side
    * ([[bandCols]]); the static sides are bounded derived relations
    * (per-band DISTINCT bucket sets, the keeper manifest), re-read per
    * micro-batch exactly as a production probe service would hold them.
    * Append-safe end to end: no stream-side aggregation, no watermark
    * needed, one output row per arrival. Input needs (doc_id, text). */
  def probeStream(s: SparkSession, docs: DataFrame, dir: String): DataFrame = {
    val corpus = (col("doc_id") % BatchMod) =!= BatchRes
    val keepers = corpusKeepers(s, dir)
    val bands = DedupPrepare.lshBands(s, dir).filter(corpus)
    val bcols = bandCols(col("text"))
    var df = docs.withColumn("sig",
      md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ").cast("binary")))
    for (b <- 0 to 3) df = df.withColumn(s"bh$b", bcols(b))
    for (b <- 0 to 3) {
      val bs = bands.filter(col("b") === b)
        .select(col("bh").as(s"k$b")).distinct()
        .withColumn(s"hit$b", lit(1))
      df = df.join(bs, df(s"bh$b") === bs(s"k$b"), "left")
    }
    df.join(keepers, Seq("sig"), "left")
      .withColumn("n_band_hits",
        (0 to 3).map(b => coalesce(col(s"hit$b"), lit(0))).reduce(_ + _))
      .withColumn("decision",
        when(col("exact_keeper").isNotNull, "drop_exact")
          .when(col("n_band_hits") > 0, "flag_near")
          .otherwise("ingest"))
      .select(col("doc_id"), col("sig"), col("exact_keeper"),
        col("n_band_hits"), col("decision"))
  }

  /** Streaming ingest chain — the ONLINE front half of the pipeline:
    * the stateless quality gate first ([[TextAnalysis.gateDf]] — pure
    * column program, no state), watermarked exact-dedup second
    * ([[graft.streaming.EventStreams.dedupStream]]). The order is the
    * scale decision: the gate drops content-intrinsic rejects BEFORE
    * they ever enter the dedup state store, so per-signature state is
    * bounded by gate survivors, not arrivals. Corpus-relative stages
    * that need global state (canonical keeper, decontamination,
    * mixture) stay in the batch manifest build — the standard
    * stream-ingest / batch-curate split. Input needs (ts, doc_id,
    * text, n_chars); emits the gate-surviving first arrival per
    * normalized content signature. */
  def ingestStream(s: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val gated = TextAnalysis.gateDf(docs)
      .filter(col("drop_reason") === "keep")
      .select(col("ts"), col("doc_id"), col("text"))
    graft.streaming.EventStreams.dedupStream(gated)
  }

  /** Registry of this family. */
  val qs: Seq[Q] = Seq(
    Q("cp01_corpus_manifest",
      "end-to-end keep/drop manifest: gate > exact_dup > contaminated",
      cp01, Some(cp01Sql)),
    Q("cp02_training_batches",
      "manifest keepers > mixture > shuffle > packed training sequences",
      cp02, Some(cp02Sql)),
    Q("cp03_manifest_v2",
      "manifest v2: gate > exact_dup > near_dup > span_dup > contaminated",
      cp03, Some(cp03Sql)),
    Q("cp04_incremental_ingest",
      "batch-sized ingest probe of the corpus's built sig + band indexes",
      cp04, Some(cp04Sql)),
    Q("cp05_corpus_version_diff",
      "v1-vs-v2 manifest diff: batch additions + re-labeled standing docs",
      cp05, Some(cp05Sql)),
  )
}
