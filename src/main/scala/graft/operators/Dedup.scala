package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.{Q, Tables}

/** Large-scale training-data deduplication operators (north-star extension;
  * no reference counterpart — SURVEY.md §0, §7.3 step 5): exact dedup,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Portability contract with the DuckDB oracle: every hash bottoms out in
  * `md5` (identical bytes-in/hex-out in both engines); the first 15 hex chars
  * are read as a 60-bit integer (Spark `conv(…,16,10)` ≡ DuckDB
  * `CAST('0x…' AS BIGINT)`), then mixed with integer arithmetic mod a 31-bit
  * prime — every intermediate stays well inside Long range. Float-order
  * nondeterminism is kept out of results: dot products / norms are summed as
  * DECIMAL (order-independent), ratios are single IEEE divisions.
  *
  * Scale posture (100 TB): everything is shuffle-on-key relational — shingle
  * explode is map-side; signatures aggregate on doc_id; LSH candidate
  * generation joins on (band, bucket) so cost is bounded by bucket sizes
  * (documented stop-shingle / bucket-cap mitigations inline); nothing
  * collects to the driver.
  */
object Dedup {

  /** 31-bit Mersenne prime used for all modular hashing. */
  private val P = 2147483647L

  /** Hot-bucket membership cap for pair-forming self-joins (dd03 LSH
    * band buckets, dd06 SimHash chunk buckets, dd07 learned IVF cells,
    * ss02 probe cells). A bucket with B members emits B²/2 pairs; one
    * degenerate bucket (boilerplate shingle, empty-text cluster, skewed
    * label) would otherwise go quadratic at 100 TB. Keeping the first
    * `cap` members by id is deterministic, oracle-expressible
    * (ROW_NUMBER ≤ cap), and bounds every bucket's cost at cap²/2 pairs
    * while a genuine near-dup cluster that large still surfaces via its
    * retained members.
    */
  val BucketCap = 1000

  /** Keep at most `cap` members per key, lowest `ord` first. The window
    * partitions on the same key the caller joins on, so the sort rides
    * the join's own shuffle partitioning.
    */
  def capPerKey(df: DataFrame, keys: Seq[String], ord: String, cap: Int): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(keys.map(col): _*).orderBy(col(ord))))
      .filter(col("__rn") <= cap).drop("__rn")

  /** Portable 60-bit hash of a string column (see class doc). */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Fixed-grid integer quantization of a double term, used to make
    * floating-point *sums* order-independent AND engine-identical: the
    * per-term double product is deterministic IEEE, the round-to-1e-9-grid
    * is identical in both engines, and the subsequent SUM is exact integer
    * arithmetic. Ties round half away from zero on the EXACT BINARY value
    * (floor(p+0.5)/ceil(p-0.5)) — precisely DuckDB's ROUND — rather than
    * Spark's round(), which rounds the shortest-string decimal repr and
    * can differ by one grid unit on tie-adjacent doubles (same analysis
    * as graft.functions.GridDot).
    */
  def gridL(c: Column): Column = {
    val p = c * 1e9
    when(p >= 0, floor(p + 0.5)).otherwise(ceil(p - 0.5)).cast("long")
  }

  private def gridSql(expr: String): String = s"CAST(ROUND(($expr) * 1e9) AS BIGINT)"

  /** DuckDB mirror of [[h60]] — every oracle that hashes must build on
    * this one definition so the portable-hash pattern can't drift. */
  private[operators] val h60Sql = (s: String) =>
    s"CAST(concat('0x', substr(md5($s), 1, 15)) AS BIGINT)"

  /** Distinct word n-shingles per document: (doc_id, s).
    * Tokens = lowercase whitespace split; shingle = n consecutive tokens.
    * Explode happens map-side off the parquet scan; `distinct` shuffles on
    * (doc_id, s) — at 100 TB this is the standard shingling pass.
    */
  def wordShingles(docs: DataFrame, n: Int): DataFrame = {
    val ws = graft.functions.GraftFunctions.tokSplit(col("text"))
    docs
      .select(col("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("ws")) - (n - 1))).as("i"), col("ws"))
      .select(col("doc_id"),
        concat_ws(" ", (0 until n).map(j => element_at(col("ws"), col("i") + lit(j))): _*).as("s"))
      .distinct()
  }

  /** Oracle CTE mirroring [[wordShingles]] (expects a `documents` view). */
  private[operators] def shinglesSqlCte(n: Int): String = {
    val parts = (0 until n).map(j => s"ws[i + $j]").mkString(" || ' ' || ")
    s"""w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws
       |       FROM documents),
       |wi AS (SELECT doc_id, ws, unnest(range(1, len(ws) - ${n - 2})) AS i
       |       FROM w WHERE len(ws) >= $n),
       |sh AS (SELECT DISTINCT doc_id, $parts AS s FROM wi)""".stripMargin
  }

  // ---------------------------------------------------------------- dd01
  /** Exact dedup: hash-groupBy on normalized text. Every doc gets its
    * content signature, the group's keeper (min doc_id) and group size —
    * the standard "keep one per content hash" pass.
    *
    * Keeper/size are computed as `groupBy(sig).agg(min, count)` joined
    * back on sig — NEVER `min/count over Window.partitionBy(sig)`. A
    * WindowExec partition holds the whole duplicate group in one task
    * with no map-side combine, and at 100 TB the content-hash key is
    * guaranteed skewed (empty docs, boilerplate pages: dup groups of
    * 10⁶–10⁸ are normal in web corpora). The partial aggregation makes a
    * 10⁸-member group cost one row per map partition, and the join-back
    * is AQE-skew-splittable — the same rule dd11's span layer follows.
    */
  def dd01(s: SparkSession, dir: String): DataFrame =
    // served from the docfeats layer since r15: the signature (the
    // query's dominant map-side cost — full-text md5 over the corpus)
    // is read back as a pruned 2-column bucketed scan instead of
    // recomputed per query; the group/join-back shape is unchanged.
    // dd01Legacy keeps the direct form (DocFeatsSpec pins ≡).
    // Size-gated since r16 (DedupPrepare.serveDocfeatsLayered): below
    // the crossover the in-query md5 of a few-MB corpus beats the
    // layer read's task floor.
    if (DedupPrepare.serveDocfeatsLayered(s, dir))
      dd01Over(TextFeatures.docFeats(s, dir)
        .select(col("doc_id"), col("sig")))
    else dd01Legacy(s, dir)

  /** The pre-layer dd01 (signature computed in-query) — parity anchor. */
  private[graft] def dd01Legacy(s: SparkSession, dir: String): DataFrame = {
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    dd01Over(Tables.documents(s, dir)
      .select(col("doc_id"), md5(norm.cast("binary")).as("sig")))
  }

  private def dd01Over(sigs: DataFrame): DataFrame = {
    val groups = sigs.groupBy(col("sig"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("group_n"))
    sigs.join(groups, "sig")
      .select(col("doc_id"), col("sig"), col("keeper_id"), col("group_n"),
        (col("doc_id") =!= col("keeper_id")).cast("int").as("is_dup"))
      .orderBy("doc_id")
  }

  val dd01Sql: String =
    """SELECT doc_id,
      |       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS sig,
      |       MIN(doc_id) OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS keeper_id,
      |       COUNT(*) OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS group_n,
      |       CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS INT) AS is_dup
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- minhash
  /** One row per doc: 16 minhashes mh00..mh15 plus 4 LSH band hashes
    * (4 values per band, hashed with the same h60).
    * h_i(s) = ((1 + 604271·i)·(H(s) mod P) + (7 + 202409·i)) mod P —
    * the universal-hash family over the md5-derived base hash. All 16
    * mins are aggregate expressions over the UNEXPLODED shingle relation:
    * one shuffle on doc_id with map-side partial aggregation, no 16× row
    * inflation (the explode form multiplied the whole shingle corpus
    * before its shuffle — the top cost in round-1 bench). Coefficients
    * stay < 2^24 and hh < 2^31, so every product fits in a Long.
    */
  private[graft] def minhashSig(docs: DataFrame): DataFrame =
    minhashSigFromShingles(wordShingles(docs, 3))

  /** Signature aggregation over an existing (doc_id, s) shingle relation
    * — the entry point [[DedupPrepare.minhashSig]] uses so the shingle
    * explode materializes once per corpus, not once per query. */
  private[graft] def minhashSigFromShingles(shingles: DataFrame): DataFrame = {
    val hh = shingles.withColumn("hh", h60(col("s")) % P)
    val mins = (0 to 15).map { i =>
      min((lit(1L + 604271L * i) * col("hh") + lit(7L + 202409L * i)) % P)
        .as(f"mh$i%02d")
    }
    val sig = hh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    val bands = (0 to 3).map { b =>
      h60(concat_ws(",", (0 until 4).map(j => col(f"mh${b * 4 + j}%02d")): _*)).as(s"bh$b")
    }
    sig.select(col("doc_id") +: (0 to 15).map(k => col(f"mh$k%02d")) ++: bands: _*)
  }

  private val minhashSigSqlCte: String = {
    val mins = (0 to 15)
      .map(i => f"MIN(((${1L + 604271L * i}) * hh + (${7L + 202409L * i})) %% 2147483647) AS mh$i%02d")
      .mkString(",\n              ")
    val bands = (0 to 3).map { b =>
      val cols = (0 until 4).map(j => f"mh${b * 4 + j}%02d")
      val cc = cols.map(c => s"CAST($c AS VARCHAR)").mkString(" || ',' || ")
      s"${h60Sql(s"($cc)")} AS bh$b"
    }.mkString(",\n              ")
    s"""${shinglesSqlCte(3)},
       |hh AS (SELECT doc_id, ${h60Sql("s")} % 2147483647 AS hh FROM sh),
       |sig0 AS (SELECT doc_id,
       |              $mins
       |       FROM hh GROUP BY doc_id),
       |sig AS (SELECT sig0.*,
       |              $bands
       |       FROM sig0)""".stripMargin
  }

  // ---------------------------------------------------------------- dd02
  /** MinHash signature table: 16 minhashes + 4 band hashes per doc —
    * read from the materialized layer (bucketed+sorted by doc_id, so
    * this is a scan, not a recompute). */
  def dd02(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.minhashSig(s, dir).orderBy("doc_id")

  val dd02Sql: String =
    s"""WITH $minhashSigSqlCte
       |SELECT * FROM sig ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- dd03
  /** dd03's verified near-dup pair relation, unsorted — the shared input
    * of dd03 (which adds the presentation sort) and dd08 (where a sort
    * before the component iteration would be wasted work). */
  private[operators] def dd03Pairs(s: SparkSession, dir: String): DataFrame = {
    // both the band self-join and the 3-way shingle verify read the
    // materialized layer: the per-query persist() of r2 becomes a
    // corpus-wide bucketed table — lshBands is bucketed on (b, bh), so
    // this self-join needs NO exchange on either side
    val bandsLong = DedupPrepare.lshBands(s, dir)
    // merge-pinned: the build side of a broadcast here would be the
    // corpus-sized band relation itself (compressed file stats undercut
    // the broadcast threshold at mid scale and mispick it)
    val cand = bandsLong.as("x").hint("merge").join(bandsLong.as("y"),
        col("x.b") === col("y.b") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    // bucketed+sorted by doc_id: the groupBy below and the d1/d2 joins
    // read pre-clustered buckets
    val sh = DedupPrepare.shingles3(s, dir)
    val n = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sh.as("s2"), col("d2") === col("s2.doc_id") && col("s1.s") === col("s2.s"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("c"))
    inter
      .join(n.as("n1"), col("d1") === col("n1.doc_id"))
      .join(n.as("n2"), col("d2") === col("n2.doc_id"))
      .withColumn("jaccard",
        col("c").cast("double") / (col("n1.n") + col("n2.n") - col("c")).cast("double"))
      .filter(col("jaccard") >= 0.2)
      .select(col("d1"), col("d2"), col("c").as("n_common"), col("jaccard"))
  }

  /** MinHash LSH near-dup pairs: candidates share an LSH band bucket
    * (equi-join on (band, bucket), membership capped at [[BucketCap]] so
    * a hot bucket can't go quadratic), then verified with exact shingle
    * Jaccard ≥ 0.2. */
  def dd03(s: SparkSession, dir: String): DataFrame =
    dd03Pairs(s, dir).orderBy("d1", "d2")

  /** CTE chain through the capped band relation (`sig` + `bl`) — the SQL
    * mirror of the [[DedupPrepare.lshBands]] layer, shared by the
    * dd03/dd08 pair chain, dd12's pregate, and cp04's incremental probe. */
  private[operators] val bandsSqlCte: String =
    s"""$minhashSigSqlCte,
       |bl0 AS (SELECT doc_id, b, CASE b WHEN 0 THEN bh0 WHEN 1 THEN bh1
       |                                 WHEN 2 THEN bh2 ELSE bh3 END AS bh
       |       FROM sig, (SELECT unnest(range(0, 4)) AS b)),
       |bl AS (SELECT doc_id, b, bh FROM (
       |         SELECT bl0.*, ROW_NUMBER() OVER (PARTITION BY b, bh ORDER BY doc_id) AS rn
       |         FROM bl0)
       |       WHERE rn <= $BucketCap)""".stripMargin

  /** CTE chain through the verified pair relation — shared by dd03 (the
    * pair listing) and dd08 (the cluster assignment over those pairs). */
  private[operators] val dd03PairsCte: String =
    s"""$bandsSqlCte,
       |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
       |         FROM bl x JOIN bl y ON x.b = y.b AND x.bh = y.bh
       |                            AND x.doc_id < y.doc_id),
       |n AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT d1, d2, COUNT(*) AS c
       |          FROM cand JOIN sh s1 ON d1 = s1.doc_id
       |                    JOIN sh s2 ON d2 = s2.doc_id AND s1.s = s2.s
       |          GROUP BY d1, d2),
       |pairs AS (SELECT d1, d2, c AS n_common,
       |                 CAST(c AS DOUBLE) / CAST(n1.n + n2.n - c AS DOUBLE) AS jaccard
       |          FROM inter JOIN n n1 ON d1 = n1.doc_id JOIN n n2 ON d2 = n2.doc_id
       |          WHERE CAST(c AS DOUBLE) / CAST(n1.n + n2.n - c AS DOUBLE) >= 0.2)""".stripMargin

  val dd03Sql: String =
    s"""WITH $dd03PairsCte
       |SELECT d1, d2, n_common, jaccard FROM pairs ORDER BY d1, d2""".stripMargin

  // ---------------------------------------------------------------- dd12
  /** LSH-gated n-gram Jaccard top-20 — dd04's answer by dd03's candidate
    * machinery: pairs come from the capped LSH band layer (Σ bucket²
    * candidate mass), then ONLY those pairs are exact-Jaccard-scored
    * over the df-cut shingle universe. The measured r8 A/B against the
    * full inverted index (identical top-20 on this corpus at every
    * scale tried): sf1.0 0.88 s vs 1.64 s — the exact form wins small —
    * but sf10 10.6 s vs 4.5 s, growth 12× vs 2.7× for 10× data: past
    * ~sf3 the banded gate is the only shape that survives, which is why
    * production span/ngram dedup always pre-gates (MinHashLSH) rather
    * than scoring every co-shingle pair. Semantics are APPROXIMATE by
    * construction — a pair the bands never co-bucket is not scored —
    * so this ships alongside dd04, not instead of it.
    */
  def dd12(s: SparkSession, dir: String): DataFrame = {
    val bands = DedupPrepare.lshBands(s, dir)
    // merge-pinned like dd03: the self-join sides are the corpus-sized
    // band relation itself (see dd03Pairs)
    val cand = bands.as("x").hint("merge").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    val kd = DedupPrepare.keptByDoc(s, dir)
    val n = kd.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(kd.as("k1"), col("d1") === col("k1.doc_id"))
      .join(kd.as("k2"),
        col("d2") === col("k2.doc_id") && col("k1.s") === col("k2.s"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("c"))
    inter
      .join(n.as("n1"), col("d1") === col("n1.doc_id"))
      .join(n.as("n2"), col("d2") === col("n2.doc_id"))
      .withColumn("jaccard",
        col("c").cast("double") /
          (col("n1.n") + col("n2.n") - col("c")).cast("double"))
      .select(col("d1"), col("d2"), col("c").as("n_common"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("d1"), col("d2"))
      .limit(20)
  }

  lazy val dd12Sql: String =
    s"""WITH $minhashSigSqlCte,
       |bl0 AS (SELECT doc_id, b, CASE b WHEN 0 THEN bh0 WHEN 1 THEN bh1
       |                                 WHEN 2 THEN bh2 ELSE bh3 END AS bh
       |       FROM sig, (SELECT unnest(range(0, 4)) AS b)),
       |bl AS (SELECT doc_id, b, bh FROM (
       |         SELECT bl0.*, ROW_NUMBER() OVER (PARTITION BY b, bh ORDER BY doc_id) AS rn
       |         FROM bl0)
       |       WHERE rn <= $BucketCap),
       |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
       |         FROM bl x JOIN bl y ON x.b = y.b AND x.bh = y.bh
       |                            AND x.doc_id < y.doc_id),
       |keptk AS (SELECT doc_id, s FROM (
       |            SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df FROM sh)
       |          WHERE df <= ${DedupPrepare.DfCut}),
       |nk AS (SELECT doc_id, COUNT(*) AS n FROM keptk GROUP BY doc_id),
       |inter AS (SELECT d1, d2, COUNT(*) AS c
       |          FROM cand JOIN keptk k1 ON d1 = k1.doc_id
       |                    JOIN keptk k2 ON d2 = k2.doc_id AND k1.s = k2.s
       |          GROUP BY 1, 2)
       |SELECT d1, d2, c AS n_common,
       |       CAST(c AS DOUBLE) / CAST(n1.n + n2.n - c AS DOUBLE) AS jaccard
       |FROM inter JOIN nk n1 ON d1 = n1.doc_id JOIN nk n2 ON d2 = n2.doc_id
       |ORDER BY jaccard DESC, d1, d2 LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- dd13
  /** Shingle CONTAINMENT detection — the asymmetric twin of dd12's
    * Jaccard: containment(A⊆B) = |A∩B| / |A|, reported for each gated
    * pair as c / min(n1, n2) (the larger of the two directional
    * containments) with the contained (smaller-set) doc identified.
    * This is the signal symmetric Jaccard structurally misses: a doc
    * wholly wrapped in a bigger one (boilerplate frame, quote-with-
    * commentary, concatenated shard) scores J = |A|/|B| ≈ 0 when sizes
    * differ wildly but containment ≈ 1 — the Broder resemblance-vs-
    * containment distinction, and why production pipelines audit both.
    *
    * Scale posture: identical to dd12 — dd03's capped band layer
    * pregates candidates (merge-pinned bucketed self-join), the exact
    * intersection runs off the df-cut kept-shingle layer for survivors
    * only, set sizes come from a groupBy (never a window over the
    * shingle key). At 100 TB the banded gate is the only shape that
    * survives (dd12's measured 12× → 2.7× curve); approximate by the
    * same construction — a pair the bands never co-bucket is not
    * scored.
    */
  def dd13(s: SparkSession, dir: String): DataFrame = {
    val bands = DedupPrepare.lshBands(s, dir)
    val cand = bands.as("x").hint("merge").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    val kd = DedupPrepare.keptByDoc(s, dir)
    val n = kd.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(kd.as("k1"), col("d1") === col("k1.doc_id"))
      .join(kd.as("k2"),
        col("d2") === col("k2.doc_id") && col("k1.s") === col("k2.s"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("c"))
    inter
      .join(n.as("n1"), col("d1") === col("n1.doc_id"))
      .join(n.as("n2"), col("d2") === col("n2.doc_id"))
      .select(col("d1"), col("d2"), col("c").as("n_common"),
        col("n1.n").as("n1"), col("n2.n").as("n2"),
        (col("c").cast("double") /
          least(col("n1.n"), col("n2.n")).cast("double")).as("containment"),
        (col("c").cast("double") /
          (col("n1.n") + col("n2.n") - col("c")).cast("double")).as("jaccard"),
        when(col("n1.n") <= col("n2.n"), col("d1")).otherwise(col("d2"))
          .as("contained_doc"))
      .orderBy(col("containment").desc, col("d1"), col("d2"))
      .limit(20)
  }

  lazy val dd13Sql: String =
    s"""WITH $minhashSigSqlCte,
       |bl0 AS (SELECT doc_id, b, CASE b WHEN 0 THEN bh0 WHEN 1 THEN bh1
       |                                 WHEN 2 THEN bh2 ELSE bh3 END AS bh
       |       FROM sig, (SELECT unnest(range(0, 4)) AS b)),
       |bl AS (SELECT doc_id, b, bh FROM (
       |         SELECT bl0.*, ROW_NUMBER() OVER (PARTITION BY b, bh ORDER BY doc_id) AS rn
       |         FROM bl0)
       |       WHERE rn <= $BucketCap),
       |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
       |         FROM bl x JOIN bl y ON x.b = y.b AND x.bh = y.bh
       |                            AND x.doc_id < y.doc_id),
       |keptk AS (SELECT doc_id, s FROM (
       |            SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df FROM sh)
       |          WHERE df <= ${DedupPrepare.DfCut}),
       |nk AS (SELECT doc_id, COUNT(*) AS n FROM keptk GROUP BY doc_id),
       |inter AS (SELECT d1, d2, COUNT(*) AS c
       |          FROM cand JOIN keptk k1 ON d1 = k1.doc_id
       |                    JOIN keptk k2 ON d2 = k2.doc_id AND k1.s = k2.s
       |          GROUP BY 1, 2)
       |SELECT d1, d2, c AS n_common, n1.n AS n1, n2.n AS n2,
       |       CAST(c AS DOUBLE) / CAST(least(n1.n, n2.n) AS DOUBLE) AS containment,
       |       CAST(c AS DOUBLE) / CAST(n1.n + n2.n - c AS DOUBLE) AS jaccard,
       |       CASE WHEN n1.n <= n2.n THEN d1 ELSE d2 END AS contained_doc
       |FROM inter JOIN nk n1 ON d1 = n1.doc_id JOIN nk n2 ON d2 = n2.doc_id
       |ORDER BY containment DESC, d1, d2 LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- dd08
  /** Deterministic connected components by min-label propagation over an
    * undirected edge list (a, b): each node's label starts at
    * min(self, neighbors) and every BSP round takes the min of its own
    * and its neighbors' labels — converging to the minimum doc_id in the
    * component. The scale shape is the standard iterative join: one
    * shuffle on the node key per round, lineage cut by localCheckpoint
    * so rounds don't stack plans, and convergence detected by the label
    * SUM (labels only ever decrease, so an unchanged sum IS the
    * fixpoint — one tiny aggregate per round instead of a full diff
    * join).
    *
    * Round bound is ADAPTIVE (r4 verdict #3): the first
    * [[JumpAfterRounds]] rounds are plain one-hop propagation — on the
    * near-clique graphs dedup actually produces (duplicates of a doc
    * are duplicates of each other, diameter 2-3) labels stabilize
    * inside that budget and the cheaper round wins (pointer jumping
    * was MEASURED slower there, r4 q20-style negative result). A graph
    * still moving after those rounds is not a near-clique, so from
    * then on every round also compresses label chains with one
    * pointer-jumping self-join (lbl(v) ← min(lbl(v), lbl(lbl(v)))) —
    * path lengths halve per round and a diameter-d component
    * converges in O(log d) rounds instead of O(d): a 4k-node CHAIN
    * finishes in ~14 rounds where one-hop alone needs 4k
    * (AdversarialScaleSpec pins this). Jumping preserves the
    * invariant (labels stay component-member ids and only decrease),
    * so the fixpoint is unchanged — both label rules are monotone
    * maps to the same least fixpoint, the component minimum.
    */
  val JumpAfterRounds = 2

  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    // the symmetrization union reads `pairs` twice — without this persist
    // the whole upstream pair pipeline (for dd08: all of dd03) executes
    // once per branch in the first action
    val p = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = p.select(col("d1").as("a"), col("d2").as("b"))
      .unionByName(p.select(col("d2").as("a"), col("d1").as("b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var lab = edges
      .groupBy(col("a").as("doc_id"))
      .agg(min(least(col("a"), col("b"))).as("lbl"))
      .localCheckpoint()
    // DECIMAL(38,0): a Long sum of ids overflows around 10^10 docs (and
    // Spark 4's default ANSI mode turns that into a crash); the decimal
    // sum is exact at any realistic scale, so equal sums still ⟺ fixpoint
    def labSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("lbl").cast(DecimalType(38, 0)))).head()
        .getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labSum(lab)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val prop = edges.join(lab, edges("b") === lab("doc_id"))
        .select(edges("a").as("doc_id"), col("lbl"))
      val hop = lab.unionByName(prop)
        .groupBy(col("doc_id")).agg(min(col("lbl")).as("lbl"))
      val next = (if (iter < JumpAfterRounds) hop else {
        // pointer jumping (see Scaladoc): every label is itself a node
        // key, so a left join can only miss when lbl(v)=v already
        val l2 = hop.select(col("doc_id").as("__jd"), col("lbl").as("__jl"))
        hop.join(l2, hop("lbl") === l2("__jd"), "left")
          .select(hop("doc_id"),
            least(hop("lbl"), coalesce(col("__jl"), hop("lbl"))).as("lbl"))
      }).localCheckpoint()
      val s = labSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      lab = next
      iter += 1
    }
    edges.unpersist()
    p.unpersist()
    // a silent non-converged exit would emit INCONSISTENT labels (same
    // component, different cluster_ids) and a mysterious oracle mismatch
    // — fail loudly instead; diameter > maxIter means the input is not
    // the near-clique graph this operator is tuned for
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "component diameter exceeds maxIter; raise maxIter")
    // cluster count can approach node count (all-singleton graphs) —
    // a plain shuffle join; AQE may still pick broadcast when it's tiny
    val sz = lab.groupBy(col("lbl").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    lab.select(col("doc_id"), col("lbl").as("cluster_id"))
      .join(sz, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
  }

  /** The shingle-pair cluster assignment as a BUILT LAYER (r8): the CC
    * fixpoint is the engine's most shuffle-heavy computation (one
    * node-keyed shuffle per BSP round), and THREE consumers each re-ran
    * it per query — dd08, dd09 and the cp03 manifest build. A real
    * pipeline publishes the cluster map once per corpus version and
    * every retention job probes it; doc_id-bucketed so dd09's quality
    * join and cp03's manifest join ride the bucketing. */
  private[operators] def shingleClusters(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "ddclusters", dir,
      () => connectedComponents(dd03Pairs(s, dir).select(col("d1"), col("d2"))),
      Seq("doc_id"), Seq("doc_id"))

  /** Near-dup cluster assignment: connected components over the dd03
    * verified-pair graph — the step a real dedup pipeline runs after
    * pair generation (keep one doc per cluster). cluster_id = min doc_id
    * in the component; only docs with ≥1 near-dup appear. Reads the
    * materialized [[shingleClusters]] layer.
    */
  def dd08(s: SparkSession, dir: String): DataFrame =
    shingleClusters(s, dir).orderBy("doc_id")

  /** Oracle twin: transitive closure as a recursive CTE (reachability
    * pairs dedup'd by UNION), cluster = MIN reachable node — the same
    * fixpoint the Spark label propagation converges to. */
  val dd08Sql: String =
    s"""WITH RECURSIVE $dd03PairsCte,
       |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
       |          UNION ALL SELECT d2, d1 FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
       |  UNION
       |  SELECT e.a, r.b FROM edges e JOIN reach r ON e.b = r.a),
       |lab AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
       |sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id)
       |SELECT doc_id, cluster_id, cluster_size
       |FROM lab JOIN sz USING (cluster_id) ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- dd09
  /** Canonical-document selection — the step a dedup pipeline runs AFTER
    * clustering: per near-dup cluster (dd08), keep the highest-quality
    * member by the ta02 score, ties broken by the LOWEST doc_id (near-dup
    * clusters are full of identical texts, so exact score ties are the
    * common case, not the edge case). Two-pass argmax (max score per
    * cluster, then min doc_id among the max-score members) — the same
    * collision-free shape as the q05/q20 oracle, and what a retention
    * job actually materializes: (cluster, keeper, size, score).
    */
  def dd09(s: SparkSession, dir: String): DataFrame = {
    val clusters = shingleClusters(s, dir)
    val quality = TextAnalysis.ta02(s, dir).select(col("doc_id"), col("score"))
    val scored = clusters.join(quality, Seq("doc_id"))
    val best = scored.groupBy(col("cluster_id"))
      .agg(max(col("score")).as("keeper_score"))
    scored.join(best, Seq("cluster_id"))
      .filter(col("score") === col("keeper_score"))
      .groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("keeper_id"),
        max(col("cluster_size")).as("cluster_size"),
        max(col("keeper_score")).as("keeper_score"))
      .select("cluster_id", "keeper_id", "cluster_size", "keeper_score")
      .orderBy("cluster_id")
  }

  val dd09Sql: String =
    s"""WITH RECURSIVE $dd03PairsCte,
       |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
       |          UNION ALL SELECT d2, d1 FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
       |  UNION
       |  SELECT e.a, r.b FROM edges e JOIN reach r ON e.b = r.a),
       |lab AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
       |sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id),
       |q AS (SELECT doc_id, score FROM (${TextAnalysis.ta02Sql}) t),
       |scored AS (SELECT lab.doc_id, lab.cluster_id, sz.cluster_size, q.score
       |           FROM lab JOIN sz USING (cluster_id) JOIN q USING (doc_id)),
       |best AS (SELECT cluster_id, MAX(score) AS keeper_score
       |         FROM scored GROUP BY cluster_id)
       |SELECT cluster_id, MIN(doc_id) AS keeper_id,
       |       MAX(cluster_size) AS cluster_size, MAX(keeper_score) AS keeper_score
       |FROM scored JOIN best USING (cluster_id)
       |WHERE score = keeper_score
       |GROUP BY cluster_id ORDER BY cluster_id""".stripMargin

  // ---------------------------------------------------------------- dd04
  /** N-gram Jaccard top-k: the 20 most similar doc pairs by word-3-gram
    * Jaccard, found via an inverted shingle index. Stop-shingles (document
    * frequency > 100) are dropped before pairing — the standard guard that
    * keeps the pair blow-up bounded at scale; Jaccard is then defined over
    * the pruned shingle universe (both engines agree on the definition).
    */
  def dd04(s: SparkSession, dir: String): DataFrame = {
    // inverted-index orientation: the by-shingle bucketed twin of the
    // shingle layer — the df-cut aggregate, the cut join and the pair
    // self-join below are all keyed on s and read co-bucketed data, so
    // candidate generation runs with no exchange. The cut itself is a
    // hash-aggregate + join, not a window (r2 verdict "What's wrong" #4).
    // Both orientations of the df-cut shingle relation come from the
    // prep layer (the cut is operator semantics, applied at write time
    // as an anti-join against the small stop list — DedupPrepare.DfCut):
    //  - the pair self-join reads the by-s table twice: co-bucketed AND
    //    co-sorted (single file per bucket), so it needs neither an
    //    exchange nor a sort;
    //  - the per-doc denominators group the by-doc twin on doc_id with
    //    no exchange.
    // NOT persisted (r5): a per-query InMemoryRelation here planned as
    // an unmaterialized AQE subtree with UNKNOWN partitioning, which
    // re-introduced a both-sides exchange on the self-join — and a
    // cache of the full kept-shingle relation could never fit executor
    // storage at corpus scale anyway.
    // Per-doc denominators ride ALONG the self-join instead of joining
    // the pair relation afterwards: the kepts prep table carries `n` on
    // every row (attached once at layer-write time — DedupPrepare), so
    // the pair relation (Σ df² candidate mass — 38M rows at sf10, the
    // largest thing this query touches) is aggregated ONCE and never
    // shuffled again, and query time needs no denominator join at all.
    val kept = DedupPrepare.keptByShingle(s, dir)
    // MERGE hint: table stats tempt the planner into broadcasting the
    // whole corpus-sized kept relation (a 2M-row hash build at sf1.0,
    // impossible at real scale); the co-bucketed co-sorted SMJ streams
    // both sides with no exchange, no sort, and no build side.
    kept.as("a").hint("merge").join(kept.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"),
        max(col("a.n")).as("n1"), max(col("b.n")).as("n2"))
      .withColumn("jaccard",
        col("c").cast("double") / (col("n1") + col("n2") - col("c")).cast("double"))
      .select(col("d1"), col("d2"), col("c").as("n_common"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("d1"), col("d2"))
      .limit(20)
  }

  val dd04Sql: String =
    s"""WITH ${shinglesSqlCte(3)},
       |kept AS (SELECT doc_id, s FROM (
       |           SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df FROM sh)
       |         WHERE df <= 100),
       |n AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
       |          FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT d1, d2, c AS n_common,
       |       CAST(c AS DOUBLE) / CAST(n1.n + n2.n - c AS DOUBLE) AS jaccard
       |FROM inter JOIN n n1 ON d1 = n1.doc_id JOIN n n2 ON d2 = n2.doc_id
       |ORDER BY jaccard DESC, d1, d2 LIMIT 20""".stripMargin

  // ------------------------------------------------------------- simhash
  /** 60-bit SimHash per doc over distinct lowercase tokens (weight 1):
    * bit j is set iff Σ_tokens (±1 by bit j of H(token)) > 0.
    * Also emits 4 × 15-bit chunks (the banding key for Hamming search).
    */
  private[operators] def simhashSig(docs: DataFrame): DataFrame = {
    // Entirely map-side, no explode/shuffle, two fused native kernels:
    // tokens_h60 tokenizes + distincts + md5-hashes the doc in one pass
    // (the HOF form ran an interpreted Cast→Md5→Substring→Conv tree per
    // token), and simhash60 folds the token×60-bit majority vote in one
    // compiled loop — the naive (doc × token × bit) explode is a 60× row
    // multiplier that shuffles the whole corpus.
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sig = docs.select(col("doc_id"),
        expr("simhash60(tokens_h60(text))").as("simhash"))
    (0 to 3).foldLeft(sig) { (df, j) =>
      df.withColumn(s"c$j", expr(s"(simhash >> ${15 * j}) & 32767"))
    }
  }

  private val simhashSqlCte: String = {
    val chunks = (0 to 3).map(j => s"(simhash >> ${15 * j}) & 32767 AS c$j")
      .mkString(",\n              ")
    s"""w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws
       |       FROM documents),
       |tok AS (SELECT DISTINCT doc_id, unnest(ws) AS w FROM w),
       |th AS (SELECT doc_id, ${h60Sql("w")} AS th FROM tok),
       |tb AS (SELECT doc_id, th, unnest(range(0, 60)) AS bit FROM th),
       |bits AS (SELECT doc_id, bit,
       |                SUM(CASE WHEN (th >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS sm
       |         FROM tb GROUP BY doc_id, bit),
       |sh AS (SELECT doc_id,
       |              CAST(SUM(CASE WHEN sm > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
       |       FROM bits GROUP BY doc_id),
       |sig AS (SELECT doc_id, simhash,
       |              $chunks
       |       FROM sh)""".stripMargin
  }

  // ---------------------------------------------------------------- dd05
  /** SimHash signature table: simhash + 4 banding chunks per doc. */
  def dd05(s: SparkSession, dir: String): DataFrame =
    // served from the docfeats layer since r15: the per-doc token
    // hash + 60-bit majority vote (the query's whole cost) is read
    // back instead of recomputed; chunks derive arithmetically.
    // dd05Legacy keeps the direct kernel form (DocFeatsSpec pins ≡).
    // Size-gated since r16 (DedupPrepare.serveDocfeatsLayered): the
    // legacy form is a shuffle-free kernel pipeline, cheaper below
    // the crossover than the bucketed layer read.
    if (DedupPrepare.serveDocfeatsLayered(s, dir))
      Present.sorted(
        (0 to 3).foldLeft(TextFeatures.docFeats(s, dir)
            .select(col("doc_id"), col("simhash"))) { (df, j) =>
          df.withColumn(s"c$j", expr(s"(simhash >> ${15 * j}) & 32767"))
        }, "doc_id")
    else dd05Legacy(s, dir)

  /** The pre-layer dd05 (simhash computed in-query) — parity anchor. */
  private[graft] def dd05Legacy(s: SparkSession, dir: String): DataFrame =
    // Present.sorted: the simhash kernel pipeline is shuffle-free, so a
    // bare orderBy would run it twice (range-bound sampling + real pass)
    Present.sorted(simhashSig(Tables.documents(s, dir)), "doc_id")

  val dd05Sql: String =
    s"""WITH $simhashSqlCte
       |SELECT * FROM sig ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- dd06
  /** SimHash Hamming near-dup: candidate pairs share one of the 4 15-bit
    * chunks (exact-match banding ⇒ finds all pairs with Hamming ≤ 3 by
    * pigeonhole, plus lucky others); emit the 20 closest by
    * bit_count(xor) with unique-key tie-break.
    */
  def dd06(s: SparkSession, dir: String): DataFrame = {
    // the capped chunk relation is materialized bucketed by (j, c)
    // (DedupPrepare.simhashChunks) — both sides of this self-join read
    // the same buckets, no exchange and no per-branch recompute
    val chunksLong = DedupPrepare.simhashChunks(s, dir)
    // merge-pinned for the same reason as dd03's band join: never
    // broadcast the corpus-sized chunk relation
    chunksLong.as("x").hint("merge").join(chunksLong.as("y"),
        col("x.j") === col("y.j") && col("x.c") === col("y.c") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        col("x.simhash").as("s1"), col("y.simhash").as("s2"))
      .distinct()
      .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))))
      .select(col("d1"), col("d2"), col("hamming"))
      .orderBy(col("hamming"), col("d1"), col("d2"))
      .limit(20)
  }

  val dd06Sql: String =
    s"""WITH $simhashSqlCte,
       |cl0 AS (SELECT doc_id, simhash, j,
       |              CASE j WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2 ELSE c3 END AS c
       |       FROM sig, (SELECT unnest(range(0, 4)) AS j)),
       |cl AS (SELECT doc_id, simhash, j, c FROM (
       |         SELECT cl0.*, ROW_NUMBER() OVER (PARTITION BY j, c ORDER BY doc_id) AS rn
       |         FROM cl0)
       |       WHERE rn <= $BucketCap),
       |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
       |                x.simhash AS s1, y.simhash AS s2
       |         FROM cl x JOIN cl y ON x.j = y.j AND x.c = y.c
       |                           AND x.doc_id < y.doc_id)
       |SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS INT) AS hamming
       |FROM cand ORDER BY hamming, d1, d2 LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- dd07
  /** Embedding-cosine near-dup, blocked by the LEARNED IVF coarse cell
    * (the same materialized k-means index ss02 probes — one index build
    * serves both ANN search and embedding dedup, exactly how a
    * production near-dup pass rides the serving index). A real corpus
    * has no ground-truth `label` column, so the blocking key must be
    * unsupervised (r7 verdict #1); pairs only form inside a cell, so at
    * 100 TB the self-join cost is Σ cellᵢ²/2, capped by [[BucketCap]].
    * Cosine = grid-exact dot / (sqrt(norm1)·sqrt(norm2)); top 20 pairs.
    */
  def dd07(s: SparkSession, dir: String): DataFrame = {
    // array-carrying self-join on the blocking key + the native codegen'd
    // grid_dot expression: no 64× posexplode fan-out, the pair join moves
    // whole vectors once and scores inside one whole-stage-codegen loop
    graft.functions.GraftFunctions.register(s)
    val e = capPerKey(
        Tables.embeddings(s, dir).join(Similarity.ivfAssign(s, dir), Seq("vec_id")),
        Seq("cell"), "vec_id", BucketCap)
      .withColumn("n2", call_function("grid_dot", col("embedding"), col("embedding")))
      .select(col("vec_id"), col("cell"), col("embedding"), col("n2"))
    e.as("a").join(e.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("dot",
        call_function("grid_dot", col("a.embedding"), col("b.embedding")))
      .withColumn("cosine",
        col("dot").cast("double") /
          (sqrt(col("a.n2").cast("double")) * sqrt(col("b.n2").cast("double"))))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"), col("cosine"))
      .orderBy(col("cosine").desc, col("v1"), col("v2"))
      .limit(20)
  }

  /** dd07's pair pipeline as a reusable CTE chain ending in `top20` —
    * shared with dd10's cluster closure. Builds on
    * [[Similarity.ivfAssignSqlCtes]] (el/nrm + the unrolled Lloyd
    * rounds), so the oracle blocks on the SAME learned cells the Spark
    * side reads from the built index. */
  private lazy val dd07TopCte: String =
    s"""capped AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell,
      |           ROW_NUMBER() OVER (PARTITION BY cell ORDER BY vec_id) AS rn
      |    FROM ${Similarity.ivfFinalAssignCte})
      |  WHERE rn <= $BucketCap),
      |dot AS (SELECT ca.vec_id AS v1, cb.vec_id AS v2,
      |               SUM(${gridSql("a.x * b.x")}) AS dot
      |        FROM capped ca JOIN capped cb
      |               ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
      |             JOIN el a ON a.vec_id = ca.vec_id
      |             JOIN el b ON b.vec_id = cb.vec_id AND a.pos = b.pos
      |        GROUP BY 1, 2),
      |top20 AS (
      |  SELECT v1, v2,
      |         CAST(dot AS DOUBLE) / (sqrt(CAST(q1.n2 AS DOUBLE)) * sqrt(CAST(q2.n2 AS DOUBLE))) AS cosine
      |  FROM dot JOIN nrm q1 ON v1 = q1.vec_id JOIN nrm q2 ON v2 = q2.vec_id
      |  ORDER BY cosine DESC, v1, v2 LIMIT 20)""".stripMargin

  lazy val dd07Sql: String =
    s"""WITH ${Similarity.ivfAssignSqlCtes},
      |$dd07TopCte
      |SELECT v1, v2, cosine FROM top20 ORDER BY cosine DESC, v1, v2""".stripMargin

  // ---------------------------------------------------------------- dd10
  /** Semantic (embedding-space) cluster assignment: connected components
    * over the dd07 top-cosine pair graph — the embedding twin of dd08's
    * shingle-based clusters, completing the pairs → clusters progression
    * for the second dedup modality. Same distributed BSP label
    * propagation ([[connectedComponents]]), same oracle shape (recursive
    * closure), vec_id instead of doc_id. Like [[shingleClusters]], the
    * assignment is a built layer (fingerprinted on embeddings.parquet).
    */
  private def semClusters(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "semclusters", dir,
      () => connectedComponents(
        dd07(s, dir).select(col("v1").as("d1"), col("v2").as("d2"))),
      Seq("doc_id"), Seq("doc_id"), fpFile = "embeddings.parquet")

  def dd10(s: SparkSession, dir: String): DataFrame =
    semClusters(s, dir)
      .select(col("doc_id").as("vec_id"), col("cluster_id"), col("cluster_size"))
      .orderBy("vec_id")

  lazy val dd10Sql: String =
    s"""WITH RECURSIVE ${Similarity.ivfAssignSqlCtes},
       |$dd07TopCte,
       |edges AS (SELECT v1 AS a, v2 AS b FROM top20
       |          UNION ALL SELECT v2, v1 FROM top20),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
       |  UNION
       |  SELECT e.a, r.b FROM edges e JOIN reach r ON e.b = r.a),
       |lab AS (SELECT a AS vec_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
       |sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id)
       |SELECT vec_id, cluster_id, cluster_size
       |FROM lab JOIN sz USING (cluster_id) ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- dd11
  /** Exact substring-span dedup — the span-level pass LLM curation runs
    * after doc-level dedup (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better"): any K-token span occurring >= 2
    * times CORPUS-WIDE (any document, any position — within-doc
    * self-repeats included) is duplicated text. Per document, the
    * duplicated span starts merge into maximal islands
    * (overlapping-or-adjacent [pos, pos+K) intervals — classic
    * gaps-and-islands over a running max of prior span ends), and the
    * query emits per-doc island stats for affected docs.
    *
    * Scale posture: the reference algorithm is a suffix array; the
    * Spark-shaped equivalent is linear passes over the positional span
    * relation, materialized once per corpus bucketed by h
    * ([[DedupPrepare.spanPositions]]) so the duplicate-detection
    * groupBy(h) and the position join-back both ride the bucket layout
    * with zero exchange — and the md5-per-position span hashing is
    * paid at layer-build time, not once per plan branch per run.
    * Duplicate detection is groupBy(h)+join-back, NOT
    * count-over-window: a boilerplate span with 10^8 occurrences at
    * 100 TB would land in ONE window task, while groupBy combines
    * map-side (hot h costs one row per map partition) and the
    * join-back is an AQE-skew-splittable join. The island windows
    * partition by doc_id — bounded by the doc's own span count. The
    * per-doc groupBys ride the doc_id window partitioning (no extra
    * exchange); only the bounded per-doc result is sorted.
    */
  /** The positional span relation dd11 is built on — (doc_id, n_tokens,
    * pos, h), one row per K-token span position. Like wordShingles, the
    * ws array rides the explode only inside the map stage — the
    * projection to the 60-bit hash happens in the same codegen stage,
    * so nothing downstream ever carries the array. Materialized
    * bucketed by h ([[DedupPrepare.spanPositions]]); K is fixed at 10
    * (the Lee-et-al span length scaled to this corpus's doc sizes).
    */
  private[operators] val SpanK = 10
  private[operators] def spanPositionRows(docs: DataFrame): DataFrame = {
    val K = SpanK
    val ws = graft.functions.GraftFunctions.tokSplit(col("text"))
    docs
      .select(col("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) >= K)
      .select(col("doc_id"), size(col("ws")).as("n_tokens"),
        explode(sequence(lit(1), size(col("ws")) - (K - 1))).as("pos"),
        col("ws"))
      .select(col("doc_id"), col("n_tokens"), col("pos"),
        h60(array_join(slice(col("ws"), col("pos"), lit(K)), " ")).as("h"))
  }

  def dd11(s: SparkSession, dir: String): DataFrame =
    dd11Stats(s, dir).orderBy("doc_id")

  /** dd11's per-doc span stats, unsorted — shared by dd11 (which adds
    * the presentation sort) and cp03's manifest build (where dup_frac
    * is a drop signal and a sort would be wasted work). */
  private[operators] def dd11Stats(s: SparkSession, dir: String): DataFrame =
    spanStatsOf(DedupPrepare.spanPositions(s, dir))

  /** The span-stats pipeline over an arbitrary (doc_id, n_tokens, pos,
    * h) span relation — dd11 feeds it the whole corpus; cp03 feeds it
    * only the doc-level-dedup survivors, so a near-dup KEEPER's spans
    * are not "duplicated" merely by its own dropped twins. */
  private[operators] def spanStatsOf(spans: DataFrame): DataFrame = {
    val K = SpanK
    val dupH = spans.groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select("h")
    val dupPos = spans.join(dupH, Seq("h"))
      .select("doc_id", "n_tokens", "pos")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val isl = dupPos
      .withColumn("prev_end", max(col("pos") + K)
        .over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_end").isNull || col("pos") > col("prev_end"), 1)
          .otherwise(0))
      .withColumn("island", sum(col("new_island"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
    isl.groupBy(col("doc_id"), col("n_tokens"), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + K).as("e"))
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(lit(1)).cast("int").as("n_spans"),
        sum(col("e") - col("s")).cast("int").as("n_dup_tokens"))
      .withColumn("dup_frac",
        col("n_dup_tokens").cast("double") / col("n_tokens").cast("double"))
      .select("doc_id", "n_tokens", "n_spans", "n_dup_tokens", "dup_frac")
  }

  /** dd11's per-doc dup_frac as a composable CTE chain ending in
    * `spanfrac (doc_id, dup_frac)` — names prefixed `sp_` so it composes
    * with the shingle CTEs (`w`/`wi` would collide) inside cp03's
    * oracle. Same SpanK-derived literals as [[dd11Sql]]. `survCte`
    * optionally names a 1-column (doc_id) CTE restricting whose spans
    * count — the [[spanStatsOf]] twin knob. */
  private[operators] def spanFracSqlCte(survCte: Option[String] = None): String = {
    val src = survCte
      .map(sv => s"(SELECT sp_sp0.* FROM sp_sp0 JOIN $sv USING (doc_id))")
      .getOrElse("sp_sp0")
    s"""sp_w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws
       |       FROM documents),
       |sp_wi AS (SELECT doc_id, CAST(len(ws) AS INT) AS n_tokens, ws,
       |              unnest(range(1, len(ws) - ${SpanK - 2})) AS pos
       |       FROM sp_w WHERE len(ws) >= $SpanK),
       |sp_sp0 AS (SELECT doc_id, n_tokens, CAST(pos AS INT) AS pos,
       |              ${h60Sql(s"array_to_string(list_slice(ws, pos, pos + ${SpanK - 1}), ' ')")} AS h
       |       FROM sp_wi),
       |sp_sp AS (SELECT * FROM $src),
       |sp_dup AS (SELECT h FROM sp_sp GROUP BY h HAVING COUNT(*) >= 2),
       |sp_dp AS (SELECT doc_id, n_tokens, pos FROM sp_sp JOIN sp_dup USING (h)),
       |sp_i1 AS (SELECT doc_id, n_tokens, pos,
       |              MAX(pos + $SpanK) OVER (PARTITION BY doc_id ORDER BY pos
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |       FROM sp_dp),
       |sp_i2 AS (SELECT doc_id, n_tokens, pos,
       |              SUM(CASE WHEN prev_end IS NULL OR pos > prev_end
       |                  THEN 1 ELSE 0 END)
       |                OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |       FROM sp_i1),
       |sp_isl AS (SELECT doc_id, n_tokens, island, MIN(pos) AS s, MAX(pos) + $SpanK AS e
       |        FROM sp_i2 GROUP BY doc_id, n_tokens, island),
       |spanfrac AS (SELECT doc_id,
       |               CAST(SUM(e - s) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS dup_frac
       |             FROM sp_isl GROUP BY doc_id, n_tokens)""".stripMargin
  }

  // every span-length literal derives from SpanK (ADVICE r7): changing
  // the one constant keeps both engines in lockstep
  val dd11Sql: String =
    s"""WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws
       |       FROM documents),
       |wi AS (SELECT doc_id, CAST(len(ws) AS INT) AS n_tokens, ws,
       |              unnest(range(1, len(ws) - ${SpanK - 2})) AS pos
       |       FROM w WHERE len(ws) >= $SpanK),
       |sp AS (SELECT doc_id, n_tokens, CAST(pos AS INT) AS pos,
       |              ${h60Sql(s"array_to_string(list_slice(ws, pos, pos + ${SpanK - 1}), ' ')")} AS h
       |       FROM wi),
       |dup AS (SELECT h FROM sp GROUP BY h HAVING COUNT(*) >= 2),
       |dp AS (SELECT doc_id, n_tokens, pos FROM sp JOIN dup USING (h)),
       |i1 AS (SELECT doc_id, n_tokens, pos,
       |              MAX(pos + $SpanK) OVER (PARTITION BY doc_id ORDER BY pos
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |       FROM dp),
       |i2 AS (SELECT doc_id, n_tokens, pos,
       |              SUM(CASE WHEN prev_end IS NULL OR pos > prev_end
       |                  THEN 1 ELSE 0 END)
       |                OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |       FROM i1),
       |isl AS (SELECT doc_id, n_tokens, island, MIN(pos) AS s, MAX(pos) + $SpanK AS e
       |        FROM i2 GROUP BY doc_id, n_tokens, island)
       |SELECT doc_id, n_tokens,
       |       CAST(COUNT(*) AS INT) AS n_spans,
       |       CAST(SUM(e - s) AS INT) AS n_dup_tokens,
       |       CAST(SUM(e - s) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS dup_frac
       |FROM isl GROUP BY doc_id, n_tokens ORDER BY doc_id""".stripMargin

  /** Registry of this family. */
  val qs: Seq[Q] = Seq(
    Q("dd01_exact_dedup", "exact dedup: content-hash groups + keeper", dd01, Some(dd01Sql)),
    Q("dd02_minhash_sig", "16-fn MinHash signatures + 4 LSH band hashes", dd02, Some(dd02Sql)),
    Q("dd03_minhash_lsh_pairs", "LSH band candidates verified by exact Jaccard", dd03, Some(dd03Sql)),
    Q("dd08_neardup_clusters", "connected-component cluster ids over LSH pairs", dd08, Some(dd08Sql)),
    Q("dd09_cluster_keeper", "per-cluster canonical doc by quality score", dd09, Some(dd09Sql)),
    Q("dd04_ngram_jaccard_topk", "top-20 word-3-gram Jaccard pairs (inverted index)", dd04, Some(dd04Sql)),
    Q("dd12_ngram_jaccard_lsh", "LSH-gated n-gram Jaccard top-20 (dd04's scale path)", dd12, Some(dd12Sql)),
    Q("dd13_shingle_containment", "LSH-gated asymmetric containment (subset/wrapper detector)", dd13, Some(dd13Sql)),
    Q("dd05_simhash_sig", "60-bit SimHash + 15-bit banding chunks", dd05, Some(dd05Sql)),
    Q("dd06_simhash_hamming", "SimHash banded Hamming near-dup top-20", dd06, Some(dd06Sql)),
    Q("dd07_embedding_neardup", "IVF-cell-blocked exact-cosine near-dup top-20", dd07, Some(dd07Sql)),
    Q("dd10_semantic_clusters", "connected components over top-cosine pairs", dd10, Some(dd10Sql)),
    Q("dd11_substring_spans", "corpus-wide duplicated K-token span islands per doc", dd11, Some(dd11Sql)),
  )
}
