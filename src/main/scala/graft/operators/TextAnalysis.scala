package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.{Q, Tables}

/** Text-analysis operators for a training-data pipeline (north-star
  * extension): language ID (stopword n-gram heuristic), quality scoring,
  * token counting (whitespace + BPE-ish regex), document fingerprinting.
  *
  * Scale posture: ta01–ta03 are pure map-side column programs over the
  * parquet scan (no explode, no shuffle — higher-order array functions
  * instead of exploding tokens); ta04 shuffles once on doc_id for the
  * shingle aggregate. All arithmetic is either integer, a single IEEE
  * division, or a fixed-shape expression tree — engine-identical.
  */
object TextAnalysis {

  private val P = 2147483647L

  /** The engine's tokenizer: exactly `split(lower(trim(text)), '\s+')`,
    * as the compiled one-pass [[graft.functions.TokSplit]] byte scanner
    * (bit-for-bit pinned in TextKernelsSpec) — java.util.regex was the
    * measured 9.7 s/sf10 floor under every explode-consumer (SCALING
    * round-11 ta14 note). Registers against the active session so every
    * consumer (not all of which touch other kernels) stays one-liner. */
  private def ws: Column = graft.functions.GraftFunctions.tokSplit(col("text"))

  private[graft] val stop = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "es" -> Seq("el", "los", "las", "es", "y", "por"))

  /** Count of tokens that appear in `list` — array filter, no explode.
    * (Kept as the semantic definition; the hot paths use the compiled
    * `stop_hits` kernel, spec-pinned equal to this form.) */
  private[graft] def hits(list: Seq[String]): Column = {
    val arr = array(list.map(lit): _*)
    size(filter(ws, w => array_contains(arr, w)))
  }

  /** One `|`-separated literal of the 4 stopword lists, the compiled
    * `stop_hits` argument (GridDot.StopHits: one tokenize pass, one hash
    * probe per (token, list) — the HOF form runs an interpreted lambda
    * per token per language). */
  private[graft] val LangOrder = Seq("en", "de", "fr", "es")
  private[graft] val stopSpec: String =
    LangOrder.map(l => stop(l).mkString(",")).mkString("|")

  private def hitsSql(list: Seq[String]): String = {
    val lits = list.map(w => s"'$w'").mkString(", ")
    // CAST … AS INT: DuckDB len() is BIGINT, Spark size() is INT — the
    // arrow-level type must match for the driver's type-sensitive compare
    s"CAST(len(list_filter(ws, w -> list_contains([$lits], w))) AS INT)"
  }

  private val wsSqlCte =
    """w AS (SELECT *, string_split_regex(lower(trim(text)), '\s+') AS ws
      |       FROM documents)""".stripMargin

  // ---------------------------------------------------------------- ta01
  /** Language ID: stopword-hit score per language, argmax with fixed
    * tie-break order (en > de > fr > es). Emits the per-language scores,
    * the prediction, and whether it matches the labeled `lang`.
    */
  def ta01(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val scored = Tables.documents(s, dir)
      .withColumn("sh", call_function("stop_hits", col("text"), lit(stopSpec)))
      .withColumn("s_en", col("sh").getItem(0))
      .withColumn("s_de", col("sh").getItem(1))
      .withColumn("s_fr", col("sh").getItem(2))
      .withColumn("s_es", col("sh").getItem(3))
    scored
      .withColumn("predicted",
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") &&
          col("s_en") >= col("s_es"), "en")
          .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es"), "de")
          .when(col("s_fr") >= col("s_es"), "fr")
          .otherwise("es"))
      .withColumn("is_match", (col("predicted") === col("lang")).cast("int"))
      .select("doc_id", "s_en", "s_de", "s_fr", "s_es", "predicted", "lang", "is_match")
      .transform(Present.sorted(_, "doc_id"))
  }

  val ta01Sql: String =
    s"""WITH $wsSqlCte,
       |sc AS (SELECT doc_id, lang,
       |              ${hitsSql(stop("en"))} AS s_en,
       |              ${hitsSql(stop("de"))} AS s_de,
       |              ${hitsSql(stop("fr"))} AS s_fr,
       |              ${hitsSql(stop("es"))} AS s_es
       |       FROM w)
       |SELECT doc_id, s_en, s_de, s_fr, s_es,
       |       CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       |            WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       |            WHEN s_fr >= s_es THEN 'fr'
       |            ELSE 'es' END AS predicted,
       |       lang,
       |       CAST((CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       |            WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       |            WHEN s_fr >= s_es THEN 'fr'
       |            ELSE 'es' END) = lang AS INT) AS is_match
       |FROM sc ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- ta02
  /** Quality scoring: length / punctuation / stopword signals combined
    * into one score with a fixed expression tree; flags low quality.
    */
  def ta02(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // gate_stats (n = 0: no gram window) fuses the two kernel passes the
    // r12 form still paid — text_metrics for the counting fields plus a
    // second full tokenize inside stop_hits — into one; field-for-field
    // spec-pinned against that composition (TextKernelsSpec)
    val tm = call_function("gate_stats", col("text"),
      lit(stop("en").mkString(",")), lit(0))
    val nTok = col("tm.n_ws_tokens").cast("double")
    val punct = col("tm.n_punct").cast("double")
    // zero-length docs: Spark x/0.0 is NULL, DuckDB IEEE gives inf — guard
    val punctRatio =
      when(col("n_chars") > 0, punct / col("n_chars").cast("double")).otherwise(0.0)
    val stopRatio = col("tm.hits").getItem(0).cast("double") / nTok
    val lenScore = least(nTok / 100.0, lit(1.0))
    val score = lenScore * 0.4 +
      (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.3 +
      least(stopRatio * 5.0, lit(1.0)) * 0.3
    Tables.documents(s, dir)
      .withColumn("tm", tm)
      .withColumn("n_tokens", col("tm.n_ws_tokens"))
      .withColumn("punct_ratio", punctRatio)
      .withColumn("stop_ratio", stopRatio)
      .withColumn("score", score)
      .withColumn("low_quality", (score < 0.5).cast("int"))
      .select("doc_id", "n_tokens", "punct_ratio", "stop_ratio", "score", "low_quality")
      .transform(Present.sorted(_, "doc_id"))
  }

  val ta02Sql: String =
    s"""WITH $wsSqlCte,
       |m AS (SELECT doc_id,
       |             CAST(len(ws) AS INT) AS n_tokens,
       |             CASE WHEN n_chars > 0 THEN
       |               CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
       |                 / CAST(n_chars AS DOUBLE) ELSE 0.0 END AS punct_ratio,
       |             CAST(${hitsSql(stop("en"))} AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS stop_ratio,
       |             CAST(len(ws) AS DOUBLE) AS ntd
       |      FROM w)
       |SELECT doc_id, n_tokens, punct_ratio, stop_ratio,
       |       (least(ntd / 100.0, 1.0) * 0.4
       |        + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.3
       |        + least(stop_ratio * 5.0, 1.0) * 0.3) AS score,
       |       CAST((least(ntd / 100.0, 1.0) * 0.4
       |        + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.3
       |        + least(stop_ratio * 5.0, 1.0) * 0.3) < 0.5 AS INT) AS low_quality
       |FROM m ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- ta03
  /** Token counting: whitespace tokens, BPE-ish regex tokens (letter runs
    * / digit runs / single punctuation), distinct-token ratio.
    */
  def ta03(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // all four counts come from the one-pass text_metrics kernel — the
    // regexp_extract_all form materialized every BPE token into an array
    // just to take its size (the whole family's worst constant factor)
    Tables.documents(s, dir)
      .withColumn("tm", call_function("text_metrics", col("text")))
      .withColumn("n_ws_tokens", col("tm.n_ws_tokens"))
      .withColumn("n_bpe_tokens", col("tm.n_bpe_tokens"))
      .withColumn("n_distinct_tokens", col("tm.n_distinct_tokens"))
      .withColumn("type_token_ratio",
        col("tm.n_distinct_tokens").cast("double") / col("tm.n_ws_tokens").cast("double"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("tm.n_ws_tokens").cast("double"))
      .select("doc_id", "n_ws_tokens", "n_bpe_tokens", "n_distinct_tokens",
        "type_token_ratio", "chars_per_token")
      .transform(Present.sorted(_, "doc_id"))
  }

  val ta03Sql: String =
    s"""WITH $wsSqlCte
       |SELECT doc_id,
       |       CAST(len(ws) AS INT) AS n_ws_tokens,
       |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe_tokens,
       |       CAST(len(list_distinct(ws)) AS INT) AS n_distinct_tokens,
       |       CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS type_token_ratio,
       |       CAST(n_chars AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS chars_per_token
       |FROM w ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- ta04
  /** Document fingerprint over the word-3-gram set: order-independent
    * modular sum + min-hash of shingle hashes (a rolling-hash-style
    * content fingerprint that survives shingle reordering; docs shorter
    * than 3 tokens have no fingerprint and are excluded).
    */
  def ta04(s: SparkSession, dir: String): DataFrame =
    // reads the materialized shingle layer (bucketed by doc_id — the
    // groupBy below needs no exchange), shared with dd02/dd03/dd04/dd08
    DedupPrepare.shingles3(s, dir)
      .withColumn("h", Dedup.h60(col("s")) % P)
      .groupBy(col("doc_id"))
      .agg(
        (sum(col("h")) % P).as("fp_sum"),
        min(col("h")).as("fp_min"),
        count(lit(1)).as("n_shingles"))
      .orderBy("doc_id")

  val ta04Sql: String =
    """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
      |       FROM documents),
      |wi AS (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
      |       FROM w WHERE len(ws) >= 3),
      |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS s FROM wi),
      |hh AS (SELECT doc_id, CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % 2147483647 AS h
      |       FROM sh)
      |SELECT doc_id, CAST(SUM(h) % 2147483647 AS BIGINT) AS fp_sum, MIN(h) AS fp_min,
      |       COUNT(*) AS n_shingles
      |FROM hh GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- ta05
  /** Lexical statistics per doc — integer-only (no float math, so the
    * cross-engine hash can't drift): vocabulary size, hapax count
    * (tokens occurring exactly once — the classic corpus-quality
    * signal), and the most frequent token with its count (ties broken
    * lexicographically ascending). The top-token window partitions per
    * doc, bounded by the doc's vocabulary — never a corpus-wide sort.
    */
  def ta05(s: SparkSession, dir: String): DataFrame = {
    // entirely map-side: the stats depend only on the row's own token
    // multiset, so the one compiled `token_stats` kernel replaces the
    // explode → groupBy(doc_id,tok) → window → groupBy(doc_id) chain
    // that shuffled the exploded token corpus twice (r2 bench cost #2).
    // Docs with no non-empty tokens yield NULL and are dropped, exactly
    // as they produced no groupable rows in the relational form.
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      // no-token doc ⟺ no non-whitespace char: this cheap, scan-pushable
      // predicate replaces filter(st.isNotNull), which Catalyst pushes
      // below the projection and therefore evaluates the kernel twice.
      // NOT trim(text) != '' — SQL trim strips only spaces, so a "\t"
      // document would pass it yet tokenize to nothing and emit a
      // null-stats row the oracle doesn't have (caught by
      // AdversarialScaleSpec's whitespace block)
      .filter(col("text").rlike("\\S"))
      .select(col("doc_id"), expr("token_stats(text)").as("st"))
      .select(col("doc_id"), col("st.vocab").as("vocab"),
        col("st.n_hapax").as("n_hapax"), col("st.top_token").as("top_token"),
        col("st.top_count").as("top_count"))
      .transform(Present.sorted(_, "doc_id"))
  }

  val ta05Sql: String =
    s"""WITH $wsSqlCte,
      |tok AS (SELECT doc_id, unnest(ws) AS tok FROM w),
      |cnt AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM tok WHERE tok <> '' GROUP BY 1, 2),
      |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, tok) AS rn
      |       FROM cnt)
      |SELECT doc_id, COUNT(*) AS vocab,
      |       COUNT(CASE WHEN cnt = 1 THEN 1 END) AS n_hapax,
      |       MAX(CASE WHEN rn = 1 THEN tok END) AS top_token,
      |       MAX(CASE WHEN rn = 1 THEN cnt END) AS top_count
      |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- ta06
  /** Repetition statistics per doc — the Gopher/C4-style quality
    * signals built on word 2-grams: duplicate-gram fraction (how much of
    * the doc is re-used phrasing) and top-gram share (is one phrase
    * dominating). Counts come integer-exact from the compiled
    * `ngram_stats` kernel (one map-side pass, same design as ta05's
    * token_stats — the relational form would shuffle the exploded gram
    * corpus twice for per-doc answers); each ratio is ONE IEEE division
    * of two exact longs, so the oracle hash can't drift.
    */
  def ta06(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      // docs with <2 tokens have no bigrams (NULL kernel result ⟺ zero
      // gram rows to group in the oracle). Dropping them via
      // filter(st.isNotNull) would be pushed below the projection and
      // evaluate the kernel TWICE per row (the ta05 lesson) — this
      // scan-pushable predicate is exactly equivalent: ≥2 non-empty
      // whitespace tokens ⟺ some whitespace run between two non-space
      // chars
      .filter(col("text").rlike("\\S\\s+\\S"))
      .select(col("doc_id"), expr("ngram_stats(text, 2)").as("st"))
      .select(col("doc_id"),
        col("st.n_grams").as("n_grams"),
        col("st.n_distinct").as("n_distinct"),
        ((col("st.n_grams") - col("st.n_distinct")).cast("double") /
          col("st.n_grams").cast("double")).as("dup_frac"),
        col("st.top_gram").as("top_gram"),
        (col("st.top_count").cast("double") /
          col("st.n_grams").cast("double")).as("top_share"))
      .transform(Present.sorted(_, "doc_id"))
  }

  val ta06Sql: String =
    s"""WITH $wsSqlCte,
      |tok AS (SELECT doc_id, tok,
      |               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS j
      |        FROM (SELECT doc_id, unnest(ws) AS tok,
      |                     generate_subscripts(ws, 1) AS i FROM w)
      |        WHERE tok <> ''),
      |bg AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS g
      |       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.j = a.j + 1),
      |cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn
      |       FROM cnt)
      |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams, COUNT(*) AS n_distinct,
      |       CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_frac,
      |       MAX(CASE WHEN rn = 1 THEN g END) AS top_gram,
      |       CAST(MAX(CASE WHEN rn = 1 THEN c END) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_share
      |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- ta07
  /** PII patterns shared by the Spark and oracle sides. Deliberately
    * lookaround-free so Java regex (Spark) and RE2 (DuckDB) agree
    * construct-for-construct: `\b`/`\d`/char classes mean the same in
    * both; lookaheads/backrefs (which RE2 lacks) are never used. */
  private[graft] val EmailPat = graft.functions.PiiScrub.EmailPat
  private[graft] val Ipv4Pat = graft.functions.PiiScrub.Ipv4Pat
  private[graft] val PhonePat = graft.functions.PiiScrub.PhonePat

  /** PII detection + redaction — the curation step every training-data
    * pipeline runs before anything else touches the text. The synthetic
    * corpus contains no PII (lowercase word soup), so the query PLANTS
    * deterministic spans derived from doc_id — one email, one IPv4, one
    * phone, plus a second email on every 3rd doc — then detects and
    * redacts them. Planting makes the per-doc ground truth exact, so the
    * oracle hash doubles as an exact-recall check of the regex kernels
    * across two engines (Java regex vs RE2); `clean` audits that the
    * redacted text re-scans to zero hits.
    *
    * Scale posture: pure map-side column program (three codegen'd
    * regexp_count + a redaction chain over the scan — no explode, no
    * shuffle before the presentation sort), identical to ta01–ta03.
    */
  def ta07(s: SparkSession, dir: String): DataFrame = {
    val ptext = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com from 10."),
      (col("doc_id") % 256).cast("string"), lit(".0."),
      (col("doc_id") % 200).cast("string"),
      lit(" call 555-867-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      when(col("doc_id") % 3 === 0, " cc admin@example.org").otherwise(""))
    graft.functions.GraftFunctions.register(s)
    // pii_scrub = the 9-regex-pass column program (3 regexp_count + 3
    // chained regexp_replace + 3 audit regexp_count) fused into one
    // kernel — same java.util.regex engine and Patterns, spec-pinned
    // equal (TextKernelsSpec), 23.7 s -> single-digit at sf1.0
    Tables.documents(s, dir)
      .select(col("doc_id"), ptext.as("ptext"))
      .withColumn("ps", call_function("pii_scrub", col("ptext")))
      .select(col("doc_id"),
        col("ps.n_email").as("n_email"),
        col("ps.n_phone").as("n_phone"),
        col("ps.n_ipv4").as("n_ipv4"),
        (col("ps.n_email") + col("ps.n_phone") + col("ps.n_ipv4")).as("n_pii"),
        col("ps.redacted").as("redacted"),
        col("ps.clean").as("clean"))
      .transform(Present.sorted(_, "doc_id"))
  }

  val ta07Sql: String = {
    // RE2 gets the same backslashes Java does; DuckDB standard strings
    // pass them through literally
    def cnt(src: String, pat: String) =
      s"CAST(len(regexp_extract_all($src, '$pat')) AS INT)"
    s"""WITH p AS (
      |  SELECT doc_id,
      |         text || ' contact user' || CAST(doc_id AS VARCHAR)
      |           || '@mail.example.com from 10.'
      |           || CAST(doc_id % 256 AS VARCHAR) || '.0.'
      |           || CAST(doc_id % 200 AS VARCHAR)
      |           || ' call 555-867-'
      |           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |           || CASE WHEN doc_id % 3 = 0 THEN ' cc admin@example.org'
      |                   ELSE '' END AS ptext
      |  FROM documents),
      |c AS (
      |  SELECT doc_id,
      |         ${cnt("ptext", EmailPat)} AS n_email,
      |         ${cnt("ptext", Ipv4Pat)} AS n_ipv4,
      |         ${cnt("ptext", PhonePat)} AS n_phone,
      |         regexp_replace(regexp_replace(regexp_replace(ptext,
      |           '$EmailPat', '[EMAIL]', 'g'),
      |           '$Ipv4Pat', '[IP]', 'g'),
      |           '$PhonePat', '[PHONE]', 'g') AS redacted
      |  FROM p)
      |SELECT doc_id, n_email, n_phone, n_ipv4,
      |       n_email + n_phone + n_ipv4 AS n_pii, redacted,
      |       CAST(${cnt("redacted", EmailPat)}
      |            + ${cnt("redacted", Ipv4Pat)}
      |            + ${cnt("redacted", PhonePat)} = 0 AS INT) AS clean
      |FROM c ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- ta08
  /** The quality GATE: composes the family's signals (ta02 score, ta06
    * 2-gram duplication, ta01 stopword evidence) into the keep/drop
    * decision a C4/Gopher-style curation pipeline actually executes,
    * with the FIRST failing rule as the drop reason — rule order is part
    * of the semantics (a 3-token doc is 'too_short', never 'repetitive',
    * so downstream reason-breakdowns are stable as thresholds move).
    *
    * Scale posture: one map-side pass — the compiled kernels (stop_hits,
    * ngram_stats) and the score tree evaluate per row off the scan; no
    * join against ta02/ta06 outputs (recomputing beats re-reading at
    * this width), no shuffle before the presentation sort. The <2-token
    * kernel-null case never decides: such docs are 'too_short' by rule 1
    * and dup_frac coalesces to 0.
    */
  /** The gate's column program over any documents-shaped relation —
    * pure map-side (requires GraftFunctions registered). Exposed so the
    * end-to-end manifest ([[Curation.cp01]]) evaluates the gate inline
    * off its own scan instead of joining ta08's output back on doc_id. */
  private[graft] def gateDf(docs: DataFrame): DataFrame = {
    // gate_stats: EVERY gate signal from one fused tokenize pass — the
    // retired composition ([[gateDfLegacy]], spec-pinned equal) ran
    // three kernels (text_metrics, stop_hits, ngram_stats) that each
    // re-tokenized the document
    val nTok = col("gs.n_ws_tokens").cast("double")
    val punct = col("gs.n_punct").cast("double")
    val punctRatio =
      when(col("n_chars") > 0, punct / col("n_chars").cast("double")).otherwise(0.0)
    val sh = col("gs.hits")
    val stopRatio = sh.getItem(0).cast("double") / nTok
    val score = least(nTok / 100.0, lit(1.0)) * 0.4 +
      (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.3 +
      least(stopRatio * 5.0, lit(1.0)) * 0.3
    docs
      .withColumn("gs", call_function("gate_stats",
        col("text"), lit(stopSpec), lit(2)))
      .withColumn("n_tokens", col("gs.n_ws_tokens"))
      .withColumn("lang_max",
        greatest(sh.getItem(0), sh.getItem(1), sh.getItem(2), sh.getItem(3)))
      // the kernel folds ngram_stats' NULL-under-2-tokens to (0, 0), so
      // the zero case must be branched around, not coalesced over: under
      // ANSI (the shipped sessions) 0/0 THROWS where the legacy form's
      // NULL/NULL propagated
      .withColumn("dup_frac",
        when(col("gs.n_grams") > 0,
          (col("gs.n_grams") - col("gs.n_distinct")).cast("double") /
            col("gs.n_grams").cast("double")).otherwise(0.0))
      .withColumn("score", score)
      .withColumn("drop_reason",
        when(col("n_tokens") < 10, "too_short")
          .when(col("lang_max") === 0, "no_lang_signal")
          .when(col("dup_frac") > 0.3, "repetitive")
          .when(col("score") < 0.5, "low_quality")
          .otherwise("keep"))
  }

  /** The RETIRED three-kernel gate program (text_metrics + stop_hits +
    * ngram_stats, each a full tokenize pass) — kept as the parity
    * oracle for [[gateDf]]'s fused gate_stats form (TextKernelsSpec)
    * and for the same-box A/B (tools/GateAb). Not on any query path. */
  private[graft] def gateDfLegacy(docs: DataFrame): DataFrame = {
    val nTok = col("tm.n_ws_tokens").cast("double")
    val punct = col("tm.n_punct").cast("double")
    val punctRatio =
      when(col("n_chars") > 0, punct / col("n_chars").cast("double")).otherwise(0.0)
    val sh = call_function("stop_hits", col("text"), lit(stopSpec))
    val stopRatio = sh.getItem(0).cast("double") / nTok
    val score = least(nTok / 100.0, lit(1.0)) * 0.4 +
      (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.3 +
      least(stopRatio * 5.0, lit(1.0)) * 0.3
    docs
      .withColumn("tm", call_function("text_metrics", col("text")))
      .withColumn("n_tokens", col("tm.n_ws_tokens"))
      .withColumn("lang_max",
        greatest(sh.getItem(0), sh.getItem(1), sh.getItem(2), sh.getItem(3)))
      .withColumn("st", expr("ngram_stats(text, 2)"))
      .withColumn("dup_frac", coalesce(
        (col("st.n_grams") - col("st.n_distinct")).cast("double") /
          col("st.n_grams").cast("double"), lit(0.0)))
      .withColumn("score", score)
      .withColumn("drop_reason",
        when(col("n_tokens") < 10, "too_short")
          .when(col("lang_max") === 0, "no_lang_signal")
          .when(col("dup_frac") > 0.3, "repetitive")
          .when(col("score") < 0.5, "low_quality")
          .otherwise("keep"))
  }

  def ta08(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    gateDf(Tables.documents(s, dir))
      .withColumn("keep", (col("drop_reason") === "keep").cast("int"))
      .select("doc_id", "n_tokens", "lang_max", "dup_frac", "score",
        "drop_reason", "keep")
      .transform(Present.sorted(_, "doc_id"))
  }

  val ta08Sql: String = {
    val langMaxSql = "greatest(" +
      LangOrder.map(l => hitsSql(stop(l))).mkString(", ") + ")"
    s"""WITH $wsSqlCte,
      |tok AS (SELECT doc_id, tok,
      |               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS j
      |        FROM (SELECT doc_id, unnest(ws) AS tok,
      |                     generate_subscripts(ws, 1) AS i FROM w)
      |        WHERE tok <> ''),
      |bg AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS g
      |       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.j = a.j + 1),
      |d AS (SELECT doc_id,
      |             CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_frac
      |      FROM (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2)
      |      GROUP BY doc_id),
      |m AS (SELECT w.doc_id,
      |             CAST(len(ws) AS INT) AS n_tokens,
      |             CAST($langMaxSql AS INT) AS lang_max,
      |             COALESCE(d.dup_frac, 0.0) AS dup_frac,
      |             (least(CAST(len(ws) AS DOUBLE) / 100.0, 1.0) * 0.4
      |              + (1.0 - least(
      |                  CASE WHEN n_chars > 0 THEN
      |                    CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
      |                      / CAST(n_chars AS DOUBLE) ELSE 0.0 END * 10.0, 1.0)) * 0.3
      |              + least(CAST(${hitsSql(stop("en"))} AS DOUBLE)
      |                      / CAST(len(ws) AS DOUBLE) * 5.0, 1.0) * 0.3) AS score
      |      FROM w LEFT JOIN d ON w.doc_id = d.doc_id)
      |SELECT doc_id, n_tokens, lang_max, dup_frac, score,
      |       CASE WHEN n_tokens < 10 THEN 'too_short'
      |            WHEN lang_max = 0 THEN 'no_lang_signal'
      |            WHEN dup_frac > 0.3 THEN 'repetitive'
      |            WHEN score < 0.5 THEN 'low_quality'
      |            ELSE 'keep' END AS drop_reason,
      |       CAST(CASE WHEN n_tokens < 10 THEN 'too_short'
      |            WHEN lang_max = 0 THEN 'no_lang_signal'
      |            WHEN dup_frac > 0.3 THEN 'repetitive'
      |            WHEN score < 0.5 THEN 'low_quality'
      |            ELSE 'keep' END = 'keep' AS INT) AS keep
      |FROM m ORDER BY doc_id""".stripMargin
  }

  /** Streaming twin of [[ta08]] — the quality gate applied at INGEST
    * time, before a document ever lands in the corpus. The gate is a
    * stateless column program (every signal — token count, stop-hit
    * kernels, 2-gram duplication, score — is computed per row), so the
    * exact batch program runs unchanged on an unbounded stream: no
    * state store, no watermark, no output-mode constraint. The one
    * difference from ta08 is the absent presentation sort (streams
    * don't order). Contrast [[graft.streaming.EventStreams.dedupStream]],
    * where the corpus-relative signal genuinely needs bounded state. */
  def gateStream(s: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    gateDf(docs)
      .withColumn("keep", (col("drop_reason") === "keep").cast("int"))
      .select("doc_id", "n_tokens", "lang_max", "dup_frac", "score",
        "drop_reason", "keep")
  }

  // ---------------------------------------------------------------- ta09
  /** Corpus-frequency rarity scoring — the model-free stand-in for the
    * LM-perplexity filter a CCNet-style pipeline runs (no LM weights in
    * this environment, and none needed for the unigram form: the corpus
    * IS the model). Two passes: build the unigram frequency table, then
    * score each doc by its tokens' corpus statistics —
    *
    *  - `n_hapax`: tokens occurring exactly once in the corpus (OOV /
    *    gibberish evidence),
    *  - `mean_tok_count`: exact mean corpus count of the doc's tokens
    *    (stopword-heaviness; integer sum ÷ count, one IEEE division),
    *  - `rarity`: mean inverse token frequency — the surprisal proxy —
    *    summed on the 1e-9 grid ([[Dedup.gridL]]) so the fold is
    *    order-independent and engine-identical (a true mean log-prob
    *    needs ln(), which is NOT correctly-rounded-identical across
    *    libms; 1/freq preserves the ranking signal and ports exactly).
    *
    * Scale posture — the unigram table is a BUILT INDEX (the corpus IS
    * the language model, so its frequency table is a corpus artifact
    * like the shingle layer: materialized once per corpus via
    * [[DedupPrepare.ensure]], bucketed by token — without it the
    * head/tail branches below would each recompute the corpus-wide
    * aggregate). The token⋈frequency join is then Zipf-skew-split:
    * tokens with corpus count ≥ [[RarityHeadCut]] (the head — "the",
    * "of" — exactly the keys that would hot-spot a hash join) resolve
    * via a BROADCAST of the head table (≤ N/[[RarityHeadCut]] entries
    * by pigeonhole, vanishing share of the vocab under Zipf), and only
    * tail tokens (per-key fanout < [[RarityHeadCut]] by construction)
    * take the shuffle join. The oracle is the unsplit join — identical
    * result by construction since head and tail partition the vocab.
    */
  val RarityHeadCut = 1000L

  /** The materialized unigram frequency table, bucketed by token —
    * (lang, tok, c) so ONE built index serves both consumers: ta09's
    * global frequencies (aggregate out lang — rides the tok bucketing,
    * no exchange, vocab-sized input) and ta10's per-language
    * diagnostics. Without the table each consumer would re-explode and
    * re-aggregate the corpus per Catalyst branch (no subplan sharing:
    * ta10 alone has three derivations of this relation). */
  /** (lang, tok) occurrence rows off a documents relation — the unigram
    * layer's un-aggregated body, shared with [[LayerMaintenance]]'s
    * batch-delta path. */
  private[operators] def langTokens(docs: DataFrame): DataFrame =
    docs.select(col("lang"), explode(ws).as("tok"))
      .filter(col("tok") =!= "")

  /** Also [[LayerMaintenance.ensureMaintained]]'s entry to the unigram
    * layer (its counts merge batch-wise on ingest). */
  private[operators] def langFreq(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "unifreq", dir,
      () => langTokens(Tables.documents(s, dir))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c")),
      Seq("tok"), Seq("tok"), variant = "_lang")

  /** Global (tok, c) view of [[langFreq]] — vocab-sized aggregate, no
    * exchange (bucketed by tok). */
  private def uniFreq(s: SparkSession, dir: String): DataFrame =
    langFreq(s, dir).groupBy(col("tok")).agg(sum(col("c")).as("c"))

  def ta09(s: SparkSession, dir: String): DataFrame = {
    // served from the docfeats layer since r15 (ta12's probe shape): the
    // per-doc unigram HISTOGRAM probes the int-keyed frequency layer, so
    // the corpus tokenize + string-keyed join are gone; every legacy
    // per-occurrence term is c_doc × the per-distinct-token term and all
    // pre-division arithmetic is exact integer math, so the result is
    // bit-identical to [[ta09Legacy]] (DocFeatsSpec pins ≡). The Zipf
    // head still broadcasts; only the tail takes the shuffle join.
    val hist = TextFeatures.docFeats(s, dir)
      .select(col("doc_id"), explode(col("uni")).as("u"))
      .select(col("doc_id"), col("u.id").as("tok_id"),
        col("u.c").cast("long").as("n"))
    val up = TextFeatures.uniProbId(s, dir)
    val head = up.filter(col("c") >= RarityHeadCut)
      .select(col("tok_id"), col("c"))
    val tail = up.filter(col("c") < RarityHeadCut)
      .select(col("tok_id"), col("c"))
    val scored = hist.join(broadcast(head), Seq("tok_id"))
      .unionByName(hist.join(tail, Seq("tok_id")))
    scored.groupBy(col("doc_id"))
      .agg(
        sum(col("n")).cast("long").as("n_tokens"),
        sum(when(col("c") === 1, col("n")).otherwise(0L)).cast("long")
          .as("n_hapax"),
        (sum(col("n") * col("c")).cast("double") /
          sum(col("n")).cast("double")).as("mean_tok_count"),
        (sum(col("n") * Dedup.gridL(lit(1.0) / col("c"))).cast("double") / 1e9 /
          sum(col("n")).cast("double")).as("rarity"))
      .orderBy("doc_id")
  }

  /** The pre-layer ta09 (tokenize + string-keyed frequency probe per
    * query) — parity anchor for DocFeatsSpec. */
  private[graft] def ta09Legacy(s: SparkSession, dir: String): DataFrame = {
    val tk = Tables.documents(s, dir)
      .select(col("doc_id"), explode(ws).as("tok"))
      .filter(col("tok") =!= "")
    val freq = uniFreq(s, dir)
    val head = freq.filter(col("c") >= RarityHeadCut)
    val tail = freq.filter(col("c") < RarityHeadCut)
    val scored = tk.join(broadcast(head), Seq("tok"))
      .unionByName(tk.join(tail, Seq("tok")))
    scored.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).cast("long").as("n_hapax"),
        (sum(col("c")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_tok_count"),
        (sum(Dedup.gridL(lit(1.0) / col("c"))).cast("double") / 1e9 /
          count(lit(1)).cast("double")).as("rarity"))
      .orderBy("doc_id")
  }

  val ta09Sql: String =
    s"""WITH $wsSqlCte,
       |tk AS (SELECT doc_id, unnest(ws) AS tok FROM w),
       |tkf AS (SELECT doc_id, tok FROM tk WHERE tok <> ''),
       |freq AS (SELECT tok, COUNT(*) AS c FROM tkf GROUP BY tok),
       |j AS (SELECT doc_id, c FROM tkf JOIN freq USING (tok))
       |SELECT doc_id,
       |       COUNT(*) AS n_tokens,
       |       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       |       CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_tok_count,
       |       CAST(SUM(CAST(ROUND((CAST(1.0 AS DOUBLE) / c) * 1e9) AS BIGINT)) AS DOUBLE)
       |         / 1e9 / CAST(COUNT(*) AS DOUBLE) AS rarity
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- ta10
  /** Corpus diagnostics — the per-language health report a pipeline
    * inspects BEFORE training: document and token volume, vocabulary
    * size, type-token ratio (lexical diversity), hapax share (OOV /
    * noise pressure), and top-100-token coverage (how head-heavy the
    * language's distribution is; a natural-language corpus sits near
    * Zipf's ~40–60%, boilerplate spikes it). All counts are exact
    * integers; each ratio is one IEEE division — engine-identical.
    *
    * Scale posture: every relation derives from the MATERIALIZED
    * (lang, tok, c) frequency index ([[langFreq]]) — vocab-sized, not
    * corpus-sized; the corpus-wide explode+aggregate is paid once per
    * corpus at index-build time, not once per Catalyst branch (three
    * consumers below — inlining re-ran it 3×, census 8 exchanges vs 6).
    * The top-100 rank window partitions by lang over vocab-sized data —
    * bounded by the largest per-language vocabulary, the standard
    * argmax-top-k shape, never the corpus. Doc counts ride a separate
    * scan that prunes to one column.
    */
  def ta10(s: SparkSession, dir: String): DataFrame = {
    val tf = langFreq(s, dir)
    val byLang = tf.groupBy(col("lang")).agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("vocab"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"))
    val wTop = Window.partitionBy(col("lang"))
      .orderBy(col("c").desc, col("tok"))
    val top = tf.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 100)
      .groupBy(col("lang")).agg(sum(col("c")).as("top100"))
    val nDocs = Tables.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    nDocs.join(byLang, Seq("lang")).join(top, Seq("lang"))
      .select(col("lang"), col("n_docs"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("vocab"),
        (col("vocab").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        (col("hapax").cast("double") / col("vocab").cast("double"))
          .as("hapax_share"),
        (col("top100").cast("double") / col("n_tokens").cast("double"))
          .as("top100_coverage"))
      .orderBy("lang")
  }

  val ta10Sql: String =
    s"""WITH $wsSqlCte,
       |tk AS (SELECT lang, unnest(ws) AS tok FROM w),
       |tf AS (SELECT lang, tok, COUNT(*) AS c FROM tk
       |       WHERE tok <> '' GROUP BY lang, tok),
       |bl AS (SELECT lang, SUM(c) AS n_tokens, COUNT(*) AS vocab,
       |              SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS hapax
       |       FROM tf GROUP BY lang),
       |tp AS (SELECT lang, SUM(c) AS top100 FROM (
       |         SELECT lang, c, ROW_NUMBER() OVER (PARTITION BY lang
       |                          ORDER BY c DESC, tok) AS rk FROM tf)
       |       WHERE rk <= 100 GROUP BY lang),
       |nd AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang)
       |SELECT lang, n_docs,
       |       CAST(n_tokens AS BIGINT) AS n_tokens, vocab,
       |       CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
       |       CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE) AS hapax_share,
       |       CAST(top100 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top100_coverage
       |FROM nd JOIN bl USING (lang) JOIN tp USING (lang)
       |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- ta11
  /** Per-source boilerplate detection — the C4-style site-template
    * cleaning signal: a word-3-shingle occurring in more than
    * [[BoilerFrac]] of a SOURCE's documents is that source's template
    * (nav bars, footers, legal text — the same bytes on every page of a
    * site), and each doc reports how much of it is template. Shingle
    * universe and doc set are exactly the shingle layer's (docs with ≥3
    * tokens); per-source doc counts are counted over that same layer so
    * the threshold is self-consistent.
    *
    * Scale posture: the template bit is baked onto each shingle row in
    * a doc_id-bucketed BUILT LAYER ([[boilerShingles]] — the source-df
    * aggregate, the threshold join and the template mark are all paid
    * at layer-write time, once per corpus), so the per-doc rollup
    * groups on doc_id with no exchange: read → zero-shuffle aggregate →
    * presentation sort.
    */
  val BoilerFrac = 0.5

  /** The boilerplate-annotated shingle layer: (doc_id, source, s,
    * is_template), bucketed by doc_id. */
  private def boilerShingles(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "boiler", dir, () => {
      val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      val sh = DedupPrepare.shingles3(s, dir).join(src, Seq("doc_id"))
      val perSrc = sh.groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      val tpl = sh.groupBy(col("source"), col("s")).agg(count(lit(1)).as("df"))
        .join(perSrc, Seq("source"))
        .filter(col("df").cast("double") >
          col("n_docs").cast("double") * BoilerFrac)
        .select(col("source"), col("s"), lit(1).as("is_template"))
      sh.join(tpl, Seq("source", "s"), "left")
        .select(col("doc_id"), col("source"), col("s"),
          coalesce(col("is_template"), lit(0)).as("is_template"))
    }, Seq("doc_id"), Seq("doc_id"), variant = "_f50")

  def ta11(s: SparkSession, dir: String): DataFrame =
    boilerShingles(s, dir)
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(col("is_template")).cast("long").as("n_template"))
      .withColumn("boiler_frac",
        col("n_template").cast("double") / col("n_shingles").cast("double"))
      .orderBy("doc_id")

  val ta11Sql: String =
    s"""WITH ${Dedup.shinglesSqlCte(3)},
       |ss AS (SELECT sh.doc_id, d.source, sh.s
       |       FROM sh JOIN documents d ON sh.doc_id = d.doc_id),
       |nd AS (SELECT source, COUNT(DISTINCT doc_id) AS n_docs
       |       FROM ss GROUP BY source),
       |tpl AS (SELECT source, s FROM
       |          (SELECT source, s, COUNT(*) AS df FROM ss GROUP BY 1, 2) j
       |        JOIN nd USING (source)
       |        WHERE CAST(df AS DOUBLE) > CAST(n_docs AS DOUBLE) * 0.5)
       |SELECT ss.doc_id, ss.source,
       |       COUNT(*) AS n_shingles,
       |       CAST(SUM(CASE WHEN tpl.s IS NOT NULL THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_template,
       |       CAST(SUM(CASE WHEN tpl.s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |         / CAST(COUNT(*) AS DOUBLE) AS boiler_frac
       |FROM ss LEFT JOIN tpl ON ss.source = tpl.source AND ss.s = tpl.s
       |GROUP BY 1, 2 ORDER BY ss.doc_id""".stripMargin

  // ---------------------------------------------------------------- ta12
  /** Unigram-LM cross-entropy / perplexity filter — the CCNet-shaped
    * quality signal (Wenzek et al. 2020 filter CommonCrawl by KenLM
    * perplexity; with no model weights available offline, the LM here is
    * the corpus's own unigram distribution — the same serving shape, a
    * per-token `-log2 p(tok)` lookup + per-doc mean). High perplexity =
    * tokens the corpus rarely sees (noise, junk encodings); anomalously
    * low = degenerate repetition of head tokens. Differs from ta09's
    * rarity (mean 1/c): cross-entropy is the information-theoretic
    * quantity pipelines actually threshold on, in bits/token, with
    * `ppl = 2^xent` reported alongside.
    *
    * Scale posture: identical to ta09's — the (tok, c) lookup table is
    * the MATERIALIZED unigram layer ([[langFreq]] aggregated, vocab-
    * sized), split at [[RarityHeadCut]] so the Zipf head (a few hundred
    * tokens carrying most token mass) joins broadcast and only the tail
    * takes the shuffle join; the corpus-total scalar rides a 1-row
    * broadcast (the broadcast-totals idiom, never a global window).
    *
    * Cross-engine floats: each per-token term `log2 N − log2 c` is
    * quantized to the 1e-9 grid ([[Dedup.gridL]]) so the SUM is exact
    * integer arithmetic (order-independent AND engine-identical — libm
    * log ulp skew is ~1e-14 on these magnitudes, far inside the grid);
    * `ppl` re-grids the single `pow(2, xent)` at 1e-6 (ppl is bounded by
    * corpus token count N, and N·1e6 stays inside double-exact range at
    * every soak scale, where N·1e9 would not).
    */
  def ta12(s: SparkSession, dir: String): DataFrame = {
    // served from the docfeats layer since r15: probes are the per-doc
    // unigram HISTOGRAM (distinct tokens per doc — a strict subset of
    // the occurrence stream) against the int-keyed model table; the
    // per-token term g_uni comes PRE-QUANTIZED from the uniprobid
    // layer (same grid formula), and c·g products are exact integer
    // arithmetic, so the result is bit-identical to ta12Legacy
    // (DocFeatsSpec pins ≡). No tokenize, no string keys, and the
    // Zipf head still broadcasts.
    val hist = TextFeatures.docFeats(s, dir)
      .select(col("doc_id"), explode(col("uni")).as("u"))
      .select(col("doc_id"), col("u.id").as("tok_id"),
        col("u.c").cast("long").as("n"))
    val up = TextFeatures.uniProbId(s, dir)
    val head = up.filter(col("c") >= RarityHeadCut)
      .select(col("tok_id"), col("g_uni"))
    val tail = up.filter(col("c") < RarityHeadCut)
      .select(col("tok_id"), col("g_uni"))
    val scored = hist.join(broadcast(head), Seq("tok_id"))
      .unionByName(hist.join(tail, Seq("tok_id")))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(sum(col("n")).cast("long").as("n_tokens"),
        (sum(col("n") * col("g_uni")).cast("double") / 1e9
          / sum(col("n")).cast("double")).as("xent"))
    val p = pow(lit(2.0), col("xent")) * 1e6
    perDoc
      .withColumn("ppl",
        (when(p >= 0, floor(p + 0.5)).otherwise(ceil(p - 0.5)).cast("long")
          .cast("double") / 1e6).as("ppl"))
      .orderBy("doc_id")
  }

  /** The pre-layer ta12 (tokenize + string-keyed probe per query) —
    * parity anchor for DocFeatsSpec. */
  private[graft] def ta12Legacy(s: SparkSession, dir: String): DataFrame = {
    val tk = Tables.documents(s, dir)
      .select(col("doc_id"), explode(ws).as("tok"))
      .filter(col("tok") =!= "")
    val freq = uniFreq(s, dir)
    val nTot = freq.agg(sum(col("c")).cast("long").as("nc"))
    val head = freq.filter(col("c") >= RarityHeadCut)
    val tail = freq.filter(col("c") < RarityHeadCut)
    val scored = tk.join(broadcast(head), Seq("tok"))
      .unionByName(tk.join(tail, Seq("tok")))
    val term = Dedup.gridL(
      log(2.0, col("nc").cast("double")) - log(2.0, col("c").cast("double")))
    val perDoc = scored.crossJoin(broadcast(nTot))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(term).cast("double") / 1e9 / count(lit(1)).cast("double"))
          .as("xent"))
    val p = pow(lit(2.0), col("xent")) * 1e6
    perDoc
      .withColumn("ppl",
        (when(p >= 0, floor(p + 0.5)).otherwise(ceil(p - 0.5)).cast("long")
          .cast("double") / 1e6).as("ppl"))
      .orderBy("doc_id")
  }

  val ta12Sql: String =
    s"""WITH $wsSqlCte,
       |tk AS (SELECT doc_id, unnest(ws) AS tok FROM w),
       |tkf AS (SELECT doc_id, tok FROM tk WHERE tok <> ''),
       |freq AS (SELECT tok, COUNT(*) AS c FROM tkf GROUP BY tok),
       |n AS (SELECT CAST(SUM(c) AS BIGINT) AS nc FROM freq),
       |j AS (SELECT doc_id,
       |             CAST(ROUND((log2(CAST(nc AS DOUBLE)) - log2(CAST(c AS DOUBLE))) * 1e9)
       |                  AS BIGINT) AS g
       |      FROM tkf JOIN freq USING (tok) CROSS JOIN n),
       |d AS (SELECT doc_id, COUNT(*) AS n_tokens,
       |             CAST(SUM(g) AS DOUBLE) / 1e9 / CAST(COUNT(*) AS DOUBLE) AS xent
       |      FROM j GROUP BY doc_id)
       |SELECT doc_id, n_tokens, xent,
       |       CAST(CAST(ROUND(pow(2.0, xent) * 1e6) AS BIGINT) AS DOUBLE) / 1e6 AS ppl
       |FROM d ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- ta13
  /** Hashed-feature-classifier feature dimension: tokens hash into this
    * many weight buckets (fastText's `-hash` bucket table). Constant and
    * model-sized — the entire parameter set of the linear model is
    * [[ClfFeatDim]] longs, which is why the serving path may load it
    * driver-side and ship it inside the plan. */
  val ClfFeatDim = 4096

  /** The classifier weight table as a BUILT ARTIFACT (r8 verdict #2):
    * (feature INT, w_milli LONG), exactly [[ClfFeatDim]] rows, stored as
    * a parquet layer like every other model artifact — a real fastText
    * export (feature-hash → weight, quantized to milli-units) drops into
    * this table without touching the serving plan ([[ta13With]] is the
    * swap hook, spec-pinned). The shipped FIXTURE weights are a
    * deterministic synthetic export: `w_milli(f) = h60(str(f)) mod 2001
    * − 1000` — uniform in [−1, 1] milli-units — so the DuckDB oracle can
    * regenerate the table in closed form.
    */
  private[graft] def clfWeights(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "clfw", dir,
      () => s.range(0, ClfFeatDim.toLong)
        .select(col("id").cast("int").as("feature"),
          (Dedup.h60(col("id").cast("string")) % 2001L - 1000L).as("w_milli")),
      Seq("feature"), Seq("feature"), variant = s"_d$ClfFeatDim")

  /** Hashed-feature linear classifier scoring — the fastText/CCNet-style
    * model-based quality filter's SERVING shape: tokens → feature hash →
    * weight-table lookup → mean margin → sigmoid → keep/drop. The
    * weights are DATA (the [[clfWeights]] parquet artifact), not code:
    * swapping the table changes scores with an identical plan, i.e. a
    * real trained export deploys as a table drop-in.
    *
    * Scale posture: ZERO-shuffle map-side column program. The weight
    * table is loaded once driver-side ([[ClfFeatDim]] rows — the model's
    * whole parameter set, a MODEL LOAD, not a data collect) and shipped
    * as an array literal inside the plan: per-token scoring is
    * `element_at(weights, h60(tok) mod ClfFeatDim)` inside higher-order
    * array functions (filter → aggregate) — no explode, no join, no
    * shuffle; this is precisely the "broadcast the model" step of a
    * fastText deployment. Per-doc margin accumulates in exact INTEGER
    * weight-millis (the /1000 division happens once per doc, after the
    * sum), so no float-order or engine skew exists anywhere before the
    * final sigmoid, which is re-gridded at 1e-9 ([[Dedup.gridL]] — the
    * margin is bounded in [−1, 1], sigmoid in [0.27, 0.73], ulp skew in
    * libm exp is ~1e-16 here).
    *
    * Docs with no non-empty token have no margin and are excluded (same
    * contract as the shingle family's ≥n-token floor).
    */
  def ta13(s: SparkSession, dir: String): DataFrame =
    // served from the docfeats layer since r15: the per-doc classifier
    // FEATURE HISTOGRAM (feat domain ≤ ClfFeatDim) is stored, so
    // serving is a pure map-side fold over ≤ distinct-features-per-doc
    // entries — no tokenize, no per-occurrence hashing, still zero
    // shuffle, and the weights stay data (same swap contract:
    // ta13Layered takes any (feature, w_milli) table; ta13With remains
    // the text-path anchor, DocFeatsSpec pins ≡ for default AND
    // swapped weights). Size-gated since r16
    // ([[DedupPrepare.serveDocfeatsLayered]]): below the crossover the
    // legacy one-pass kernel scan is strictly cheaper than the layer
    // read's task floor.
    if (DedupPrepare.serveDocfeatsLayered(s, dir))
      ta13Layered(s, dir, clfWeights(s, dir))
    else ta13With(s, dir, clfWeights(s, dir))

  /** [[ta13]] off the layer against an explicit weight table. */
  private[graft] def ta13Layered(s: SparkSession, dir: String,
      weights: DataFrame): DataFrame = {
    val wArr = new Array[Long](ClfFeatDim)
    weights.select(col("feature"), col("w_milli")).collect()
      .foreach(r => wArr(r.getInt(0)) = r.getLong(1))
    val wLit = typedlit(wArr.toSeq)
    // exact integer accumulation in weight-millis, same as clf_margin's
    // fold — the sum is order-independent, so histogram order (sorted
    // by feature in the layer) vs document order cannot matter
    val wm = aggregate(col("clf"), lit(0L),
      (acc, x) => acc + x.getField("c").cast("long") *
        element_at(wLit, x.getField("f") + 1))
    val margin =
      (col("w_milli").cast("double") / 1000.0) / col("n_tokens").cast("double")
    val sig = lit(1.0) / (lit(1.0) + exp(-col("margin")))
    TextFeatures.docFeats(s, dir)
      .select(col("doc_id"), col("n_tokens").cast("int").as("n_tokens"),
        wm.as("w_milli"))
      .filter(col("n_tokens") > 0)
      .withColumn("margin", margin)
      .withColumn("score", Dedup.gridL(sig).cast("double") / 1e9)
      .withColumn("keep", (col("score") >= 0.5).cast("int"))
      .select("doc_id", "n_tokens", "margin", "score", "keep")
      .transform(Present.sorted(_, "doc_id"))
  }

  /** [[ta13]] against an explicit weight table — the swap hook: the spec
    * feeds an alternative (feature, w_milli) relation and pins that
    * scores change while the plan shape does not. */
  private[graft] def ta13With(s: SparkSession, dir: String,
      weights: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val wArr = new Array[Long](ClfFeatDim)
    weights.select(col("feature"), col("w_milli")).collect()
      .foreach(r => wArr(r.getInt(0)) = r.getLong(1))
    // tokenize + hash + lookup + accumulate fused in the compiled
    // clf_margin kernel (r9 verdict #8 — the per-token md5 h60 was the
    // suite's sf10 hot loop; poly131 is one multiply-add per code point)
    val cm = call_function("clf_margin", col("text"), typedlit(wArr.toSeq))
    val margin =
      (col("w_milli").cast("double") / 1000.0) / col("n_tokens").cast("double")
    val sig = lit(1.0) / (lit(1.0) + exp(-col("margin")))
    Tables.documents(s, dir)
      .select(col("doc_id"), cm.as("cm"))
      .select(col("doc_id"), col("cm.n_tokens").as("n_tokens"),
        col("cm.w_milli").as("w_milli"))
      .filter(col("n_tokens") > 0)
      .withColumn("margin", margin)
      .withColumn("score", Dedup.gridL(sig).cast("double") / 1e9)
      .withColumn("keep", (col("score") >= 0.5).cast("int"))
      .select("doc_id", "n_tokens", "margin", "score", "keep")
      .transform(Present.sorted(_, "doc_id"))
  }

  /** The oracle twin of [[graft.functions.ClfMargin.poly131]]. */
  private[operators] def poly131Sql(t: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(regexp_extract_all($t, '.'), " +
      s"c -> CAST(ord(c) AS BIGINT))), (a, b) -> (a * 131 + b) % 1000000007)"

  val ta13Sql: String = {
    // the oracle regenerates the weight TABLE's fixture formula in
    // closed form: feature = poly131(tok) mod ClfFeatDim, then
    // w_milli = h60(str(feature)) mod 2001 − 1000 (the weight TABLE
    // keeps its md5 fixture formula — it is data, built once per model)
    val feat = s"(${poly131Sql("t")} % $ClfFeatDim)"
    val wOfT = s"CAST(concat('0x', substr(md5(CAST($feat AS VARCHAR)), 1, 15)) AS BIGINT) % 2001 - 1000"
    s"""WITH $wsSqlCte,
       |m AS (SELECT doc_id,
       |             CAST(len(list_filter(ws, t -> t <> '')) AS INT) AS n_tokens,
       |             CAST(coalesce(list_sum(list_transform(
       |               list_filter(ws, t -> t <> ''),
       |               t -> $wOfT)), 0) AS BIGINT) AS w_milli
       |      FROM w),
       |d AS (SELECT doc_id, n_tokens,
       |             (CAST(w_milli AS DOUBLE) / 1000.0) / CAST(n_tokens AS DOUBLE) AS margin
       |      FROM m WHERE n_tokens > 0)
       |SELECT doc_id, n_tokens, margin,
       |       CAST(CAST(ROUND((1.0 / (1.0 + exp(-margin))) * 1e9) AS BIGINT) AS DOUBLE)
       |         / 1e9 AS score,
       |       CAST(CAST(CAST(ROUND((1.0 / (1.0 + exp(-margin))) * 1e9) AS BIGINT) AS DOUBLE)
       |         / 1e9 >= 0.5 AS INT) AS keep
       |FROM d ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- ta14
  /** KenLM-style pruning: bigrams with corpus count below this are cut
    * from the model table and served by backoff instead — part of the
    * operator's semantics (the oracle applies the same cut), like dd04's
    * df-cut. Without it an in-corpus LM would never back off (every
    * scored bigram exists at least once in its own corpus). */
  val BigramMinCount = 2L

  /** Stupid-backoff discount (Brants et al. 2007, "Large Language
    * Models in Machine Translation"): p(t2|t1) ≈ α·p(t2) when the
    * bigram is absent from the pruned model. */
  val BackoffAlpha = 0.4

  /** Per-token log-prob table (tok, c, g_uni, g_back) — the KenLM
    * serving FORMAT: the model artifact stores quantized −log₂
    * probabilities, not counts, so query-time scoring is lookup + exact
    * integer sum with zero per-row float math. `g_uni` = grid(log₂N −
    * log₂c) (unigram cost — also the first-token term), `g_back` =
    * grid(log₂N − log₂(α·c)) (the stupid-backoff cost). Both are
    * 1e-9-grid longs ([[Dedup.gridL]]); the corpus-total scalar is a
    * 1-row broadcast folded in at BUILD time, so no query ever pays it.
    * Bucketed by tok: the Zipf head/tail lookup joins read pre-clustered
    * buckets. */
  private[graft] def uniProb(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "uniprob", dir,
      () => {
        val f = uniFreq(s, dir)
        val tot = f.agg(sum(col("c")).cast("long").as("nc"))
        f.crossJoin(broadcast(tot))
          .select(col("tok"), col("c").cast("long").as("c"),
            Dedup.gridL(log(2.0, col("nc").cast("double")) -
              log(2.0, col("c").cast("double"))).as("g_uni"),
            Dedup.gridL(log(2.0, col("nc").cast("double")) -
              log(2.0, lit(BackoffAlpha) * col("c").cast("double"))).as("g_back"))
      },
      Seq("tok"), Seq("tok"))

  /** Adjacent token pairs (doc_id, t1, t2) — map-side off the scan
    * (sequence + element_at, no self-join; [[Dedup.wordShingles]]'s
    * idiom over the empty-filtered token list). */
  private def bigramPairs(docs: DataFrame): DataFrame = {
    val t = filter(ws, x => x =!= "")
    docs.select(col("doc_id"), t.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(sequence(lit(2), size(col("t")))).as("i"), col("t"))
      .select(col("doc_id"),
        element_at(col("t"), col("i") - 1).as("t1"),
        element_at(col("t"), col("i")).as("t2"))
  }

  /** The pruned bigram log-prob table (t1, t2, g) — the model's bigram
    * section: g = grid(log₂c(t1) − log₂c(t1,t2)) = −log₂p(t2|t1) for
    * every bigram with count ≥ [[BigramMinCount]]. Bucketed by (t1, t2)
    * so the scoring left-join shuffles only the probe side. The corpus
    * bigram aggregate and the unigram-denominator join are paid once
    * per corpus at build, amortized like the unigram layer. */
  private[graft] def bigramProb(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "biprob", dir,
      () => bigramPairs(Tables.documents(s, dir))
        .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("c12"))
        .filter(col("c12") >= BigramMinCount)
        .join(uniFreq(s, dir).withColumnRenamed("tok", "t1"), Seq("t1"))
        .select(col("t1"), col("t2"), col("c12"),
          Dedup.gridL(log(2.0, col("c").cast("double")) -
            log(2.0, col("c12").cast("double"))).as("g")),
      Seq("t1", "t2"), Seq("t1", "t2"), variant = s"_mc${BigramMinCount}c")

  /** Broadcast-size cap for the bigram HEAD table: the Zipf² analogue
    * of [[RarityHeadCut]] (r10 verdict #4). A count threshold would
    * grow the head with the corpus; a fixed top-K keeps the broadcast
    * bounded at any scale (256k rows ≈ 10–15 MB) while hot pairs ("of
    * the") still carry the squared-Zipf share of the probe mass —
    * measured 59% of all sf10 bigram occurrences. */
  val BigramHeadK = 262144

  /** The top-[[BigramHeadK]] bigram model rows by corpus count — the
    * broadcast side of ta14's split probe. Deterministic under ties
    * ((c12, t1, t2) ordering), though head membership only moves WORK
    * between the broadcast and shuffle branches, never scores: the
    * shuffle branch probes the FULL model table, so a head miss is
    * simply a colder path to the same g. */
  private[graft] def bigramHead(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "bighead", dir,
      () => bigramProb(s, dir)
        .orderBy(col("c12").desc, col("t1"), col("t2")).limit(BigramHeadK)
        .select(col("t1"), col("t2"), col("g")),
      Seq("t1", "t2"), Seq("t1", "t2"),
      variant = s"_mc${BigramMinCount}_k$BigramHeadK")

  /** Bigram-LM cross-entropy / perplexity with stupid backoff — the
    * actual KenLM serving shape (r8 verdict #3, upgrading [[ta12]]'s
    * unigram LM): per doc, the first token costs its unigram −log₂p and
    * every following token costs −log₂p(t2|t1) from the pruned bigram
    * table, falling back to α-discounted unigram cost when the bigram
    * was pruned. All per-token costs come PRE-QUANTIZED from the model
    * layers, so the per-doc sum is exact integer arithmetic
    * (order-independent, engine-identical) and query-time float math is
    * two scalar ops per doc (the /n division and 2^xent).
    *
    * Scale posture: bigram extraction is map-side; the model lookup is
    * SPLIT like the unigram side (r10 verdict #4) — probe rows hitting
    * the broadcast [[bigramHead]] (the top-[[BigramHeadK]] pairs, the
    * squared-Zipf mass: "of the"-class bigrams) never shuffle, flowing
    * map-side into the per-doc aggregate's partial combine; only head
    * misses shuffle into the (t1,t2)-bucketed full model table (a JOIN,
    * so AQE skew-split applies, never a single-task window). When the
    * whole model fits under the head cap (small corpora — a stats-
    * driven flip, decided from the head layer's own bounded count), the
    * shuffle branch is elided entirely. Unigram lookups (first token +
    * backoff, both keyed on guaranteed-Zipf-skewed single tokens) ride
    * the [[RarityHeadCut]] head-broadcast/tail-join split, ta09/ta12's
    * idiom.
    */
  def ta14(s: SparkSession, dir: String): DataFrame = {
    // served from the docfeats layer since r15: the bigram stream is a
    // map-side transform over the stored int-id sequence (no corpus
    // re-tokenize — the single largest warm cost of the sf10 record),
    // probe keys are ONE packed long instead of two strings (the head
    // broadcast shrinks ~4×, hashing is a long compare), and the
    // model tables are the id-keyed derives with bit-identical g
    // values. Branch partials, integer sums, and the final division
    // are unchanged, so output ≡ ta14PartialWith ≡ ta14With
    // (DocFeatsSpec + Ta14PlanSpec pin the chain). The string-keyed
    // KenLM swap contract lives on in [[ta14With]]. Size-gated since
    // r16 ([[DedupPrepare.serveDocfeatsLayered]]): at tiny scale the
    // layered chain's extra stages (layer reads + id-keyed model
    // derives) cost more than the legacy single-pass probe — the
    // driver's sf0.1 board read 0.32× — while sf10 keeps the ~4× win.
    if (!DedupPrepare.serveDocfeatsLayered(s, dir)) return ta14Legacy(s, dir)
    val head = TextFeatures.bigHeadId(s, dir)
    val coversAll = head.count() < BigramHeadK
    ta14LayeredWith(s, dir, TextFeatures.uniProbId(s, dir),
      TextFeatures.biProbId(s, dir), Some((head, coversAll)))
  }

  /** The pre-layer ta14 (tokenize + string-keyed probes per query) —
    * parity anchor for DocFeatsSpec. */
  private[graft] def ta14Legacy(s: SparkSession, dir: String): DataFrame = {
    val head = bigramHead(s, dir)
    val coversAll = head.count() < BigramHeadK
    // the per-branch partial-aggregate plan (r12 adoption):
    // bit-identical to [[ta14With]] (spec-pinned + the committed sf10
    // A/B's exact-equality check), 0.83× its wall at sf10
    ta14PartialWith(s, dir, uniProb(s, dir), bigramProb(s, dir),
      Some((head, coversAll)))
  }

  /** [[ta14PartialWith]] re-expressed over the docfeats layer's id
    * stream and the id-keyed model tables: `up` = (tok_id, c, g_uni,
    * g_back), `bp` = (bg, c12, g) with bg the packed bigram id. Plan
    * shape identical to the partial form — per-branch map-side partial
    * aggregates, head-broadcast/shuffle split, stats-driven
    * shuffle-branch elision — only the keys changed width. */
  private[graft] def ta14LayeredWith(s: SparkSession, dir: String,
      up: DataFrame, bp: DataFrame,
      head: Option[(DataFrame, Boolean)] = None): DataFrame = {
    val df = Present.pooled(TextFeatures.docFeats(s, dir)
      .filter(col("n_tokens") >= 1)
      .select(col("doc_id"), col("ids")))
    val first = df.select(col("doc_id"),
      element_at(col("ids"), 1).as("tok_id"))
    val bg = df.filter(size(col("ids")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(2), size(col("ids"))),
          i => TextFeatures.packBg(element_at(col("ids"), i - 1),
            element_at(col("ids"), i)))).as("bg"))
    val bpg = bp.select(col("bg"), col("g"))
    val uhead = up.filter(col("c") >= RarityHeadCut)
    val utail = up.filter(col("c") < RarityHeadCut)
    def lookup(rel: DataFrame): DataFrame =
      rel.join(broadcast(uhead), Seq("tok_id"))
        .unionByName(rel.join(utail, Seq("tok_id")))
    val hj = head match {
      case Some((hd, _)) => bg.join(
        broadcast(hd.select(col("bg"), col("g").as("g_h"))),
        Seq("bg"), "left")
      case None => bg.withColumn("g_h", lit(null).cast("long"))
    }
    def part(rel: DataFrame, g: Column, isBg: Int, isBack: Int): DataFrame =
      rel.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"), sum(g).as("g_sum"))
        .select(col("doc_id"), col("n"),
          (lit(isBg.toLong) * col("n")).as("n_bg"),
          (lit(isBack.toLong) * col("n")).as("n_back"), col("g_sum"))
    val headPart = part(hj.filter(col("g_h").isNotNull), col("g_h"), 1, 0)
    val miss = hj.filter(col("g_h").isNull).select("doc_id", "bg")
    val tj = head match {
      case Some((_, true)) => miss.withColumn("g", lit(null).cast("long"))
      case _ => miss.join(bpg, Seq("bg"), "left")
    }
    val tailPart = part(tj.filter(col("g").isNotNull), col("g"), 1, 0)
    val backPart = part(lookup(
      tj.filter(col("g").isNull).select(col("doc_id"),
        TextFeatures.bgT2(col("bg")).as("tok_id"))),
      col("g_back"), 0, 1)
    val firstPart = part(lookup(first), col("g_uni"), 0, 0)
    val perDoc = headPart.unionByName(tailPart).unionByName(backPart)
      .unionByName(firstPart)
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).cast("long").as("n_tokens"),
        sum(col("n_bg")).cast("long").as("n_bigrams"),
        sum(col("n_back")).cast("long").as("n_backoff"),
        (sum(col("g_sum")).cast("double") / 1e9
          / sum(col("n")).cast("double")).as("xent"))
    val p = pow(lit(2.0), col("xent")) * 1e6
    perDoc
      .withColumn("ppl",
        when(p >= 0, floor(p + 0.5)).otherwise(ceil(p - 0.5)).cast("long")
          .cast("double") / 1e6)
      .orderBy("doc_id")
  }

  /** [[ta14]] against explicit model tables — the weights-as-data swap
    * hook (ta13's contract): `up` is the per-token table
    * (tok, c, g_uni, g_back), `bp` the pruned bigram table (t1, t2, g).
    * A KenLM export quantized to the 1e-9 grid drops into these two
    * tables without touching the plan; the spec pins that swapped
    * tables change scores under the same plan shape. */
  private[graft] def ta14With(s: SparkSession, dir: String,
      up: DataFrame, bp: DataFrame,
      head: Option[(DataFrame, Boolean)] = None): DataFrame = {
    val t = filter(ws, x => x =!= "")
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), t.as("t")).filter(size(col("t")) >= 1)
    val first = docs.select(col("doc_id"), element_at(col("t"), 1).as("tok"))
    val bg = bigramPairs(Tables.documents(s, dir))
    val bpg = bp.select(col("t1"), col("t2"), col("g"))
    val uhead = up.filter(col("c") >= RarityHeadCut)
    val utail = up.filter(col("c") < RarityHeadCut)
    def lookup(rel: DataFrame): DataFrame =
      rel.join(broadcast(uhead), Seq("tok"))
        .unionByName(rel.join(utail, Seq("tok")))
    // head = Some((table, coversAll)): the broadcast/shuffle split —
    // `table` must be a SUBSET of `bp` (same g values), `coversAll`
    // asserts it is ALL of bp so the shuffle branch can be elided.
    //
    // The repartition(doc_id) right after the broadcast head join is
    // the plan's SHARING POINT (r10 verdict #4 follow-through): the
    // probe stream has up to five consumers (head-matched terms, tail-
    // matched terms, backoff head/tail lookups), and DataFrame plans
    // are trees — without an exchange at the fork, every consumer
    // re-runs the corpus scan + explode (measured: the naive union
    // form at sf10 ran FIVE probe scans, 39 s -> 49 s). With it, all
    // consumers reuse the one shuffle (ReuseExchange), the scan runs
    // once, and hash(doc_id) is exactly what the final per-doc
    // aggregate wants.
    val hj = head match {
      case Some((hd, _)) => bg.join(
        broadcast(hd.select(col("t1"), col("t2"), col("g").as("g_h"))),
        Seq("t1", "t2"), "left")
      case None => bg.withColumn("g_h", lit(null).cast("long"))
    }
    val e = hj.repartition(col("doc_id"))
    val headTerms = e.filter(col("g_h").isNotNull)
      .select(col("doc_id"), col("g_h").as("g"),
        lit(1L).as("is_bg"), lit(0L).as("is_back"))
    val miss = e.filter(col("g_h").isNull).select("doc_id", "t1", "t2")
    // head misses probe the full model table — unless the head IS the
    // whole model (small corpora: a stats-driven flip decided from the
    // head layer's bounded count), where a miss can only be a backoff
    val tj = head match {
      case Some((_, true)) => miss.withColumn("g", lit(null).cast("long"))
      case _ => miss.join(bpg, Seq("t1", "t2"), "left")
    }
    val tailTerms = tj.filter(col("g").isNotNull)
      .select(col("doc_id"), col("g"), lit(1L).as("is_bg"), lit(0L).as("is_back"))
    val backTerms = lookup(
        tj.filter(col("g").isNull).select(col("doc_id"), col("t2").as("tok")))
      .select(col("doc_id"), col("g_back").as("g"),
        lit(0L).as("is_bg"), lit(1L).as("is_back"))
    val firstTerms = lookup(first)
      .select(col("doc_id"), col("g_uni").as("g"),
        lit(0L).as("is_bg"), lit(0L).as("is_back"))
    val perDoc = headTerms.unionByName(tailTerms).unionByName(backTerms)
      .unionByName(firstTerms)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("is_bg")).cast("long").as("n_bigrams"),
        sum(col("is_back")).cast("long").as("n_backoff"),
        (sum(col("g")).cast("double") / 1e9 / count(lit(1)).cast("double"))
          .as("xent"))
    val p = pow(lit(2.0), col("xent")) * 1e6
    perDoc
      .withColumn("ppl",
        when(p >= 0, floor(p + 0.5)).otherwise(ceil(p - 0.5)).cast("long")
          .cast("double") / 1e6)
      .orderBy("doc_id")
  }

  /** The SHIPPED ta14 plan (adopted r12 after the committed sf10 A/B:
    * exact-equality diff 0, warm median 26.9 s vs 32.3 s = 0.83×):
    * [[ta14With]] re-planned with per-branch PARTIAL per-doc aggregates
    * — instead of repartition(doc_id)-ing the FULL probe stream so four
    * consumers can share one scan, each branch folds to
    * (doc_id, n, g_sum) partials the moment it knows its g — the
    * head-matched squared-Zipf mass (59% of pairs at sf10) then
    * collapses MAP-SIDE in its partial HashAggregate and never
    * shuffles at all. The probe scan runs twice (head branch + miss
    * branch; the miss join's exchange is shared by tail/backoff via
    * ReuseExchange) — with tok_split the second scan is cheaper than
    * repartitioning ~100M pair rows. Same integer sums, same counts,
    * same division → bit-identical output to [[ta14With]], which stays
    * as the reference form for the parity spec and the swap-hook
    * contract. */
  private[graft] def ta14PartialWith(s: SparkSession, dir: String,
      up: DataFrame, bp: DataFrame,
      head: Option[(DataFrame, Boolean)] = None): DataFrame = {
    val t = filter(ws, x => x =!= "")
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), t.as("t")).filter(size(col("t")) >= 1)
    val first = docs.select(col("doc_id"), element_at(col("t"), 1).as("tok"))
    val bg = bigramPairs(Tables.documents(s, dir))
    val bpg = bp.select(col("t1"), col("t2"), col("g"))
    val uhead = up.filter(col("c") >= RarityHeadCut)
    val utail = up.filter(col("c") < RarityHeadCut)
    def lookup(rel: DataFrame): DataFrame =
      rel.join(broadcast(uhead), Seq("tok"))
        .unionByName(rel.join(utail, Seq("tok")))
    val hj = head match {
      case Some((hd, _)) => bg.join(
        broadcast(hd.select(col("t1"), col("t2"), col("g").as("g_h"))),
        Seq("t1", "t2"), "left")
      case None => bg.withColumn("g_h", lit(null).cast("long"))
    }
    def part(rel: DataFrame, g: Column, isBg: Int, isBack: Int): DataFrame =
      rel.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"), sum(g).as("g_sum"))
        .select(col("doc_id"), col("n"),
          (lit(isBg.toLong) * col("n")).as("n_bg"),
          (lit(isBack.toLong) * col("n")).as("n_back"), col("g_sum"))
    val headPart = part(hj.filter(col("g_h").isNotNull), col("g_h"), 1, 0)
    val miss = hj.filter(col("g_h").isNull).select("doc_id", "t1", "t2")
    val tj = head match {
      case Some((_, true)) => miss.withColumn("g", lit(null).cast("long"))
      case _ => miss.join(bpg, Seq("t1", "t2"), "left")
    }
    val tailPart = part(tj.filter(col("g").isNotNull), col("g"), 1, 0)
    val backPart = part(lookup(
      tj.filter(col("g").isNull).select(col("doc_id"), col("t2").as("tok"))),
      col("g_back"), 0, 1)
    val firstPart = part(lookup(first), col("g_uni"), 0, 0)
    val perDoc = headPart.unionByName(tailPart).unionByName(backPart)
      .unionByName(firstPart)
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).cast("long").as("n_tokens"),
        sum(col("n_bg")).cast("long").as("n_bigrams"),
        sum(col("n_back")).cast("long").as("n_backoff"),
        (sum(col("g_sum")).cast("double") / 1e9
          / sum(col("n")).cast("double")).as("xent"))
    val p = pow(lit(2.0), col("xent")) * 1e6
    perDoc
      .withColumn("ppl",
        when(p >= 0, floor(p + 0.5)).otherwise(ceil(p - 0.5)).cast("long")
          .cast("double") / 1e6)
      .orderBy("doc_id")
  }

  val ta14Sql: String =
    s"""WITH $wsSqlCte,
       |fq AS (SELECT doc_id, list_filter(ws, x -> x <> '') AS t FROM w),
       |tk AS (SELECT doc_id, unnest(t) AS tok FROM fq),
       |c1 AS (SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok),
       |n AS (SELECT CAST(SUM(c) AS BIGINT) AS nc FROM c1),
       |up AS (SELECT tok, c,
       |              CAST(ROUND((log2(CAST(nc AS DOUBLE)) - log2(CAST(c AS DOUBLE))) * 1e9) AS BIGINT) AS g_uni,
       |              CAST(ROUND((log2(CAST(nc AS DOUBLE)) - log2($BackoffAlpha * CAST(c AS DOUBLE))) * 1e9) AS BIGINT) AS g_back
       |       FROM c1 CROSS JOIN n),
       |bgi AS (SELECT doc_id, t, unnest(range(2, len(t) + 1)) AS i
       |        FROM fq WHERE len(t) >= 2),
       |bgq AS (SELECT doc_id, t[i - 1] AS t1, t[i] AS t2 FROM bgi),
       |big AS (SELECT t1, t2, COUNT(*) AS c12 FROM bgq
       |        GROUP BY 1, 2 HAVING COUNT(*) >= $BigramMinCount),
       |bp AS (SELECT big.t1, big.t2,
       |              CAST(ROUND((log2(CAST(c1.c AS DOUBLE)) - log2(CAST(c12 AS DOUBLE))) * 1e9) AS BIGINT) AS g
       |       FROM big JOIN c1 ON big.t1 = c1.tok),
       |fr AS (SELECT doc_id, t[1] AS tok FROM fq WHERE len(t) >= 1),
       |bj AS (SELECT bgq.doc_id, bgq.t2, bp.g
       |       FROM bgq LEFT JOIN bp ON bgq.t1 = bp.t1 AND bgq.t2 = bp.t2),
       |tm AS (SELECT f.doc_id, up.g_uni AS g, 0 AS is_bg, 0 AS is_back
       |       FROM fr f JOIN up ON f.tok = up.tok
       |       UNION ALL
       |       SELECT doc_id, g, 1, 0 FROM bj WHERE g IS NOT NULL
       |       UNION ALL
       |       SELECT bj.doc_id, up.g_back, 0, 1
       |       FROM bj JOIN up ON bj.t2 = up.tok WHERE bj.g IS NULL),
       |d AS (SELECT doc_id, COUNT(*) AS n_tokens,
       |             CAST(SUM(is_bg) AS BIGINT) AS n_bigrams,
       |             CAST(SUM(is_back) AS BIGINT) AS n_backoff,
       |             CAST(SUM(g) AS DOUBLE) / 1e9 / CAST(COUNT(*) AS DOUBLE) AS xent
       |      FROM tm GROUP BY doc_id)
       |SELECT doc_id, n_tokens, n_bigrams, n_backoff, xent,
       |       CAST(CAST(ROUND(pow(2.0, xent) * 1e6) AS BIGINT) AS DOUBLE) / 1e6 AS ppl
       |FROM d ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- ta15
  /** Sequence-length distribution audit — the context-length-planning
    * report every pretraining run starts from: per (lang, log₂ length
    * bucket) doc counts, token mass, and the within-lang doc/token
    * shares + cumulative token mass (what fraction of trainable tokens
    * fits under a candidate context length; which buckets sp06's
    * packing must split). The bucket is the INTEGER log₂ — computed as
    * `length(bin(n_tokens)) − 1`, never floor(log2(x)) (log2 of an
    * exact power of two can come back 2.999… in one libm and 3.0 in the
    * other, flipping the bucket; the binary-string length is exact in
    * both engines).
    *
    * Scale posture: map-side token count off the scan, one shuffle on
    * the tiny (lang, bucket) keyspace; the share/cumulative windows run
    * over the bucket-cardinality-bounded audit relation, never the
    * corpus.
    */
  def ta15(s: SparkSession, dir: String): DataFrame = {
    // served from the docfeats layer since r15: the only per-doc inputs
    // are (lang, non-empty token count) — the layer's n_tokens plus a
    // text-free pruned documents scan for lang; the corpus text scan +
    // tokenize kernel are gone. Inclusion rule is the DECLARED oracle
    // semantics (n_tokens > 0). On every oracle-checked corpus this is
    // exactly [[ta15Legacy]]'s trim-gate (DocFeatsSpec pins ≡ there);
    // the two diverge only on whitespace-only docs that contain
    // non-space whitespace ("\t"), where the legacy kernel counted the
    // split's EMPTY fields (n_ws_tokens=2 for "\t") and emitted a row
    // its own declared oracle excludes — the layer path fixes that
    // latent divergence (spec-pinned in DocFeatsSpec with the fixture
    // that triggers it). Size-gated since r16
    // ([[DedupPrepare.serveDocfeatsLayered]]); on every oracle-checked
    // corpus the two forms are row-identical, so the gate only moves
    // execution strategy.
    if (!DedupPrepare.serveDocfeatsLayered(s, dir)) return ta15Legacy(s, dir)
    val grouped = TextFeatures.docFeats(s, dir)
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
      .join(Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .withColumn("bucket", (length(bin(col("n_tokens"))) - 1).cast("int"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"))
    val wl = Window.partitionBy(col("lang"))
    val wcum = Window.partitionBy(col("lang")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped
      .withColumn("lo_tokens", expr("shiftleft(CAST(1 AS BIGINT), bucket)"))
      .withColumn("doc_share",
        col("n_docs").cast("double") /
          sum(col("n_docs")).over(wl).cast("double"))
      .withColumn("token_share",
        col("sum_tokens").cast("double") /
          sum(col("sum_tokens")).over(wl).cast("double"))
      .withColumn("cum_token_share",
        sum(col("sum_tokens")).over(wcum).cast("double") /
          sum(col("sum_tokens")).over(wl).cast("double"))
      .select("lang", "bucket", "lo_tokens", "n_docs", "sum_tokens",
        "doc_share", "token_share", "cum_token_share")
      .orderBy("lang", "bucket")
  }

  /** The pre-layer ta15 (text scan + text_metrics kernel per query) —
    * parity anchor for DocFeatsSpec. Carries the legacy trim-gate
    * inclusion rule (see [[ta15]]'s note on whitespace-only docs). */
  private[graft] def ta15Legacy(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // token count via the compiled one-pass text_metrics kernel (the
    // ta03 lesson — the HOF filter runs an interpreted lambda per
    // token). A blank doc splits to [""] (n_ws_tokens 1), so gate on
    // trimmed length FIRST; for non-blank text the \s+ split emits no
    // empties, making n_ws_tokens exactly the non-empty token count.
    val grouped = Tables.documents(s, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("lang"),
        call_function("text_metrics", col("text"))
          .getField("n_ws_tokens").cast("long").as("n_tokens"))
      .withColumn("bucket", (length(bin(col("n_tokens"))) - 1).cast("int"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"))
    val wl = Window.partitionBy(col("lang"))
    val wcum = Window.partitionBy(col("lang")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped
      .withColumn("lo_tokens", expr("shiftleft(CAST(1 AS BIGINT), bucket)"))
      .withColumn("doc_share",
        col("n_docs").cast("double") /
          sum(col("n_docs")).over(wl).cast("double"))
      .withColumn("token_share",
        col("sum_tokens").cast("double") /
          sum(col("sum_tokens")).over(wl).cast("double"))
      .withColumn("cum_token_share",
        sum(col("sum_tokens")).over(wcum).cast("double") /
          sum(col("sum_tokens")).over(wl).cast("double"))
      .select("lang", "bucket", "lo_tokens", "n_docs", "sum_tokens",
        "doc_share", "token_share", "cum_token_share")
      .orderBy("lang", "bucket")
  }

  val ta15Sql: String =
    s"""WITH $wsSqlCte,
       |t AS (SELECT lang,
       |             CAST(len(list_filter(ws, x -> x <> '')) AS BIGINT) AS n_tokens
       |      FROM w),
       |b AS (SELECT lang, CAST(length(bin(n_tokens)) - 1 AS INT) AS bucket, n_tokens
       |      FROM t WHERE n_tokens > 0),
       |g AS (SELECT lang, bucket, COUNT(*) AS n_docs,
       |             CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
       |      FROM b GROUP BY 1, 2)
       |SELECT lang, bucket,
       |       CAST(CAST(1 AS BIGINT) << bucket AS BIGINT) AS lo_tokens,
       |       n_docs, sum_tokens,
       |       CAST(n_docs AS DOUBLE)
       |         / CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE) AS doc_share,
       |       CAST(sum_tokens AS DOUBLE)
       |         / CAST(SUM(sum_tokens) OVER (PARTITION BY lang) AS DOUBLE) AS token_share,
       |       CAST(SUM(sum_tokens) OVER (PARTITION BY lang ORDER BY bucket
       |                                  ROWS UNBOUNDED PRECEDING) AS DOUBLE)
       |         / CAST(SUM(sum_tokens) OVER (PARTITION BY lang) AS DOUBLE) AS cum_token_share
       |FROM g ORDER BY lang, bucket""".stripMargin

  /** Registry of this family. */
  // ---------------------------------------------------------------- ta16
  /** Vocabulary size of the encode step. Fixture-scaled: the synthetic
    * corpus has 31 distinct tokens, so 16 leaves a real OOV tail for the
    * hash buckets to catch; a production vocab (32k–256k) is a constant
    * swap — the plan is invariant to it (the table is still a driver-side
    * model load). */
  val VocabSize = 16
  /** UNK hash-bucket count: OOV tokens map to id [[VocabSize]] +
    * h60(tok) mod this — the fastText hashing-trick bucket scheme, so
    * rare tokens keep a stable (if shared) id instead of one UNK. */
  val OovBuckets = 64L

  /** The vocabulary as a MODEL ARTIFACT — (tok, id), id = dense rank by
    * (corpus count desc, tok asc) over the global unigram layer. Built
    * once per corpus like every model table ([[clfWeights]] contract):
    * a real BPE/WordPiece vocab export is a table drop-in. The rank is
    * assigned DRIVER-SIDE on the collected top-[[VocabSize]] rows (a
    * model load — the same consumption pattern ta16 itself uses), not
    * via a partitionless window: keeps the suite's zero-WindowExec-
    * warning invariant (PlanBudgetSpec pins it). */
  private[graft] def vocabLayer(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "vocab", dir, () => {
      val top = uniFreq(s, dir).orderBy(col("c").desc, col("tok"))
        .limit(VocabSize).select("tok").collect().map(_.getString(0))
      val rows = top.zipWithIndex.toSeq
        .map { case (t, i) => Row(t, i.toLong) }
      s.createDataFrame(s.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("tok", StringType, nullable = false),
          StructField("id", LongType, nullable = false))))
    }, Seq("tok"), Seq("tok"), variant = s"_v$VocabSize")

  def ta16(s: SparkSession, dir: String): DataFrame =
    // size-gated since r16 ([[DedupPrepare.serveDocfeatsLayered]]):
    // legacy = the zero-shuffle broadcast-vocab kernel scan, strictly
    // cheaper below the crossover than the layered path's first-8
    // dictionary join stages.
    if (DedupPrepare.serveDocfeatsLayered(s, dir)) ta16Layered(s, dir)
    else ta16With(s, dir, vocabLayer(s, dir))

  /** [[ta16]] served from the docfeats layer (r15 opt): the in-vocab id
    * set is re-keyed to docfeats token ids (16-row model join of two
    * tok-bucketed layers, collected like [[ta16With]]'s model load);
    * n_oov folds over the per-doc unigram histogram (one 16-entry map
    * probe per DISTINCT token instead of per occurrence); ids8 decodes
    * only the FIRST 8 ids of the layer's id stream (the OOV hash rides
    * a broadcast dictionary join of ≤8 rows/doc). No text scan, no
    * per-occurrence tokenize — bit-identical to [[ta16With]] (same
    * h60 fallback, same counts; DocFeatsSpec pins ≡). */
  private[graft] def ta16Layered(s: SparkSession, dir: String): DataFrame = {
    val inv = vocabLayer(s, dir)
      .join(TextFeatures.vocab(s, dir).select(col("tok"), col("tok_id")),
        Seq("tok"))
      .select(col("tok_id"), col("id")).collect()
    val invMap = typedlit(
      inv.map(r => r.getInt(0) -> r.getLong(1)).toMap)
    val df = TextFeatures.docFeats(s, dir)
    val nInv = aggregate(col("uni"), lit(0),
      (acc, x) => acc + when(element_at(invMap, x.getField("id")).isNotNull,
        x.getField("c")).otherwise(lit(0)))
    val base = df.select(col("doc_id"), col("n_tokens"),
      (col("n_tokens") - nInv).cast("int").as("n_oov"), col("ids"))
    val first8 = base
      .select(col("doc_id"),
        posexplode(slice(col("ids"), 1, 8)).as(Seq("pos", "tok_id")))
      .join(broadcast(TextFeatures.vocab(s, dir)
        .select(col("tok_id"), col("tok"))), Seq("tok_id"))
      .select(col("doc_id"), col("pos"),
        coalesce(element_at(invMap, col("tok_id")),
          lit(VocabSize.toLong) + Dedup.h60(col("tok")) % OovBuckets)
          .cast("string").as("idstr"))
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("pos"), col("idstr")))),
        x => x.getField("idstr")), ",").as("ids8"))
    base.select("doc_id", "n_tokens", "n_oov")
      .join(first8, Seq("doc_id"), "left")
      .withColumn("oov_rate",
        when(col("n_tokens") > 0,
          col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .otherwise(0.0))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"), col("oov_rate"),
        coalesce(col("ids8"), lit("")).as("ids8"))
      .transform(Present.sorted(_, "doc_id"))
  }

  /** ta16: VOCABULARY ENCODE — the tokenizer's token→id step plus the
    * per-doc OOV coverage audit a pipeline runs before committing to a
    * vocab. Per document: token count, OOV count/rate under the vocab,
    * and the first 8 encoded ids (comma-joined — the encode itself,
    * pinned end-to-end; a full-width id column is this same transform
    * without the slice). In-vocab tokens get their dense vocab id; OOV
    * tokens get [[VocabSize]] + h60(tok) mod [[OovBuckets]].
    *
    * Scale posture: ZERO-shuffle map-side column program — the vocab is
    * loaded once driver-side (a model load, [[VocabSize]] rows) and
    * shipped as a literal map; per-token encode is `element_at(map,
    * tok)` with the hash fallback inside higher-order array functions.
    * No explode, no join: exactly how a tokenizer deploys on 100 TB
    * (the model rides the closure, the corpus never shuffles). The
    * explicit-vocab hook is the ta13 swap contract: a different vocab
    * changes ids under an identical plan.
    */
  private[graft] def ta16With(s: SparkSession, dir: String,
      vocab: DataFrame): DataFrame = {
    import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
    val rows = vocab.select(col("tok"), col("id")).collect()
    val m = new java.util.HashMap[
      org.apache.spark.unsafe.types.UTF8String, java.lang.Long](rows.length * 2)
    rows.foreach { r =>
      m.put(org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
        java.lang.Long.valueOf(r.getLong(1)))
    }
    val bc = s.sparkContext.broadcast(m)
    val st = ExpressionUtils.column(graft.functions.VocabDocStats(
      ExpressionUtils.expression(ws), bc, VocabSize.toLong, OovBuckets))
    Tables.documents(s, dir)
      .select(col("doc_id"), st.as("st"))
      .select(col("doc_id"),
        col("st.n_tokens").as("n_tokens"),
        col("st.n_oov").as("n_oov"),
        col("st.ids8").as("ids8"))
      .withColumn("oov_rate",
        when(col("n_tokens") > 0,
          col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .otherwise(0.0))
      .select("doc_id", "n_tokens", "n_oov", "oov_rate", "ids8")
      .transform(Present.sorted(_, "doc_id"))
  }

  /** The retired `typedlit(map)` form of [[ta16With]] — the SEMANTIC
    * definition the kernel plan is spec-pinned against. A Catalyst map
    * literal is ArrayBasedMapData, so every `element_at` here is an
    * O(|vocab|) linear scan — three per token; the kernel replaces them
    * with one O(1) hash probe per token (see
    * [[graft.functions.VocabDocStats]]). */
  private[graft] def ta16LitWith(s: SparkSession, dir: String,
      vocab: DataFrame): DataFrame = {
    val m = vocab.select(col("tok"), col("id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val vLit = typedlit(m)
    val toks = filter(ws, t => t =!= "")
    def idOf(t: Column): Column = coalesce(element_at(vLit, t),
      lit(VocabSize.toLong) + Dedup.h60(t) % OovBuckets)
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(toks).as("n_tokens"),
        size(filter(toks, t => element_at(vLit, t).isNull)).as("n_oov"),
        array_join(transform(slice(toks, 1, 8), t => idOf(t).cast("string")),
          ",").as("ids8"))
      .withColumn("oov_rate",
        when(col("n_tokens") > 0,
          col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .otherwise(0.0))
      .select("doc_id", "n_tokens", "n_oov", "oov_rate", "ids8")
      .transform(Present.sorted(_, "doc_id"))
  }

  /** Oracle: global frequency → ranked vocab → per-token encode with
    * the same hash fallback, aggregated per doc (ids8 via ordered
    * string_agg over the first 8 token ordinals). */
  val ta16Sql: String =
    s"""WITH $wsSqlCte,
       |tok AS (SELECT doc_id, tok, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS j
       |        FROM (SELECT doc_id, unnest(ws) AS tok,
       |                     generate_subscripts(ws, 1) AS i FROM w)
       |        WHERE tok <> ''),
       |gf AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
       |vocab AS (SELECT tok, id FROM (
       |            SELECT tok, ROW_NUMBER() OVER (ORDER BY c DESC, tok) - 1 AS id
       |            FROM gf)
       |          WHERE id < $VocabSize),
       |enc AS (SELECT t.doc_id, t.j,
       |               COALESCE(v.id, $VocabSize + ${Dedup.h60Sql("t.tok")} % $OovBuckets) AS id,
       |               (v.id IS NULL) AS oov
       |        FROM tok t LEFT JOIN vocab v USING (tok)),
       |agg AS (SELECT doc_id,
       |               CAST(COUNT(*) AS INT) AS n_tokens,
       |               CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS INT) AS n_oov,
       |               string_agg(CAST(id AS VARCHAR), ',' ORDER BY j)
       |                 FILTER (WHERE j <= 8) AS ids8
       |        FROM enc GROUP BY doc_id)
       |SELECT d.doc_id,
       |       COALESCE(a.n_tokens, 0) AS n_tokens,
       |       COALESCE(a.n_oov, 0) AS n_oov,
       |       CASE WHEN COALESCE(a.n_tokens, 0) > 0
       |            THEN CAST(a.n_oov AS DOUBLE) / CAST(a.n_tokens AS DOUBLE)
       |            ELSE 0.0 END AS oov_rate,
       |       COALESCE(a.ids8, '') AS ids8
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- ta17
  /** Number of learned BPE merges. Fixture-scaled like [[VocabSize]]
    * (the synthetic corpus has a ~30-token head; 8 merges already fold
    * its most frequent character pairs into multi-char subwords while
    * leaving a real single-char tail); a production tokenizer (32k–64k
    * merges) changes only this constant and the size of the merge-table
    * artifact — the training loop, the artifact schema, and the serving
    * plan are invariant to it. */
  val BpeRounds = 8

  /** Symbol-sequence encoding used by the whole BPE family: a word's
    * symbol list is ONE string, each symbol wrapped in U+0001 fences —
    * "hi" → `\u0001h\u0001\u0001i\u0001`. With doubled fences BETWEEN
    * symbols, applying a merge (l, r) left-to-right non-overlapping —
    * the BPE application rule (Sennrich et al. 2016) — is EXACTLY a
    * literal string `replace` of `\u0001l\u0001\u0001r\u0001` with
    * `\u0001lr\u0001` in both engines ("aaa" → [aa, a]: after the first
    * replacement consumes its closing fence, the overlapping second
    * occurrence no longer matches). That one identity is what lets the
    * DuckDB oracle replay training and encode with zero recursion: each
    * training round is a pair-count + argmax + one `replace`, unrolled
    * per round (the k-means-CTE precedent). U+0001 cannot appear in a
    * whitespace-split token of any text corpus this engine targets. */
  private val BpeSep = "\u0001"
  private val BpeSepSql = "chr(1)"

  private def bpeSyms0(t: Column): Column =
    concat(lit(BpeSep),
      array_join(regexp_extract_all(t, lit("."), lit(0)), BpeSep + BpeSep),
      lit(BpeSep))

  /** The learned merge table as a MODEL ARTIFACT — (rank, l, r), rank
    * 1-based in learn order ([[clfWeights]] contract: a real tokenizer's
    * merges.txt export is a table drop-in, [[ta17With]] is the swap
    * hook). Training is the standard corpus-side BPE loop over the
    * DISTINCT-WORD frequency table (Sennrich et al. 2016 train on the
    * word dict, not the corpus): per round, adjacent-pair counts
    * weighted by word frequency → argmax (count desc, then (l, r) asc in
    * UTF-8 binary order, the cross-engine-stable tie-break) → apply the
    * merge. The pair counts aggregate DISTRIBUTED (the dict is
    * vocab-sized but the shuffle is pair-sized); only the 1-row argmax
    * is collected per round — [[BpeRounds]] driver round-trips at layer
    * build time, each model-sized. Stops early if no adjacent pair is
    * left (tiny fixtures); ranks stay contiguous. */
  private[graft] def bpeMerges(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "bpemerges", dir, () => {
      val words = Tables.documents(s, dir)
        .select(explode(ws).as("tok")).filter(col("tok") =!= "")
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .withColumn("syms", bpeSyms0(col("tok")))
        .persist()
      words.count() // materialize once; each round re-reads the cache
      val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
      var cur = words.select(col("c"), col("syms"))
      var r = 1
      var done = false
      while (r <= BpeRounds && !done) {
        val arr = split(trim(col("syms"), BpeSep), BpeSep + BpeSep)
        val n = size(arr)
        val best = cur
          .select(col("c"), explode(zip_with(
            slice(arr, lit(1), n - lit(1)), slice(arr, lit(2), n - lit(1)),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("c")).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()
        if (best.isEmpty) done = true
        else {
          val (l, rr) = (best(0).getString(0), best(0).getString(1))
          merges += ((r.toLong, l, rr))
          cur = cur.withColumn("syms", replace(col("syms"),
            lit(BpeSep + l + BpeSep + BpeSep + rr + BpeSep),
            lit(BpeSep + l + rr + BpeSep)))
          r += 1
        }
      }
      words.unpersist()
      val rows = merges.toSeq.map { case (k, l, rr) => Row(k, l, rr) }
      s.createDataFrame(s.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("rank", LongType, nullable = false),
          StructField("l", StringType, nullable = false),
          StructField("r", StringType, nullable = false))))
    }, Seq("rank"), Seq("rank"), variant = s"_r$BpeRounds")

  /** Batched BPE training — the R/k-scan path to MODEL-SCALE merge
    * counts (r10 verdict #3): sequential training pays one full
    * dict-wide pair-count aggregation + a 1-row collect PER MERGE, which
    * is unusable at a real tokenizer's 32k merges. Each batched scan
    * takes the top candidate pairs once and admits up to `k` of them
    * greedily in rank order under SYMBOL-DISJOINTNESS — a candidate is
    * skipped if its l, r, or surface l+r collides with any symbol or
    * surface already admitted this scan. Disjointness is what keeps the
    * pre-scan counts exact for every admitted pair (none of them can
    * create or consume another's adjacencies), so admitted ranks are
    * ordered by their true counts; the approximation vs sequential
    * training is only that a pair whose count would have been BOOSTED by
    * an earlier merge in the same scan waits for the next scan. k=1 is
    * exactly sequential training (spec-pinned against [[bpeMerges]]'s
    * loop). Driver traffic per scan is the top slice of the pair-count
    * relation (≤ 4k rows), never the dict; the admitted merges apply as
    * one ≤k-deep replace chain per scan (bounded, unlike a per-merge
    * chain over the whole table). Returns (rank, l, r) like
    * [[bpeMerges]] — a drop-in for [[bpeWordsFrom]]/[[ta17With]]. */
  private[graft] def bpeMergesBatched(s: SparkSession, words0: DataFrame,
      rounds: Int, k: Int,
      onScan: (Int, Int, Double) => Unit = (_, _, _) => ()): DataFrame = {
    require(k >= 1 && rounds >= 1)
    // localCheckpoint, not persist: every scan derives the next dict
    // from the previous one, and cached-plan lineage GROWS per scan —
    // unpersisting scan s forces the cache manager to recompile scan
    // s+1's entry over the whole chain (quadratic work, OOM at 64
    // scans). Checkpointing truncates the lineage to a flat RDD each
    // scan, the standard iterative-algorithm posture.
    val words = words0
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .withColumn("syms", bpeSyms0(col("tok")))
      .select(col("c"), col("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    var cur = words
    var scan = 0
    var done = false
    while (merges.length < rounds && !done) {
      val t0 = System.nanoTime()
      val arr = split(trim(col("syms"), BpeSep), BpeSep + BpeSep)
      val n = size(arr)
      val want = math.min(k, rounds - merges.length)
      val top = cur
        .select(col("c"), explode(zip_with(
          slice(arr, lit(1), n - lit(1)), slice(arr, lit(2), n - lit(1)),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(math.max(4 * want, 64)).collect()
      if (top.isEmpty) done = true
      else {
        val used = scala.collection.mutable.HashSet.empty[String]
        val admitted = top.iterator
          .map(r0 => (r0.getString(0), r0.getString(1)))
          .filter { case (l, r) =>
            if (used(l) || used(r) || used(l + r)) false
            else { used += l; used += r; used += (l + r); true }
          }
          .take(want).toSeq
        var enc = col("syms")
        admitted.foreach { case (l, r) =>
          merges += ((merges.length + 1L, l, r))
          enc = replace(enc,
            lit(BpeSep + l + BpeSep + BpeSep + r + BpeSep),
            lit(BpeSep + l + r + BpeSep))
        }
        cur = cur.select(col("c"), enc.as("syms")).localCheckpoint()
        scan += 1
        onScan(scan, admitted.length, (System.nanoTime() - t0) / 1e9)
      }
    }
    val rows = merges.toSeq.map { case (rk, l, rr) => Row(rk, l, rr) }
    s.createDataFrame(s.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("rank", LongType, nullable = false),
        StructField("l", StringType, nullable = false),
        StructField("r", StringType, nullable = false))))
  }

  /** The encoded LEXICON as a built layer — (tok, subs, ids, n_sub) for
    * every distinct corpus word, bucketed by tok: the expensive part of
    * BPE encode (the merge fold) runs once per DISTINCT WORD at layer
    * build, never per occurrence — encode cost scales with the
    * vocabulary, not the corpus, which is the property that makes BPE
    * deployable at 100 TB. */
  private[graft] def bpeWords(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "bpewords", dir, () =>
      bpeWordsFrom(s,
        Tables.documents(s, dir)
          .select(explode(ws).as("tok")).filter(col("tok") =!= "")
          .distinct(),
        bpeMerges(s, dir)),
      Seq("tok"), Seq("tok"), variant = s"_r$BpeRounds")

  /** Encode a distinct-word relation against a merge table — the engine
    * behind [[bpeWords]] and the [[ta17With]] swap hook, built to load a
    * REAL tokenizer artifact (r10 verdict #2): the 8-merge fixture table
    * and a 32k-row merges.txt export run the identical plan. Two
    * scale-safety properties replace the previous form:
    *  - the merge fold is a typed `mapPartitions` over the vocab-sized
    *    word dict — a pure Scala loop per word, never a per-merge
    *    expression (a 32k-deep `replace` chain is uncompilable);
    *  - subword→id assignment probes BROADCAST model maps, never an
    *    in-plan `typedlit` of the whole symbol vocabulary.
    * Fold semantics are EXACTLY the fence-string replace chain's
    * (spec-pinned against it): merges apply in rank order, each once,
    * left-to-right non-overlapping. The fold processes the lowest
    * CURRENTLY-ADJACENT rank and then restricts to higher ranks — chain-
    * equivalent, because every rank below the current minimum applicable
    * one is a no-op on the current state (nothing it could match is
    * adjacent), and each application is the same single left-to-right
    * pass `String.replace` makes. Per-word cost is O(len · applied
    * merges), independent of the merge-table size.
    *
    * Subword ids follow the standard layout: alphabet chars (sorted,
    * UTF-8 binary) get 0..A-1, merge `rank` gets A+rank-1; if two merges
    * produce the same surface string the first (lowest id) wins. */
  private[graft] def bpeWordsFrom(s: SparkSession, words: DataFrame,
      merges: DataFrame): DataFrame = {
    import s.implicits._
    // model-artifact-sized driver structures (32k merges ≈ a few MB),
    // shipped once per executor as broadcasts
    val mg = merges.orderBy("rank").collect()
      .map(r0 => (r0.getLong(0), r0.getString(1), r0.getString(2)))
    // alphabet: distinct chars of the word dict, ordered by Spark's
    // UTF8 binary sort (matches DuckDB's) — a charset-bounded model
    // load, collected in sorted order
    val alpha = words
      .select(explode(regexp_extract_all(col("tok"), lit("."), lit(0))).as("sym"))
      .distinct().orderBy("sym").collect().map(_.getString(0))
    val pairs = mg.map { case (_, l, r) => (l, r) }
    val pairOrd = new java.util.HashMap[String, Integer](mg.length * 2)
    pairs.zipWithIndex.foreach { case ((l, r), i) =>
      pairOrd.putIfAbsent(l + " " + r, Integer.valueOf(i)) }
    val symId = new java.util.HashMap[String, java.lang.Long](
      (alpha.length + mg.length) * 2)
    alpha.zipWithIndex.foreach { case (sym, i) => symId.put(sym, i.toLong) }
    mg.foreach { case (rank, l, r) =>
      symId.putIfAbsent(l + r, alpha.length + rank - 1) }
    val bcPairs = s.sparkContext.broadcast(pairs)
    val bcOrd = s.sparkContext.broadcast(pairOrd)
    val bcIds = s.sparkContext.broadcast(symId)
    words.select(col("tok")).as[String].mapPartitions { it =>
      val ps = bcPairs.value; val ord = bcOrd.value; val ids = bcIds.value
      it.map { tok =>
        var syms = BpeFold.codePoints(tok)
        var from = -1 // only ranks ABOVE the last applied one remain live
        var next = BpeFold.minApplicable(syms, ord, from)
        while (next >= 0) {
          val (l, r) = ps(next)
          syms = BpeFold.applyPair(syms, l, r)
          from = next
          next = BpeFold.minApplicable(syms, ord, from)
        }
        val idArr = new Array[Long](syms.length)
        var i = 0
        while (i < syms.length) {
          idArr(i) = ids.get(syms(i)) // total by construction: every
          i += 1 // multi-char subword IS a merge surface, every single
        } // char is in the word dict's alphabet
        (tok, syms.toSeq, idArr.toSeq, syms.length.toLong)
      }
    }.toDF("tok", "subs", "ids", "n_sub")
  }

  def ta17(s: SparkSession, dir: String): DataFrame =
    // size-gated since r16 ([[DedupPrepare.serveDocfeatsLayered]]):
    // legacy = the one-pass BpeDocStats kernel scan (broadcast lexicon,
    // zero shuffle), strictly cheaper below the crossover.
    if (DedupPrepare.serveDocfeatsLayered(s, dir)) ta17Layered(s, dir)
    else ta17With(s, dir, bpeWords(s, dir))

  /** [[ta17]] served from the docfeats layer (r15 opt): n_tokens/n_bpe
    * fold over the per-doc unigram histogram (c · n_sub per distinct
    * id), ids8 probes only the FIRST 8 token ids of the layer's id
    * stream — both against the id-keyed lexicon [[bpeIdLex]]; no text
    * scan, no per-occurrence encode. Hit semantics are the kernel's
    * exactly: n_tokens counts lexicon hits (the histogram probe's inner
    * join), ids8 keeps hits among the first 8 POSITIONS — bit-identical
    * to [[ta17With]]([[bpeWords]]), DocFeatsSpec pins ≡ on the edge
    * corpus and sf0.001. */
  private[graft] def ta17Layered(s: SparkSession, dir: String): DataFrame = {
    val idlex = bpeIdLex(s, dir)
    val df = TextFeatures.docFeats(s, dir)
    val nb = df
      .select(col("doc_id"), explode(col("uni")).as("u"))
      .select(col("doc_id"), col("u.id").as("tok_id"),
        col("u.c").cast("long").as("n"))
      .join(broadcast(idlex.select(col("tok_id"), col("n_sub"))),
        Seq("tok_id"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).cast("long").as("n_tokens"),
        sum(col("n") * col("n_sub")).as("n_bpe"))
    val id8 = df
      .select(col("doc_id"),
        posexplode(slice(col("ids"), 1, 8)).as(Seq("pos", "tok_id")))
      .join(broadcast(idlex.select(col("tok_id"), col("subids"))),
        Seq("tok_id"))
      .groupBy(col("doc_id"))
      .agg(flatten(transform(
        sort_array(collect_list(struct(col("pos"), col("subids")))),
        x => x.getField("subids"))).as("flat"))
      .select(col("doc_id"),
        array_join(transform(slice(col("flat"), 1, 8), x => x.cast("string")),
          ",").as("ids8"))
    nb.join(id8, Seq("doc_id"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"), col("n_bpe"),
        (col("n_bpe").cast("double") / col("n_tokens").cast("double"))
          .as("bpe_per_tok"),
        col("ids8"))
      .orderBy("doc_id")
  }

  /** ta17: BPE SUBWORD ENCODE — the iterative pair-merge tokenizer every
    * training pipeline actually measures and packs in (Sennrich et al.
    * 2016; GPT-2/LLaMA tokenizers are this plus byte-level alphabets).
    * Per document: word count, total BPE token count, the fertility rate
    * (BPE tokens per word — the number tokenizer evaluations report),
    * and the first 8 subword ids (the encode itself, pinned end-to-end).
    *
    * Scale posture: the merge fold is PRE-PAID per distinct word in the
    * [[bpeWords]] lexicon layer; the query is one corpus-side explode →
    * broadcast join against the vocab-sized lexicon → one per-doc
    * aggregate. The first-8 slice rides the same aggregate with bounded
    * per-group state (≤8 structs collected under `pos < 8`), never a
    * per-doc window. Docs with no non-empty token have no encode row
    * (the ta13 contract). [[ta17With]] is the swap hook: an alternative
    * (tok, ids, n_sub) lexicon — e.g. a real 32k-merge export encoded
    * through the same fold — changes every number under an identical
    * plan. */
  private[graft] def ta17With(s: SparkSession, dir: String,
      enc: DataFrame): DataFrame = {
    import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
    val st = ExpressionUtils.column(graft.functions.BpeDocStats(
      ExpressionUtils.expression(ws), bpeLexBc(s, enc)))
    // The kernel projection is cached (Present.pooled, the q13/ta07
    // evaluate-once pattern) BEFORE the hit filter and the presentation
    // sort: without the cache boundary, predicate pushdown clones the
    // kernel into the filter and the range-sort sampling pass re-runs
    // the whole map pipeline — 4 kernel evaluations per doc instead of 1
    // (same-box sf10 A/B in SCALING.md round-12).
    val mapped = Present.pooled(Tables.documents(s, dir)
      .select(col("doc_id"), st.as("st"))
      .select(col("doc_id"),
        // coalesce only to pin nullable=false (count()'s schema in the
        // retired form); the filter below drops null-struct rows
        coalesce(col("st.n_tokens"), lit(0L)).as("n_tokens"),
        col("st.n_bpe").as("n_bpe"),
        // guarded: the pooled cache materializes this projection BEFORE
        // the n_tokens > 0 filter below, so a zero-hit doc (whitespace-
        // only, or all-OOV under a swapped partial lexicon) would hit
        // the ANSI divide-by-zero error and crash the query — a latent
        // r12 bug surfaced by the r15 DocFeatsSpec edge pin. The guard
        // changes no surviving row (rows with n_tokens = 0 are dropped).
        when(col("st.n_tokens") > 0,
          col("st.n_bpe").cast("double") / col("st.n_tokens").cast("double"))
          .as("bpe_per_tok"),
        col("st.ids8").as("ids8")))
    // n_tokens counts LEXICON HITS (the retired inner join dropped
    // misses); a doc whose every token is OOV under a swapped serving
    // lexicon vanishes here exactly as it vanished from the join+groupBy
    mapped.filter(col("n_tokens") > 0).orderBy("doc_id")
  }

  /** The retired explode → broadcast-join → per-doc aggregate form of
    * [[ta17With]] — the SEMANTIC definition the kernel plan is spec-pinned
    * against (including on a partial lexicon, where the inner join's
    * miss-dropping bites). One exploded row + one join probe per token
    * occurrence + a collect_list/sort/flatten chain for ids8; the kernel
    * ([[graft.functions.BpeDocStats]]) computes the identical struct in
    * one map-side pass with zero shuffle before the presentation sort. */
  private[graft] def ta17ExplodeWith(s: SparkSession, dir: String,
      enc: DataFrame): DataFrame = {
    val toksF = filter(ws, t => t =!= "")
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(toksF))
      .toDF("doc_id", "pos", "tok")
    t.join(broadcast(enc.select(col("tok"), col("ids"), col("n_sub"))), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("n_sub")).as("n_bpe"),
        flatten(transform(
          sort_array(collect_list(
            when(col("pos") < 8, struct(col("pos"), col("ids"))))),
          x => x.getField("ids"))).as("flat"))
      .withColumn("ids8",
        array_join(transform(slice(col("flat"), 1, 8), x => x.cast("string")), ","))
      .withColumn("bpe_per_tok",
        col("n_bpe").cast("double") / col("n_tokens").cast("double"))
      .select("doc_id", "n_tokens", "n_bpe", "bpe_per_tok", "ids8")
      // plain orderBy, not Present.sorted: the child has shuffles (join +
      // agg), so the range-bound sampling pass reuses shuffle files and a
      // presentation cache would only hide the plan from the census
      .orderBy("doc_id")
  }

  /** The (tok → n_sub, ids) lexicon as an executor-side broadcast hash
    * map — the model-ships-once serving mechanism behind [[ta17With]] and
    * [[bpeDocCounts]]. Vocab-sized driver collect (the same model load
    * [[bpeWordsFrom]] makes for merges), probed with UTF8String keys so
    * the kernel never converts token bytes. */
  private def bpeLexBc(s: SparkSession, enc: DataFrame):
      org.apache.spark.broadcast.Broadcast[java.util.HashMap[
        org.apache.spark.unsafe.types.UTF8String, graft.functions.BpeEntry]] = {
    val rows = enc.select(col("tok"), col("ids"), col("n_sub")).collect()
    val m = new java.util.HashMap[
      org.apache.spark.unsafe.types.UTF8String, graft.functions.BpeEntry](
      rows.length * 2)
    rows.foreach { r =>
      m.put(org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
        new graft.functions.BpeEntry(r.getLong(2), r.getSeq[Long](1).toArray))
    }
    s.sparkContext.broadcast(m)
  }

  /** Oracle: the full BPE pipeline replayed in SQL — training unrolled
    * one CTE-chain per round (pair counts via an adjacency self-join,
    * 1-row argmax, merge application as the fence-string `replace`; an
    * exhausted round LEFT-JOINs an empty argmax and COALESCEs to a
    * no-op), then the id layout and per-doc assembly. Values are exact
    * integers plus one final division, so the hash compare is skew-free
    * by construction. */
  /** Shared oracle prefix of the BPE family (ta17/ta18/sp11): the ws
    * token stream with per-doc ordinals, the word dict, the unrolled
    * training rounds, and the per-word subword decomposition + counts.
    * AS MATERIALIZED on every chained CTE: DuckDB 1.0 inlines CTEs by
    * default, and each round references the previous round's relation
    * more than once — inlining would re-expand the whole training
    * prefix per reference (exponential in BpeRounds). */
  private[operators] val bpePrefixSql: String = {
    val S = BpeSepSql
    val SS = s"$S||$S"
    val rounds = (1 to BpeRounds).map { r =>
      s"""ex$r AS MATERIALIZED (
         |  SELECT tok, c, unnest(s) AS sym, generate_subscripts(s, 1) AS i
         |  FROM (SELECT tok, c, string_split(trim(syms, $S), $SS) AS s FROM w${r - 1})),
         |best$r AS MATERIALIZED (
         |  SELECT a.sym AS l, b.sym AS r, SUM(a.c) AS cnt
         |  FROM ex$r a JOIN ex$r b ON a.tok = b.tok AND b.i = a.i + 1
         |  GROUP BY 1, 2 ORDER BY cnt DESC, l, r LIMIT 1),
         |w$r AS MATERIALIZED (
         |  SELECT tok, c,
         |         COALESCE(replace(syms, $S||l||$S||$S||r||$S, $S||l||r||$S), syms) AS syms
         |  FROM w${r - 1} LEFT JOIN best$r ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""$wsSqlCte,
       |tok AS MATERIALIZED (
       |  SELECT doc_id, tok, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS j
       |  FROM (SELECT doc_id, unnest(ws) AS tok,
       |               generate_subscripts(ws, 1) AS i FROM w)
       |  WHERE tok <> ''),
       |gf AS MATERIALIZED (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
       |w0 AS MATERIALIZED (
       |  SELECT tok, c,
       |         $S || array_to_string(regexp_extract_all(tok, '.'), $SS) || $S AS syms
       |  FROM gf),
       |$rounds,
       |wenc AS MATERIALIZED (
       |  SELECT tok, string_split(trim(syms, $S), $SS) AS subs FROM w$BpeRounds),
       |wn AS (SELECT tok, CAST(len(subs) AS BIGINT) AS n_sub FROM wenc)""".stripMargin
  }

  /** Per-doc BPE count CTE (`bpecnt`) over [[bpePrefixSql]] — every doc
    * keeps its lang; docs with no non-empty token count 0 (they still
    * pack/bucket downstream, the sp06 contract). */
  private[operators] val bpeCntSql: String =
    """bpecnt AS MATERIALIZED (
      |  SELECT d.doc_id, d.lang, COALESCE(a.n_bpe, 0) AS n_bpe
      |  FROM documents d LEFT JOIN (
      |    SELECT t.doc_id, CAST(SUM(n.n_sub) AS BIGINT) AS n_bpe
      |    FROM tok t JOIN wn n USING (tok) GROUP BY 1) a USING (doc_id))""".stripMargin

  val ta17Sql: String = {
    val S = BpeSepSql
    val SS = s"$S||$S"
    val mergeUnion = (1 to BpeRounds)
      .map(r => s"SELECT $r AS rank, l, r FROM best$r").mkString(" UNION ALL ")
    s"""WITH $bpePrefixSql,
       |merges AS ($mergeUnion),
       |chars AS MATERIALIZED (
       |  SELECT DISTINCT unnest(regexp_extract_all(tok, '.')) AS sym FROM gf),
       |na AS (SELECT CAST(COUNT(*) AS BIGINT) AS a FROM chars),
       |alpha AS (SELECT sym, CAST(ROW_NUMBER() OVER (ORDER BY sym) - 1 AS BIGINT) AS id
       |          FROM chars),
       |symmap AS MATERIALIZED (
       |  SELECT sym, MIN(id) AS id FROM (
       |    SELECT sym, id FROM alpha
       |    UNION ALL
       |    SELECT l || r AS sym, a + rank - 1 AS id FROM merges, na)
       |  GROUP BY sym),
       |wid AS (SELECT u.tok, u.i, s.id
       |        FROM (SELECT tok, unnest(subs) AS sub,
       |                     generate_subscripts(subs, 1) AS i FROM wenc) u
       |        JOIN symmap s ON u.sub = s.sym),
       |agg1 AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |                CAST(SUM(n.n_sub) AS BIGINT) AS n_bpe
       |         FROM tok t JOIN wn n USING (tok) GROUP BY t.doc_id),
       |firsts AS (SELECT doc_id, id,
       |                  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j, i) AS rn
       |           FROM (SELECT t.doc_id, t.j, u.i, u.id
       |                 FROM tok t JOIN wid u USING (tok) WHERE t.j <= 8)),
       |ids8 AS (SELECT doc_id, string_agg(CAST(id AS VARCHAR), ',' ORDER BY rn) AS ids8
       |         FROM firsts WHERE rn <= 8 GROUP BY doc_id)
       |SELECT a.doc_id, a.n_tokens, a.n_bpe,
       |       CAST(a.n_bpe AS DOUBLE) / CAST(a.n_tokens AS DOUBLE) AS bpe_per_tok,
       |       i.ids8
       |FROM agg1 a JOIN ids8 i USING (doc_id)
       |ORDER BY a.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- ta18
  /** Per-doc BPE token counts (doc_id, lang, n_bpe) — the measurement
    * relation the tokenizer-parameterized variants (ta18's histogram,
    * sp11's packing) consume instead of whitespace counts: context
    * budgets and packing caps are spent in MODEL tokens, so the
    * engine must be able to measure in them. Same join shape as ta17
    * (explode → broadcast lexicon → per-doc sum); `explode_outer` +
    * left join keep zero-token docs at count 0 (they still pack). */
  /** The BPE lexicon re-keyed to docfeats token ids — (tok_id, subids,
    * n_sub): [[bpeWords]] ⋈ the token dictionary, both bucketed by tok
    * so the join is exchange-free and vocab-sized. The BPE family's
    * serving queries probe THIS relation against the docfeats id
    * stream/histogram instead of re-tokenizing the corpus (r15 opt —
    * the same id-keying step uniprobid/biprobid took in the docfeats
    * round; derived per query because both inputs are already
    * materialized layers and the join is broadcast-sized). */
  private[graft] def bpeIdLex(s: SparkSession, dir: String): DataFrame =
    bpeWords(s, dir)
      .join(TextFeatures.vocab(s, dir).select(col("tok"), col("tok_id")),
        Seq("tok"))
      .select(col("tok_id"), col("ids").as("subids"), col("n_sub"))

  /** Per-doc BPE counts served from the docfeats layer (r15 opt): n_bpe
    * = Σ over the per-doc unigram histogram of c · n_sub(tok_id) — the
    * same integer the kernel's per-occurrence walk accumulates, summed
    * per distinct token instead (exact integer math, so bit-identical;
    * DocFeatsSpec pins ≡ against [[bpeDocCounts]]). lang rides a
    * text-free pruned documents scan; the left join keeps zero-token
    * docs at 0 exactly as the kernel's coalesce does. With a full-corpus
    * lexicon every histogram id resolves; under a PARTIAL lexicon the
    * inner probe drops misses exactly as the kernel scores them 0. */
  /** The per-doc BPE count source ta18/sp11 dispatch through —
    * size-gated since r16 ([[DedupPrepare.serveDocfeatsLayered]]):
    * layered above the crossover (no text scan), the one-pass kernel
    * below it (a few-MB corpus scans in ~50 ms where the layer read
    * pays a fixed multi-stage task floor). Bit-identical either way
    * (DocFeatsSpec pins ≡). */
  private[graft] def bpeDocCountsServe(s: SparkSession, dir: String): DataFrame =
    if (DedupPrepare.serveDocfeatsLayered(s, dir)) bpeDocCountsLayered(s, dir)
    else bpeDocCounts(s, dir)

  private[graft] def bpeDocCountsLayered(s: SparkSession, dir: String): DataFrame = {
    val nb = TextFeatures.docFeats(s, dir)
      .select(col("doc_id"), explode(col("uni")).as("u"))
      .select(col("doc_id"), col("u.id").as("tok_id"),
        col("u.c").cast("long").as("n"))
      .join(broadcast(bpeIdLex(s, dir).select(col("tok_id"), col("n_sub"))),
        Seq("tok_id"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n") * col("n_sub")).as("n_bpe"))
    Tables.documents(s, dir).select(col("doc_id"), col("lang"))
      .join(nb, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_bpe"), lit(0L)).as("n_bpe"))
  }

  /** The kernel form of the per-doc BPE counts (pre-layer, r12–r14) —
    * parity anchor for DocFeatsSpec; the partial-lexicon contract spec
    * pins it against [[bpeDocCountsJoin]]. */
  private[graft] def bpeDocCounts(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
    val st = ExpressionUtils.column(graft.functions.BpeDocStats(
      ExpressionUtils.expression(ws), bpeLexBc(s, bpeWords(s, dir))))
    // one kernel pass per doc, no explode/join/groupBy: the left join
    // summed hits with misses contributing nothing and zero-token docs
    // kept at 0 — exactly the kernel's n_bpe (the full-corpus lexicon
    // makes every non-empty token a hit; a miss contributes 0 in both
    // forms, spec-pinned on a partial lexicon)
    Tables.documents(s, dir)
      // coalesce carries a null-text doc to 0 — the same row the retired
      // form kept (explode_outer of a null array → one null-tok row →
      // join miss → coalesce(sum)=0) — and pins nullable=false
      .select(col("doc_id"), col("lang"),
        coalesce(st.getField("n_bpe"), lit(0L)).as("n_bpe"))
  }

  /** The retired explode_outer → broadcast-left-join → per-doc sum form
    * of [[bpeDocCounts]] — the SEMANTIC definition the kernel plan is
    * spec-pinned against (zero-token docs keep their 0 row; lexicon
    * misses contribute nothing to the sum). */
  private[graft] def bpeDocCountsJoin(s: SparkSession, dir: String): DataFrame = {
    val enc = bpeWords(s, dir).select(col("tok"), col("n_sub"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        explode_outer(filter(ws, t => t =!= "")).as("tok"))
      .join(broadcast(enc), Seq("tok"), "left")
      .groupBy(col("doc_id"), col("lang"))
      .agg(coalesce(sum(col("n_sub")), lit(0L)).as("n_bpe"))
  }

  /** ta18: ta15's context-length histogram measured in BPE TOKENS — the
    * tokenizer-parameterized twin (same buckets, same shares, same
    * cumulative mass) that answers the question ta15 only approximates:
    * how the corpus distributes over MODEL-token context lengths. The
    * whitespace→BPE swap multiplies lengths by the fertility rate, so
    * docs migrate ~log2(fertility)≈2 buckets up; everything else about
    * the plan is ta15's (one agg + broadcast-side shares). */
  def ta18(s: SparkSession, dir: String): DataFrame = {
    // served from the docfeats layer since r15 (bpeDocCountsLayered —
    // no text scan, no per-occurrence encode), size-gated since r16
    // (bpeDocCountsServe); still pooled: the n_bpe > 0 filter would
    // otherwise push into the histogram probe (or the kernel
    // projection) and clone it; the cached counts relation is 3 skinny
    // columns
    val grouped = Present.pooled(bpeDocCountsServe(s, dir))
      .filter(col("n_bpe") > 0)
      .withColumn("bucket", (length(bin(col("n_bpe"))) - 1).cast("int"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bpe")).cast("long").as("sum_tokens"))
    val wl = Window.partitionBy(col("lang"))
    val wcum = Window.partitionBy(col("lang")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped
      .withColumn("lo_tokens", expr("shiftleft(CAST(1 AS BIGINT), bucket)"))
      .withColumn("doc_share",
        col("n_docs").cast("double") /
          sum(col("n_docs")).over(wl).cast("double"))
      .withColumn("token_share",
        col("sum_tokens").cast("double") /
          sum(col("sum_tokens")).over(wl).cast("double"))
      .withColumn("cum_token_share",
        sum(col("sum_tokens")).over(wcum).cast("double") /
          sum(col("sum_tokens")).over(wl).cast("double"))
      .select("lang", "bucket", "lo_tokens", "n_docs", "sum_tokens",
        "doc_share", "token_share", "cum_token_share")
      .orderBy("lang", "bucket")
  }

  val ta18Sql: String =
    s"""WITH $bpePrefixSql,
       |$bpeCntSql,
       |b AS (SELECT lang, CAST(length(bin(n_bpe)) - 1 AS INT) AS bucket, n_bpe
       |      FROM bpecnt WHERE n_bpe > 0),
       |g AS (SELECT lang, bucket, COUNT(*) AS n_docs,
       |             CAST(SUM(n_bpe) AS BIGINT) AS sum_tokens
       |      FROM b GROUP BY 1, 2)
       |SELECT lang, bucket,
       |       CAST(CAST(1 AS BIGINT) << bucket AS BIGINT) AS lo_tokens,
       |       n_docs, sum_tokens,
       |       CAST(n_docs AS DOUBLE)
       |         / CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE) AS doc_share,
       |       CAST(sum_tokens AS DOUBLE)
       |         / CAST(SUM(sum_tokens) OVER (PARTITION BY lang) AS DOUBLE) AS token_share,
       |       CAST(SUM(sum_tokens) OVER (PARTITION BY lang ORDER BY bucket
       |                                  ROWS UNBOUNDED PRECEDING) AS DOUBLE)
       |         / CAST(SUM(sum_tokens) OVER (PARTITION BY lang) AS DOUBLE) AS cum_token_share
       |FROM g ORDER BY lang, bucket""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("ta01_langid", "stopword-heuristic language ID + accuracy flag", ta01, Some(ta01Sql)),
    Q("ta02_quality_score", "length/punct/stopword quality score", ta02, Some(ta02Sql)),
    Q("ta03_token_counts", "whitespace + BPE-ish regex token counts", ta03, Some(ta03Sql)),
    Q("ta04_fingerprint", "order-independent shingle-hash fingerprint", ta04, Some(ta04Sql)),
    Q("ta05_lexical_stats", "vocab / hapax / top-token integer stats", ta05, Some(ta05Sql)),
    Q("ta06_repetition_stats", "Gopher-style 2-gram duplication / top-share", ta06, Some(ta06Sql)),
    Q("ta07_pii_scrub", "PII detect + redact, planted ground truth", ta07, Some(ta07Sql)),
    Q("ta08_quality_gate", "composed keep/drop gate with first-failing-rule reason", ta08, Some(ta08Sql)),
    Q("ta09_rarity_score", "corpus-frequency rarity (unigram surprisal proxy)", ta09, Some(ta09Sql)),
    Q("ta10_corpus_diagnostics", "per-lang vocab / TTR / hapax / head-coverage report", ta10, Some(ta10Sql)),
    Q("ta11_boilerplate", "per-source template shingles + per-doc boilerplate fraction", ta11, Some(ta11Sql)),
    Q("ta12_lm_perplexity", "unigram-LM cross-entropy + perplexity (CCNet-shaped filter)", ta12, Some(ta12Sql)),
    Q("ta13_hash_classifier", "hashed-feature linear classifier scoring (fastText serving shape)", ta13, Some(ta13Sql)),
    Q("ta14_bigram_lm", "bigram-LM cross-entropy with stupid backoff (KenLM serving shape)", ta14, Some(ta14Sql)),
    Q("ta15_length_histogram", "log2-bucket sequence-length distribution (context-length planning)", ta15, Some(ta15Sql)),
    Q("ta16_vocab_encode", "vocab token->id encode + OOV coverage audit (broadcast model)", ta16, Some(ta16Sql)),
    Q("ta17_bpe_encode", "BPE subword encode — learned merges + per-doc fertility (tokenizer serving shape)", ta17, Some(ta17Sql)),
    Q("ta18_bpe_length_histogram", "ta15's context-length histogram measured in BPE model tokens", ta18, Some(ta18Sql)),
  )
}

/** The per-word BPE merge fold — the executor-side kernel behind
  * [[TextAnalysis.bpeWordsFrom]]. Plain static methods so the
  * mapPartitions closure captures nothing but broadcasts. */
private[graft] object BpeFold {

  /** A word's initial symbol sequence: its code points, in order (what
    * the `.`-regexp alphabet split and the fence encoding both see). */
  def codePoints(tok: String): Array[String] = {
    val b = Array.newBuilder[String]
    var i = 0
    while (i < tok.length) {
      val n = Character.charCount(tok.codePointAt(i))
      b += tok.substring(i, i + n)
      i += n
    }
    b.result()
  }

  /** The lowest merge order-index strictly above `fromExclusive` whose
    * pair is adjacent in `syms`, or -1. One hash probe per adjacency. */
  def minApplicable(syms: Array[String],
      ord: java.util.HashMap[String, Integer], fromExclusive: Int): Int = {
    var best = -1
    var i = 0
    while (i < syms.length - 1) {
      val o = ord.get(syms(i) + " " + syms(i + 1))
      if (o != null && o.intValue > fromExclusive &&
          (best < 0 || o.intValue < best)) best = o.intValue
      i += 1
    }
    best
  }

  /** One merge application: replace every left-to-right non-overlapping
    * (l, r) adjacency with the symbol l+r — exactly the single pass the
    * fence-string `replace` makes (a just-merged symbol is never the
    * LEFT of a later match in the same pass; the symbol after it may
    * START one). */
  def applyPair(syms: Array[String], l: String, r: String): Array[String] = {
    val b = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }
}
