package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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

  private def ws: Column = split(lower(trim(col("text"))), "\\s+")

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
    // text_metrics replaces the regex split (array built just to be
    // counted) and the regexp_replace-then-length punct counter with one
    // compiled pass — field-for-field spec-pinned (TextKernelsSpec)
    val tm = call_function("text_metrics", col("text"))
    val nTok = col("tm.n_ws_tokens").cast("double")
    val punct = col("tm.n_punct").cast("double")
    // zero-length docs: Spark x/0.0 is NULL, DuckDB IEEE gives inf — guard
    val punctRatio =
      when(col("n_chars") > 0, punct / col("n_chars").cast("double")).otherwise(0.0)
    val stopRatio = call_function("stop_hits", col("text"),
      lit(stop("en").mkString(","))).getItem(0).cast("double") / nTok
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
  private[operators] def gateDf(docs: DataFrame): DataFrame = {
    // text_metrics: same one-pass swap as ta02 (the gate recomputes
    // ta02's signals inline — see the join-vs-recompute note above)
    val nTok = col("tm.n_ws_tokens").cast("double")
    val punct = col("tm.n_punct").cast("double")
    val punctRatio =
      when(col("n_chars") > 0, punct / col("n_chars").cast("double")).otherwise(0.0)
    val stopRatio = call_function("stop_hits", col("text"),
      lit(stop("en").mkString(","))).getItem(0).cast("double") / nTok
    val score = least(nTok / 100.0, lit(1.0)) * 0.4 +
      (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.3 +
      least(stopRatio * 5.0, lit(1.0)) * 0.3
    val sh = call_function("stop_hits", col("text"), lit(stopSpec))
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
  private def langFreq(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "unifreq", dir,
      () => Tables.documents(s, dir)
        .select(col("lang"), explode(ws).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c")),
      Seq("tok"), Seq("tok"), variant = "_lang")

  /** Global (tok, c) view of [[langFreq]] — vocab-sized aggregate, no
    * exchange (bucketed by tok). */
  private def uniFreq(s: SparkSession, dir: String): DataFrame =
    langFreq(s, dir).groupBy(col("tok")).agg(sum(col("c")).as("c"))

  def ta09(s: SparkSession, dir: String): DataFrame = {
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
  /** Hashed-feature linear classifier scoring — the fastText/CCNet-style
    * model-based quality filter's SERVING shape: tokens → feature hash →
    * weight lookup → mean margin → sigmoid → keep/drop. No trained
    * weights exist offline, so the weight table is a deterministic
    * function of the feature hash itself (`w(tok) = (h60(tok) mod 2001
    * − 1000) / 1000` — uniform in [−1, 1]); the Spark-side shape (the
    * thing this operator exercises and pins) is exactly what a real
    * exported linear model runs at 100 TB.
    *
    * Scale posture: ZERO-shuffle map-side column program — the weight
    * "lookup" is pure per-token arithmetic inside higher-order array
    * functions (filter → aggregate), no explode, no join, no weight
    * broadcast needed; a real weight table would ride the same shape as
    * a broadcast map. Per-doc margin accumulates in exact INTEGER
    * weight-millis (the /1000 division happens once per doc, after the
    * sum), so no float-order or engine skew exists anywhere before the
    * final sigmoid, which is re-gridded at 1e-9 ([[Dedup.gridL]] — the
    * margin is bounded in [−1, 1], sigmoid in [0.27, 0.73], ulp skew in
    * libm exp is ~1e-16 here).
    *
    * Docs with no non-empty token have no margin and are excluded (same
    * contract as the shingle family's ≥n-token floor).
    */
  def ta13(s: SparkSession, dir: String): DataFrame = {
    val toks = filter(ws, t => t =!= "")
    val wMilli = aggregate(toks, lit(0L),
      (acc, t) => acc + (Dedup.h60(t) % 2001L - 1000L))
    val margin =
      (col("w_milli").cast("double") / 1000.0) / col("n_tokens").cast("double")
    val sig = lit(1.0) / (lit(1.0) + exp(-col("margin")))
    Tables.documents(s, dir)
      .select(col("doc_id"), size(toks).as("n_tokens"), wMilli.as("w_milli"))
      .filter(col("n_tokens") > 0)
      .withColumn("margin", margin)
      .withColumn("score", Dedup.gridL(sig).cast("double") / 1e9)
      .withColumn("keep", (col("score") >= 0.5).cast("int"))
      .select("doc_id", "n_tokens", "margin", "score", "keep")
      .transform(Present.sorted(_, "doc_id"))
  }

  val ta13Sql: String = {
    val h60 = "CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)"
    s"""WITH $wsSqlCte,
       |m AS (SELECT doc_id,
       |             CAST(len(list_filter(ws, t -> t <> '')) AS INT) AS n_tokens,
       |             CAST(coalesce(list_sum(list_transform(
       |               list_filter(ws, t -> t <> ''),
       |               t -> $h60 % 2001 - 1000)), 0) AS BIGINT) AS w_milli
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

  /** Registry of this family. */
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
  )
}
