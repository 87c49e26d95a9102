package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The shared per-document TEXT-FEATURE layer (r14 verdict #1 — the mm
  * family's decode-once doctrine applied to the text side): the top
  * warm costs of the sf10 record were all corpus re-scans recomputing
  * the same per-doc derivations — ta14 re-tokenized the corpus per
  * query (26.9 s), dd01 and sp03 each recomputed the identical
  * normalized-content md5, dd05 re-hashed every token for its simhash,
  * ta12/ta13 re-ran tokenize+hash to probe their models. This layer
  * pays the tokenize/hash/normalize pass ONCE per corpus and stores,
  * per doc_id (bucketed by doc_id like every per-doc-map layer):
  *
  *  - `sig`      — md5 of the whitespace-normalized lowercased text
  *                 (dd01's exact-dedup signature ≡ sp03's
  *                 decontamination key);
  *  - `simhash`  — the 60-bit SimHash (dd05; banding chunks derive
  *                 arithmetically);
  *  - `n_tokens` — count of non-empty whitespace tokens (the shared
  *                 denominator of ta12/ta13/ta14);
  *  - `ids`      — the token stream DICTIONARY-ENCODED to int ids in
  *                 document order (the "bpewords trick" applied to the
  *                 whitespace tokenizer): every downstream model probe
  *                 becomes an int join instead of a string join, and a
  *                 BIGRAM key packs into one long;
  *  - `uni`      — the per-doc unigram histogram array<struct<id,c>>
  *                 (ta12 probes distinct-tokens-per-doc rows instead of
  *                 one row per token occurrence);
  *  - `clf`      — the per-doc classifier-feature histogram
  *                 array<struct<f,c>> over `poly131(tok) mod ClfFeatDim`
  *                 (ta13 becomes a pure map-side fold — no tokenize, no
  *                 per-token hashing, zero shuffle, model still
  *                 weights-as-data).
  *
  * The id space comes from the [[vocab]] dictionary layer, derived
  * vocab-sized from the maintained unigram layer. Ids are STRIPED, not
  * globally ranked: `tok_id = (rank_within_stripe − 1)·VocabStripes +
  * stripe`, stripe = hash(tok) mod VocabStripes — a per-stripe
  * row_number window (never an unpartitioned global window), unique by
  * construction, and APPEND-STABLE: an ingest batch's new tokens
  * extend each stripe's rank range without renumbering standing ids
  * (standing `docfeats`/model rows stay valid — the property a
  * dictionary must have to be append-maintained at all).
  *
  * Cross-engine exactness: the layer stores only engine-side encodings
  * (the DuckDB oracle recomputes every query from `documents` with
  * string keys); all g-cost/count arithmetic stays the same exact
  * integer math as the legacy plans, so layer-served queries are
  * bit-identical to their legacy forms (DocFeatsSpec pins each pair).
  *
  * 100 TB posture: the build is one corpus-sized tokenize+explode, one
  * string join against the vocab dictionary (the classic
  * dictionary-encode job), and one partitioning on doc_id reused by
  * all three per-doc aggregates; every serving query then reads
  * pruned columns of a doc_id-bucketed table. Appends ride
  * [[LayerMaintenance]]'s per-doc-map contract (batch-sized delta,
  * vocab merged extend-only first).
  */
object TextFeatures {

  /** Id-space stripe count (see striping note above): per-stripe ranks
    * stay < 2^31/VocabStripes until the vocabulary exceeds ~2^31
    * distinct tokens — far past any real corpus (web-scale English is
    * ~10^8–10^9 with most mass far below). The ANSI int cast fails
    * loudly, never wraps, if that assumption ever breaks. */
  val VocabStripes = 4096

  private def tokArr: Column =
    filter(graft.functions.GraftFunctions.tokSplit(col("text")),
      t => t =!= "")

  /** Pack a bigram of int token ids into one long join key. */
  private[operators] def packBg(t1: Column, t2: Column): Column =
    shiftleft(t1.cast("long"), 32).bitwiseOR(t2.cast("long"))

  private[operators] def bgT1(bg: Column): Column =
    shiftright(bg, 32).cast("int")
  private[operators] def bgT2(bg: Column): Column =
    bg.bitwiseAND(lit(0xFFFFFFFFL)).cast("int")

  /** The token dictionary (tok, tok_id, feat), bucketed by tok —
    * tok_id striped as documented above; `feat` = the classifier
    * feature hash `poly131(tok) mod ClfFeatDim`, computed once per
    * DISTINCT token here instead of once per occurrence per query. */
  def vocab(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "tokdict", dir,
      () => {
        graft.functions.GraftFunctions.register(s)
        vocabRows(
          TextAnalysis.langFreq(s, dir).select(col("tok")).distinct(),
          startRank = lit(1))
      },
      Seq("tok"), Seq("tok"), variant = s"_s$VocabStripes")

  /** Dictionary rows for a distinct-token relation, ranks starting at
    * `startRank` per stripe (1 for a fresh build; standing max + 1 for
    * an append merge). `startRank` may be a per-stripe column. */
  private def vocabRows(toks: DataFrame, startRank: Column): DataFrame =
    toks
      .withColumn("stripe",
        pmod(xxhash64(col("tok")), lit(VocabStripes.toLong)).cast("int"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("stripe")).orderBy(col("tok"))))
      .select(col("tok"),
        ((startRank + col("rn") - 2).cast("long") * VocabStripes +
          col("stripe")).cast("int").as("tok_id"),
        pmod(call_function("tok_hash131", col("tok")),
          lit(TextAnalysis.ClfFeatDim.toLong)).cast("int").as("feat"))

  /** The (non-distinct) token relation of a docs-shaped batch —
    * [[LayerMaintenance]]'s input to the dictionary merge. */
  private[operators] def batchTokens(docs: DataFrame): DataFrame =
    docs.select(explode(tokArr).as("tok"))

  /** Extend a standing dictionary with a batch's new tokens: standing
    * ids untouched, fresh tokens ranked after each stripe's standing
    * max (append-stability). Returns the MERGED dictionary. */
  private[operators] def vocabMerged(old: DataFrame,
      batchToks: DataFrame): DataFrame = {
    // standing per-stripe next rank, recovered arithmetically from the
    // striped id: tok_id div VocabStripes = rank − 1
    val maxRank = old
      .withColumn("stripe", pmod(col("tok_id").cast("long"),
        lit(VocabStripes.toLong)).cast("int"))
      .groupBy(col("stripe"))
      .agg(max(floor(col("tok_id").cast("long") / VocabStripes))
        .cast("long").as("mx"))
    val fresh = batchToks.select(col("tok")).distinct()
      .join(old.select(col("tok")), Seq("tok"), "left_anti")
      .withColumn("stripe",
        pmod(xxhash64(col("tok")), lit(VocabStripes.toLong)).cast("int"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("stripe")).orderBy(col("tok"))))
      .join(maxRank, Seq("stripe"), "left")
      .select(col("tok"),
        ((coalesce(col("mx"), lit(-1L)) + col("rn"))
          * VocabStripes + col("stripe")).cast("int").as("tok_id"),
        pmod(call_function("tok_hash131", col("tok")),
          lit(TextAnalysis.ClfFeatDim.toLong)).cast("int").as("feat"))
    old.select(col("tok"), col("tok_id"), col("feat")).unionByName(fresh)
  }

  /** The per-doc feature layer (see object doc), bucketed by doc_id. */
  def docFeats(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "docfeats", dir,
      () => docFeatRows(s, Tables.documents(s, dir), vocab(s, dir)),
      Seq("doc_id"), Seq("doc_id"))

  /** Layer rows for any docs-shaped relation against an explicit
    * dictionary — shared by the corpus build and
    * [[LayerMaintenance.appendIngest]]'s batch-delta path (which feeds
    * the MERGED vocab so batch tokens always resolve). */
  private[operators] def docFeatRows(s: SparkSession, docs: DataFrame,
      v: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val base = Present.pooled(docs.select(col("doc_id"),
      md5(norm.cast("binary")).as("sig"),
      expr("simhash60(tokens_h60(text))").as("simhash"),
      tokArr.as("t")))
    val tokpos = base
      .select(col("doc_id"), posexplode(col("t")).as(Seq("pos", "tok")))
    // the ONE string join of the whole family (dictionary-encode);
    // everything after rides the doc_id partitioning, shared by the
    // three aggregates below via the pooled cache
    val withId = Present.pooled(tokpos.join(v, Seq("tok"))
      .select(col("doc_id"), col("pos"), col("tok_id"), col("feat"))
      .repartition(col("doc_id")))
    val seqAgg = withId.groupBy(col("doc_id")).agg(
      count(lit(1)).cast("int").as("n_tokens"),
      transform(array_sort(collect_list(struct(col("pos"), col("tok_id")))),
        x => x.getField("tok_id")).as("ids"))
    // histograms sorted by key so the layer's rows are deterministic
    // (collect_list order is not); consumers are order-independent sums
    val uniAgg = withId
      .groupBy(col("doc_id"), col("tok_id"))
      .agg(count(lit(1)).cast("int").as("c"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(
        struct(col("tok_id").as("id"), col("c")))).as("uni"))
    val clfAgg = withId
      .groupBy(col("doc_id"), col("feat"))
      .agg(count(lit(1)).cast("int").as("c"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(
        struct(col("feat").as("f"), col("c")))).as("clf"))
    base.select(col("doc_id"), col("sig"), col("simhash"))
      .join(seqAgg, Seq("doc_id"), "left")
      .join(uniAgg, Seq("doc_id"), "left")
      .join(clfAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("sig"), col("simhash"),
        coalesce(col("n_tokens"), lit(0)).as("n_tokens"),
        coalesce(col("ids"), typedlit(Seq.empty[Int])).as("ids"),
        coalesce(col("uni"), typedlit(Seq.empty[(Int, Int)])
          .cast("array<struct<id:int,c:int>>")).as("uni"),
        coalesce(col("clf"), typedlit(Seq.empty[(Int, Int)])
          .cast("array<struct<f:int,c:int>>")).as("clf"))
  }

  // ------------------------------------------- id-keyed model layers

  /** [[TextAnalysis.uniProb]] re-keyed to int token ids (tok_id, c,
    * g_uni, g_back), bucketed by tok_id — vocab-sized derive, built
    * once per corpus; ta12/ta14's unigram probes become int joins. */
  private[graft] def uniProbId(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "uniprobid", dir,
      () => TextAnalysis.uniProb(s, dir).join(vocab(s, dir), Seq("tok"))
        .select(col("tok_id"), col("c"), col("g_uni"), col("g_back")),
      Seq("tok_id"), Seq("tok_id"))

  /** The pruned bigram model re-keyed to PACKED long bigram ids
    * (bg, c12, g), bucketed by bg — built straight off the layer's id
    * stream (no corpus re-tokenize, no string bigram shuffle: the
    * heaviest model-build cost of the legacy path). Same counts, same
    * grid formula, so g is bit-identical to [[TextAnalysis.bigramProb]]
    * rows under the id↔string bijection. */
  private[graft] def biProbId(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "biprobid", dir,
      () => {
        val df = docFeats(s, dir)
        val bg = df.filter(size(col("ids")) >= 2)
          .select(col("doc_id"),
            explode(transform(sequence(lit(2), size(col("ids"))),
              i => packBg(element_at(col("ids"), i - 1),
                element_at(col("ids"), i)))).as("bg"))
        bg.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
          .filter(col("c12") >= TextAnalysis.BigramMinCount)
          .withColumn("tok_id", bgT1(col("bg")))
          .join(uniProbId(s, dir).select(col("tok_id"), col("c")),
            Seq("tok_id"))
          .select(col("bg"), col("c12"),
            Dedup.gridL(log(2.0, col("c").cast("double")) -
              log(2.0, col("c12").cast("double"))).as("g"))
      },
      Seq("bg"), Seq("bg"),
      variant = s"_mc${TextAnalysis.BigramMinCount}")

  /** Top-[[TextAnalysis.BigramHeadK]] bigram model rows by count —
    * the broadcast side of ta14's split probe, now a long→long map
    * (head membership ties break by bg instead of (t1,t2) string
    * order — membership only moves work between the broadcast and
    * shuffle branches, never scores, same argument as the legacy
    * head). */
  private[graft] def bigHeadId(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "bigheadid", dir,
      () => biProbId(s, dir)
        .orderBy(col("c12").desc, col("bg"))
        .limit(TextAnalysis.BigramHeadK)
        .select(col("bg"), col("g")),
      Seq("bg"), Seq("bg"),
      variant = s"_mc${TextAnalysis.BigramMinCount}_k${TextAnalysis.BigramHeadK}")
}
