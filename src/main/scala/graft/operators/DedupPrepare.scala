package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Materialized shingle/signature layer shared by the dedup family
  * (r2 verdict "Next round" #3): the word-3-shingle relation, the
  * MinHash signature table, and the capped LSH band relation are
  * computed ONCE per corpus and stored as BUCKETED parquet tables, then
  * read by dd02/dd03/dd04/dd08/ta04.
  *
  * Why bucketed tables and not `.persist`: persistence is per-query and
  * per-JVM — at 100 TB the family's dominant cost is recomputing the
  * shingle explode + distinct for every query that needs it. A bucketed
  * table is the cluster-shareable version of that cache, and its layout
  * IS the shuffle:
  *  - `shingles3`/`minhashSig` bucket+sort by doc_id → every
  *    groupBy(doc_id) (signature aggregation, per-doc shingle counts,
  *    ta04 fingerprints) and every verify join keyed on doc_id reads
  *    pre-clustered data, no exchange;
  *  - `lshBands` buckets by (b, bh) → the LSH candidate self-join is a
  *    bucketed sort-merge join with NO shuffle on either side — the
  *    pair-forming shuffle, the single most expensive exchange of the
  *    family, is paid once at write time and never again.
  *
  * Materialization is lazy per (session catalog, corpus dir): the first
  * query that needs a layer writes it (mode=overwrite, so a fresh JVM
  * can never read a stale catalog entry), later queries just read the
  * table. The DuckDB oracle recomputes everything from `documents` —
  * the layer is an execution strategy, not a semantic change.
  */
object DedupPrepare {

  /** Bucket count: matches the session shuffle parallelism the engine
    * configures (32 on the bench box); at cluster scale this would be
    * sized to corpus-bytes / target-partition-bytes. */
  val Buckets = 32

  /** Corpus fingerprint: hash of every data file's (path, length,
    * mtime) under `<dir>/documents.parquet`. Folded into the prep-table
    * tag so a corpus REWRITTEN at the same path gets fresh prep tables —
    * without it, prepared queries (dd02/dd03/...) would serve stale
    * materializations while non-prepared ones (dd01, ta01) read the new
    * data (r3 ADVICE). Memoized per corpus dir (diag corpora are
    * immutable snapshots in production): one FS listing per corpus per
    * JVM, not per accessor call — at a 100k-file corpus the listing is
    * a namenode sweep. A rewritten corpus must call [[invalidate]]
    * first, exactly the [[graft.sources.DiagSource.invalidate]]
    * contract. */
  private val fpCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Forget the memoized corpus fingerprints for `dir` (all source
    * files) — call after rewriting a corpus in place, before the next
    * prepared query. */
  def invalidate(dir: String): Unit = {
    fpCache.keySet.removeIf(_.startsWith(s"$dir::"))
    rgBytesCache.keySet.removeIf(_.startsWith(s"$dir/"))
  }
  def invalidateAll(): Unit = { fpCache.clear(); rgBytesCache.clear() }

  /** Build-time log (layer key → seconds), appended by [[ensure]] each
    * time a layer actually BUILDS (not when it is read back). Bench
    * drains this per query to attribute layer-build cost to the query
    * that first touched the layer — without it, a layer build moving
    * between first-toucher queries across rounds reads as a per-query
    * regression (r8 verdict #7). The key is `family+variant` (stable
    * across corpora/rounds), not the fingerprinted table name. */
  private val buildLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]

  /** Wall-clock of layer builds nested inside the currently-running
    * build (ensure() is reentrant on the object lock: minhash's build
    * invokes shingles3's). Logged times are EXCLUSIVE — each layer's
    * own work only — so a drain's sum equals the subtree wall-clock and
    * cold-minus-layers can never double-subtract. Guarded by the same
    * object lock as [[ensure]]. */
  private var nestedBuildSecs = 0.0

  /** Remove and return all build-log entries accumulated since the last
    * drain, in build order. */
  private[graft] def drainBuildLog(): Seq[(String, Double)] = {
    val b = Seq.newBuilder[(String, Double)]
    var e = buildLog.poll()
    while (e != null) { b += e; e = buildLog.poll() }
    b.result()
  }

  /** The memoized corpus fingerprint, for sibling caches that must key
    * on corpus identity (Similarity's cell-count memo): same lifecycle
    * as the prep-table tags — [[invalidate]] clears it. */
  private[operators] def corpusFingerprint(s: SparkSession, dir: String,
      fpFile: String): String = fingerprint(s, dir, fpFile)

  private def fingerprint(s: SparkSession, dir: String, fpFile: String): String =
    fpCache.computeIfAbsent(s"$dir::$fpFile",
      _ => fingerprintUncached(s, dir, fpFile))

  private def fingerprintUncached(s: SparkSession, dir: String,
      fpFile: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$fpFile")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val entries =
      if (!fs.exists(p)) Seq("absent")
      else {
        val it = fs.listFiles(p, true)
        val b = Seq.newBuilder[String]
        while (it.hasNext) {
          val st = it.next()
          b += s"${st.getPath}:${st.getLen}:${st.getModificationTime}"
        }
        b.result().sorted
      }
    f"${scala.util.hashing.MurmurHash3.orderedHash(entries)}%08x"
  }

  // fixed-width %08x: a variable-length hex hash lets one corpus's tag
  // be a strict prefix of another's, and the stale-layer sweep below
  // would then glob (and delete) the LIVE sibling's prep tables
  private def dirTag(dir: String): String = {
    val h = f"${scala.util.hashing.MurmurHash3.stringHash(dir)}%08x"
    val safe = dir.replaceAll("[^A-Za-z0-9]", "_").takeRight(24)
    s"${safe}_$h".toLowerCase
  }

  /** Layer base + fingerprinted name for (family, dir, variant) — the
    * naming scheme [[ensure]] keys tables by, exposed so
    * [[LayerMaintenance]] can mint the post-ingest name without
    * rebuilding. */
  private[operators] def naming(s: SparkSession, family: String, dir: String,
      variant: String, fpFile: String = "documents.parquet"): (String, String) = {
    val base = s"graft_prep_${family}_${dirTag(dir)}"
    (base, s"${base}_${fingerprint(s, dir, fpFile)}$variant")
  }

  /** Append-maintenance aliases (expected fingerprint-keyed name →
    * actual table holding the appended layer): when
    * [[LayerMaintenance.appendIngest]] extends a layer in place instead
    * of rebuilding it, the table keeps its pre-ingest name while the
    * corpus fingerprint moves on — the alias lets [[ensure]] resolve the
    * new expected name to the live appended table. Session-scoped like
    * the in-memory catalog itself: a fresh JVM simply rebuilds (correct,
    * just not incremental). */
  private val appendAlias =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[operators] def aliasLayer(expected: String, actual: String): Unit =
    appendAlias.put(expected, actual)

  private[operators] def dropAliases(base: String): Unit =
    appendAlias.keySet.removeIf(_.startsWith(base))

  private[operators] def resolveAlias(name: String): String =
    appendAlias.getOrDefault(name, name)

  /** The bucketed layer write (one file per bucket — see the
    * repartition note in [[ensure]]); `mode` is "overwrite" for builds
    * and "append" for [[LayerMaintenance]] batch appends (which land
    * delta files in the same buckets; partitioning survives, the
    * single-file sort elision is restored by compaction). */
  private[operators] def writeBucketed(df: DataFrame, name: String,
      bucketCols: Seq[String], sortCols: Seq[String],
      mode: String = "overwrite"): Unit =
    df.repartition(Buckets, bucketCols.map(col): _*)
      .write.mode(mode).format("parquet")
      .bucketBy(Buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .saveAsTable(name)

  /** Delete every warehouse sibling of `base` except `keep` — the
    * stale-layer sweep, shared by [[ensure]] and [[LayerMaintenance]].
    * "_*", not "*": the fingerprint separator must follow the EXACT dir
    * tag, so a sibling corpus whose tag extends this one is never
    * swept. */
  private[operators] def sweepStale(s: SparkSession, base: String,
      keep: Set[String] = Set.empty): Unit = {
    val whRoot = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"))
    val fs = whRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
    val stale = fs.globStatus(new org.apache.hadoop.fs.Path(whRoot, base + "_*"))
    if (stale != null) stale.filterNot(f => keep.contains(f.getPath.getName))
      .foreach(f => fs.delete(f.getPath, true))
  }

  /** `variant` distinguishes parameterizations WITHIN a family (e.g. the
    * df-cut threshold) and sits AFTER the fingerprint in the table name,
    * inside the `base_*` glob the stale-layer sweep uses — so changing a
    * threshold mints a new table AND reclaims the old threshold's
    * directories on the next ensure, instead of orphaning them forever
    * (which baking the threshold into the family name did). */
  /** `fpFile` names the source table whose files fingerprint the layer
    * (documents.parquet for the shingle family, embeddings.parquet for
    * the IVF index in [[Similarity]]) — shared by any operator family
    * that materializes a corpus-level artifact. */
  private[graft] def ensure(s: SparkSession, family: String, dir: String,
      build: () => DataFrame,
      bucketCols: Seq[String], sortCols: Seq[String],
      variant: String = "",
      fpFile: String = "documents.parquet"): DataFrame = synchronized {
    val (base, name0) = naming(s, family, dir, variant, fpFile)
    val name = resolveAlias(name0)
    if (!s.catalog.tableExists(name)) {
      // the in-memory catalog forgets tables across JVMs but warehouse
      // directories survive — and every corpus rewrite mints a NEW
      // fingerprinted name, so without GC the warehouse accrues one dead
      // layer per rewrite forever. Sweep every sibling of this corpus
      // (same family + dir tag, any fingerprint — includes this name's
      // own stale cross-JVM dir, which saveAsTable would refuse to
      // overwrite with LOCATION_ALREADY_EXISTS). A dangling append alias
      // (target swept or never written) dies with the sweep, and the
      // rebuild lands under the CURRENT fingerprint name, not the
      // alias's stale one.
      dropAliases(base)
      sweepStale(s, base)
      // repartition on the bucket key into exactly `Buckets` partitions
      // BEFORE the bucketed write: HashPartitioning and bucket-id use
      // the same Murmur3 hash, so every write task holds exactly one
      // bucket and each bucket lands in ONE file. Spark only trusts a
      // bucketed table's sortBy order when a bucket is a single file —
      // with it, readers get outputOrdering as well as partitioning,
      // and the family's sort-merge self-joins elide their Sorts (at
      // multi-file buckets they re-sort the whole relation per side,
      // which at sf1.0 measured ~2x the query's entire budget).
      val enclosing = nestedBuildSecs
      nestedBuildSecs = 0.0
      // isolate this build's pending cap audits from an enclosing build's
      // (nested ensure calls run while the outer closure evaluates)
      val enclosingAudits = pendingCapAudits
      pendingCapAudits = Nil
      val t0 = System.nanoTime()
      val body = build()
      // zero-unpartitioned-window invariant, enforced where the r9
      // regression actually lived (a layer-build plan, invisible to the
      // per-query plan pins): a Window with no partitionBy funnels the
      // whole relation through ONE task — at corpus scale that is a
      // single-executor sort, never acceptable in a layer build. Rank
      // bounded relations driver-side instead (the vocab-layer pattern).
      val unpart = graft.PlanAudit.unpartitionedWindows(body)
      require(unpart.isEmpty,
        s"layer $family$variant build plan has unpartitioned window(s): " +
          unpart.mkString("; "))
      try {
        writeBucketed(body, name0, bucketCols, sortCols)
        // the layer is published; NOW its truncation audits may say so
        pendingCapAudits.reverse.foreach { case (physical, a) =>
          writeCapAudit(s, physical, a, mode = "overwrite") }
      } finally pendingCapAudits = enclosingAudits
      val elapsed = (System.nanoTime() - t0) / 1e9
      buildLog.add((s"$family$variant", elapsed - nestedBuildSecs))
      nestedBuildSecs = enclosing + elapsed
      s.table(name0)
    } else
      // No blanket join hint here: a session-wide experiment pinned
      // MERGE on every prep read and it measured strictly worse (sf0.1
      // 31.3 -> 34.7 s, isolated dd04 at sf1.0 11 -> 28 s) because it
      // also forces SMJ where broadcasting a small DERIVED side is both
      // correct and scale-safe. The candidate SELF-joins — the only
      // sites where the broadcast side is the corpus relation itself —
      // carry the hint at their call sites instead.
      s.table(name)
  }

  /** Corpus INTAKE layers — see [[graft.Tables.documents]]'s doc for the
    * why (the raw single-row-group parquet serializes every scan). A
    * row-identical bucketed rewrite of the raw table, one file per
    * bucket, fingerprint-keyed so a rewritten corpus re-ingests.
    *
    * SIZE-GATED (r15, guide §1.2/§6): intake only pays when the raw
    * file actually serializes meaningful work behind one task — its
    * bytes-per-row-group at or above `spark.graft.intake.minRgBytes`
    * (default 16 MB: a 16 MB+ undivided row group is roughly a second
    * of scan+decode pinned to one core, which already exceeds the
    * bucketed layer's fixed ~0.3 s 32-task floor). Below the gate the
    * raw single-file scan is strictly cheaper (measured at sf0.1: the
    * always-on layer read cost +0.28 s MEAN across the 15 map-side
    * document queries against a 3.5 MB corpus — a pure task-floor tax),
    * so the accessor serves the raw table untouched. The gate is a
    * session conf, not a hard constant: production (and the test suite,
    * which pins the AT-SCALE plan shapes — SparkTestBase forces 0) can
    * set it; the criterion is scale-adaptive by construction — the
    * driver's sf0.1 bench stays on raw files while sf1.0+/sf10 corpora
    * cross it naturally (35 MB+ single-row-group files). */
  private val IntakeMinRgBytesDefault: Long = 16L * 1024 * 1024
  private val rgBytesCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  /** Bytes-per-row-group of one raw parquet file — the gate criterion
    * shared by the intake AND serving decisions, memoized per file (one
    * footer read per corpus file per JVM). */
  private def rawRgBytes(s: SparkSession, dir: String, file: String): Long =
    rgBytesCache.computeIfAbsent(s"$dir/$file", _ => {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$file")
      val conf = s.sparkContext.hadoopConfiguration
      val bytes = p.getFileSystem(conf).getFileStatus(p).getLen
      val rgs = {
        val in = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
        try in.getRowGroups.size() finally in.close()
      }
      bytes / math.max(rgs, 1)
    })
  private[graft] def rawNeedsIntake(s: SparkSession, dir: String,
      file: String): Boolean = {
    val minRg = s.conf.getOption("spark.graft.intake.minRgBytes")
      .map(_.toLong).getOrElse(IntakeMinRgBytesDefault)
    minRg <= 0 || rawRgBytes(s, dir, file) >= minRg
  }

  /** Docfeats layer SERVING gate (r16, the r15 verdict's one real
    * regression cluster): r15 size-gated layer INTAKE on the measured
    * bytes-per-row-group crossover but left layer SERVING always-on, so
    * at tiny scale the layer-served dispatchers (dd01/dd05, ta13–ta18,
    * sp11) paid the fixed 32-bucket read floor + histogram-join stages
    * where the legacy single-pass kernel scan of a few-MB corpus is
    * ~50 ms (driver sf0.1: ta14 0.32×, ta16 0.58×, ta17 0.52× …, while
    * the same paths win 2.6–12× at sf10). Same doctrine, same
    * criterion, own conf: a dispatcher serves the LAYERED form iff the
    * raw corpus file's bytes-per-row-group ≥
    * `spark.graft.docfeats.serve.minRgBytes` (default = the intake
    * crossover, 16 MB — once a corpus is worth ingesting it is worth
    * serving from the layers), else the legacy (r14) form, which the
    * DocFeatsSpec parity pins hold bit-identical. The suite and
    * PlanAudit force 0 so every plan pin and committed dump guards the
    * at-scale production shapes. Only the dispatchers whose legacy form
    * is a cheap one-pass kernel scan are gated; ta09/ta12/sp03/cp04 —
    * whose legacy forms re-tokenize per occurrence with string joins —
    * measured faster layered at BOTH scales and stay layered always. */
  private[graft] def serveDocfeatsLayered(s: SparkSession,
      dir: String): Boolean = {
    val minRg = s.conf.getOption("spark.graft.docfeats.serve.minRgBytes")
      .map(_.toLong).getOrElse(IntakeMinRgBytesDefault)
    minRg <= 0 || rawRgBytes(s, dir, "documents.parquet") >= minRg
  }

  private[graft] def intakeDocuments(s: SparkSession, dir: String): DataFrame =
    if (!rawNeedsIntake(s, dir, "documents.parquet")) Tables.documentsRaw(s, dir)
    else ensure(s, "docsrc", dir, () => Tables.documentsRaw(s, dir),
      Seq("doc_id"), Seq("doc_id"))

  /** Events intake (r15 opt, same §6 diagnosis as docsrc/embsrc): the
    * raw events.parquet is ONE file whose row-group count caps scan
    * parallelism (10 row groups at sf10 = a 10-task ceiling under every
    * events aggregate), and no pre-partitioning serves the per-user
    * operators. Bucketed by user_id, sorted (user_id, ts): q08's
    * top-1-per-user window, q22's as-of carry and sp05's
    * (event_type, user_id) partial aggregate all read their clustering
    * straight off the buckets (ClusteredDistribution accepts a subset
    * key), so their input exchange disappears. Row-identical to
    * [[graft.Tables.eventsRaw]] — EventsIntakeSpec pins equality. */
  private[graft] def intakeEvents(s: SparkSession, dir: String): DataFrame =
    if (!rawNeedsIntake(s, dir, "events.parquet")) Tables.eventsRaw(s, dir)
    else ensure(s, "evsrc", dir, () => Tables.eventsRaw(s, dir),
      Seq("user_id"), Seq("user_id", "ts"), fpFile = "events.parquet")

  private[graft] def intakeEmbeddings(s: SparkSession, dir: String): DataFrame =
    if (!rawNeedsIntake(s, dir, "embeddings.parquet")) Tables.embeddingsRaw(s, dir)
    else ensure(s, "embsrc", dir, () => Tables.embeddingsRaw(s, dir),
      Seq("vec_id"), Seq("vec_id"), fpFile = "embeddings.parquet")

  /** Distinct word-3-shingles (doc_id, s), bucketed+sorted by doc_id. */
  def shingles3(s: SparkSession, dir: String): DataFrame =
    ensure(s, "shingles3", dir,
      () => Dedup.wordShingles(Tables.documents(s, dir), 3),
      Seq("doc_id"), Seq("doc_id"))

  /** MinHash signature table (doc_id, mh00..mh15, bh0..bh3), bucketed by
    * doc_id — built FROM the shingle table, so the explode+distinct runs
    * once for the whole family. */
  def minhashSig(s: SparkSession, dir: String): DataFrame =
    ensure(s, "minhash", dir,
      () => Dedup.minhashSigFromShingles(shingles3(s, dir)),
      Seq("doc_id"), Seq("doc_id"))

  /** Positional K-token span hashes (doc_id, n_tokens, pos, h) for the
    * substring-span dedup pass (dd11), bucketed+sorted by h: the
    * duplicate-detection groupBy(h) and the join-back of positions
    * against the duplicated-h set both ride the bucket partitioning —
    * zero exchange — and the md5 span hashing (the layer's dominant
    * cost: one hash per token position per document) is paid once per
    * corpus instead of once per plan branch per run. */
  def spanPositions(s: SparkSession, dir: String): DataFrame =
    ensure(s, "spanpos", dir,
      () => Dedup.spanPositionRows(Tables.documents(s, dir)),
      Seq("h"), Seq("h"))

  /** The same shingle relation bucketed by the SHINGLE instead — the
    * inverted-index orientation: dd04's document-frequency cut
    * (groupBy s), its cut join (on s) and its pair self-join (on s) all
    * read co-bucketed data, so the whole candidate-generation chain runs
    * without an exchange. Storage duplicates [[shingles3]] by design:
    * at scale the two access patterns (by doc, by shingle) are both hot
    * and re-clustering per query IS the cost being removed. */
  def shinglesByShingle(s: SparkSession, dir: String): DataFrame =
    ensure(s, "shbys", dir,
      () => shingles3(s, dir),
      Seq("s"), Seq("s"))

  /** dd04's df-cut threshold: shingles with document frequency above
    * this are boilerplate ("stop-shingles") and take no part in n-gram
    * Jaccard. Part of the operator's semantics (the oracle applies the
    * same cut), hence baked into the prep tables like [[lshBands]]'s
    * cap. */
  val DfCut = 100

  /** The stop list (shingles with df > [[DfCut]]) as its OWN tiny prep
    * table: both kept orientations anti-join against it, and without the
    * materialization each kept build re-ran the full corpus-sized
    * groupBy-df aggregation at prep-write time (r5 ADVICE) — now the df
    * aggregate runs once per corpus. Bounded small by construction
    * (≤ occurrences/DfCut entries at any corpus size), so the reads
    * broadcast. */
  private def stopShingles(s: SparkSession, dir: String): DataFrame =
    ensure(s, "stops", dir,
      () => shinglesByShingle(s, dir)
        .groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") > DfCut).select(col("s")),
      Seq("s"), Seq("s"), variant = s"_df$DfCut")

  /** The kept (df ≤ [[DfCut]]) shingle relation in the BY-SHINGLE
    * orientation, carrying each row's PER-DOC kept-shingle count `n`
    * (the Jaccard denominator) — dd04's pair self-join reads two copies
    * of this and needs neither exchange, sort, nor any join at query
    * time (single file per bucket). Both one-time costs are paid here
    * at write: the anti-join against the SMALL stop side, and the
    * doc_id-keyed denominator attach — which at QUERY time planned as
    * either a corpus-sized broadcast or a doc_id SMJ that blinded the
    * bucketed read and re-shuffled both self-join sides (the sf1.0
    * census caught exactly that flip). Denormalizing one long onto the
    * shingle row is the classic storage-for-shuffle trade.
    *
    * SINGLETON-PRUNED (r16, guide §2.3 reduce-before-shuffle): rows
    * whose shingle has document frequency 1 are dropped at write time —
    * a df-1 shingle matches nothing in the `a.s = b.s` self-join, so it
    * contributes no candidate pair and no intersection count; the
    * Jaccard denominators are untouched because `n` is computed from
    * the UNPRUNED [[keptByDoc]] before the prune. dd04's output is
    * bit-identical (its only consumer; OperatorsSpec pins dd04 against
    * the oracle-mirroring unpruned composition), but the self-join
    * streams only the pairable rows — measured 83% of kept rows are
    * df-1 at sf1.0 (1.89M of 2.28M; the synthetic sf0.1 corpus has
    * almost none, so the prune is scale-progressive like everything
    * else in this family). Append safety: kepts is a DERIVED layer
    * that rebuilds from the appended shingle relation on next touch,
    * so a standing df-1 shingle that gains a partner in a later batch
    * re-enters on rebuild with df 2 (unlike lshBands, which is
    * append-maintained in place and therefore must NOT be pruned). */
  def keptByShingle(s: SparkSession, dir: String): DataFrame =
    ensure(s, "kepts", dir,
      () => {
        val n = keptByDoc(s, dir)
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val kept = shinglesByShingle(s, dir)
          .join(stopShingles(s, dir), Seq("s"), "left_anti")
        // df ≥ 2 prune: the groupBy(s) and the back-join on s both ride
        // the shbys bucketing (no exchange at build)
        val pairable = kept.join(
          kept.groupBy(col("s")).agg(count(lit(1)).as("df"))
            .filter(col("df") >= 2).select(col("s")),
          Seq("s"))
        pairable.join(n, Seq("doc_id"))
      },
      Seq("s"), Seq("s"), variant = s"_df${DfCut}np")

  /** The same kept relation BY DOC — per-doc kept-shingle counts
    * (dd04's Jaccard denominators) group on doc_id with no exchange. */
  def keptByDoc(s: SparkSession, dir: String): DataFrame =
    ensure(s, "keptd", dir,
      () => shingles3(s, dir)
        .join(stopShingles(s, dir), Seq("s"), "left_anti"),
      Seq("doc_id"), Seq("doc_id"), variant = s"_df$DfCut")

  /** Capped SimHash chunk relation (j, c, doc_id, simhash), bucketed by
    * (j, c) — dd06's Hamming-banding self-join reads co-bucketed data
    * with no exchange, same shape as [[lshBands]]. The signature itself
    * is map-side cheap (fused native kernels), so only the join-keyed
    * relation is worth materializing. */
  def simhashChunks(s: SparkSession, dir: String): DataFrame =
    ensure(s, "simchunks", dir,
      // since r15 the signature comes from the docfeats layer (the
      // same simhash60 kernel, computed once per corpus) instead of a
      // fresh corpus-wide tokenize+hash; chunks derive arithmetically
      () => capForLayer(s, "simchunks", dir, "",
        (0 to 3).foldLeft(TextFeatures.docFeats(s, dir)
            .select(col("doc_id"), col("simhash"))) { (df, j) =>
          df.withColumn(s"c$j", expr(s"(simhash >> ${15 * j}) & 32767"))
        }
          .select(col("doc_id"), col("simhash"),
            explode(map_from_arrays(
              array((0 to 3).map(lit): _*),
              array((0 to 3).map(j => col(s"c$j")): _*))).as(Seq("j", "c"))),
        Seq("j", "c"), "doc_id", Dedup.BucketCap)
        .select(col("j"), col("c"), col("doc_id"), col("simhash")),
      Seq("j", "c"), Seq("j", "c", "doc_id"))

  // ------------------------------------------------------ cap auditing

  /** Truncation audit of a capped layer write (r9 verdict #6 — the "no
    * silent caps" rule): what the cap dropped, recorded where a user
    * can query it. One row per build (or per ingest append) of a capped
    * layer.
    *
    * `keysTotal`/`keysCapped` universe is PER PRODUCER (r14 ADVICE): a
    * full BUILD row counts over every key of the layer (the IVF build
    * writes keys_total = k, the whole index); an APPEND row counts over
    * the keys the BATCH touched (for the IVF ingest: distinct primary ∪
    * spill target cells). Rows/`rowsIn`/`rowsKept`/`rowsDropped` always
    * describe the producing job's own input, so drop accounting
    * reconciles by summing rows per `layer` tag regardless of
    * producer. */
  final case class CapAudit(layer: String, cap: Long, keysTotal: Long,
      keysCapped: Long, rowsIn: Long, rowsKept: Long, rowsDropped: Long)

  /** In-session cap-audit log, drained like [[drainBuildLog]]. */
  private val capLog =
    new java.util.concurrent.ConcurrentLinkedQueue[CapAudit]

  /** Cap audits stashed by [[capForLayer]] during a build closure,
    * persisted by [[ensure]] only AFTER the layer write succeeds (r10
    * ADVICE: an audit row published before the layer itself would
    * describe a layer that was never published if the write fails).
    * Single-threaded by construction: capForLayer only runs inside
    * ensure's synchronized build. */
  private var pendingCapAudits: List[(String, CapAudit)] = Nil

  private[graft] def drainCapLog(): Seq[CapAudit] = {
    val b = Seq.newBuilder[CapAudit]
    var e = capLog.poll()
    while (e != null) { b += e; e = capLog.poll() }
    b.result()
  }

  /** The queryable audit table of a capped physical layer table —
    * `<physical-name>__audit`, one row per build/append event. */
  private[graft] def capAuditName(physical: String): String =
    physical + "__audit"

  private[graft] def writeCapAudit(s: SparkSession, physical: String,
      a: CapAudit, mode: String): Unit = {
    capLog.add(a)
    val logger = org.slf4j.LoggerFactory.getLogger(getClass)
    val msg = s"capped layer ${a.layer}: cap=${a.cap} keys=${a.keysTotal} " +
      s"capped_keys=${a.keysCapped} rows_in=${a.rowsIn} kept=${a.rowsKept} " +
      s"DROPPED=${a.rowsDropped}"
    if (a.rowsDropped > 0) logger.warn(msg) else logger.info(msg)
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("layer",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("cap",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("keys_total",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("keys_capped",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rows_in",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rows_kept",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rows_dropped",
        org.apache.spark.sql.types.LongType)))
    val row = org.apache.spark.sql.Row(a.layer, a.cap, a.keysTotal,
      a.keysCapped, a.rowsIn, a.rowsKept, a.rowsDropped)
    s.createDataFrame(Seq(row).asJava, schema)
      .write.mode(mode).format("parquet")
      .saveAsTable(capAuditName(physical))
  }

  /** Stash a cap-audit row computed by a build closure whose capping
    * logic doesn't fit [[capForLayer]]'s per-key histogram (the IVF
    * membership layer's two-level cap+spill): persisted by [[ensure]]
    * after the layer write succeeds, like every other audit. */
  private[operators] def stashCapAudit(s: SparkSession, family: String,
      dir: String, variant: String, a: CapAudit,
      fpFile: String = "documents.parquet"): Unit =
    pendingCapAudits ::= (naming(s, family, dir, variant, fpFile)._2 -> a)

  /** Cap a layer-build relation per key AND account for what the cap
    * drops — every capped LAYER WRITE goes through here, never through
    * a bare [[Dedup.capPerKey]]: computes the per-key histogram once on
    * the build-sized relation (pooled so the capped write below reuses
    * it), logs the truncation (WARN when anything was dropped), records
    * an in-session audit entry, and persists a queryable audit row next
    * to the layer. */
  private[operators] def capForLayer(s: SparkSession, family: String,
      dir: String, variant: String, df: DataFrame, keys: Seq[String],
      ord: String, cap: Int): DataFrame = {
    val base = Present.pooled(df)
    val perKey = base.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val r = perKey.agg(
      count(lit(1)).as("keys_total"),
      sum(when(col("n") > cap, 1L).otherwise(0L)).as("keys_capped"),
      sum(col("n")).as("rows_in"),
      sum(least(col("n"), lit(cap.toLong))).as("rows_kept")).head()
    val (kt, kc, ri, rk) = (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) 0L else r.getLong(2),
      if (r.isNullAt(3)) 0L else r.getLong(3))
    val physical = naming(s, family, dir, variant)._2
    // stash, don't write: ensure() persists the audit after the capped
    // layer itself lands (see pendingCapAudits)
    pendingCapAudits ::=
      (physical -> CapAudit(s"$family$variant", cap.toLong, kt, kc, ri, rk,
        ri - rk))
    Dedup.capPerKey(base, keys, ord, cap)
  }

  /** (b, bh, doc_id) band rows off a MinHash signature relation — the
    * un-capped lshBands body, shared with [[LayerMaintenance]]'s
    * batch-delta path. */
  private[operators] def bandsFromSig(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"),
      explode(map_from_arrays(
        array((0 to 3).map(lit): _*),
        array((0 to 3).map(b => col(s"bh$b")): _*))).as(Seq("b", "bh")))
      .select(col("b"), col("bh"), col("doc_id"))

  /** Capped LSH band relation (b, bh, doc_id), bucketed by (b, bh): both
    * sides of the candidate self-join read the same buckets — no
    * exchange. The [[Dedup.BucketCap]] is applied before writing (it is
    * part of the operator's semantics, not a per-query choice). */
  def lshBands(s: SparkSession, dir: String): DataFrame =
    ensure(s, "lshbands", dir,
      () => capForLayer(s, "lshbands", dir, "",
          bandsFromSig(minhashSig(s, dir)),
          Seq("b", "bh"), "doc_id", Dedup.BucketCap)
        .select(col("b"), col("bh"), col("doc_id")),
      Seq("b", "bh"), Seq("b", "bh", "doc_id"))
}
