package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupPrepare, Similarity, TextAnalysis}

/** Skew-adversarial soak (r2 verdict "Next round" #4): a corpus built to
  * break the pair-forming joins —
  *   (a) one boilerplate 3-gram shared by 1300 docs (hot inverted-index
  *       shingle),
  *   (b) one exact-duplicate cluster LARGER than [[Dedup.BucketCap]]
  *       (1150 identical docs → every LSH band bucket, SimHash chunk
  *       bucket and learned embedding cell is degenerate),
  *   (c) an empty/whitespace-text block (degenerate tokenization).
  * The assertions are on CANDIDATE COUNTS and retained-member semantics,
  * not wall time: the caps must bound every pair join at C(cap, 2) with
  * the lowest-id members retained, the stop-shingle cut must remove the
  * hot shingles entirely, and the no-token block must vanish from the
  * shingle family while still deduping exactly.
  */
class AdversarialScaleSpec extends AnyFunSuite with SparkTestBase {

  private val Cap = Dedup.BucketCap // 1000
  private val ClusterN = 1150      // > Cap
  private val pairsOfCap = Cap.toLong * (Cap - 1) / 2

  /** One-time adversarial corpus in a temp dir (documents + embeddings
    * parquet with the TESTDATA schemas). */
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_adv").toString
    val cluster = (0 until ClusterN).map { i =>
      (i.toLong, "alpha beta gamma delta epsilon", "en", "cluster", 29L)
    }
    val unique = (0 until 1300).map { i =>
      (2000L + i,
        s"u${i}x u${i}y u${i}z common boilerplate phrase u${i}w u${i}v",
        "en", "unique", 40L)
    }
    val empty = (0 until 200).map { i =>
      (5000L + i, if (i % 2 == 0) "" else "   \t ", "en", "empty", 0L)
    }
    (cluster ++ unique ++ empty).toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8).write.parquet(s"$d/documents.parquet")

    val hotVec = Array.fill(8)(0.5f).toSeq
    val hotCell = (0 until 1100).map(i => (i.toLong, hotVec, 0))
    val rest = (0 until 100).map { i =>
      // pseudo-random, pairwise non-proportional (a modular pattern here
      // once produced exact duplicates whose cosine TIED the hot cell's)
      (2000L + i,
        (0 until 8).map(j => 0.1f + (((i * 2654435761L + j * 40503L) % 997L) / 997.0f)),
        1 + i % 4)
    }
    (hotCell ++ rest).toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .repartition(4).write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("lshBands: every degenerate band bucket capped, lowest ids retained") {
    val bands = DedupPrepare.lshBands(spark, dir)
    val perBucket = bands.groupBy("b", "bh").count()
    assert(perBucket.agg(max("count")).head.getLong(0) <= Cap)
    // the cluster's buckets hit the cap exactly, and the retained members
    // are the 1000 LOWEST cluster ids (0..999 of 0..1149)
    val hot = perBucket.filter(col("count") === Cap)
    assert(hot.count() == 4) // all 4 bands of the identical-doc cluster
    val kept = bands.join(hot.select("b", "bh"), Seq("b", "bh"))
      .agg(max("doc_id"), min("doc_id"), countDistinct("doc_id"))
      .head()
    assert(kept.getLong(0) == Cap - 1 && kept.getLong(1) == 0L)
    assert(kept.getLong(2) == Cap)
  }

  test("dd03: degenerate cluster emits exactly C(cap,2) verified pairs") {
    val pairs = Dedup.dd03(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounded: C(1000,2), NOT C(1150,2) — the cap held under degeneracy;
    // stray band collisions among unique docs die at the Jaccard verify
    assert(pairs.count() == pairsOfCap)
    val ids = pairs.agg(max("d1"), max("d2"), min(col("jaccard"))).head()
    assert(ids.getLong(0) == Cap - 2 && ids.getLong(1) == Cap - 1)
    assert(ids.getDouble(2) == 1.0) // identical docs: exact Jaccard 1
    pairs.unpersist()
  }

  test("dd08: the capped clique resolves to ONE cluster of cap members") {
    val cl = Dedup.dd08(spark, dir)
    val agg = cl.agg(countDistinct("cluster_id"), count(lit(1)),
      max("cluster_size")).head()
    assert(agg.getLong(0) == 1L)      // one component
    assert(agg.getLong(1) == Cap.toLong)
    assert(agg.getLong(2) == Cap.toLong)
  }

  test("connectedComponents: a 4096-node chain converges inside the round guard") {
    import spark.implicits._
    // the pathological anti-near-clique: a pure CHAIN, diameter 4095.
    // One-hop propagation needs one round per hop (4095 ≫ any sane
    // guard); the adaptive pointer-jumping rounds halve path lengths,
    // so maxIter=30 only passes if the O(log d) path is live (~14
    // rounds for 4096). Fixpoint semantics must be unchanged: one
    // component, labeled by its minimum id.
    val n = 4096
    val chain = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("d1", "d2")
    val cc = Dedup.connectedComponents(chain, maxIter = 30).collect()
    assert(cc.length == n)
    assert(cc.forall(r => r.getLong(1) == 0L && r.getLong(2) == n.toLong))
  }

  test("dd04: boilerplate and cluster shingles die at the df cut — zero pairs") {
    // the shared 3-grams have df 1300 (boilerplate) and 1150 (cluster),
    // both > 100; what remains is per-doc-unique → the inverted index
    // CANNOT form a single pair, instead of exploding quadratically
    assert(Dedup.dd04(spark, dir).count() == 0)
  }

  test("dd12: LSH gate + df cut — candidates exist but zero scored pairs") {
    // the cluster docs DO co-bucket in the LSH bands (they're identical),
    // but every shingle they own dies at the df cut, so the exact-Jaccard
    // stage has nothing to score — the gate and the cut compose
    assert(Dedup.dd12(spark, dir).count() == 0)
  }

  test("dd13: containment rides the same gate + cut — zero scored pairs too") {
    // same composition property as dd12: the asymmetric scorer can only
    // see pairs that survive BOTH the band gate and the df cut, so the
    // degenerate cluster can't reach the containment arithmetic either
    assert(Dedup.dd13(spark, dir).count() == 0)
  }

  test("dd06: top-20 all Hamming-0 pairs from the capped retained set") {
    val top = Dedup.dd06(spark, dir).collect()
    assert(top.length == 20)
    assert(top.forall(_.getAs[Int]("hamming") == 0))
    // ordering (hamming, d1, d2) ⇒ the 20 lowest retained cluster pairs
    assert(top.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      (1 to 20).map(j => (0L, j.toLong)))
  }

  test("dd07: hot learned cell capped; top-20 are exact-tie lowest retained ids") {
    val top = Dedup.dd07(spark, dir).collect()
    assert(top.length == 20)
    assert(top.forall(r => math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9))
    // identical hot vectors → identical cosine doubles → exact ties →
    // (v1, v2) ascending; and every id ≤ 999 proves the 1100-member cell
    // was capped to its lowest 1000 vec_ids
    assert(top.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      (1 to 20).map(j => (0L, j.toLong)))
  }

  test("ss02: IVF completes against the degenerate cell, k×queries shape") {
    val r = Similarity.ss02(spark, dir)
    assert(r.count() == 50) // 10 queries × top-5
    // query 0 lives in the hot cell; its neighbors are exact ties at 1.0
    val q0 = r.filter(col("query_id") === 0).collect()
    assert(q0.forall(x => math.abs(x.getAs[Double]("cosine") - 1.0) < 1e-12))
  }

  test("as-of join: one hot user owning every event still attributes correctly") {
    import spark.implicits._
    // the as-of union-tag plan sorts WITHIN the key's partition — a hot
    // key means one big per-partition sort, never a cross product; pin
    // that the carry stays correct across a long single-user history
    val n = 50000
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val clicks = (0 until n).map(i =>
      (i.toLong, 7L, new java.sql.Timestamp(base + i * 1000L), i.toDouble))
      .toDF("event_id", "user_id", "ts", "value")
    // a purchase every 100 s: click i matches purchase floor(i/100)*100
    val purchases = (0 until n by 100).map(i =>
      (7L, 100000L + i, new java.sql.Timestamp(base + i * 1000L), 1.0))
      .toDF("user_id", "p_event_id", "p_ts", "p_value")
    val out = graft.operators.AsOfJoin.asOf(clicks, purchases, Seq("user_id"),
      "ts", "p_ts", Seq("p_event_id", "p_ts", "p_value"), "p_event_id")
    val bad = out.filter(
      col("asof_p_event_id") =!= lit(100000L) + (col("event_id") - col("event_id") % 100))
    assert(bad.count() == 0)
    assert(out.count() == n.toLong)
  }

  test("hot-key windows: q21/q08/q07 stay correct when one key owns 40% of rows") {
    import spark.implicits._
    // the user-keyed window family (Window.partitionBy(user_id))
    // serializes each key into one task — intrinsic to per-key order.
    // The bound is O(hot log hot) for that one task, NOT a cross
    // product and NOT a full-relation skew: pin the semantics under a
    // power-law key owning 40% of all rows (r4 verdict #2).
    val d = java.nio.file.Files.createTempDirectory("graft_hot").toString
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    // hot user 7: 20k events in 200 bursts of 100 (1 s apart inside a
    // burst, 1 h between bursts) → exactly 200 sessions of 100 events
    val hot = (0 until 20000).map { i =>
      (i.toLong, new java.sql.Timestamp(base + (i / 100) * 3600000L + (i % 100) * 1000L),
        7L, "click", 5.0, "{}")
    }
    // 3000 cold users, 10 events each 10 s apart → one session per user
    val cold = (0 until 30000).map { i =>
      (100000L + i, new java.sql.Timestamp(base + (i / 3000) * 10000L),
        1000L + i % 3000, "click", (i % 17).toDouble, "{}")
    }
    (hot ++ cold).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(8).write.parquet(s"$d/events.parquet")
    (hot.take(2000) ++ cold.take(3000)).map(t => (t._1, t._3, t._5))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .repartition(4).write.parquet(s"$d/orders.parquet")

    val sess = graft.operators.Relational.q21(spark, d).collect()
    val hotSess = sess.filter(_.getAs[Long]("user_id") == 7L)
    assert(hotSess.length == 200)
    assert(hotSess.forall(r => r.getAs[Long]("n_events") == 100L &&
      r.getAs[Long]("duration_sec") == 99L))
    assert(sess.count(_.getAs[Long]("user_id") != 7L) == 3000)

    // q08 top-1: the hot user's 20k values all TIE → unique-id
    // tiebreak must pick the lowest event_id, deterministically
    val top = graft.operators.Relational.q08(spark, d).collect()
    val hotTop = top.filter(_.getAs[Long]("user_id") == 7L)
    assert(hotTop.length == 1 && hotTop.head.getAs[Long]("event_id") == 0L)
    assert(top.length == 3001)

    // q07, same window shape on orders: hot custkey all-tied prices
    val o = graft.operators.Relational.q07(spark, d).collect()
    val hotO = o.filter(_.getAs[Long]("o_custkey") == 7L)
    assert(hotO.length == 1 && hotO.head.getAs[Long]("o_orderkey") == 0L)
  }

  test("q23 bins: degenerate all-equal values land in exactly one bin") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_q23").toString
    val ts0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    // all values identical → min=p50=p95=p99 → bins 1-3 are empty
    // half-open ranges and ONLY bin 4 [p99, ∞) matches
    val rows = (0 until 1000).map(i => (i.toLong, ts0, i.toLong, "burst", 42.0, "{}")) ++
      Seq((9999L, ts0, 1L, "normal", 1.0, "{}"), (9998L, ts0, 2L, "normal", 2.0, "{}"),
        (9997L, ts0, 3L, "normal", 3.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = graft.operators.Relational.q23(spark, d).collect()
    val burst = out.filter(_.getString(0) == "burst")
    assert(burst.length == 1 && burst.head.getInt(1) == 4 &&
      burst.head.getLong(2) == 1000L)
    // and the bins always partition the events exactly (no double count)
    assert(out.map(_.getLong(2)).sum == rows.length.toLong)
  }

  test("empty-text block: absent from the shingle family, exact-deduped by dd01") {
    // no-token docs never reach the materialized shingle layer
    assert(DedupPrepare.shingles3(spark, dir)
      .filter(col("doc_id") >= 5000).count() == 0)
    // and ta05 drops them (no groupable tokens)
    assert(TextAnalysis.ta05(spark, dir)
      .filter(col("doc_id") >= 5000).count() == 0)
    // but exact dedup still sees them. SQL trim strips only spaces (both
    // engines), so "" normalizes to "" and "   \t " to " " — TWO content
    // groups of 100, keepers = each group's lowest id
    val g = Dedup.dd01(spark, dir).filter(col("doc_id") >= 5000)
    val agg = g.agg(countDistinct("sig"), max("group_n"), min("keeper_id")).head()
    assert(agg.getLong(0) == 2L && agg.getLong(1) == 100L && agg.getLong(2) == 5000L)
    assert(g.filter(col("is_dup") === 0).count() == 2) // one keeper per group
  }

  test("dd01: one sig owning 50% of all docs partial-aggregates map-side, no window task") {
    import spark.implicits._
    // r8 verdict #1: keeper/group-size must NEVER be min/count over
    // Window.partitionBy(sig) — a WindowExec partition holds the whole
    // dup group in one task. At 100 TB the content-hash key is
    // GUARANTEED skewed (empty docs, boilerplate pages: 10⁶–10⁸-member
    // groups are normal in web corpora). Pin both the plan shape (partial
    // min/count BEFORE the shuffle, zero WindowExec) and the semantics
    // under a sig owning half the corpus.
    val d = java.nio.file.Files.createTempDirectory("graft_dd01skew").toString
    val hot = (0 until 2500).map(i =>
      (i.toLong, "the exact same boilerplate page", "en", "hot", 31L))
    val uniq = (0 until 2500).map(i =>
      (10000L + i, s"unique document $i body", "en", "uniq", 20L))
    (hot ++ uniq).toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8).write.parquet(s"$d/documents.parquet")

    val df = Dedup.dd01(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "dd01 must not window over the content-hash key")
    assert(plan.contains("partial_min") && plan.contains("partial_count"),
      "keeper/group_n must partial-aggregate before the shuffle")

    val rows = df.collect()
    val hotRows = rows.filter(_.getAs[Long]("group_n") == 2500L)
    assert(hotRows.length == 2500)
    assert(hotRows.forall(_.getAs[Long]("keeper_id") == 0L))
    assert(hotRows.count(_.getAs[Int]("is_dup") == 0) == 1)
    assert(rows.count(_.getAs[Long]("group_n") == 1L) == 2500)

    // mm05 shares the contract on the perceptual hash key: same plan
    // shape — partial aggregation, no window over (phash_hi, phash_lo)
    val mplan = graft.operators.Multimodal.mm05(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!mplan.contains("Window"),
      "mm05 must not window over the perceptual-hash key")
    assert(mplan.contains("partial_min") && mplan.contains("partial_count"))
  }
}
