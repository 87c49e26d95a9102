package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

import java.sql.Timestamp

/** Streaming semantics tests with MemoryStream: windowed rollup equals
  * its batch twin; watermark drops late data; stateful percentiles match
  * the positional batch definition across micro-batches. */
class StreamingSpec extends AnyFunSuite with SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourly rollup matches the batch computation on the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts("2023-03-01 10:05:00"), "click", 1.0),
      (ts("2023-03-01 10:55:00"), "click", 3.0),
      (ts("2023-03-01 10:30:00"), "view", 5.0),
      (ts("2023-03-01 11:10:00"), "click", 7.0))
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = EventStreams.hourlyRollup(mem.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("roll").outputMode("update").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val got = spark.table("roll")
      .select("hour_start", "event_type", "n", "sum_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    q.stop()
    val exp = spark.createDataset(rows).toDF("ts", "event_type", "value")
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == exp)
    assert(got.contains((ts("2023-03-01 10:00:00"), "click", 2L, 4.0)))
  }

  test("watermark drops events later than 10 minutes behind the max") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = EventStreams.hourlyRollup(mem.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("wm").outputMode("append").start()
    // batch 1 advances the watermark to 11:50
    mem.addData((ts("2023-03-01 10:10:00"), "click", 1.0))
    q.processAllAvailable()
    mem.addData((ts("2023-03-01 12:00:00"), "click", 2.0))
    q.processAllAvailable()
    // 10:xx window is now closed (watermark 11:50) → this late row is dropped
    mem.addData((ts("2023-03-01 10:20:00"), "click", 100.0))
    q.processAllAvailable()
    mem.addData((ts("2023-03-01 13:30:00"), "click", 3.0))
    q.processAllAvailable()
    q.stop()
    val hour10 = spark.table("wm")
      .filter(col("hour_start") === ts("2023-03-01 10:00:00")).collect()
    assert(hour10.length == 1)
    assert(hour10.head.getAs[Long]("n") == 1L) // late 100.0 row not counted
  }

  test("running percentiles: positional picks evolve across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val q = EventStreams.runningPercentiles(mem.toDS())
      .writeStream.format("memory").queryName("pct").outputMode("update").start()
    mem.addData(("gc", 100.0), ("gc", 300.0), ("gc", 200.0))
    q.processAllAvailable()
    mem.addData(("gc", 400.0), ("gc", 500.0), ("other", 42.0))
    q.processAllAvailable()
    q.stop()
    val updates = spark.table("pct").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getDouble(6)))
    // first batch: n=3 over [100,200,300] → p50 idx round(1.5)=2 → 200
    assert(updates.contains(("gc", 3L, 200.0, 300.0)))
    // second batch folds to [100..500]: p50 idx round(2.5)=3 → 300, max 500
    assert(updates.contains(("gc", 5L, 300.0, 500.0)))
    assert(updates.contains(("other", 1L, 42.0, 42.0)))
  }

  test("gc log stream: raw GCInspector lines → watermarked hourly rollup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = EventStreams.gcLogStream(mem.toDS())
      .writeStream.format("memory").queryName("gcs").outputMode("update").start()
    mem.addData(
      ("n1", "INFO  [Service Thread] 2023-03-01 10:00:00,123 GCInspector.java:284 - ParNew GC in 210ms.  x"),
      ("n1", "INFO  [Service Thread] 2023-03-01 10:30:00,456 GCInspector.java:284 - ParNew GC in 450ms.  x"),
      ("n1", "INFO  [main] 2023-03-01 10:31:00,000 StorageService.java:100 - not a gc line"),
      ("n2", "INFO  [ScheduledTasks:1] 2023-03-01 10:45:00,789 GCInspector.java:284 - ParNew GC in 100ms.  x"),
      ("n3", "INFO  [Service Thread] NOT-A-DATE 10:45:00,789 GCInspector.java:284 - ParNew GC in 100ms.  x"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("gcs")
      .select("hour_start", "event_type", "n", "sum_value").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set(
      (ts("2023-03-01 10:00:00"), "n1", 2L, 660.0),
      (ts("2023-03-01 10:00:00"), "n2", 1L, 100.0)))
  }

  test("fromParquetDir streams the nanos-timestamp events table") {
    // the streaming file source wants a directory; stage the single file
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val q = graft.streaming.EventStreams
      .fromParquetDir(spark, dir.toString)
      .writeStream.format("memory").queryName("pq").outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("pq")
    val total = rows.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    val batch = Tables.events(spark, "/root/testdata/sf0.001").count()
    assert(total == batch) // every event lands in exactly one hourly window
  }

  test("sessionize: gap closes a session; watermark timeout flushes the open one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val q = EventStreams.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    // user 1: two events 10 min apart (one session), then a 40-min gap
    // event (closes it in-stream); user 2: one lone event
    mem.addData(
      (1L, ts("2023-03-01 10:00:00")), (1L, ts("2023-03-01 10:10:00")),
      (2L, ts("2023-03-01 10:05:00")))
    q.processAllAvailable()
    mem.addData((1L, ts("2023-03-01 10:50:00")))
    q.processAllAvailable()
    // advance the watermark far past every open session's end+gap so the
    // event-time timeout flushes them (12:30 - 10min wm >> 11:20)
    mem.addData((99L, ts("2023-03-01 12:30:00")))
    q.processAllAvailable()
    mem.addData((99L, ts("2023-03-01 14:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess")
      .select("user_id", "start_ts", "end_ts", "n_events", "duration_sec")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getLong(4))).toSet
    // batch q21 semantics on the same rows: user 1 splits at the 40-min
    // gap into [10:00,10:10] and [10:50,10:50]; user 2 has a singleton
    assert(got.contains((1L, ts("2023-03-01 10:00:00"), ts("2023-03-01 10:10:00"), 2L, 600L)))
    assert(got.contains((1L, ts("2023-03-01 10:50:00"), ts("2023-03-01 10:50:00"), 1L, 0L)))
    assert(got.contains((2L, ts("2023-03-01 10:05:00"), ts("2023-03-01 10:05:00"), 1L, 0L)))
  }

  test("sessionize: a late event far before the open session closes as a singleton") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val q = EventStreams.sessionize(mem.toDS(), gapSec = 300L)
      .writeStream.format("memory").queryName("sessLate").outputMode("append").start()
    // 10:00 then 10:30: the 30-min gap closes [10:00] and opens [10:30]
    mem.addData((1L, ts("2023-03-01 10:00:00")), (1L, ts("2023-03-01 10:30:00")))
    q.processAllAvailable()
    // 10:21 is on-time for the 10-min watermark (10:20) but more than the
    // 5-min gap BEFORE the open session's 10:30 start: it must become its
    // own closed singleton, NOT back-extend [10:30] across a 9-min hole
    mem.addData((1L, ts("2023-03-01 10:21:00")))
    q.processAllAvailable()
    // flush the open session via the event-time timeout
    mem.addData((99L, ts("2023-03-01 12:00:00")))
    q.processAllAvailable()
    mem.addData((99L, ts("2023-03-01 14:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessLate")
      .select("user_id", "start_ts", "end_ts", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(got.contains((1L, ts("2023-03-01 10:00:00"), ts("2023-03-01 10:00:00"), 1L)))
    assert(got.contains((1L, ts("2023-03-01 10:21:00"), ts("2023-03-01 10:21:00"), 1L)))
    assert(got.contains((1L, ts("2023-03-01 10:30:00"), ts("2023-03-01 10:30:00"), 1L)))
  }

  test("dedupStream drops same-content re-arrivals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val q = EventStreams.dedupStream(mem.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    mem.addData(
      (ts("2023-03-01 10:00:00"), 1L, "Hello  World"),
      (ts("2023-03-01 10:01:00"), 2L, "hello world"), // same normalized content
      (ts("2023-03-01 10:02:00"), 3L, "something else"))
    q.processAllAvailable()
    // re-arrival in a later micro-batch, still inside the watermark
    mem.addData((ts("2023-03-01 10:10:00"), 4L, "HELLO   world"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dedup").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L)) // first arrival per content survives
  }

  test("probeStream: arrivals probe corpus indexes via stream-static joins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_probe").toString
    val base = (1 to 50).map(i => s"tok$i").mkString(" ")
    val alpha = (1 to 50).map(i => s"alpha$i").mkString(" ")
    Seq(1L -> base, 2L -> alpha, 3L -> "a short unrelated corpus doc")
      .map { case (id, t) => (id, t, "en", "u", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // the per-row HOF bands are value-identical to the batch layer's
    val batchSig = graft.operators.DedupPrepare.minhashSig(spark, dir)
      .select("doc_id", "bh0", "bh1", "bh2", "bh3").collect()
      .map(r => r.getLong(0) -> (0 to 3).map(b => r.getLong(1 + b))).toMap
    val bc = graft.operators.Curation.bandCols(col("text"))
    val hofSig = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id") +: bc.zipWithIndex.map { case (c, b) => c.as(s"bh$b") }: _*)
      .collect().map(r => r.getLong(0) -> (0 to 3).map(b => r.getLong(1 + b))).toMap
    assert(hofSig == batchSig)
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.Curation
      .probeStream(spark, mem.toDF().toDF("doc_id", "text"), dir)
      .writeStream.format("memory").queryName("probe").outputMode("append").start()
    mem.addData(
      (101L, "  " + base.toUpperCase + "  "), // normalizes to corpus doc 1
      (102L, alpha + " extra"))               // near-dup of corpus doc 2
    q.processAllAvailable()
    // second micro-batch: the probe is stateless per arrival
    mem.addData((103L, "completely fresh crawl content never seen before"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("probe").collect()
      .map(r => r.getLong(0) ->
        (r.getString(4), if (r.isNullAt(2)) -1L else r.getLong(2), r.getInt(3)))
      .toMap
    assert(got(101L) == ("drop_exact", 1L, got(101L)._3))
    assert(got(102L)._1 == "flag_near" && got(102L)._2 == -1L && got(102L)._3 >= 1)
    assert(got(103L) == ("ingest", -1L, 0))
  }

  test("rangeStream: streamed queries match batch ss08 on the standing index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val batch = graft.operators.Similarity.ss08(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty)
    val qvecs = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 10).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = graft.operators.Similarity
      .rangeStream(spark, mem.toDF().toDF("query_id", "embedding"), dir)
      .writeStream.format("memory").queryName("rng").outputMode("append").start()
    mem.addData(qvecs.take(5): _*)
    q.processAllAvailable()
    mem.addData(qvecs.drop(5): _*) // second micro-batch: stateless probe
    q.processAllAvailable()
    q.stop()
    val got = spark.table("rng").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // bit-identical pairs AND cosines: same routing (literal centroids),
    // same capped membership, same grid arithmetic, same theta
    assert(got == batch)
  }

  test("rangeStreamWhere: predicate variant matches batch ss10 (filtered range)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val batch = graft.operators.Similarity.ss10(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty)
    val meta = graft.Tables.documents(spark, dir)
      .filter(col("lang") === graft.operators.Similarity.FilterLang)
      .select(col("doc_id").as("neighbor_id"))
    val qvecs = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 10).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = graft.operators.Similarity
      .rangeStreamWhere(spark, mem.toDF().toDF("query_id", "embedding"), dir,
        Some(meta))
      .writeStream.format("memory").queryName("rngf").outputMode("append").start()
    mem.addData(qvecs: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("rngf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == batch)
    // and the unfiltered stream strictly contains the filtered one
    val unf = graft.operators.Similarity.ss08(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.subsetOf(unf) && got.size < unf.size)
  }

  test("quality gate runs statelessly on a stream and matches the batch gate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "one two three", 13L),                                   // too_short
      (2L, "zz yy xx ww vv uu tt ss rr qq pp", 31L),                // no_lang_signal
      (3L, Seq.fill(10)("the cat").mkString(" "), 79L),             // repetitive
      (4L, (1 to 60).map(i => s"the w$i").mkString(" "), 400L))     // keep
    val mem = MemoryStream[(Long, String, Long)]
    val q = graft.operators.TextAnalysis
      .gateStream(spark, mem.toDF().toDF("doc_id", "text", "n_chars"))
      .writeStream.format("memory").queryName("gate").outputMode("append").start()
    mem.addData(docs.take(2): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(2): _*)  // second micro-batch: no cross-batch state
    q.processAllAvailable()
    q.stop()
    val got = spark.table("gate").collect()
      .map(r => r.getLong(0) -> (r.getString(5), r.getInt(6))).toMap
    assert(got == Map(1L -> ("too_short", 0), 2L -> ("no_lang_signal", 0),
      3L -> ("repetitive", 0), 4L -> ("keep", 1)))
    // parity: the stream rows equal the batch gate over the same relation
    val batch = graft.operators.TextAnalysis
      .gateStream(spark, docs.toDF("doc_id", "text", "n_chars")).collect()
      .map(r => r.getLong(0) -> (r.getString(5), r.getInt(6))).toMap
    assert(batch == got)
  }

  test("ingest chain: gate rejects never reach dedup state; first arrival wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def good(tag: String) = (1 to 60).map(i => s"the $tag$i").mkString(" ")
    val mem = MemoryStream[(Timestamp, Long, String, Long)]
    val q = graft.operators.Curation
      .ingestStream(spark, mem.toDF().toDF("ts", "doc_id", "text", "n_chars"))
      .writeStream.format("memory").queryName("ingest").outputMode("append").start()
    mem.addData(
      (ts("2023-03-01 10:00:00"), 1L, "one two three", 13L),      // gate: too_short
      (ts("2023-03-01 10:01:00"), 2L, good("a"), 400L),           // keeper
      (ts("2023-03-01 10:02:00"), 3L, good("b"), 400L))           // keeper
    q.processAllAvailable()
    mem.addData(
      (ts("2023-03-01 10:10:00"), 4L, "  " + good("a").toUpperCase, 402L), // dup of 2
      (ts("2023-03-01 10:11:00"), 5L, good("c"), 400L))           // keeper
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("ingest").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 5L)) // 1 gated out, 4 deduped out
  }

  test("as-of stream parity: in-order rows reproduce the batch q22 attribution") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, ts("2026-01-01 10:00:00"), 10L, "click", 1.0),    // no prior → NULL
      (101L, ts("2026-01-01 11:00:00"), 10L, "purchase", 10.0),
      (102L, ts("2026-01-01 11:00:00"), 10L, "purchase", 20.0), // equal-ts: 102 wins
      (2L, ts("2026-01-01 11:00:00"), 10L, "click", 2.0),    // inclusive at equal ts
      (3L, ts("2026-01-01 12:00:00"), 10L, "click", 3.0),
      (201L, ts("2026-01-01 09:00:00"), 20L, "purchase", 30.0),
      (4L, ts("2026-01-01 11:00:00"), 20L, "click", 4.0),
      (5L, ts("2026-01-01 12:00:00"), 30L, "view", 5.0))     // other types ignored
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = EventStreams.asOfStream(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("asof").outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    // batch twin on the same rows
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val batch = graft.operators.AsOfJoin.asOf(
        ev.filter($"event_type" === "click").select("event_id", "user_id", "ts", "value"),
        ev.filter($"event_type" === "purchase").select($"user_id",
          $"event_id".as("p_event_id"), $"ts".as("p_ts"), $"value".as("p_value")),
        Seq("user_id"), "ts", "p_ts",
        Seq("p_event_id", "p_ts", "p_value"), "p_event_id")
    val got = spark.table("asof").collect()
      .map(r => (r.getLong(0), Option(r.get(4)), Option(r.get(6))))
      .sortBy(_._1).toSeq
    val want = batch.collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.get(r.fieldIndex("asof_p_event_id"))),
        Option(r.get(r.fieldIndex("asof_p_value")))))
      .sortBy(_._1).toSeq
    assert(got == want)
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L)) // clicks only, 'view' ignored
    assert(got(1)._2.contains(102L)) // equal-ts inclusive, max-id tie-break
  }

  test("as-of stream late data: old purchase ignored, pre-purchase click gets NULL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = EventStreams.asOfStream(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("asof_late").outputMode("append").start()
    mem.addData((300L, ts("2026-01-01 12:00:00"), 1L, "purchase", 1.0))
    q.processAllAvailable()
    // batch 2, all LATE relative to the stored 12:00 purchase:
    mem.addData(
      (299L, ts("2026-01-01 11:00:00"), 1L, "purchase", 2.0), // older → ignored
      (30L, ts("2026-01-01 11:30:00"), 1L, "click", 3.0),     // pre-purchase → NULL
      (31L, ts("2026-01-01 13:00:00"), 1L, "click", 4.0))     // after → attributed to 300
    q.processAllAvailable()
    q.stop()
    val got = spark.table("asof_late").collect()
      .map(r => r.getLong(0) -> Option(r.get(4))).toMap
    // no-lookahead contract: the 11:30 click must NOT see the 12:00
    // purchase, and the evicted 11:00 purchase cannot resurface
    assert(got(30L).isEmpty)
    assert(got(31L).contains(300L))
  }

  test("stream-static bin join: windowed counts match the batch binning") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // static side: bins computed batch-side from a reference slice
    val refSlice = (0 until 200).map(i =>
      (i.toLong, ts("2023-06-01 09:00:00"), i.toLong, "m", i % 40 * 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val bins = graft.operators.Relational.valueBins(refSlice).collect().toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        if (r.isNullAt(3)) Option.empty[Double] else Some(r.getDouble(3))))
      .toDF("bt", "bin_id", "lo", "hi") // materialized: truly static
    val live = (0 until 300).map(i =>
      (ts(f"2023-06-01 ${10 + i % 2}%02d:00:00"), "m", i % 40 * 1.0))
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = EventStreams.windowedBinCounts(
        mem.toDF().toDF("ts", "event_type", "value"), bins)
      .writeStream.format("memory").queryName("binw").outputMode("update").start()
    live.grouped(120).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val stream = spark.table("binw").collect()
      .groupBy(r => (r.getTimestamp(0), r.getString(1), r.getInt(2)))
      .map { case (k, rs) => k -> rs.map(_.getLong(3)).max }
    val batch = live.toDF("ts", "event_type", "value")
      .join(bins, col("event_type") === col("bt") &&
        col("value") >= col("lo") && (col("hi").isNull || col("value") < col("hi")))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"), col("bin_id"))
      .count().collect()
      .map(r => (r.getStruct(0).getTimestamp(0), r.getString(1), r.getInt(2)) ->
        r.getLong(3)).toMap
    assert(stream == batch && stream.nonEmpty)
    // every live event landed in exactly one bin
    assert(stream.values.sum == live.length.toLong)
  }

  test("stream-static bin join: a live value below the static min still lands in bin 1") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // static bins derived from a batch slice whose min value is 0
    val refSlice = (0 until 200).map(i =>
      (i.toLong, ts("2023-06-01 09:00:00"), i.toLong, "m", i % 40 * 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val bins = graft.operators.Relational.valueBins(refSlice).collect().toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        if (r.isNullAt(3)) Option.empty[Double] else Some(r.getDouble(3))))
      .toDF("bt", "bin_id", "lo", "hi")
    // live stream drifts BELOW the slice's min — bin 1 is open downward,
    // so these must count into bin 1 rather than vanish (r4 ADVICE)
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = EventStreams.windowedBinCounts(
        mem.toDF().toDF("ts", "event_type", "value"), bins)
      .writeStream.format("memory").queryName("binw_under").outputMode("update").start()
    mem.addData(
      (ts("2023-06-01 10:00:00"), "m", -5.0),
      (ts("2023-06-01 10:10:00"), "m", 0.0),
      (ts("2023-06-01 10:20:00"), "m", 25.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("binw_under").collect()
      .map(r => r.getInt(2) -> r.getLong(3)).toMap
    assert(got == Map(1 -> 2L, 2 -> 1L), got.toString) // -5 and 0 in bin 1; 25 in bin 2
  }

  test("RocksDB state store: fMGWS operators run green with bounded state metrics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the production state backend: HDFSBackedStateStoreProvider keeps
    // every key's state on the executor HEAP — at 100 TB the state
    // store must spill to disk, which is exactly what RocksDB provides.
    // This spec proves the custom-state operators' state classes
    // round-trip through RocksDB (serialization happens on EVERY
    // access there, unlike the heap provider's object reuse) and that
    // state stays key-bounded across batches.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // percentile state (histogram variant — the bounded-state one)
      val mem = MemoryStream[(String, Int)]
      val q = EventStreams.runningPercentilesHist(mem.toDS())
        .writeStream.format("memory").queryName("rocks_pct")
        .outputMode("update").start()
      // 3 batches over the SAME 4 keys: state rows must stay at 4
      (0 until 3).foreach { b =>
        mem.addData((0 until 200).map(i => (s"node${i % 4}", (b * 200 + i) % 97)): _*)
        q.processAllAvailable()
      }
      val prog = q.lastProgress
      val op = prog.stateOperators.head
      // RocksDB is really the provider (its custom metrics are present)
      assert(op.customMetrics.keySet.toString.contains("rocksdb"),
        s"expected rocksdb metrics, got ${op.customMetrics.keySet}")
      // state is key-bounded: 4 entities, not 600 events
      assert(op.numRowsTotal == 4L, s"state rows = ${op.numRowsTotal}")
      q.stop()
      // the final picks equal the batch positional definition
      val last = spark.table("rocks_pct").collect()
        .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.last }
      val exp = (0 until 3).flatMap(b => (0 until 200).map(i =>
          (s"node${i % 4}", (b * 200 + i) % 97)))
        .groupBy(_._1).map { case (k, vs) =>
          val sorted = vs.map(_._2.toDouble).toVector.sorted
          k -> EventStreams.pick(sorted, 0.50)
        }
      exp.foreach { case (k, p50) =>
        assert(last(k).getAs[Double]("p50") == p50, s"$k p50")
      }

      // sessionize + asOfStream: state classes round-trip RocksDB
      val sess = MemoryStream[(Long, Timestamp)]
      val qs = EventStreams.sessionize(sess.toDS())
        .writeStream.format("memory").queryName("rocks_sess")
        .outputMode("append").start()
      sess.addData((1L, ts("2023-03-01 10:00:00")), (1L, ts("2023-03-01 10:10:00")))
      qs.processAllAvailable()
      // a 2h-later event closes the first session via gap
      sess.addData((1L, ts("2023-03-01 12:30:00")))
      qs.processAllAvailable()
      qs.stop()
      val closed = spark.table("rocks_sess").collect()
      assert(closed.length == 1 && closed.head.getAs[Long]("n_events") == 2L)

      val asof = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val qa = EventStreams.asOfStream(
          asof.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
        .writeStream.format("memory").queryName("rocks_asof")
        .outputMode("append").start()
      asof.addData((1L, ts("2023-03-01 10:00:00"), 5L, "purchase", 9.0))
      qa.processAllAvailable()
      asof.addData((2L, ts("2023-03-01 10:30:00"), 5L, "click", 1.0))
      qa.processAllAvailable()
      qa.stop()
      val attributed = spark.table("rocks_asof")
        .filter(col("event_id") === 2L).collect()
      assert(attributed.length == 1 &&
        attributed.head.getAs[Long]("p_event_id") == 1L)

      // the kmv_kth TypedImperativeAggregate's ≤k-long buffer goes
      // through the STREAMING-AGGREGATION state path (distinct from
      // fMGWS state) — pin that it round-trips RocksDB too and still
      // reproduces the batch sketch
      val kmem = MemoryStream[(Timestamp, Long)]
      val qk = EventStreams.hourlyKmvDistinct(
          kmem.toDF().toDF("ts", "user_id"))
        .writeStream.format("memory").queryName("rocks_kmv")
        .outputMode("update").start()
      val krows = (0 until 300).map(i =>
        (ts(f"2023-03-01 10:${i % 50}%02d:00"), (i % 83).toLong))
      krows.grouped(100).foreach { b => kmem.addData(b: _*); qk.processAllAvailable() }
      val kOp = qk.lastProgress.stateOperators.head
      assert(kOp.customMetrics.keySet.toString.contains("rocksdb"))
      qk.stop()
      val kLast = spark.table("rocks_kmv").collect()
        .groupBy(_.getTimestamp(0)).map { case (w, rs) => w -> rs.last }
      val kBatch = krows.toDF("ts", "user_id")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(call_function("kmv_kth",
          graft.operators.Dedup.h60(concat(lit("u"), col("user_id").cast("string"))),
          lit(64)).as("s"))
        .select(col("window.start"), col("s.n_kept"), col("s.kth"))
        .collect().map(r => r.getTimestamp(0) -> r).toMap
      assert(kLast.keySet == kBatch.keySet && kLast.nonEmpty)
      kLast.foreach { case (w, r) =>
        assert(r.getLong(1) == kBatch(w).getLong(1) &&
          Option(r.get(2)) == Option(kBatch(w).get(2)), s"window $w")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("kmv_kth aggregates in a streaming window and matches the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    // the custom TypedImperativeAggregate must serialize its buffer
    // through the streaming state store — the §2.10 sketch composing
    // with §2.9 incremental execution, not just batch groupBy
    val rows = (0 until 400).map(i =>
      (ts(f"2023-03-01 10:${i % 50}%02d:00"), (i % 97).toLong))
    val mem = MemoryStream[(Timestamp, Long)]
    val q = EventStreams.hourlyKmvDistinct(
        mem.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("kmvw").outputMode("update").start()
    rows.grouped(150).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // last update per window ≡ the batch sketch over the same rows
    val stream = spark.table("kmvw").collect()
      .groupBy(_.getTimestamp(0)).map { case (w, rs) => w -> rs.last }
    val batch = rows.toDF("ts", "user_id")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(call_function("kmv_kth",
        graft.operators.Dedup.h60(concat(lit("u"), col("user_id").cast("string"))),
        lit(64)).as("s"))
      .select(col("window.start"), col("s.n_kept"), col("s.kth"))
      .collect().map(r => r.getTimestamp(0) -> r).toMap
    assert(stream.keySet == batch.keySet && stream.nonEmpty)
    for ((w, sr) <- stream) {
      assert(sr.getLong(1) == batch(w).getLong(1), s"n_kept @ $w")
      assert(sr.getLong(2) == batch(w).getLong(2), s"kth @ $w")
    }
  }

  test("histogram-state percentiles equal the vector-state operator across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      Seq(("k", 210), ("k", 450), ("k", 210), ("j", 7)),       // ties collapse
      Seq(("k", 100), ("k", 999), ("k", 450), ("j", 3)))
    val memV = MemoryStream[(String, Double)]
    val memH = MemoryStream[(String, Int)]
    val qv = EventStreams.runningPercentiles(memV.toDS())
      .writeStream.format("memory").queryName("pv").outputMode("update").start()
    val qh = EventStreams.runningPercentilesHist(memH.toDS())
      .writeStream.format("memory").queryName("ph2").outputMode("update").start()
    batches.foreach { b =>
      memV.addData(b.map { case (k, v) => (k, v.toDouble) }: _*)
      memH.addData(b: _*)
      qv.processAllAvailable()
      qh.processAllAvailable()
    }
    qv.stop(); qh.stop()
    // compare the LAST update per key from both operators
    def last(tbl: String) = spark.table(tbl)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._2) }
    assert(last("pv") == last("ph2"))
    val k = last("ph2")("k")
    assert(k._2 == 6L && k._3 == 100.0 && k._7 == 999.0) // n, min, max
  }

  test("tombstone log stream: warning lines → per-(ks,tbl) hourly rollup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = EventStreams.tombstoneLogStream(mem.toDS())
      .writeStream.format("memory").queryName("tss").outputMode("update").start()
    mem.addData(
      ("n1", "WARN  [ReadStage-2] 2023-03-01 10:15:00,123 ReadCommand.java:567 - Read 100 live rows and 2000 tombstone cells for query SELECT * FROM ks1.users WHERE id=1"),
      ("n1", "WARN  [ReadStage-1] 2023-03-01 10:40:00,000 ReadCommand.java:567 - Read 70 live rows and 5000 tombstone cells for query SELECT * FROM ks1.users WHERE id=2"),
      ("n2", "WARN  [ReadStage-9] 2023-03-01 10:45:00,789 ReadCommand.java:567 - Read 10 live rows and 1500 tombstone cells for query SELECT * FROM ks2.legacy_cf LIMIT 1"),
      // below the tpTs gate → excluded
      ("n2", "WARN  [ReadStage-3] 2023-03-01 10:50:00,000 ReadCommand.java:567 - Read 10 live rows and 500 tombstone cells for query SELECT * FROM ks2.legacy_cf LIMIT 1"),
      ("n3", "INFO  [main] 2023-03-01 10:31:00,000 StorageService.java:100 - not a tombstone line"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("tss")
      .select("hour_start", "keyspace", "table", "n_warnings", "tombstones", "reads")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // worst line per (ks,tbl): users max 5000 with ITS reads (70, not the
    // max reads 100 — max_by on struct(tombstones, reads), the batch
    // dedup-keep-max ordering)
    assert(got == Set(
      (ts("2023-03-01 10:00:00"), "ks1", "users", 2L, 5000L, 70L),
      (ts("2023-03-01 10:00:00"), "ks2", "legacy_cf", 1L, 1500L, 10L)))
  }

  test("tombstone stream parity: same lines through batch parseLog agree") {
    import spark.implicits._
    val lines = Seq(
      ("n1", "WARN  [ReadStage-2] 2023-03-01 10:15:00,123 ReadCommand.java:567 - Read 100 live rows and 2000 tombstone cells for query SELECT * FROM ks1.users WHERE id=1"),
      ("n2", "WARN  [ReadStage-9] 2023-03-01 10:45:00,789 ReadCommand.java:567 - Read 10 live rows and 1500 tombstone cells for query SELECT * FROM ks2.legacy_cf LIMIT 1"))
    // line-level parse (stream path) ≡ iterator parse (batch path)
    val streamed = lines.flatMap { case (n, l) =>
      graft.parse.Parsers.parseTombstoneLine(n, l, 1000L).map(_._2)
    }
    val batch = lines.groupBy(_._1).toSeq.flatMap { case (n, ls) =>
      graft.parse.Parsers.parseLog(n, ls.map(_._2).iterator).tombstones
    }
    assert(streamed.toSet == batch.toSet)
    // and every streamed event carries a parsed UTC timestamp
    assert(lines.forall { case (n, l) =>
      graft.parse.Parsers.parseTombstoneLine(n, l, 1000L).get._1.isDefined })
  }

  test("pick: positional percentile definition (round, clamp, 1-based)") {
    val v = Vector(1.0, 2.0, 3.0, 4.0, 5.0)
    assert(EventStreams.pick(v, 0.5) == 3.0)   // round(2.5)=3 (half-up)
    assert(EventStreams.pick(v, 0.99) == 5.0)  // round(4.95)=5
    assert(EventStreams.pick(Vector(9.0), 0.01) == 9.0) // clamp to 1
  }
}
