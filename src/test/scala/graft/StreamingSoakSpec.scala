package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.EventStreams

import java.sql.Timestamp
import java.nio.file.Files

/** Sustained-load soak for the streaming state operators (r5 verdict
  * #7): ~1M events through the percentile operator and 300k+ through
  * sessionize / as-of in ONE query lifetime each, 50+ micro-batches,
  * on the RocksDB state store — asserting that state size PLATEAUS
  * instead of growing with event volume. This is the claim the
  * recovery spec can't test: each operator's state is bounded by key
  * cardinality (sessionize, as-of) or value domain (histogram
  * percentiles), never by how many events have flowed through.
  *
  * Method: deterministic micro-batches via MemoryStream (one
  * addData + processAllAvailable per batch — a rate source's batch
  * boundaries are wall-clock and unrepeatable), state metrics read
  * from each batch's StateOperatorProgress. The plateau assertion
  * compares the last batches against the middle batches: linear
  * state growth would roughly double the metric from mid-run to
  * end-of-run; a plateau holds it flat modulo RocksDB
  * compaction/cache noise (1.25 tolerance on bytes, exact on rows).
  */
class StreamingSoakSpec extends AnyFunSuite with SparkTestBase {

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def ckpt(tag: String): String =
    Files.createTempDirectory(s"graft-soak-$tag-").toFile.getAbsolutePath

  /** Run `batches` micro-batches, returning per-batch
    * (stateRows, stateBytes) from the query's progress. */
  private def soak(q: StreamingQuery, batches: Int)(feed: Int => Unit)
      : Vector[(Long, Long)] = {
    val metrics = Vector.newBuilder[(Long, Long)]
    try {
      for (b <- 0 until batches) {
        feed(b)
        q.processAllAvailable()
        val p = q.lastProgress
        assert(p != null && p.stateOperators.nonEmpty, s"no state progress at batch $b")
        val so = p.stateOperators(0)
        // the bytes signal is the LIVE SST footprint: the provider's
        // memoryUsedBytes on RocksDB tracks block-cache fill, which
        // grows with blocks TOUCHED (measured: perfectly linear in
        // batch count at constant row count) — it measures read
        // traffic, not state
        val sst = Option(so.customMetrics.get("rocksdbSstFileSize"))
          .map(_.longValue).getOrElse(0L)
        metrics += ((so.numRowsTotal, sst))
      }
    } finally q.stop()
    metrics.result()
  }

  /** Plateau: the end of the run must not sit above the middle of the
    * run (rows exactly; SST bytes within RocksDB compaction timing
    * noise). Under linear growth end ≈ 2× middle, so the bound has
    * real teeth. */
  private def assertPlateau(m: Vector[(Long, Long)], tag: String): Unit = {
    val mid = m.slice(m.length / 2 - 5, m.length / 2 + 5)
    val end = m.takeRight(10)
    assert(end.map(_._1).max <= mid.map(_._1).max,
      s"$tag state ROWS grew past mid-run: mid=${mid.map(_._1).max} end=${end.map(_._1).max}")
    assert(end.map(_._2).max <= (mid.map(_._2).max * 1.3).toLong,
      s"$tag state BYTES grew past mid-run: mid=${mid.map(_._2).max} end=${end.map(_._2).max}")
  }

  private def withRocksDb[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
    // make the bytes metric reflect LIVE state, not housekeeping debt:
    // without compactOnCommit the store accrues tiny L0 SSTs for dozens
    // of commits (bytes grow ~linearly in batch count at constant row
    // count — measured 1.7x mid→end before this), and the default
    // 100-batch checkpoint retention keeps old versions the whole run
    spark.conf.set("spark.sql.streaming.stateStore.rocksdb.compactOnCommit", "true")
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "2")
    try body
    finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.unset("spark.sql.streaming.stateStore.rocksdb.compactOnCommit")
      spark.conf.unset("spark.sql.streaming.minBatchesToRetain")
    }
  }

  test("soak: 1M events, histogram-percentile state bounded by value domain (RocksDB)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[(String, Int)]
      val q = EventStreams.runningPercentilesHist(mem.toDS())
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt("hist"))
        .outputMode("update").start()
      val batches = 50
      val perBatch = 20000 // 50 × 20k = 1M events, 5 keys, values in [0,1000)
      val m = soak(q, batches) { b =>
        mem.addData((0 until perBatch).map(i =>
          (s"k${i % 5}", (b * 31 + i * 7) % 1000)))
      }
      assertPlateau(m, "hist-pct")
      // the histogram saturates its 1000-value domain long before the
      // run ends: 5 keys of ≤1000 counters regardless of 1M inputs
      assert(m.last._1 == 5L, s"expected 5 state rows, got ${m.last._1}")
    }
  }

  test("soak: sessionize state bounded by open-session cardinality under churn (RocksDB)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[(Long, Timestamp)]
      val users = 1000
      // gap 120 s, batches step 300 s: every batch's events are beyond
      // the previous batch's sessions' gap, so sessions close (by gap
      // or event-time timeout) as fast as they open — sustained churn,
      // ~6k events/batch, 56 batches ≈ 336k events
      val q = EventStreams.sessionize(mem.toDS(), gapSec = 120L)
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt("sess"))
        .outputMode("append").start()
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val m = soak(q, 56) { b =>
        mem.addData((0 until 6000).map { i =>
          val u = i % users
          (u.toLong, new Timestamp(base + b * 300000L + (i / users) * 30000L))
        })
      }
      assertPlateau(m, "sessionize")
      // open sessions can never exceed the user cardinality (+ closing
      // overlap); 336k events must not leave more state than that
      assert(m.last._1 <= 2L * users,
        s"open-session state exceeds key cardinality: ${m.last._1}")
    }
  }

  test("soak: as-of join state is one row per user regardless of volume (RocksDB)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val users = 1000
      val q = EventStreams.asOfStream(
          mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt("asof"))
        .outputMode("append").start()
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val m = soak(q, 52) { b =>
        mem.addData((0 until 6000).map { i =>
          val id = b * 6000L + i
          val typ = if (i % 3 == 0) "purchase" else "click"
          (id, new Timestamp(base + b * 60000L + i), (i % users).toLong, typ, i.toDouble)
        })
      }
      assertPlateau(m, "as-of")
      // exactly one PurchaseState per user ever
      assert(m.last._1 == users.toLong,
        s"as-of state should be one row per user: ${m.last._1}")
    }
  }
}
