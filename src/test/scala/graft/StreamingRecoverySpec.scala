package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

import java.sql.Timestamp
import java.nio.file.Files

/** Checkpoint-recovery semantics: every streaming twin must survive a
  * stop/restart cycle from its checkpoint — state restored (not reset),
  * committed offsets not replayed, data that arrived while the query was
  * down processed exactly once. This is the production failure mode the
  * batch-parity tests can't see: a 100-TB pipeline WILL lose executors
  * and restart queries, and an operator whose state resets on restart
  * silently double-counts or un-dedups.
  */
class StreamingRecoverySpec extends AnyFunSuite with SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)
  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-$tag-").toFile.getAbsolutePath

  test("restart: fMGWS percentile state is restored, not reset") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("ckpt-pct")
    val outPath = tmpDir("out-pct")
    val mem = MemoryStream[(String, Double)]
    // memory sink can't recover a checkpoint (update mode); foreachBatch
    // -> parquet append is the recoverable stand-in for a real sink
    def start() = EventStreams.runningPercentiles(mem.toDS())
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[EventStreams.PctUpdate], _: Long) =>
        batch.write.mode("append").parquet(outPath); ()
      }
      .option("checkpointLocation", ckpt).outputMode("update").start()

    val q1 = start()
    mem.addData(("gc", 100.0), ("gc", 300.0), ("gc", 200.0))
    q1.processAllAvailable()
    q1.stop()

    // Restart from the same checkpoint. The sorted-values state for key
    // "gc" must come back from the state store: the new batch's n and
    // percentiles reflect ALL five values, not just the two new ones.
    val q2 = start()
    mem.addData(("gc", 400.0), ("gc", 500.0))
    q2.processAllAvailable()
    q2.stop()

    val last = spark.read.parquet(outPath).as[EventStreams.PctUpdate]
      .collect().maxBy(_.n)
    assert(last.n == 5L, s"state reset on restart: n=${last.n}, expected 5")
    // positional picks over [100,200,300,400,500], engine HALF_UP
    // semantics (documented deviation from Python's banker's rounding —
    // see EventStreams.pick): p50 idx round_half_up(2.5)=3 -> 300;
    // p95 idx min(round(4.75),5)=5 -> 500
    assert(last.min == 100.0 && last.p50 == 300.0 && last.max == 500.0)
  }

  test("restart: file sink emits each closed window exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("ckpt-roll")
    val outPath = tmpDir("out-roll")
    val mem = MemoryStream[(Timestamp, String, Double)]
    def start() = EventStreams
      .hourlyRollup(mem.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("parquet").option("path", outPath)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val q1 = start()
    mem.addData((ts("2023-03-01 10:10:00"), "click", 1.0))
    q1.processAllAvailable()
    mem.addData((ts("2023-03-01 12:00:00"), "click", 2.0))
    q1.processAllAvailable()
    // watermark is now 11:50; the 10:00 window closes (appends to files)
    // on the next batch with data:
    mem.addData((ts("2023-03-01 13:00:00"), "click", 3.0))
    q1.processAllAvailable()
    q1.stop()

    // Data arriving while the query is DOWN must be processed exactly
    // once by the restarted query (offset recovery), and the already-
    // committed hour-10 emission must NOT be replayed.
    mem.addData((ts("2023-03-01 15:00:00"), "click", 4.0))
    val q2 = start()
    q2.processAllAvailable()
    // one more batch so the watermark advance from the 15:00 row closes
    // the 12:00 and 13:00 windows too
    mem.addData((ts("2023-03-01 17:00:00"), "click", 5.0))
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(outPath)
      .select("hour_start", "event_type", "n", "sum_value")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // exactly-once: no (hour, type) key appears twice across the restart
    assert(rows.length == rows.map(r => (r._1, r._2)).distinct.length,
      s"duplicate window emission after restart: ${rows.toSeq.sortBy(_._1.getTime)}")
    val byHour = rows.map(r => r._1 -> r).toMap
    assert(byHour(ts("2023-03-01 10:00:00"))._3 == 1L)
    assert(byHour(ts("2023-03-01 12:00:00"))._3 == 1L)
    assert(byHour(ts("2023-03-01 13:00:00"))._3 == 1L)
    // the offline-added 15:00 row closed once its window did
    assert(byHour(ts("2023-03-01 15:00:00"))._4 == 4.0)
  }

  test("restart: watermarked dedup state survives — a pre-restart doc still dedups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("ckpt-dedup")
    val outPath = tmpDir("out-dedup")
    val mem = MemoryStream[(Timestamp, Long, String)]
    def start() = EventStreams.dedupStream(mem.toDF().toDF("ts", "doc_id", "text"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outPath); ()
      }
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val q1 = start()
    mem.addData((ts("2023-03-01 10:00:00"), 1L, "the quick brown fox"))
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    // same normalized signature, within the 1-hour watermark: must be
    // suppressed by state restored from the checkpoint (a reset state
    // would re-emit it = duplicate documents downstream)
    mem.addData(
      (ts("2023-03-01 10:30:00"), 2L, "  The  QUICK brown fox "),
      (ts("2023-03-01 10:31:00"), 3L, "an entirely new document"))
    q2.processAllAvailable()
    q2.stop()

    val emitted = spark.read.parquet(outPath).select("doc_id")
      .collect().map(_.getLong(0))
    assert(!emitted.contains(2L),
      "dedup state lost on restart: duplicate doc re-emitted")
    assert(emitted.toSet == Set(1L, 3L) && emitted.length == 2,
      s"expected docs 1 and 3 exactly once, got ${emitted.toSeq}")
  }
}
