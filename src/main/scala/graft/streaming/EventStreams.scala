package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twin of the batch event pipelines (SURVEY.md
  * §2.9, §7.3 step 5): the reference's log-derived GC/tombstone relations
  * are event streams in disguise — event-timestamped, per-node arrival,
  * out of order across nodes. This module gives them true incremental
  * semantics: watermarked tumbling windows for the rollup aggregates and
  * a custom keyed state operator for running positional percentiles
  * (the one place reference semantics need custom streaming state —
  * built-in aggs can't do exact positional picks incrementally).
  *
  * Scale posture: state is keyed by (entity, window) so per-key state is
  * bounded by the window's event count; the watermark evicts closed
  * windows. At 100 TB/day the key space (dc/node/hour) stays small even
  * when the event volume doesn't.
  */
object EventStreams {

  /** Watermarked hourly rollup — the streaming form of the batch q19 /
    * GC A6-A8 aggregates: count, sum, min/max per (event_type, hour).
    * 10-minute watermark tolerates cross-node arrival skew; late rows
    * beyond it are dropped (no reference semantics to preserve —
    * SURVEY.md §2.9).
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        // decimal-exact sum (the repo determinism rule): double-order
        // nondeterminism must not leak into streaming output either
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"), col("min_value"), col("max_value"))

  /** Snapshot of one key's running percentiles. */
  final case class PctState(values: Vector[Double])

  final case class PctUpdate(
      key: String, n: Long, min: Double, p50: Double, p95: Double,
      p99: Double, max: Double)

  /** Exact positional percentile of a sorted vector — round-half-up(n·q),
    * 1-based clamped. Same shape as the reference's pick (explore.py:
    * 365-398) but HALF_UP like the rest of the engine, NOT Python 3's
    * banker's rounding — at exact .5 rank ties (e.g. n=5, q=0.5) this
    * picks the upper sample where the reference picks the lower. One
    * documented semantic across batch (idxHalfUp, gcPercentiles) and
    * streaming; see DiagAnalysis.gcPercentiles' deviation note. */
  def pick(sorted: Vector[Double], q: Double): Double = {
    val n = sorted.length
    val idx = math.min(math.max(math.round(n * q), 1L), n.toLong).toInt
    sorted(idx - 1)
  }

  /** Per-key running exact percentiles via flatMapGroupsWithState:
    * each micro-batch folds new values into the key's sorted state and
    * emits an updated percentile row.
    *
    * Exactness costs O(values) state per key — the same trade the batch
    * positional percentile makes; keys MUST be bounded entities
    * (dc/node/type), not high-cardinality ids. NoTimeout is deliberate:
    * a ProcessingTimeTimeout makes the engine fire continuous no-data
    * "cleaning up state" batches (observed livelock under
    * processAllAvailable); with bounded keys, state is bounded by the
    * event count per entity and eviction belongs to the deployment
    * (query restart / state TTL config), not the operator.
    */
  def runningPercentiles(events: Dataset[(String, Double)])
      : Dataset[PctUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[PctState, PctUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key, rows, state: GroupState[PctState]) =>
          val prev = state.getOption.map(_.values).getOrElse(Vector.empty)
          val merged = (prev ++ rows.map(_._2)).sorted
          state.update(PctState(merged))
          if (merged.isEmpty) Iterator.empty
          else Iterator.single(PctUpdate(
            key, merged.length.toLong, merged.head,
            pick(merged, 0.50), pick(merged, 0.95), pick(merged, 0.99),
            merged.last))
      }
  }

  /** Histogram state for integer-valued running percentiles. */
  final case class HistState(counts: Map[Int, Long])

  /** Exact running percentiles with BOUNDED state for integer-valued
    * streams (GC pause ms, latencies in µs buckets): state per key is a
    * value→count histogram, so it grows with the value DOMAIN, not the
    * event count — the fix for [[runningPercentiles]]'s documented
    * O(values) state trade. The positional pick walks the sorted
    * histogram's cumulative counts — the same smallest-value-reaching-
    * rank-idx selection as the batch histPercentiles, so picks equal the
    * sorted-vector definition exactly.
    */
  def runningPercentilesHist(events: Dataset[(String, Int)])
      : Dataset[PctUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[HistState, PctUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key, rows, state: GroupState[HistState]) =>
          var h = state.getOption.map(_.counts).getOrElse(Map.empty[Int, Long])
          rows.foreach { case (_, v) => h = h.updated(v, h.getOrElse(v, 0L) + 1L) }
          state.update(HistState(h))
          if (h.isEmpty) Iterator.empty
          else {
            val sorted = h.toArray.sortBy(_._1)
            val n = sorted.map(_._2).sum
            def pickH(q: Double): Double = {
              val idx = math.min(math.max(math.round(n * q), 1L), n)
              var cum = 0L
              var i = 0
              while (cum < idx) { cum += sorted(i)._2; i += 1 }
              sorted(i - 1)._1.toDouble
            }
            Iterator.single(PctUpdate(key, n, sorted.head._1.toDouble,
              pickH(0.50), pickH(0.95), pickH(0.99), sorted.last._1.toDouble))
          }
      }
  }

  /** Streaming exact dedup — the incremental twin of the batch dd01
    * content-hash dedup, composed from built-ins (the preference order:
    * existing operators before custom state): md5 the normalized text,
    * then `dropDuplicatesWithinWatermark` keeps the first arrival per
    * signature and drops re-arrivals whose event time lands within the
    * watermark delay of it. Plain `dropDuplicates("sig")` would NEVER
    * evict: Spark only removes dedup state when the watermark column is
    * part of the keys, so per-signature state grows unboundedly — the
    * WithinWatermark variant is the keys-only form with watermark-bounded
    * state. The guarantee is correspondingly bounded: duplicates are
    * dropped with certainty only inside the 1-hour horizon; a re-arrival
    * after its signature's state was evicted is re-emitted. Cross-horizon
    * dupes are the batch job's business.
    */
  def dedupStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("sig",
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ").cast("binary")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("sig")

  /** One user's open session. */
  final case class SessionState(start: java.sql.Timestamp,
      end: java.sql.Timestamp, n: Long)

  final case class SessionOut(user_id: Long, start_ts: java.sql.Timestamp,
      end_ts: java.sql.Timestamp, n_events: Long, duration_sec: Long)

  /** Streaming twin of the batch q21 gap sessionization: per user, events
    * within `gapSec` of the session's current end extend it; a larger gap
    * closes it and opens a new one. A closed session is emitted either by
    * an in-stream gap or by the EVENT-TIME timeout — the watermark passing
    * end+gap proves no on-time event can extend the session
    * (ProcessingTimeTimeout would both livelock tests and tie session
    * closure to wall-clock, not data — see the batch/stream parity spec).
    * Gaps and durations are computed on FLOOR-SECOND epochs, exactly like
    * q21's unix_timestamp arithmetic, so sub-second event times can't make
    * the twins diverge.
    *
    * Single-pass semantics for bounded-late rows (the one deviation from
    * the batch sort): a late event within `gapSec` of the open session's
    * span extends it (backward extensions keep the no-hole->gap
    * invariant); a late event more than `gapSec` BEFORE the open
    * session's start belongs to an earlier — already emitted — session
    * and is closed as its own singleton rather than re-opening history
    * (append-mode output cannot be retracted, so a burst of such late
    * events fragments into singletons where the batch sort would merge
    * them — the inherent cost of emit-on-close streaming sessionization).
    *
    * State per user is O(1) (start, end, n) — unlike the percentile
    * operator there is no per-event state, so user_id cardinality is the
    * only scale bound, and timeout eviction keeps only users with open
    * sessions inside the watermark horizon.
    */
  def sessionize(events: Dataset[(Long, java.sql.Timestamp)],
      gapSec: Long = 1800L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    def sec(t: java.sql.Timestamp): Long = Math.floorDiv(t.getTime, 1000L)
    events.toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state: GroupState[SessionState]) =>
          def close(s: SessionState) = SessionOut(user, s.start, s.end, s.n,
            sec(s.end) - sec(s.start))
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(close(s))
          } else {
            // within-batch order is arbitrary; gap logic needs time order
            val ts = rows.map(_._2).toVector.sortBy(_.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if sec(t) < sec(s.start) - gapSec =>
                  // too far before the open session: part of an earlier,
                  // already-emitted session — close as a singleton
                  closed ::= SessionOut(user, t, t, 1L, 0L)
                case Some(s) if sec(t) <= sec(s.end) + gapSec =>
                  // extends the session (possibly backward, bounded-late)
                  val start = if (t.before(s.start)) t else s.start
                  val end = if (t.after(s.end)) t else s.end
                  cur = Some(SessionState(start, end, s.n + 1))
                case Some(s) =>
                  closed ::= close(s)
                  cur = Some(SessionState(t, t, 1L))
                case None =>
                  cur = Some(SessionState(t, t, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // +1: events in second sec(end)+gap still extend the session
              // (floor-second compare), so the timeout may only fire once
              // the watermark passes the END of that second — firing at
              // its start would close up to 999 ms early and split
              // sessions the batch twin merges
              state.setTimeoutTimestamp((sec(s.end) + gapSec + 1) * 1000L)
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming distinct-user estimate per hour window — the KMV sketch
    * aggregate ([[graft.functions.KmvKth]]) running INSIDE a watermarked
    * streaming aggregation: the ≤k-long buffer is exactly what the state
    * store checkpoints per window, so the operator's state is bounded by
    * (windows in horizon) × k longs no matter the event volume — the
    * streaming dual of q24's map-side-combine argument. Update mode;
    * rows: (window_start, n_kept, kth). */
  def hourlyKmvDistinct(events: DataFrame, k: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(call_function("kmv_kth",
        graft.operators.Dedup.h60(
          concat(lit("u"), col("user_id").cast("string"))),
        lit(k)).as("s"))
      .select(col("window.start").as("window_start"),
        col("s.n_kept").as("n_kept"), col("s.kth").as("kth"))
  }

  /** Stream-static broadcast join: live events binned against a STATIC
    * percentile-derived bin table (`Relational.valueBins`, computed
    * batch-side — the q23 bins) and counted per (hour window, type,
    * bin). The standard "enrich a stream with a slowly-changing
    * dimension" shape: the tiny static side broadcasts, the stream
    * never shuffles for the join, and only the windowed count keys
    * shuffle. Bins are half-open, and bin 1 is additionally opened
    * DOWNWARD here (its `lo` becomes unbounded): the static table's
    * min came from a batch slice, so a live value below that min must
    * still land in exactly one bin — it counts into bin 1 rather than
    * silently vanishing from the join.
    */
  def windowedBinCounts(events: DataFrame, bins: DataFrame): DataFrame = {
    val open = bins.withColumn("lo",
      when(col("bin_id") === min("bin_id").over(
        Window.partitionBy(col("bt"))), lit(null).cast("double"))
        .otherwise(col("lo")))
    events
      .withWatermark("ts", "10 minutes")
      .join(broadcast(open),
        col("event_type") === col("bt") &&
          (col("lo").isNull || col("value") >= col("lo")) &&
          (col("hi").isNull || col("value") < col("hi")))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"), col("bin_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("bin_id"), col("n"))
  }

  /** The latest purchase seen for one user. */
  final case class PurchaseState(id: Long, ts: java.sql.Timestamp, value: Double)

  final case class AsOfOut(event_id: Long, user_id: Long,
      ts: java.sql.Timestamp, value: Double,
      p_event_id: Option[Long], p_ts: Option[java.sql.Timestamp],
      p_value: Option[Double], gap_sec: Option[Long])

  /** Streaming twin of the batch q22 as-of join (purchase attribution):
    * clicks and purchases arrive in ONE stream; per user the operator
    * keeps only the latest purchase (O(1) state — the as-of lookback is
    * unbounded, so state never expires, but it is one row per user:
    * cardinality-bounded, not volume-bounded) and emits each click
    * attributed to it. Within a micro-batch, rows are time-ordered with
    * purchases before clicks at equal timestamps and equal-time
    * purchases by ascending id — exactly the batch operator's total
    * order, so in-order streams reproduce q22 row-for-row (parity spec).
    *
    * Single-pass semantics for late data (the deviation, same contract
    * style as [[sessionize]]): a late PURCHASE older than the stored one
    * is ignored (the stored one is still "the latest at or before" any
    * future click); a late CLICK whose timestamp precedes the stored
    * purchase gets NULL attribution rather than a WRONG future purchase
    * — for a training pipeline, no-lookahead beats completeness
    * (append-mode output can't be retracted, so the conservative answer
    * is the only safe one).
    */
  def asOfStream(events: DataFrame): Dataset[AsOfOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select("event_id", "ts", "user_id", "event_type", "value")
      .as[(Long, java.sql.Timestamp, Long, String, Double)]
      .filter(r => r._4 == "click" || r._4 == "purchase")
      .groupByKey(_._3)
      .flatMapGroupsWithState[PurchaseState, AsOfOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, rows, state: GroupState[PurchaseState]) =>
          val sorted = rows.toVector.sortBy(r =>
            (r._2.getTime, if (r._4 == "purchase") 0 else 1, r._1))
          val out = Vector.newBuilder[AsOfOut]
          var cur = state.getOption
          sorted.foreach { case (id, t, _, typ, v) =>
            if (typ == "purchase") {
              if (cur.forall(c => c.ts.getTime < t.getTime ||
                  (c.ts.getTime == t.getTime && c.id < id)))
                cur = Some(PurchaseState(id, t, v))
            } else {
              val m = cur.filter(c => !c.ts.after(t))
              out += AsOfOut(id, user, t, v, m.map(_.id), m.map(_.ts),
                m.map(_.value),
                m.map(c => Math.floorDiv(t.getTime, 1000L) -
                  Math.floorDiv(c.ts.getTime, 1000L)))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** File-source entry: stream a parquet events directory with the batch
    * schema (TESTDATA events) into [[hourlyRollup]]. Handles the
    * TIMESTAMP(NANOS) encoding of the testdata events table the same way
    * graft.Tables.events does (nanos → long → microsecond timestamps;
    * lossless for this data). */
  def fromParquetDir(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    hourlyRollup(graft.Tables.nanosTsToMicros(raw))
  }

  /** Incremental GC ingest over raw system.log lines — the streaming form
    * of the reference's batch log scan (S9): GCInspector lines are
    * self-contained, so a line-level text stream parses statelessly
    * (graft.parse.Parsers.parseGcLine) and feeds the watermarked hourly
    * rollup keyed by node. Works over `readStream.text(logGlob)` (new
    * log files appear per micro-batch) or any line DataFrame with
    * (node, value) columns.
    */
  def gcLogStream(lines: Dataset[(String, String)]): DataFrame = {
    import lines.sparkSession.implicits._
    val events = lines.flatMap { case (node, line) =>
      graft.parse.Parsers.parseGcLine(node, line)
    }
    hourlyRollup(events.toDF()
      .select(col("ts"), col("node").as("event_type"),
        col("pauseMs").cast("double").as("value")))
  }

  /** Incremental tombstone ingest — the streaming twin of the batch
    * tombstone tab (S10), same shape as [[gcLogStream]]: tombstone
    * warning lines are self-contained, so a line-level text stream
    * parses statelessly (Parsers.parseTombstoneLine, which also yields
    * the line's timestamp for the watermark; ts-less lines are dropped
    * here — the stream can't place them in time) and feeds a watermarked
    * per-(keyspace, table) hourly rollup: worst (max) tombstone count,
    * the live-rows read on that worst line (max_by on the same struct
    * ordering the batch dedup-keep-max uses), and the warning count.
    * State per key is one window aggregate; the watermark closes windows.
    */
  def tombstoneLogStream(lines: Dataset[(String, String)],
      tpTs: Long = 1000L): DataFrame = {
    import lines.sparkSession.implicits._
    val events = lines.flatMap { case (node, line) =>
      graft.parse.Parsers.parseTombstoneLine(node, line, tpTs)
        .collect { case (Some(ts), ev) =>
          (ts, ev.keyspace, ev.table, ev.reads, ev.tombstones)
        }
    }.toDF("ts", "keyspace", "table", "reads", "tombstones")
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("keyspace"), col("table"))
      .agg(
        count(lit(1)).as("n_warnings"),
        max(col("tombstones")).as("tombstones"),
        max_by(col("reads"), struct(col("tombstones"), col("reads")))
          .as("reads"))
      .select(col("window.start").as("hour_start"), col("keyspace"),
        col("table"), col("n_warnings"), col("tombstones"), col("reads"))
  }
}
