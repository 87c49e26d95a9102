package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** As-of (temporal) join — the canonical "operator Spark lacks": for
  * each left row, attach the most recent right row with the same key and
  * `rightTime <= leftTime` (inclusive). The reference has no temporal
  * join (its event streams are only ever bucketed, explore.py:332-341),
  * but any event pipeline built on this engine needs one — purchase
  * attribution, slowly-changing-dimension lookup, config-at-time-of.
  *
  * Implementation is the UNION-TAG pattern, not a range join:
  * tag both inputs, union them, and carry the last right payload forward
  * with a running `last(ignoreNulls)` window ordered by (time, side,
  * right-id). One shuffle on the key serves the whole operator; there is
  * no per-row range probe and no O(left × right-per-key) inequality-join
  * blow-up — the plan a 100 TB event table needs. (A Catalyst range-join
  * rewrite would only beat this when the right side is tiny enough to
  * broadcast; at that size AQE already picks a broadcast for the
  * relational form.)
  *
  * Tie semantics (total order, both engines):
  *  - a right row AT the left row's timestamp matches (sorted first via
  *    the side tag: right=0 < left=1);
  *  - several right rows at one (key, time): the highest `rightId` wins
  *    (they sort ascending; the carry keeps the last seen);
  *  - left rows never disturb the carry, so equal-time left rows all see
  *    the same match regardless of their relative order.
  */
object AsOfJoin {

  /** Generic as-of join. `rightCols` are the payload columns attached to
    * every left row (NULL when no right row precedes it); `rightId` must
    * be a unique member of `rightCols` — it makes the equal-time carry
    * deterministic. Left columns pass through unchanged; payload columns
    * are prefixed `asof_`.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightCols: Seq[String], rightId: String): DataFrame = {
    require(rightCols.contains(rightId), "rightId must be in rightCols")
    // the rewrite owns these working names; a left column reusing one
    // would silently alias through the union projection
    val reserved = Set("__t", "__side", "__l", "__r", "__m")
    require(!left.columns.exists(reserved), s"left columns may not use $reserved")
    val payload = struct(rightCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        struct(left.columns.map(col).toSeq: _*).as("__l"),
        lit(null).cast(payloadType).as("__r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(l.schema("__l").dataType).as("__l"),
        payload.as("__r")): _*)
    // hot-key bound: the carry window serializes each key into one task
    // (intrinsic — the running last() needs the full per-key order);
    // cost is O((left+right per key)·log ·) for that task's sort, no
    // range blow-up. Pinned at a 50k-event hot key by
    // AdversarialScaleSpec; the O(1)-state streaming twin
    // (EventStreams.asOfStream) is the shape for unbounded histories.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col(s"__r.$rightId"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +:
        rightCols.map(c => col(s"__m.$c").as(s"asof_$c")): _*)
  }

  // ---------------------------------------------------------------- q22
  /** Purchase attribution: every 'click' event joined as-of to the same
    * user's most recent 'purchase' at or before it. Events with no prior
    * purchase keep NULL attribution (left as-of). `gap_sec` is an exact
    * integer second difference (no float time arithmetic).
    */
  def q22(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    asOf(clicks, purchases, Seq("user_id"),
        leftTime = "ts", rightTime = "p_ts",
        rightCols = Seq("p_event_id", "p_ts", "p_value"),
        rightId = "p_event_id")
      .withColumn("gap_sec",
        unix_timestamp(col("ts")) - unix_timestamp(col("asof_p_ts")))
      .select("event_id", "user_id", "ts", "value",
        "asof_p_event_id", "asof_p_ts", "asof_p_value", "gap_sec")
      .orderBy("event_id")
  }

  /** Oracle twin: the same union-tag running carry, spelled as
    * LAST_VALUE(... IGNORE NULLS) over the identical total order.
    *
    * The carry moves ONE non-null marker per purchase row (its
    * event_id) and joins the payload back by that id, so the attributed
    * (p_event_id, p_ts, p_value) triple is always torn-free — the
    * engine carries the whole struct, and per-column IGNORE-NULLS
    * carries would stitch columns from DIFFERENT purchases if a
    * purchase ever had a NULL value (r4 ADVICE). */
  val q22Sql: String =
    """WITH u AS (
      |  SELECT user_id, ts AS t, 1 AS is_ev, event_id, value,
      |         NULL::BIGINT AS pe
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, ts, 0, NULL, NULL, event_id
      |  FROM events WHERE event_type = 'purchase'),
      |w AS (
      |  SELECT *,
      |    LAST_VALUE(pe IGNORE NULLS) OVER win AS m
      |  FROM u
      |  WINDOW win AS (PARTITION BY user_id ORDER BY t, is_ev, pe
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT w.event_id, w.user_id, w.t AS ts, w.value,
      |       p.event_id AS asof_p_event_id, p.ts AS asof_p_ts,
      |       p.value AS asof_p_value,
      |       CAST(date_diff('second', p.ts, w.t) AS BIGINT) AS gap_sec
      |FROM w LEFT JOIN events p
      |  ON p.event_type = 'purchase' AND p.event_id = w.m
      |WHERE w.is_ev = 1 ORDER BY w.event_id""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q22_asof_join", "union-tag as-of join: purchase attribution", q22, Some(q22Sql)))
}
