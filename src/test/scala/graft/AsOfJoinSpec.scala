package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

/** As-of join semantics on hand-built streams: inclusivity at equal
  * timestamps, deterministic tie-break among equal-time right rows, NULL
  * attribution with no prior right row, and key isolation.
  */
class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of: inclusive at equal ts, max-id tie-break, NULL when nothing precedes") {
    import spark.implicits._
    val clicks = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00"), 1.0),  // before any purchase → NULL
      (2L, 10L, ts("2026-01-01 11:00:00"), 2.0),  // equal-ts purchases 101/102 → 102
      (3L, 10L, ts("2026-01-01 12:00:00"), 3.0),  // still 102 (no newer purchase)
      (4L, 20L, ts("2026-01-01 11:00:00"), 4.0))  // other user: own purchase 201
      .toDF("event_id", "user_id", "ts", "value")
    val purchases = Seq(
      (10L, 101L, ts("2026-01-01 11:00:00"), 10.0),
      (10L, 102L, ts("2026-01-01 11:00:00"), 20.0), // same ts, higher id wins
      (20L, 201L, ts("2026-01-01 09:00:00"), 30.0))
      .toDF("user_id", "p_event_id", "p_ts", "p_value")
    val out = AsOfJoin.asOf(clicks, purchases, Seq("user_id"),
        leftTime = "ts", rightTime = "p_ts",
        rightCols = Seq("p_event_id", "p_ts", "p_value"), rightId = "p_event_id")
      .orderBy("event_id").collect()
    assert(out.length == 4)
    assert(out(0).isNullAt(out(0).fieldIndex("asof_p_event_id")))
    // a right row AT the left timestamp matches (inclusive as-of), and
    // among the two equal-time purchases the higher p_event_id carries
    assert(out(1).getAs[Long]("asof_p_event_id") == 102L)
    assert(out(1).getAs[Double]("asof_p_value") == 20.0)
    assert(out(2).getAs[Long]("asof_p_event_id") == 102L)
    // keys are isolated: user 20 sees only its own purchase
    assert(out(3).getAs[Long]("asof_p_event_id") == 201L)
    // left columns pass through untouched
    assert(out.map(_.getAs[Double]("value")).toSeq == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("as-of equals a brute-force model on random streams (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    // dense key/time collisions: few users, coarse timestamps → equal-ts
    // and no-match cases appear constantly
    val clicks = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt(5).toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(40) * 1000L),
        rnd.nextDouble())
    }
    val purchases = (0 until 120).map { i =>
      (rnd.nextInt(5).toLong, 1000L + i,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(40) * 1000L),
        rnd.nextDouble())
    }
    val out = AsOfJoin.asOf(
        clicks.toDF("event_id", "user_id", "ts", "value"),
        purchases.toDF("user_id", "p_event_id", "p_ts", "p_value"),
        Seq("user_id"), "ts", "p_ts",
        Seq("p_event_id", "p_ts", "p_value"), "p_event_id")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("asof_p_event_id")).map(_.asInstanceOf[Long])).toMap
    // model: latest purchase at or before the click; ties on time by
    // highest purchase id
    val byUser = purchases.groupBy(_._1)
    for ((id, user, t, _) <- clicks) {
      val want = byUser.getOrElse(user, Seq.empty)
        .filter(!_._3.after(t))
        .sortBy(p => (p._3.getTime, p._2))
        .lastOption.map(_._2)
      assert(out(id) == want, s"click $id user $user t $t")
    }
  }

  test("as-of plan: one shuffle on the key, no range-join blow-up") {
    import spark.implicits._
    val l = Seq((1L, 1L, ts("2026-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val r = Seq((1L, 9L, ts("2026-01-01 09:00:00"))).toDF("user_id", "p_id", "p_ts")
    val plan = AsOfJoin.asOf(l, r, Seq("user_id"), "ts", "p_ts",
      Seq("p_id", "p_ts"), "p_id").queryExecution.executedPlan.toString
    // the union-tag rewrite must not degenerate into a nested-loop or
    // cartesian product — the whole operator is windows over ONE
    // hash-partitioning of the key
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected ONE exchange above the union, got $shuffles:\n$plan")
  }
}
