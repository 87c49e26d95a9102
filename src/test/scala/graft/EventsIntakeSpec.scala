package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The evsrc events-intake layer (round 15, guide §6): batch events
  * serve through a row-identical user_id-bucketed rewrite of the raw
  * single-file table (the raw file's row-group count caps scan
  * parallelism; the bucketing serves the per-user operators). Pins:
  *  (a) the layer is EXACTLY the raw table — both directions of
  *      exceptAll empty on the real sf0.001 corpus, schema identical;
  *  (b) the per-user operators actually consume the bucketing — q08's
  *      top-1-per-user window plans with NO exchange below the final
  *      order-by (the window's clustering comes straight off the
  *      buckets).
  * The streaming reader needs no pin here: EventStreams.fromParquetDir
  * is built on readStream over the raw arrival directory (never on
  * Tables.events), and StreamingSpec's fromParquetDir test now doubles
  * as a second layer-equality witness (stream total over the raw file
  * == batch count through the layer). */
class EventsIntakeSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("evsrc layer is row-identical to the raw events table") {
    val raw = Tables.eventsRaw(spark, dir)
    val layered = Tables.events(spark, dir)
    assert(layered.schema.map(f => (f.name, f.dataType)) ===
      raw.schema.map(f => (f.name, f.dataType)))
    assert(layered.exceptAll(raw).isEmpty && raw.exceptAll(layered).isEmpty)
    assert(layered.count() === raw.count())
  }

  test("q08 window consumes the user_id bucketing (single exchange: the final sort)") {
    val df = operators.Relational.q08(spark, dir)
    // exactly ONE exchange may remain — the global ORDER BY user_id
    // range exchange; the window's hash exchange must be gone (it reads
    // clustering off the evsrc buckets)
    assert(PlanAudit.exchangeCount(df) === 1,
      df.queryExecution.executedPlan.toString)
  }
}
