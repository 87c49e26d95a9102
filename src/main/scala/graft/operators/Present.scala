package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** Presentation-sort helper for queries whose sort sits directly on an
  * expensive SHUFFLE-FREE map pipeline (kernel/parse-heavy projections).
  *
  * A global `orderBy` range-partitions, and computing the range bounds
  * runs a sampling job over the child plan first: the child executes
  * TWICE. When the child contains a shuffle, the map-side files are
  * reused and the second pass is cheap; when it is a pure map pipeline
  * (q13's JSON parse, ta07's pii_scrub, dd05's simhash), the entire
  * expensive pipeline re-executes — measured 8.3 s -> 2.9 s on q13 at
  * sf1.0 from this one change. Persisting the result-sized relation
  * trades one in-memory/disk materialization for the second full
  * compute; MEMORY_AND_DISK spills instead of OOMing, and at cluster
  * scale the same shape is a staging write before a sorted export.
  *
  * Cache lifetime (r7 verdict #3): persists registered here live in a
  * bounded FIFO pool of [[CachePool]] relations — registering a new one
  * evicts (unpersists) the oldest beyond the cap. A long-lived session
  * running the full query surface therefore holds at most [[CachePool]]
  * result-sized cached relations, instead of one per
  * presentation-sorted query invoked since session start. FIFO is safe
  * for the sequential-action sessions this engine runs (Bench/Verify/a
  * notebook): a query's own cache cannot be evicted between its persist
  * and its action unless more than [[CachePool]] OTHER queries persist
  * concurrently in between — and eviction is never a correctness event,
  * only a recompute.
  */
object Present {

  /** Max presentation caches retained; the pool holds the most recent
    * N so a repeated query (Bench's warm runs re-clear anyway, but a
    * notebook re-showing a result) still hits its cache. */
  val CachePool = 4

  private val pool = new java.util.ArrayDeque[DataFrame]

  /** Persist `df` under pool management: the returned DataFrame is
    * cached MEMORY_AND_DISK and the OLDEST pooled relation beyond
    * [[CachePool]] is unpersisted. Also the lifecycle home for other
    * bounded presentation persists (sp07/sp09's audit relations). */
  private[graft] def pooled(df: DataFrame): DataFrame = synchronized {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    pool.addLast(df)
    while (pool.size > CachePool)
      pool.removeFirst().unpersist(blocking = false)
    df
  }

  /** Number of live pooled caches — spec hook. */
  private[graft] def pooledCount: Int = synchronized { pool.size }

  def sorted(df: DataFrame, cols: Column*): DataFrame =
    pooled(df).orderBy(cols: _*)

  def sorted(df: DataFrame, first: String, rest: String*): DataFrame =
    sorted(df, (first +: rest).map(col): _*)
}
