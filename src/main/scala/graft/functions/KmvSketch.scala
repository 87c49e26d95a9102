package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Bounded KMV (k-minimum-values) buffer: the k smallest DISTINCT
  * 60-bit hashes seen so far. TreeSet gives dedup + ordered eviction of
  * the largest member in one structure; size never exceeds k. */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def add(h: Long): Unit = {
    set.add(h)
    if (set.size > k) { val _ = set.pollLast() }
  }
}

/** Custom mergeable SKETCH aggregate (north-star §2.10: the custom-
  * aggregate path, complementing the scalar kernels): KMV distinct-count
  * support. Keeps the k smallest distinct values of an already-hashed
  * LONG column (graft's portable 60-bit md5 hash — [[graft.operators
  * .Dedup.h60]]) and returns struct(n_kept, kth) where `kth` is the
  * k-th smallest hash (NULL while fewer than k distinct values exist).
  * The classic estimator is then one exact division in the QUERY:
  * est = (k-1)·2^60 / kth — so the aggregate output stays integer-exact
  * and the DuckDB oracle can reproduce it bit-for-bit from a rank
  * window (KMV is deterministic, unlike HLL's implementation-defined
  * bias tables).
  *
  * Why this shape at 100 TB: exact COUNT(DISTINCT) shuffles every
  * distinct value; this sketch's partial state is ≤ k longs per
  * partition and MERGE is a bounded set-union — the map-side combine is
  * the whole win, which is exactly what TypedImperativeAggregate's
  * partial/merge contract expresses.
  */
case class KmvKth(
    left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != LongType || right.dataType != IntegerType ||
      !right.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "kmv_kth expects (long hash, foldable int k)")
    val kv = right.eval(null)
    // the upper bound keeps the "bounded state" contract honest: the
    // buffer is k boxed longs PER GROUP (and per streaming window) — an
    // absurd k would silently turn the sketch into exact-distinct with
    // worse constants
    if (kv == null || kv.asInstanceOf[Int] < 2 ||
      kv.asInstanceOf[Int] > 1000000)
      return TypeCheckResult.TypeCheckFailure(
        "kmv_kth k must be a non-NULL int in [2, 1000000]")
    TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val k: Int = right.eval(null).asInstanceOf[Int]

  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", LongType, nullable = false),
    StructField("kth", LongType, nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_kth"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, row: InternalRow): KmvBuffer = {
    val v = left.eval(row)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, o: KmvBuffer): KmvBuffer = {
    val it = o.set.iterator()
    while (it.hasNext) b.add(it.next())
    b
  }

  override def eval(b: KmvBuffer): Any = new GenericInternalRow(Array[Any](
    b.set.size.toLong,
    if (b.set.size == k) b.set.last(): Any else null))

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * b.set.size)
    bb.putInt(b.k).putInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new KmvBuffer(bb.getInt)
    val n = bb.getInt
    (0 until n).foreach(_ => b.add(bb.getLong))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvKth =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvKth =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvKth =
    copy(left = newLeft, right = newRight)
}
