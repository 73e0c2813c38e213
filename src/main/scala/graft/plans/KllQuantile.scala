package graft.plans

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType}

/** Mergeable quantile sketch pipeline — the percentile analogue of
  * `q_agg_sketch_hll`'s hll_sketch_agg/hll_union_agg pair, built on the
  * Datasketches KLL implementation Spark already ships (the same library
  * backing its HLL SQL functions; Spark 4 exposes no KLL SQL surface, so
  * these are injected via [[GraftExtensions]]):
  *
  *  - `graft_kll_agg(value[, k])` — aggregate doubles into a serialized
  *    KLL sketch (binary), map-side partials merged like any aggregate.
  *  - `graft_kll_merge_agg(sk)` — merge serialized sketches; this is the
  *    REUSE step a two-level rollup needs (per-group sketches persisted
  *    once, any coarser grouping derived WITHOUT rescanning the raw
  *    data — at 100 TB the whole point of a mergeable summary).
  *  - `graft_kll_quantile(sk, q)` — extract a quantile estimate.
  *
  * KLL guarantees ±ε RANK error (k=200 → ε≈1.65% at 99% confidence,
  * single-sided), independent of data size or merge topology; the spec
  * pins the estimate between exact quantiles at q∓3%. Buffers live on the
  * heap per partial (a few KB at k=200), serialized through the standard
  * TypedImperativeAggregate spill path.
  */
case class KllSketchAgg(
    left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with BinaryLike[Expression] {

  def this(child: Expression) =
    this(child, org.apache.spark.sql.catalyst.expressions.Literal(200))

  private lazy val k: Int = right.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_kll_agg k must be a foldable integer, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == IntegerType &&
        right.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_kll_agg(value, k) wants (double, foldable int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = left.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllSketchAgg =
    copy(left = newLeft, right = newRight)
}

/** Merges serialized KLL sketches (see [[KllSketchAgg]]). */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_merge_agg wants binary, got ${child.dataType.simpleString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_merge_agg"

  // The merge target adopts the smallest k seen (Datasketches semantics);
  // starting from the library max means the first merged sketch's k wins.
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(org.apache.datasketches.kll.KllSketch.MAX_K)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** `graft_kll_quantile(sk, q)` — quantile estimate from a serialized KLL
  * sketch. Interpreted eval only (CodegenFallback): one call per GROUP, not
  * per row — never on the hot path.
  */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_kll_quantile(sk, q) wants (binary, double), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // empty sketch -> NULL
  override def prettyName: String = "graft_kll_quantile"

  override protected def nullSafeEval(sk: Any, q: Any): Any = {
    val sketch = KllDoublesSketch.heapify(
      Memory.wrap(sk.asInstanceOf[Array[Byte]]))
    if (sketch.isEmpty) null
    else sketch.getQuantile(q.asInstanceOf[Double],
      org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}
