package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two float-array columns.
  *
  * The composed formulation (`aggregate(zip_with(a, b, _*_), 0, _+_)` three
  * times) is correct but interpreted: Spark's higher-order functions don't
  * participate in whole-stage codegen, and each of the three folds walks the
  * arrays separately. This expression is one fused loop that codegens into
  * the enclosing stage — the (b)-tier custom operator of the build brief,
  * used on the similarity hot paths (kNN, LSH rerank).
  *
  * Accumulation order matches the composed version exactly (index order,
  * double precision), so swapping implementations cannot change results.
  * That includes null ELEMENTS: the composed folds yield NULL when any
  * zipped element is null, so this loop propagates NULL identically; the
  * per-element check is only emitted when containsNull says it can occur.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })
  override def nullable: Boolean = super.nullable || elemNullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val checkNulls = elemNullable
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xd = x.getFloat(i).toDouble
      val yd = y.getFloat(i).toDouble
      dot += xd * yd; na += xd * xd; nb += yd * yd
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      double ${ev.value}_dot = 0.0, ${ev.value}_na = 0.0, ${ev.value}_nb = 0.0;
      int ${ev.value}_n = java.lang.Math.min($a.numElements(), $b.numElements());
      for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
        ${if (elemNullable)
          s"if ($a.isNullAt(${ev.value}_i) || $b.isNullAt(${ev.value}_i)) { ${ev.isNull} = true; break; }"
        else ""}
        double xd = (double) $a.getFloat(${ev.value}_i);
        double yd = (double) $b.getFloat(${ev.value}_i);
        ${ev.value}_dot += xd * yd;
        ${ev.value}_na += xd * xd;
        ${ev.value}_nb += yd * yd;
      }
      ${ev.value} = ${ev.value}_dot /
        (java.lang.Math.sqrt(${ev.value}_na) * java.lang.Math.sqrt(${ev.value}_nb));
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registers `graft_cosine` via SparkSessionExtensions (see
  * [[graft.Sessions]]): `spark.sql.extensions`-style injection, so the
  * function is available to SQL and `expr()` in every graded session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot_long"),
      new ExpressionInfo(classOf[DotProductLong].getName, "graft_dot_long"),
      (children: Seq[Expression]) => DotProductLong(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductDouble].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProductDouble(children(0), children(1))))
    // Bloom semi-join surface: Spark ships BloomFilterAggregate /
    // BloomFilterMightContain for its runtime row-level filtering but does
    // not register them as SQL functions — injecting them makes the
    // build-bloom-on-the-dim / prefilter-the-fact-scan pattern writable as
    // a declarative query (q_join_bloom_prefilter). The analyzer wraps the
    // returned AggregateFunction in an AggregateExpression itself, and
    // MightContain's own type check enforces the constant-or-scalar-
    // subquery contract on the bloom argument.
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
        case Seq(c, n) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n)
        case other => throw new IllegalArgumentException(
          s"graft_bloom_agg(col[, estItems]) takes 1-2 args, got ${other.size}")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))
    // Mergeable quantile sketches (KllQuantile.scala): Spark ships the
    // Datasketches library for its HLL SQL functions but exposes no KLL
    // surface — these give percentiles the same sketch/merge/extract
    // pipeline hll_sketch_agg/hll_union_agg give distinct counts.
    ext.injectFunction((
      FunctionIdentifier("graft_kll_agg"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "graft_kll_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => new KllSketchAgg(c)
        case Seq(c, k) => KllSketchAgg(c, k)
        case other => throw new IllegalArgumentException(
          s"graft_kll_agg(col[, k]) takes 1-2 args, got ${other.size}")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_kll_merge_agg"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "graft_kll_merge_agg"),
      (children: Seq[Expression]) => KllMergeAgg(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_kll_quantile"),
      new ExpressionInfo(classOf[KllQuantile].getName, "graft_kll_quantile"),
      (children: Seq[Expression]) => KllQuantile(children(0), children(1))))
    // Theta sketches (ThetaSketch.scala) — distinct-count SET ALGEBRA:
    // intersect/difference estimates HLL cannot express.
    ext.injectFunction((
      FunctionIdentifier("graft_theta_agg"),
      new ExpressionInfo(classOf[ThetaSketchAgg].getName, "graft_theta_agg"),
      (children: Seq[Expression]) => ThetaSketchAgg(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_theta_estimate"),
      new ExpressionInfo(classOf[ThetaEstimate].getName, "graft_theta_estimate"),
      (children: Seq[Expression]) => ThetaEstimate(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_theta_intersect_estimate"),
      new ExpressionInfo(classOf[ThetaIntersectEstimate].getName,
        "graft_theta_intersect_estimate"),
      (children: Seq[Expression]) =>
        ThetaIntersectEstimate(children(0), children(1))))
    // Frequent-items (heavy-hitters) sketches (FreqSketch.scala) — the
    // third sketch family member next to HLL (distinct) and KLL
    // (quantiles), same store-then-reaggregate shape.
    ext.injectFunction((
      FunctionIdentifier("graft_freq_agg"),
      new ExpressionInfo(classOf[FreqSketchAgg].getName, "graft_freq_agg"),
      (children: Seq[Expression]) => FreqSketchAgg(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_freq_merge_agg"),
      new ExpressionInfo(classOf[FreqMergeAgg].getName, "graft_freq_merge_agg"),
      (children: Seq[Expression]) => FreqMergeAgg(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_freq_estimate"),
      new ExpressionInfo(classOf[FreqEstimate].getName, "graft_freq_estimate"),
      (children: Seq[Expression]) => FreqEstimate(children(0), children(1))))
    // Mergeable bounded top-k (TopK.scala): per-group top-n as O(k) state
    // through the ordinary partial/final hash-agg path — the one-pass
    // alternative to the window sort (q_win_topn_agg grades it against
    // exactly that window formulation).
    ext.injectFunction((
      FunctionIdentifier("graft_topk_agg"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk_agg"),
      (children: Seq[Expression]) => TopKAgg(children(0), children(1))))
    // Positional document fingerprint as one codegen'd pass — collapses
    // the explode + higher-order sumAscii + regroup shuffle of the
    // composed form (Fingerprint.scala; bit-identical by construction).
    ext.injectFunction((
      FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[Fingerprint].getName, "graft_fingerprint"),
      (children: Seq[Expression]) => Fingerprint(children.head)))
    // EXACT mergeable distinct-count bitmaps (BitmapDistinct.scala) — the
    // bitmap-index aggregate: same store-then-reaggregate shape as the
    // sketch family, but exact, so it grades against count(DISTINCT …).
    ext.injectFunction((
      FunctionIdentifier("graft_bitmap_agg"),
      new ExpressionInfo(classOf[BitmapAgg].getName, "graft_bitmap_agg"),
      (children: Seq[Expression]) => BitmapAgg(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_bitmap_merge_agg"),
      new ExpressionInfo(classOf[BitmapMergeAgg].getName,
        "graft_bitmap_merge_agg"),
      (children: Seq[Expression]) => BitmapMergeAgg(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_bitmap_card"),
      new ExpressionInfo(classOf[BitmapCard].getName, "graft_bitmap_card"),
      (children: Seq[Expression]) => BitmapCard(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_bitmap_and_card"),
      new ExpressionInfo(classOf[BitmapAndCard].getName,
        "graft_bitmap_and_card"),
      (children: Seq[Expression]) => BitmapAndCard(children(0), children(1))))
    // Quantized squared-L2 distance as one fused codegen loop
    // (SqDistLong.scala) — the nearest-neighbor hot path beside
    // graft_dot_long; integer-exact, same values as the composed fold.
    ext.injectFunction((
      FunctionIdentifier("graft_sqdist_long"),
      new ExpressionInfo(classOf[SqDistLong].getName, "graft_sqdist_long"),
      (children: Seq[Expression]) => SqDistLong(children(0), children(1))))
    // Fuzzy name matching for entity resolution (JaroWinkler.scala) —
    // prefix-weighted, transposition-tolerant similarity Spark lacks;
    // semantics pinned against DuckDB's jaro_winkler_similarity.
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => JaroWinkler(children(0), children(1))))
    // Optimizer surface: banded edit-distance predicates (length guard +
    // threshold DP) — see LevenshteinPruning's equivalence proof.
    ext.injectOptimizerRule(_ => LevenshteinPruning)
    // Optimizer surface: pure point-in-interval joins rewritten into
    // binned equi joins (RangeJoinBinning.scala — kills the O(n·m)
    // nested loop; conf-gated by spark.graft.rangeJoin.binSize).
    ext.injectOptimizerRule(_ => RangeJoinBinning)
    // Optimizer surface: materialized-view aggregate navigation —
    // registered monthly rollups serve matching fact aggregations
    // (MvRewrite.scala; inert until a rollup is registered).
    ext.injectOptimizerRule(_ => MvAggregateRewrite)
    // Whole-operator surface: the as-of merge join (logical node +
    // strategy + physical streaming merge — AsOfJoin.scala).
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
