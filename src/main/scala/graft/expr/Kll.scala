package graft.expr

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable rank/quantile sketches at rest (datasketches KLL),
  * completing the stored-sketch family: distinct counts have
  * hll_sketch_agg/hll_union_agg (x3), point frequencies have CMS +
  * Misra–Gries (x4/t8) — but open Spark has NO quantile sketch that
  * can be STORED and re-merged (`percentile_approx` merges internally
  * and emits only the final number). These three nodes add it:
  * `kll_sketch(double)` builds, `kll_merge(binary)` rolls stored
  * sketches up, `kll_quantile(binary, q)` reads — so a daily
  * pre-aggregation can answer weekly/monthly quantile questions
  * without rescanning raw rows.
  *
  * Caveat, stated loudly: KLL compaction draws from a shared unseeded
  * Random (datasketches KllSketch.random), so unlike HLL/CMS the
  * sketch bytes and estimates vary run-to-run and across
  * partitionings. Rank ERROR is bounded regardless (~1.65% at the
  * default k=200, far inside the envelopes the x5 contract checks);
  * anything exposed to a hash-compared oracle must be exact counts or
  * wide-envelope booleans, never the estimate itself.
  */
object Kll {
  /** Build a KLL doubles sketch (default k=200) over a double column. */
  def kllSketch(value: Column): Column =
    GraftColumnShim.column(
      KllSketchAgg(GraftColumnShim.expression(value)).toAggregateExpression())

  /** Merge stored KLL sketch binaries into one. */
  def kllMerge(sketch: Column): Column =
    GraftColumnShim.column(
      KllMergeAgg(GraftColumnShim.expression(sketch)).toAggregateExpression())

  /** Quantile estimate at rank `q` from a stored KLL sketch binary. */
  def kllQuantile(sketch: Column, q: Column): Column =
    GraftColumnShim.column(KllQuantileExpr(
      GraftColumnShim.expression(sketch), GraftColumnShim.expression(q)))
}

private[expr] trait KllAggBase extends UnaryLike[Expression] {
  self: TypedImperativeAggregate[KllDoublesSketch] =>
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance()
  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2); b1
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** `kll_sketch(double)` — see [[Kll]]. Null inputs are ignored; an
  * empty group returns an empty sketch. */
case class KllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with KllAggBase {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kll_sketch expects double, got ${other.simpleString}")
    }

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
  override def prettyName: String = "kll_sketch"
}

/** `kll_merge(binary)` — union of stored KLL sketches; see [[Kll]]. */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with KllAggBase {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kll_merge expects binary (a kll_sketch), got ${other.simpleString}")
    }

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
  override def prettyName: String = "kll_merge"
}

/** `kll_quantile(sketch, q)` — reads a quantile from a stored sketch
  * in-plan (the cms_estimate pattern: broadcast the KB-scale sketch,
  * probe rows where they live). Returns null for an empty sketch.
  * Deserialization caches per CONTENT (Arrays.equals, with a reference
  * fast-path): BinaryType eval hands back a fresh copied array per row
  * on UnsafeRow-backed input, so a reference-only cache never hits in
  * the broadcast-scalar probe pattern. */
case class KllQuantileExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckSuccess
      case (l, r) => TypeCheckFailure(
        s"kll_quantile expects (binary, double), got (${l.simpleString}, ${r.simpleString})")
    }
  }

  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastSketch: KllDoublesSketch = _

  override protected def nullSafeEval(sk: Any, q: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if (!(bytes eq lastBytes) &&
        (lastBytes == null || !java.util.Arrays.equals(bytes, lastBytes))) {
      lastSketch = KllDoublesSketch.heapify(Memory.wrap(bytes))
    }
    lastBytes = bytes
    if (lastSketch.isEmpty) null
    else lastSketch.getQuantile(q.asInstanceOf[Double])
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantileExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kll_quantile"
}
