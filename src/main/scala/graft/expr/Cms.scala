package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(sketch, item)` — point-frequency lookup into a
  * serialized Count-Min sketch (the binary the builtin
  * `count_min_sketch` aggregate emits).
  *
  * Spark ships the CMS builder but no reader expression — estimates
  * normally require collecting the sketch to the driver. This keeps
  * the lookup in the plan, so a KB-scale sketch can broadcast-join
  * onto a distributed relation of query items (the x4 shape: the
  * 1000-executor pattern is "ship one sketch everywhere, probe it
  * row-by-row", never "ship rows to the sketch").
  *
  * CMS counters are additive, so the aggregate's binary is identical
  * under any partitioning/merge order (unlike Misra–Gries) — the
  * estimate is fully deterministic given the seed. Estimates
  * OVER-count only: est ≥ true always; est ≤ true + eps·N with
  * probability ≥ confidence per item.
  *
  * The deserialized sketch is cached per expression instance by
  * CONTENT (length + `Arrays.equals`), not reference: BinaryType eval
  * over UnsafeRow-backed input returns a fresh copied byte array per
  * row, so a reference-only cache would re-deserialize every row. The
  * content compare is a vectorized linear scan — orders cheaper than
  * `readFrom`'s parse + counter-matrix allocation — and a reference
  * fast-path keeps the literal/reused-array case O(1). CodegenFallback
  * — sketch probing is object code either way, and the surrounding
  * projection stays codegen'd.
  */
case class CmsEstimateExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckSuccess
      case (l, r) => TypeCheckFailure(
        s"cms_estimate expects (binary, bigint), got (${l.simpleString}, ${r.simpleString})")
    }
  }

  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastSketch: CountMinSketch = _

  override protected def nullSafeEval(sk: Any, item: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if (!(bytes eq lastBytes) &&
        (lastBytes == null || !java.util.Arrays.equals(bytes, lastBytes))) {
      lastSketch = CountMinSketch.readFrom(bytes)
    }
    lastBytes = bytes
    lastSketch.estimateCount(java.lang.Long.valueOf(item.asInstanceOf[Long]))
  }

  override def dataType: DataType = LongType
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cms_estimate"
}

object Cms {
  /** Point-frequency estimate of a long `item` from a serialized
    * Count-Min `sketch` (see [[CmsEstimateExpr]]). */
  def cmsEstimate(sketch: Column, item: Column): Column =
    GraftColumnShim.column(CmsEstimateExpr(
      GraftColumnShim.expression(sketch), GraftColumnShim.expression(item)))
}
