package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(col)` over a pre-built [[BloomFilter]] — the
  * map-side membership pre-filter for joins whose build side is
  * "small by nature" but too large to broadcast as rows.
  *
  * Scale rationale: a benchmark-suite shingle set can run to hundreds
  * of millions of distinct hashes (GBs as a broadcast relation), while
  * its bloom is tens of MBs at 0.1% fpp — shippable to every executor
  * like Spark's own runtime bloom join filters. Applying it BEFORE the
  * shuffle means the 100 TB probe side contributes only might-match
  * rows to the exchange; the exact join afterwards removes the false
  * positives, so results are bit-identical to the unfiltered plan
  * (one-sided error: a bloom never produces false negatives).
  *
  * The filter rides the plan as a deserialized [[BloomFilter]]
  * reference (spark-sketch filters are `Serializable`); codegen calls
  * `mightContainBinary` on the UTF8 bytes directly — the same bytes
  * `DataFrameStatFunctions.bloomFilter` inserted via `putString`, so
  * build and probe agree with no per-row String allocation.
  */
case class BloomMightContainExpr(child: Expression, bloom: BloomFilter)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.string("bloom_might_contain", child.dataType)

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContainExpr =
    copy(child = c)
  override def prettyName: String = "bloom_might_contain"
}

object Bloom {
  /** Membership predicate of a string column against `bf`. */
  def mightContain(c: Column, bf: BloomFilter): Column =
    GraftColumnShim.column(BloomMightContainExpr(GraftColumnShim.expression(c), bf))
}
