package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Linear bag-of-words scoring kernel for classifier inference
  * ([[graft.ops.Classify]]): one pass over the tokens with O(1) hash
  * lookups against a DRIVER-HELD weight map riding as a codegen
  * reference object (the CellExprs centroid pattern — the generated
  * call site is one stable line).
  *
  * Why a kernel: the map-literal + `aggregate` HOF formulation evaluates
  * its lambda interpreted per token AND `GetMapValue` on a map literal
  * is a LINEAR key scan — O(tokens · vocab) per row, quadratic at the
  * 65536-entry vocab cap the API advertises. This loop is
  * O(tokens) with constant-factor HashMap probes at any vocab size.
  */
object LinearScoreKernel {

  /** [bias + Σ w(token), n_tokens] — both outputs from ONE tokenize
    * pass. Unknown tokens contribute 0 (the OOV convention). */
  def score(text: UTF8String, w: java.util.HashMap[String, java.lang.Long],
      bias: Long): ArrayData = {
    val toks = text.toString.split(" ", -1)
    var acc = bias
    var i = 0
    while (i < toks.length) {
      val v = w.get(toks(i))
      if (v != null) acc = Math.addExact(acc, v.longValue())
      i += 1
    }
    new GenericArrayData(Array[Any](acc, toks.length.toLong))
  }
}

/** `linear_score(text)` → array<long> [weighted sum incl. bias, token
  * count]. The weight map participates in expression equality by
  * CONTENT (java.util.HashMap.equals), so two plans scoring with the
  * same model canonicalize identically. */
case class LinearScoreExpr(child: Expression,
    weights: java.util.HashMap[String, java.lang.Long], bias: Long)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.string("linear_score", child.dataType)
  override def nullSafeEval(v: Any): Any =
    LinearScoreKernel.score(v.asInstanceOf[UTF8String], weights, bias)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rW = ctx.addReferenceObj("weights", weights, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.LinearScoreKernel.score($c, $rW, ${bias}L)")
  }
  override protected def withNewChildInternal(c: Expression): LinearScoreExpr =
    copy(child = c)
  override def prettyName: String = "linear_score"
}

object LinearScore {
  def apply(text: Column, weights: Seq[(String, Long)], bias: Long): Column = {
    val hm = new java.util.HashMap[String, java.lang.Long](weights.size * 2)
    weights.foreach { case (t, w) => hm.put(t, java.lang.Long.valueOf(w)) }
    GraftColumnShim.column(LinearScoreExpr(GraftColumnShim.expression(text), hm, bias))
  }
}
