package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.expr.{DigitsIntExpr, HexAddExpr, HexCmpExpr, HexSubExpr, HexToDecExpr, Keccak256Expr, MinHashSigsExpr, ShingleHashesExpr}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions for any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions` — the idiomatic way to
  * ship custom Catalyst functions with a library.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("keccak256"),
      new ExpressionInfo(classOf[Keccak256Expr].getName, "keccak256"),
      es => Keccak256Expr(es.head)))
    e.injectFunction((FunctionIdentifier("hex_add"),
      new ExpressionInfo(classOf[HexAddExpr].getName, "hex_add"),
      es => HexAddExpr(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("hex_cmp"),
      new ExpressionInfo(classOf[HexCmpExpr].getName, "hex_cmp"),
      es => HexCmpExpr(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("hex_sub"),
      new ExpressionInfo(classOf[HexSubExpr].getName, "hex_sub"),
      es => HexSubExpr(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("hex_to_dec"),
      new ExpressionInfo(classOf[HexToDecExpr].getName, "hex_to_dec"),
      es => HexToDecExpr(es.head)))
    e.injectFunction((FunctionIdentifier("digits_int"),
      new ExpressionInfo(classOf[DigitsIntExpr].getName, "digits_int"),
      es => DigitsIntExpr(es.head)))
    e.injectFunction((FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigsExpr].getName, "minhash_sigs"),
      es => MinHashSigsExpr(es.head)))
    e.injectFunction((FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "shingle_hashes"),
      es => ShingleHashesExpr(es.head)))
    e.injectOptimizerRule(_ => graft.plans.TokenCountRule)
  }
}
