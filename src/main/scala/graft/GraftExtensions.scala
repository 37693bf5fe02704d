package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's FULL SQL
  * function surface (scalar kernels, uint256/keccak, the sketch
  * aggregate family) and optimizer rules for any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions` — the idiomatic way to
  * ship custom Catalyst functions with a library. The function list is
  * [[graft.expr.Exprs.sqlBuilders]], the SAME list the runtime
  * `Catalog.registerAll` path installs, so the two surfaces cannot
  * drift (they did twice before: first the hand-copied extensions
  * list ran seven functions behind the runtime path, then the udaf
  * `uint256_sum` rode a separate udf.register call the extensions
  * path lacked — it is now an entry in the shared list too, built as
  * the same ScalaAggregator).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    graft.expr.Exprs.sqlBuilders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.expr.Exprs", name), builder))
    }
    e.injectOptimizerRule(_ => graft.plans.TokenCountRule)
  }
}
