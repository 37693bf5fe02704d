package graft.sql

import org.apache.spark.sql.SparkSession
import graft.tables.Tables

/** SQL surface: registers the testdata tables as temp views and the
  * engine's custom functions, so `spark.sql` works end-to-end:
  *
  * {{{
  * Catalog.registerAll(spark, "/root/testdata/sf0.01")
  * spark.sql("SELECT keccak256(event_type), count(*) FROM events GROUP BY 1")
  * }}}
  */
object Catalog {
  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  def registerAll(spark: SparkSession, dir: String): Unit = {
    // Register through the canonical loaders, not raw scans: the SQL
    // views must inherit the same drift normalization (documents/
    // embeddings width widening, events ts) as the programmatic
    // surface, or `spark.sql` arithmetic silently wraps where the
    // oracle promotes. widen() is the identity when types match, so
    // today's plans are unchanged.
    val widened: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "documents" -> (Tables.documents _),
      "embeddings" -> (Tables.embeddings _))
    TableNames.foreach { n =>
      widened.get(n) match {
        case Some(load) => load(spark, dir).createOrReplaceTempView(n)
        case None       => Tables.table(spark, dir, n).createOrReplaceTempView(n)
      }
    }
    Tables.events(spark, dir).createOrReplaceTempView("events")
    graft.expr.Exprs.register(spark)
    graft.expr.Abi.register(spark)
  }
}
