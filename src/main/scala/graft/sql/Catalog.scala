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
    // Register through Tables.load — THE canonical by-name loader — so
    // the SQL views inherit exactly the same drift normalization
    // (documents/embeddings width widening, events ts) as the
    // programmatic surface. No second registry of "which tables are
    // special" to keep in sync: a loader armored in Tables is armored
    // here by construction.
    (TableNames :+ "events").foreach { n =>
      Tables.load(spark, dir, n).createOrReplaceTempView(n)
    }
    graft.expr.Exprs.register(spark)
    graft.expr.Abi.register(spark)
  }
}
