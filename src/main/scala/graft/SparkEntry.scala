package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, ExtendedQueries, PipelineQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + FIXTURES.md §B. */
object SparkEntry {

  private val allDefs: Seq[CoreQueries.QueryDef] = {
    val defs = CoreQueries.defs ++ PipelineQueries.defs ++ ExtendedQueries.defs
    // A name collision across the three registries would silently drop a
    // query in the .toMap below — never run, never dumped, invisible in
    // both errors.json and the output dirs. Fail loudly instead.
    val dups = defs.groupBy(_.name).collect { case (n, ds) if ds.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names across registries: ${dups.mkString(", ")}")
    defs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.pipelines.Crawl.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.filter(_.sql.nonEmpty).map(d => d.name -> d.sql).toMap
}
