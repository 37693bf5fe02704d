package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, ExtendedQueries, PipelineQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + FIXTURES.md §B. */
object SparkEntry {

  private val allDefs: Seq[CoreQueries.QueryDef] =
    CoreQueries.defs ++ PipelineQueries.defs ++ ExtendedQueries.defs

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
