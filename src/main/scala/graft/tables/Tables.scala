package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver parquet testdata (`TESTDATA.md`).
  *
  * All loaders are plain parquet scans so Catalyst can push filters and
  * prune columns into the scan. The only normalization is `events.ts`:
  * the file stores TIMESTAMP(NANOS) which Spark's parquet reader rejects
  * by default; we read it as a nanos long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and expose
  *   - `ts_us`: epoch microseconds (long, truncated like DuckDB's ns->us
  *     cast, so oracle comparisons agree bit-for-bit), and
  *   - `ts`: a proper TimestampType built from `ts_us`.
  */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  // Loading a parquet table costs a file listing + footer/schema read
  // per call; with ~50 declared queries each re-loading its inputs that
  // fixed cost dominates small-SF runs. Cache the analyzed DataFrame per
  // (session, path) — keyed on the session so a restarted session never
  // sees plans bound to a stopped SparkContext. Entries of stopped
  // sessions are purged on access so long-lived JVMs that cycle many
  // sessions (test suites) don't leak analyzed plans. Note the cached
  // plan snapshots the file listing: data rewritten at the same path
  // during a session's lifetime won't be picked up.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    cache.computeIfAbsent((spark, path(dir, name)),
      { case (s, p) => s.read.parquet(p) })
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    // Runtime-settable, so this works even on a session we didn't build.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    // `ts_ns` stays the raw scan column: range predicates against it are
    // pushed into the parquet scan (row-group pruning); the derived
    // `ts_us`/`ts` would block pushdown if filtered on instead.
    val withNs = raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts_ns", col("ts"))
      case _        => raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000)
    }
    withNs.withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
