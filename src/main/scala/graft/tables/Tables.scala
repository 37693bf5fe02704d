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

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  def events(spark: SparkSession, dir: String): DataFrame = {
    // Runtime-settable, so this works even on a session we didn't build.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    val withUs = raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts_us", expr("ts div 1000"))
      case _        => raw.withColumn("ts_us", unix_micros(col("ts")))
    }
    withUs.withColumn("ts", timestamp_micros(col("ts_us")))
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
