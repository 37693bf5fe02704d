package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.types.{DateType, DoubleType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver parquet testdata (`TESTDATA.md`).
  *
  * All loaders are plain parquet scans so Catalyst can push filters and
  * prune columns into the scan. The only normalization is `events.ts`,
  * whose physical type has drifted across driver rounds (int64 nanos,
  * TIMESTAMP(NANOS), TIMESTAMP(MICROS) isAdjustedToUTC=false). We
  * normalize every variant to the same three columns:
  *   - `ts_ns`: epoch nanoseconds (long),
  *   - `ts_us`: epoch microseconds (long, truncated like DuckDB's
  *     ns->us cast, so oracle comparisons agree bit-for-bit), and
  *   - `ts`: a proper TimestampType built from `ts_us`.
  * The NTZ branch must stay timezone-independent: a cast to TIMESTAMP
  * reinterprets the wall clock in the *session* timezone, which silently
  * shifts epochs for any caller that hasn't pinned UTC. `timestampdiff`
  * against an NTZ epoch literal never consults the session timezone.
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

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizedWidenedEvents(eventsRaw(spark, dir))

  /** The one place the events widen spec lives: [[events]] and
    * [[eventsRange]] both funnel through it, so a column added to the
    * armor can never cover one surface and miss the other. */
  private def normalizedWidenedEvents(raw: DataFrame): DataFrame =
    widen(normalizeEvents(raw),
      longs = Seq("event_id", "user_id"), doubles = Seq("value"))

  /** TIMESTAMP(NANOS) parquet is unreadable on Spark 4.1 without the
    * legacy conf (PARQUET_TYPE_ILLEGAL at analysis); WITH it the column
    * reads as long nanos — hitting [[normalizeEvents]]'s LongType
    * branch — while MICROS files are entirely unaffected (verified
    * empirically on this Spark: the conf only changes nanos-unit
    * columns). The conf is runtime-settable, so setting it here covers
    * sessions the library didn't build. Past driver rounds HAVE shipped
    * nanos; dropping this line would re-open that drift hole. */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
  }

  /** events with a `[loUs, hiUs)` epoch-micros range predicate applied
    * to the RAW stored `ts` column — so it reaches the parquet scan as
    * a pushed filter (row-group pruning) — before the normalized
    * columns are derived. Filtering the derived `ts_ns`/`ts_us`/`ts`
    * after [[events]] would evaluate above a full-table scan instead.
    */
  def eventsRange(spark: SparkSession, dir: String, loUs: Long, hiUs: Long): DataFrame = {
    val raw = eventsRaw(spark, dir)
    val pred = raw.schema("ts").dataType match {
      case LongType            =>
        col("ts") >= loUs * 1000L && col("ts") < hiUs * 1000L
      case _: TimestampNTZType =>
        // LocalDateTime literals are TIMESTAMP_NTZ; building them at
        // UTC offset matches the wall-clock-as-UTC storage contract and
        // never consults the session timezone.
        col("ts") >= lit(ntzOfEpochUs(loUs)) && col("ts") < lit(ntzOfEpochUs(hiUs))
      case _                   =>
        // Instant literals are TIMESTAMP (LTZ): an instant compare.
        col("ts") >= lit(java.time.Instant.EPOCH.plus(loUs, java.time.temporal.ChronoUnit.MICROS)) &&
          col("ts") < lit(java.time.Instant.EPOCH.plus(hiUs, java.time.temporal.ChronoUnit.MICROS))
    }
    normalizedWidenedEvents(raw.filter(pred))
  }

  /** Session-timezone-independent epoch extraction for a stored
    * temporal column — the drift armor [[events]] applies to `ts`,
    * generalized: `o_orderdate`/`l_shipdate` have themselves drifted
    * DATE -> TIMESTAMP_NTZ across driver rounds, and a
    * `cast("timestamp")` on an NTZ/DATE column silently shifts epochs
    * in any session not pinned to UTC. Matched on the column's CURRENT
    * type; DATE and NTZ paths never consult the session timezone. */
  def epochUs(df: DataFrame, name: String): Column = df.schema(name).dataType match {
    case DateType            =>
      datediff(col(name), lit(java.sql.Date.valueOf("1970-01-01"))).cast("long") * 86400000000L
    case _: TimestampNTZType =>
      timestamp_diff("MICROSECOND", lit(ntzOfEpochUs(0L)), col(name))
    case _: TimestampType    => unix_micros(col(name))
    case other               => throw new IllegalArgumentException(
      s"$name: cannot derive an epoch from ${other.simpleString}")
  }

  /** FLOOR epoch milliseconds, derived from [[epochUs]] so every
    * physical type agrees by construction — per-type ms primitives
    * disagree on pre-epoch sub-ms values (`unix_millis` floors,
    * `timestamp_diff("MILLISECOND", ...)` truncates toward zero), and
    * that divergence is exactly the cross-type inconsistency these
    * helpers exist to eliminate. The double division is exact for any
    * epoch within ±2^52 us (~year 144683). */
  def epochMs(df: DataFrame, name: String): Column =
    floor(epochUs(df, name) / 1000L).cast("long")

  /** FLOOR days since the epoch (UTC day for instants); see [[epochMs]]
    * for why this derives from [[epochUs]] instead of per-type DAY
    * primitives (`timestamp_diff("DAY", ...)` truncates toward zero). */
  def epochDay(df: DataFrame, name: String): Column =
    floor(epochUs(df, name) / 86400000000L).cast("long")

  private def ntzOfEpochUs(us: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)

  /** Width normalization for the drift classes beyond temporal: an id
    * column shipped as INT32 makes Spark's int arithmetic WRAP where
    * DuckDB promotes (`event_id * 1000000000` silently diverges), and a
    * measure shipped as FLOAT changes downstream agg types. Casts are
    * inserted ONLY when the stored type differs from the canonical one,
    * so today's data takes the identity path (no cast node, pushdown
    * untouched); under drift the exact widening (int->long,
    * float->double) restores the arithmetic both engines agree on. */
  private def widen(df: DataFrame, longs: Seq[String], doubles: Seq[String] = Nil): DataFrame = {
    var out = df
    longs.foreach { c =>
      if (df.schema.fieldNames.contains(c) && df.schema(c).dataType != LongType)
        out = out.withColumn(c, col(c).cast("long"))
    }
    doubles.foreach { c =>
      if (df.schema.fieldNames.contains(c) && df.schema(c).dataType != DoubleType)
        out = out.withColumn(c, col(c).cast("double"))
    }
    out
  }

  private def normalizeEvents(raw: DataFrame): DataFrame = {
    val withNs = raw.schema("ts").dataType match {
      case LongType            => raw.withColumn("ts_ns", col("ts"))
      case _: TimestampNTZType =>
        // Wall-clock delta from the NTZ epoch: independent of
        // spark.sql.session.timeZone, unlike cast-to-TIMESTAMP.
        raw.withColumn("ts_ns",
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)") * 1000L)
      case _                   =>
        // TIMESTAMP (LTZ) stores an instant; unix_micros is tz-free.
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
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
  def documents(spark: SparkSession, dir: String): DataFrame =
    widen(table(spark, dir, "documents"), longs = Seq("doc_id", "n_chars"))
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    widen(table(spark, dir, "embeddings"), longs = Seq("vec_id"))

  /** THE canonical by-name loader: every table that has (or gains)
    * drift normalization dispatches to its armored loader here; plain
    * tables fall through to the raw scan. The SQL catalog iterates this
    * single registry instead of re-encoding which tables are special —
    * a loader added above but forgotten in a second list would leave
    * one surface silently unarmored. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events"     => events(spark, dir)
    case "documents"  => documents(spark, dir)
    case "embeddings" => embeddings(spark, dir)
    case other        => table(spark, dir, other)
  }
}
