package graft

import graft.tables.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The driver testdata's `events.ts` physical type has drifted across
  * rounds (int64 nanos -> TIMESTAMP(NANOS) -> TIMESTAMP(MICROS) NTZ), and
  * round 7 died because the non-long branch of `Tables.events` was never
  * exercised. This matrix pins every layout the loader can face —
  * int64-long, micros NTZ, micros LTZ, and both TIMESTAMP(NANOS)
  * flavors (readable only under the legacy nanosAsLong conf the loader
  * sets at runtime, where they surface as long nanos) — to identical
  * `ts_ns`/`ts_us`/`ts`, in ANY session timezone.
  *
  * Fixtures committed under test resources; regenerate with
  * `tools/gen_ts_fixtures.py` (pyarrow, not a library dependency).
  */
class EventsTypeMatrixSpec extends SparkSpec {

  private val formats = Seq("events_int64_ns", "events_us_ntz", "events_us_ltz",
    "events_ns_ntz", "events_ns_ltz")

  // 8 rows, micro-precision, days 0,2,..,14 of 2024-01 (see generator)
  private val expectedUs: Seq[Long] =
    (0 until 15 by 2).map(d => 1704067200000000L + d * 86400000000L + 123456L)

  private def dirFor(fixture: String): String = {
    val dir = Files.createTempDirectory(s"tsfix-$fixture-")
    val res = getClass.getResourceAsStream(s"/tsfix/$fixture.parquet")
    assert(res != null, s"missing fixture resource $fixture")
    Files.copy(res, dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private lazy val dirs: Map[String, String] = formats.map(f => f -> dirFor(f)).toMap

  private def tsUs(df: DataFrame): Seq[Long] =
    df.orderBy("event_id").select("ts_us").collect().map(_.getLong(0)).toSeq

  test("all five physical ts layouts normalize to the same epoch micros") {
    for (f <- formats) {
      val ev = Tables.events(spark, dirs(f))
      assert(ev.schema("ts_ns").dataType === LongType, f)
      assert(ev.schema("ts_us").dataType === LongType, f)
      assert(ev.schema("ts").dataType === TimestampType, f)
      assert(tsUs(ev) === expectedUs, s"$f ts_us mismatch")
      val ns = ev.orderBy("event_id").select("ts_ns").collect().map(_.getLong(0)).toSeq
      assert(ns === expectedUs.map(_ * 1000L), s"$f ts_ns mismatch")
    }
  }

  test("normalization is independent of spark.sql.session.timeZone") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (tz <- Seq("Asia/Kolkata", "America/New_York")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        for (f <- formats)
          assert(tsUs(Tables.events(spark, dirs(f))) === expectedUs, s"$f under $tz")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("eventsRange selects the same subset on every format, any timezone") {
    val lo = 1704240000000000L // 2024-01-03T00:00:00Z
    val hi = 1704758400000000L // 2024-01-09T00:00:00Z
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (tz <- Seq("UTC", "Asia/Kolkata")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        for (f <- formats) {
          val got = Tables.eventsRange(spark, dirs(f), lo, hi)
            .orderBy("event_id").select("event_id").collect().map(_.getLong(0)).toSeq
          assert(got === Seq(2L, 3L, 4L), s"$f under $tz")
        }
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("property: random epochs normalize identically across all physical types") {
    // The committed fixtures pin the exact driver layouts; this variant
    // generates fresh parquet from random epochs (seeded) so the
    // normalization is exercised over the value space, including
    // sub-microsecond truncation on the int64-nanos path.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    // epochs in [1970, ~2100), micro precision
    val us = Seq.fill(64)((rnd.nextLong() % 4102444800000000L).abs).sorted
    val rows = us.zipWithIndex.map { case (u, i) => (i.toLong + 1, u) }
    def writeEvents(ts: org.apache.spark.sql.Column): String = {
      val dir = Files.createTempDirectory("tsprop-").toString
      rows.toDF("event_id", "us")
        .select(col("event_id"), ts.as("ts"), (col("event_id") * 10).as("user_id"),
          lit("click").as("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.parquet(s"$dir/events.parquet")
      dir
    }
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "UTC") // fixture GENERATION pinned
      val dirs = Map(
        // int64 nanos with sub-micro residue: ts_us must truncate like DuckDB
        "long" -> writeEvents(col("us") * 1000L + (col("event_id") % 1000)),
        "ltz"  -> writeEvents(timestamp_micros(col("us"))),
        "ntz"  -> writeEvents(timestamp_micros(col("us")).cast("timestamp_ntz")))
      for (tz <- Seq("UTC", "Australia/Eucla")) { // +8:45, the nastiest offset
        spark.conf.set("spark.sql.session.timeZone", tz)
        for ((kind, d) <- dirs)
          assert(tsUs(Tables.events(spark, d)) === us, s"$kind under $tz")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("eventsRange pushes the ts range into the parquet scan") {
    for (f <- formats) {
      val df = Tables.eventsRange(spark, dirs(f), 1704240000000000L, 1704758400000000L)
      val scanMeta = df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metadata("PushedFilters")
      }
      assert(scanMeta.isDefined, s"$f: no FileSourceScanExec found")
      assert(scanMeta.get.contains("GreaterThanOrEqual(ts") && scanMeta.get.contains("LessThan(ts"),
        s"$f: range not pushed, PushedFilters=${scanMeta.get}")
    }
  }
}
