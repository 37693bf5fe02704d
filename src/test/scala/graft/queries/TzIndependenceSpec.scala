package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Queries deriving epochs from stored temporal columns must return the
  * SAME values in any session timezone: the driver pins UTC, but the
  * library is also reached from user sessions that don't, and a
  * `cast("timestamp")` on an NTZ/DATE column silently shifts epochs by
  * the session offset (the round-8 `Tables.epochUs/Ms/Day` armor).
  * Covers every query that touches `o_orderdate` or `events.ts` epoch
  * derivations on the Spark side. */
class TzIndependenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val affected = Seq(
    "s2_point_lookup", "q18_large_orders", // o_date_ms via epochMs
    "j5_asof_join", "j7_asof_merge",       // o_day via epochDay
    "j6_range_join",                       // o_us via epochUs
    "s4_ranged_scan", "s5_max_height")     // events ts_us normalization

  test("epoch-deriving queries are identical under UTC and non-UTC sessions") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      val utc = affected.map { name =>
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        name -> SparkEntry.queries(name)(spark, dir).collect().map(_.toString).sorted.toSeq
      }.toMap
      for (tz <- Seq("Asia/Kolkata", "America/New_York")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        for (name <- affected) {
          val got = SparkEntry.queries(name)(spark, dir).collect().map(_.toString).sorted.toSeq
          assert(got === utc(name), s"$name shifts under session tz $tz")
        }
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
