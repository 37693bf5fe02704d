package graft

import graft.tables.Tables
import org.apache.spark.sql.functions._

/** The epoch helpers' contract: every physical type carrying the same
  * instant yields the same epoch value, in any session timezone,
  * INCLUDING pre-1970 instants — `timestamp_diff("DAY", ...)` truncates
  * toward zero while floor-division floors, and that divergence on
  * negative values is exactly the cross-type inconsistency the helpers
  * exist to eliminate. */
class TablesEpochSpec extends SparkSpec {
  import spark.implicits._

  // instants straddling the epoch: -36h, -12h, -1us, 0, +12h, +36h
  private val usVals = Seq(-129600000000L, -43200000000L, -1L, 0L, 43200000000L, 129600000000L)

  private def frames = {
    val base = usVals.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "us")
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC") // pin only the NTZ fixture build
    val ntz = base.select(col("id"), timestamp_micros(col("us")).cast("timestamp_ntz").as("t"))
      .localCheckpoint() // freeze values before the tz flips below
    spark.conf.set("spark.sql.session.timeZone", prev)
    val ltz = base.select(col("id"), timestamp_micros(col("us")).as("t"))
    Map("ntz" -> ntz, "ltz" -> ltz)
  }

  test("epochUs/epochMs/epochDay agree across physical types, pre-epoch included") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      val fs = frames
      // the contract is FLOOR division: -1us lands in ms -1 and day -1,
      // -36h lands in day -2 (truncation toward zero would say 0 and -1)
      val wantMs = usVals.map(Math.floorDiv(_, 1000L))
      val wantDay = usVals.map(Math.floorDiv(_, 86400000000L))
      for (tz <- Seq("UTC", "Asia/Kolkata")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        for ((kind, df) <- fs) {
          def got(c: org.apache.spark.sql.Column) =
            df.orderBy("id").select(c).collect().map(_.getLong(0)).toSeq
          assert(got(Tables.epochUs(df, "t")) === usVals, s"$kind/$tz epochUs")
          assert(got(Tables.epochMs(df, "t")) === wantMs, s"$kind/$tz epochMs")
          assert(got(Tables.epochDay(df, "t")) === wantDay, s"$kind/$tz epochDay")
        }
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
