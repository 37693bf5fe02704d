package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stream==batch convergence for cohort retention (the StreamResample
  * discipline): the same finite event set, fed as micro-batches with
  * in-watermark disorder, must emit exactly the distinct (user,
  * cohort, offset) facts of `Retention.activity` plus one
  * membership fact per `Retention.cohort` row — each exactly once. */
class StreamRetentionSpec extends SparkSpec {
  import spark.implicits._

  private val P = 60000000L // 1-minute cohort periods for a compact timeline
  private val schema = StructType(Seq(
    StructField("key", LongType),
    StructField("ts", TimestampType),
    StructField("tpe", StringType)))

  private def writeFile(dir: String, file: String, rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("key", "tss", "tpe")
      .select($"key", to_timestamp($"tss").as("ts"), $"tpe")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$file")

  test("streamed retention facts converge to the batch operator, incl. anchor shifts") {
    val dir = Files.createTempDirectory("sret_src").toString
    val ckpt = Files.createTempDirectory("sret_ckpt").toString

    // user 1: plain close-then-late path — signs up at 00:00:30, two
    //   in-window activities before the watermark closes it (f2), then
    //   POST-CLOSE activity in f4 that must emit immediately via the
    //   mask (minutes 6 and 7), with a duplicate minute-7 masked out.
    // user 2: the adversarial case — signup at 00:05 lands first, an
    //   EARLIER signup at 00:03:30 arrives in f2 inside the watermark;
    //   the final cohort is minute 3, so the f1 activity at 00:04
    //   (buffered pre-close) becomes offset 1 and the original signup
    //   becomes offset 2. Closing greedily at anchor 5 would have
    //   emitted the wrong offsets.
    // user 3: pre-anchor buffering — activity at 00:02 arrives before
    //   any signup; the signup (00:03) lands later, making the
    //   buffered minute-2 a NEGATIVE offset (excluded) and the f2
    //   activity at 00:06 offset 3.
    // user 4: never signs up — must emit nothing, state stays bounded.
    val f1 = Seq(
      (1L, "2024-01-01 00:00:30", "signup"),
      (1L, "2024-01-01 00:00:40", "click"),
      (1L, "2024-01-01 00:03:10", "click"),
      (2L, "2024-01-01 00:05:00", "signup"),
      (2L, "2024-01-01 00:04:00", "click"),
      (3L, "2024-01-01 00:02:00", "click"),
      (4L, "2024-01-01 00:01:30", "click"))
    // watermark after f1 = 00:05 - 2min = 00:03; every f2 event is at
    // or above it (the convergence contract's lateness caveat)
    val f2 = Seq(
      (2L, "2024-01-01 00:03:30", "signup"), // anchor shifts 5 -> 3
      (2L, "2024-01-01 00:04:30", "click"),  // dup minute-4 with f1
      (3L, "2024-01-01 00:03:00", "signup"),
      (3L, "2024-01-01 00:06:00", "click"))
    // wm driver: pushes the watermark to 00:06, closing user 2
    val f3 = Seq((999L, "2024-01-01 00:08:00", "click"))
    // post-close activity, all at/above wm 00:06
    val f4 = Seq(
      (1L, "2024-01-01 00:06:30", "click"),
      (1L, "2024-01-01 00:07:00", "click"),
      (1L, "2024-01-01 00:07:30", "click"), // dup minute-7, masked
      (2L, "2024-01-01 00:06:00", "click"))
    writeFile(dir, "f1", f1)
    writeFile(dir, "f2", f2)
    writeFile(dir, "f3", f3)
    writeFile(dir, "f4", f4)

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*").as[StreamRetention.REv]
    val q = StreamRetention.facts(stream, periodUs = P, maxOffset = 8,
        watermark = "2 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sret_out")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT * FROM sret_out WHERE user_id < 900")
      .as[StreamRetention.RFact].collect()
      .map(r => (r.user_id, r.cohort_week, r.week_offset))
    assert(got.length === got.toSet.size, "a fact emitted twice")

    val events = (f1 ++ f2 ++ f3 ++ f4).toDF("key", "tss", "tpe")
      .select($"key".as("user_id"), unix_micros(to_timestamp($"tss")).as("ts_us"),
        $"tpe".as("event_type"))
    val wantActivity = graft.ops.Retention.activity(events,
        col("user_id"), col("ts_us"), col("event_type"), "signup", P, 8)
      .as[(Long, Long, Long)].collect().toSet
    val wantMembers = graft.ops.Retention.cohort(events,
        col("user_id"), col("ts_us"), col("event_type"), "signup", P)
      .as[(Long, Long)].collect().map { case (u, cw) => (u, cw, -1L) }.toSet

    assert(got.toSet === (wantActivity ++ wantMembers),
      s"missing=${(wantActivity ++ wantMembers) -- got.toSet} " +
        s"extra=${got.toSet -- (wantActivity ++ wantMembers)}")
    // spot-pin the adversarial shapes (cohorts are absolute epoch
    // minutes: base = 2024-01-01 00:00 UTC / 1 min)
    val base = 1704067200000000L / P
    val u2 = got.filter(_._1 == 2L).map(f => (f._2, f._3)).toSet
    assert(u2 === Set((base + 3, -1L), (base + 3, 0L), (base + 3, 1L),
        (base + 3, 2L), (base + 3, 3L)),
      "anchor shift must re-base user 2's offsets to cohort minute 3")
    val u1Late = got.filter(f => f._1 == 1L && f._3 >= 6L).map(_._3).toSet
    assert(u1Late === Set(6L, 7L), "post-close facts must emit via the mask, deduped")
    assert(!got.exists(_._1 == 4L), "a user who never signs up emits nothing")
  }
}
