package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stream==batch convergence for the funnel (the StreamResample
  * discipline): the same finite event set, fed as micro-batches with
  * in-watermark disorder, must emit exactly the (user, t1, level) rows
  * the batch `Funnel.firstTouch` computes for every user whose window
  * the watermark closed. */
class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val W = 10L * 60000000L // 10-minute funnel window
  private val schema = StructType(Seq(
    StructField("key", LongType),
    StructField("ts", TimestampType),
    StructField("tpe", StringType)))

  private def writeFile(dir: String, file: String, rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("key", "tss", "tpe")
      .select($"key", to_timestamp($"tss").as("ts"), $"tpe")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$file")

  test("streamed funnel converges to the batch operator, incl. anchor shifts and tombstones") {
    val dir = Files.createTempDirectory("sfun_src").toString
    val ckpt = Files.createTempDirectory("sfun_ckpt").toString
    val steps = Seq("a", "b", "c")

    // user 1: full a->b->c conversion in order.
    // user 2: level 2 only (c lands outside the 10-min window).
    // user 3: the adversarial case — its 'b' at 00:02 arrives in f1
    //   BEFORE any 'a'; the 'a' (00:01) arrives in f2 out of order but
    //   inside the watermark. The buffered-pre-anchor-event rule is
    //   what makes the chain find a->b here.
    // user 4: anchor shift — an 'a' at 00:05 arrives first, then an
    //   earlier 'a' at 00:00 in the next batch; 'b' at 00:12 is inside
    //   the SHIFTED window's [anchor, anchor+W]? 00:12 - 00:00 = 12min
    //   > W, so the earlier anchor must DROP the level-2 that the late
    //   anchor would have granted.
    val f1 = Seq(
      (1L, "2024-01-01 00:00:00", "a"),
      (1L, "2024-01-01 00:03:00", "b"),
      (2L, "2024-01-01 00:00:00", "a"),
      (2L, "2024-01-01 00:02:00", "b"),
      (3L, "2024-01-01 00:02:00", "b"),
      (4L, "2024-01-01 00:05:00", "a"))
    val f2 = Seq(
      (1L, "2024-01-01 00:06:00", "c"),
      (2L, "2024-01-01 00:20:00", "c"), // outside user 2's window
      (3L, "2024-01-01 00:01:00", "a"), // out-of-order anchor
      (4L, "2024-01-01 00:00:00", "a"), // anchor shifts earlier
      (4L, "2024-01-01 00:12:00", "b")) // inside late-anchor window only
    val sentinel = Seq((999L, "2024-01-01 03:00:00", "a"))
    writeFile(dir, "f1", f1)
    writeFile(dir, "f2", f2)
    writeFile(dir, "f3", sentinel)

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*").as[StreamFunnel.FEv]
    val q = StreamFunnel.funnel(stream, steps, W, watermark = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sfun_out")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT * FROM sfun_out WHERE user_id < 900")
      .as[StreamFunnel.FRow].collect()
      .map(r => r.user_id -> ((r.t1_us, r.level)))
    assert(got.length === got.toMap.size, "a user emitted twice")

    val events = (f1 ++ f2).toDF("key", "tss", "tpe")
      .select($"key".as("user_id"), unix_micros(to_timestamp($"tss")).as("ts_us"),
        $"tpe".as("event_type"))
    val want = graft.ops.Funnel.firstTouch(events,
        col("user_id"), col("ts_us"), col("event_type"), steps, W)
      .select("user_id", "t1_us", "level")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    assert(got.toMap === want,
      s"missing=${(want.keySet -- got.map(_._1)).toSeq.sorted} " +
        s"extra=${(got.map(_._1).toSet -- want.keySet).toSeq.sorted} got=${got.toMap}")
    // spot-pin the adversarial users
    val m = got.toMap
    val base = 1704067200000000L
    assert(m(3L) === ((base + 60000000L, 2L)), "pre-anchor buffering failed")
    assert(m(4L) === ((base, 1L)), "anchor shift failed to tighten the window")
  }
}
