package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stream==batch convergence for the resample operator (the Tail
  * viewSink discipline): the same finite event set, fed as micro-
  * batches with in-watermark disorder, must emit EXACTLY the rows the
  * batch `Resample.resample` computes — same grid span, same gap rows,
  * bit-identical forward-filled doubles. */
class StreamResampleSpec extends SparkSpec {
  import spark.implicits._

  private val stepUs = 60000000L // 1-minute grid
  private val schema = StructType(Seq(
    StructField("key", LongType),
    StructField("ts", TimestampType),
    StructField("tb", LongType),
    StructField("v", DoubleType)))

  private def writeFile(dir: String, file: String, rows: Seq[(Long, String, Long, Double)]): Unit =
    rows.toDF("key", "tss", "tb", "v")
      .select($"key", to_timestamp($"tss").as("ts"), $"tb", $"v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$file")

  test("streamed grid converges to the batch resample, rows emitted as the watermark closes steps") {
    val dir = Files.createTempDirectory("sres_src").toString
    val ckpt = Files.createTempDirectory("sres_ckpt").toString

    // key 1: steps 0, 1, 4 (gap steps 2-3 fill from step 1's last obs);
    // key 2: a single step; key 3: arrives late in the stream.
    // f2's second event lands in step 1 OUT OF ORDER but inside the
    // 2-minute watermark allowance — it must still win step 1's argmax.
    val f1 = Seq(
      (1L, "2024-01-01 00:00:10", 1L, 1.0),
      (1L, "2024-01-01 00:01:20", 2L, 2.0),
      (2L, "2024-01-01 00:00:30", 3L, 5.0))
    val f2 = Seq(
      (1L, "2024-01-01 00:04:30", 4L, 4.0),
      (1L, "2024-01-01 00:01:40", 5L, 9.0))
    val f3 = Seq((3L, "2024-01-01 00:09:00", 6L, 7.5))
    val sentinel = Seq((999L, "2024-01-01 01:00:00", 7L, 0.0))
    writeFile(dir, "f1", f1)
    writeFile(dir, "f2", f2)
    writeFile(dir, "f3", f3)
    writeFile(dir, "f4", sentinel)

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*").as[StreamResample.Ev]
    val q = StreamResample.resample(stream, stepUs, watermark = "2 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sres_out")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT * FROM sres_out WHERE key < 900")
      .as[StreamResample.Grid].collect()
      .map(g => (g.key, g.step) -> ((g.step_start_us, g.n_events, g.last_value)))
    assert(got.length === got.toMap.size, "a grid row emitted twice")

    val events = (f1 ++ f2 ++ f3).toDF("key", "tss", "tb", "v")
      .select($"key", unix_micros(to_timestamp($"tss")).as("us"), $"tb", $"v")
    val want = graft.ops.Resample.resample(
        events, col("key"), col("us"), col("v"), col("tb"), stepUs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

    assert(got.toMap === want,
      s"missing=${(want.keySet -- got.map(_._1)).toSeq.sorted} " +
        s"extra=${(got.map(_._1).toSet -- want.keySet).toSeq.sorted}")
    // spot-pin the interesting rows: the late event won step 1, the gap
    // rows carry its value forward, step 4's own value takes over
    val m = got.toMap
    val base = 1704067200000000L / stepUs // 2024-01-01T00:00Z's absolute step
    assert(m((1L, base + 1))._3 === 9.0)
    assert(m((1L, base + 2))._2 === 0L && m((1L, base + 2))._3 === 9.0)
    assert(m((1L, base + 3))._2 === 0L && m((1L, base + 3))._3 === 9.0)
    assert(m((1L, base + 4))._3 === 4.0)
  }

  test("idle keys finalize by event-time timeout, not only on their next event") {
    val dir = Files.createTempDirectory("sres2_src").toString
    val ckpt = Files.createTempDirectory("sres2_ckpt").toString
    // key 1 never sees a second event; only the sentinel's watermark
    // advance (a different key) can close its step — the timeout path
    writeFile(dir, "f1", Seq((1L, "2024-01-01 00:00:10", 1L, 3.25)))
    writeFile(dir, "f2", Seq((999L, "2024-01-01 02:00:00", 2L, 0.0)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*").as[StreamResample.Ev]
    val q = StreamResample.resample(stream, stepUs, watermark = "2 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sres2_out")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT * FROM sres2_out WHERE key = 1")
      .as[StreamResample.Grid].collect()
    assert(got.length === 1)
    assert(got.head.step === 1704067200000000L / stepUs)
    assert(got.head.n_events === 1L && got.head.last_value === 3.25)
  }
}
