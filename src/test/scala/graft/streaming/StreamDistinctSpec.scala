package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stream==batch convergence for the HLL distinct-count twin: the same
  * finite event set, fed as micro-batches with in-watermark disorder
  * and duplicates, must emit per-window estimates EXACTLY equal to the
  * batch hll_sketch_agg/hll_sketch_estimate rollup — HLL registers
  * depend only on the value SET, so the sketches are identical, not
  * merely close. */
class StreamDistinctSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("window", LongType),
    StructField("ts", TimestampType),
    StructField("value", LongType)))

  private val WindowUs = 10000000L // 10-second windows

  test("streamed per-window distinct estimates equal the batch sketch rollup") {
    val dir = Files.createTempDirectory("sdis_src").toString
    val ckpt = Files.createTempDirectory("sdis_ckpt").toString

    def at(sec: Int): String = f"2024-01-01 00:00:$sec%02d"
    // three 10s windows; values overlap across windows, repeat within
    // them (idempotence), and window 0's tail arrives OUT OF ORDER in
    // the second file, inside the 10s watermark allowance.
    val all = (0 until 30).flatMap { sec =>
      val w = sec / 10
      Seq.tabulate(40)(i => (w.toLong, at(sec), (sec * 7 + i * 13) % 97L))
    }
    val (w0Tail, rest) = all.partition { case (w, ts, _) => w == 0L && ts >= at(6) }
    def write(file: String, rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("window", "tss", "value")
        .select($"window", to_timestamp($"tss").as("ts"), $"value")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$file")
    write("f1", rest.filter(_._1 <= 1L))
    write("f2", w0Tail) // out-of-order: window-0 rows after window-1 rows
    write("f3", rest.filter(_._1 == 2L))
    write("f4", Seq((99L, "2024-01-01 01:00:00", 0L))) // flush sentinel

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
      .as[StreamDistinct.WEv]
    val q = StreamDistinct.distinctPerWindow(stream, WindowUs,
        watermark = "10 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sdis_out")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT * FROM sdis_out WHERE window < 99")
      .as[StreamDistinct.WRow].collect()
      .map(r => r.window -> r.n_distinct).toList
    assert(got.map(_._1).distinct.length === got.length, "a window emitted twice")

    val want = all.toDF("window", "tss", "value")
      .groupBy($"window")
      .agg(hll_sketch_estimate(hll_sketch_agg($"value")).as("n_distinct"))
      .as[(Long, Long)].collect().toList
    assert(got.toMap === want.toMap,
      s"stream=${got.sorted} batch=${want.sorted}")
    // and the estimate at this cardinality (≤ 97 distinct) is exact
    val exact = all.groupBy(_._1).view.mapValues(_.map(_._3).distinct.size.toLong).toMap
    assert(got.toMap === exact, "lgK=12 sketch must be exact at 97 distinct")
  }
}
