package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stream==batch convergence for rolling z-score anomalies (the
  * StreamResample discipline): the same finite event set, fed as
  * micro-batches with in-watermark disorder, must emit exactly the
  * rows `Anomaly.rolling` computes under (ts, id) order — doubles
  * bit-for-bit, since both sides quantize to DECIMAL(18,2) and share
  * one double expression tree. */
class StreamAnomalySpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("key", LongType),
    StructField("id", LongType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  private def writeFile(dir: String, file: String,
      rows: Seq[(Long, Long, String, Double)]): Unit =
    rows.toDF("key", "id", "tss", "value")
      .select($"key", $"id", to_timestamp($"tss").as("ts"), $"value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$file")

  private def at(sec: Int): String = f"2024-01-01 00:00:$sec%02d"

  test("streamed anomalies converge to the batch operator, incl. out-of-order inserts") {
    val dir = Files.createTempDirectory("sano_src").toString
    val ckpt = Files.createTempDirectory("sano_ckpt").toString

    // user 1: seconds 0..24, one per second, values ~10 with a spike
    //   at s20 (80.0, the anomaly) — EXCEPT s4, which arrives in f2
    //   out of order with a perturbing value (99.0). s4 itself has
    //   only 4 priors (no verdict), but it sits inside the trailing
    //   window of s5..s24, so scoring those eagerly in f1 would get
    //   every mean/z after it wrong. 25 events also exercise the
    //   20-value trail cap (s24 scores against exactly 20 priors).
    // user 2: 3 events — never reaches minPrior, emits nothing.
    val base = Seq.tabulate(25) { i =>
      val v = if (i == 20) 80.0 else 10.0 + (i % 5) * 0.3 - (i % 3) * 0.2
      (1L, 100L + i, at(i), v)
    }
    val f1 = base.filter { case (_, id, _, _) =>
      id != 104L && id - 100L <= 13L
    } ++ Seq(
      (2L, 200L, at(0), 5.0), (2L, 201L, at(1), 5.5), (2L, 202L, at(2), 6.0))
    // wm after f1 = s13 - 10s = s3; every f2 event is at/above it
    val f2 = Seq((1L, 104L, at(4), 99.0)) ++
      base.filter { case (_, id, _, _) => id - 100L >= 14L }
    val f3 = Seq((999L, 900L, "2024-01-01 01:00:00", 0.0)) // flush sentinel
    writeFile(dir, "f1", f1)
    writeFile(dir, "f2", f2)
    writeFile(dir, "f3", f3)

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*").as[StreamAnomaly.AEv]
    val q = StreamAnomaly.detect(stream, trail = 20, minPrior = 5,
        watermark = "10 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sano_out")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT * FROM sano_out WHERE user_id < 900")
      .as[StreamAnomaly.ARow].collect()
      .map(r => (r.event_id, r.user_id, r.value, r.n, r.mean, r.z, r.is_anomaly))
    assert(got.length === got.map(_._1).distinct.length, "an event scored twice")

    val events = (f1 ++ f2 ++ f3).toDF("key", "id", "tss", "value")
      .select($"key".as("user_id"), $"id".as("event_id"),
        unix_micros(to_timestamp($"tss")).as("ts_us"), $"value")
    val want = graft.ops.Anomaly.rolling(events, col("event_id"),
        col("user_id"), col("value"), Seq(col("ts_us"), col("event_id")))
      .filter(col("user_id") < 900)
      .as[(Long, Long, Double, Long, Double, Option[Double], Long)]
      .collect().toSet

    assert(got.toSet === want,
      s"missing=${want -- got.toSet} extra=${got.toSet -- want}")
    // spot-pin the shapes the scenario was built for
    assert(got.exists(r => r._1 == 120L && r._7 == 1L), "the s20 spike must flag")
    assert(!got.exists(_._1 == 104L), "s4 has 4 priors, no verdict")
    assert(got.find(_._1 == 124L).get._4 === 20L, "s24 scores against the capped trail")
    assert(!got.exists(_._2 == 2L), "user 2 never reaches minPrior")
    // the out-of-order 99.0 must have entered later windows: s5's mean
    // includes it (n=5 priors: s0..s4)
    val s5 = got.find(_._1 == 105L).get
    assert(s5._5 > 20.0, s"s4's 99.0 missing from s5's window: mean=${s5._5}")
  }
}
