package graft.streaming

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Convergence-on-the-guarantee for the streaming Misra–Gries twin:
  * across micro-batch boundaries and in-watermark disorder, each
  * closed window must emit (1) every θ-heavy item (recall), (2) only
  * lower bounds within the advertised N/(capacity+1) undercount, and
  * (3) at most `capacity` rows — the exact properties the batch
  * recount consumes. */
class StreamHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("window", LongType),
    StructField("ts", TimestampType),
    StructField("item", LongType)))

  private val WindowUs = 10000000L // 10-second windows
  private val Cap = 20

  test("per-window candidates honor recall, bounds, and capacity") {
    val dir = Files.createTempDirectory("shh_src").toString
    val ckpt = Files.createTempDirectory("shh_ckpt").toString
    def at(sec: Int): String = f"2024-01-01 00:00:$sec%02d"

    // two windows of 2000 Zipf-ish draws over 150 item kinds — far
    // more kinds than the capacity of 20, so eviction is constant
    val rnd = new Random(5)
    val cum = (1 to 150).map(i => 1.0 / i).scanLeft(0.0)(_ + _).tail
    def draw(): Long = {
      val x = rnd.nextDouble() * cum.last
      cum.indexWhere(_ >= x).toLong
    }
    val all = (0 until 20).flatMap { sec =>
      Seq.fill(100)((sec / 10L, at(sec), draw()))
    }
    // split so window-0 rows straggle into the second file (disorder)
    val (w0Tail, rest) = all.partition { case (w, ts, _) => w == 0L && ts >= at(7) }
    def write(file: String, rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("window", "tss", "item")
        .select($"window", to_timestamp($"tss").as("ts"), $"item")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$file")
    write("f1", rest.filter(_._1 == 0L))
    write("f2", w0Tail ++ rest.filter(_._1 == 1L))
    write("f3", Seq((99L, "2024-01-01 01:00:00", 0L))) // flush sentinel

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
      .withColumn("item", $"item".cast("string"))
      .as[StreamHeavyHitters.HEv]
    val q = StreamHeavyHitters.candidatesPerWindow(stream, WindowUs, Cap,
        watermark = "10 seconds")
      .writeStream.outputMode("append").format("memory").queryName("shh_out")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT * FROM shh_out WHERE window < 99")
      .as[StreamHeavyHitters.HRow].collect()
      .groupBy(_.window).view.mapValues(_.toSeq).toMap

    val byWindow = all.groupBy(_._1).view
      .mapValues(_.groupBy(_._3).view.mapValues(_.size.toLong).toMap).toMap
    for (w <- Seq(0L, 1L)) {
      val exact = byWindow(w)
      val n = exact.values.sum
      val rows = got.getOrElse(w, fail(s"window $w never emitted"))
      assert(rows.size <= Cap, s"window $w emitted ${rows.size} > capacity")
      assert(rows.map(_.item).distinct.size === rows.size, s"window $w dup items")
      assert(rows.forall(_.n_window == n), s"window $w n_window wrong")
      val maxErr = n / (Cap + 1).toLong
      rows.foreach { r =>
        val t = exact(r.item.toLong)
        assert(r.lb >= 1L && r.lb <= t, s"w=$w ${r.item}: lb=${r.lb} vs true=$t")
        assert(t - r.lb <= maxErr, s"w=$w ${r.item}: undercount > N/(cap+1)")
      }
      // recall: every item with true count > N/(cap+1) must be emitted
      val emitted = rows.map(_.item.toLong).toSet
      exact.filter(_._2 > maxErr).keys.foreach { item =>
        assert(emitted.contains(item), s"w=$w heavy item $item missed")
      }
    }
  }
}
