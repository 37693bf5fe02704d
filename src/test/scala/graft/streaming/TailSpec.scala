package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Drives the tail micro-batch pipeline with a file source: each parquet
  * file = one poll cycle (maxFilesPerTrigger=1), exactly the reference's
  * one-chunk-per-barrier execution (`core/bus.py:127-144`). */
class TailSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("windowed counts over micro-batches match the batch computation") {
    val dir = Files.createTempDirectory("tail_src").toString
    val ckpt = Files.createTempDirectory("tail_ckpt").toString
    def mk(rows: Seq[(String, String, Double)], file: String): Unit =
      rows.toDF("tss", "event_type", "value")
        .select(to_timestamp($"tss").as("ts"), $"event_type", $"value")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$file")
    // two "poll cycles" arriving as two files
    mk(Seq(("2024-01-01 00:10:00", "click", 1.0),
           ("2024-01-01 00:20:00", "click", 2.0),
           ("2024-01-01 00:40:00", "view", 3.0)), "f1")
    mk(Seq(("2024-01-01 01:10:00", "click", 4.0),
           ("2024-01-01 01:20:00", "view", 5.0)), "f2")

    val stream = Tail.fileTail(spark, dir + "/*", schema)
    val agg = Tail.windowedCounts(stream)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("tail_out")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    val lastBatch = q.lastProgress.batchId
    q.stop()
    assert(lastBatch >= 1) // maxFilesPerTrigger=1 => at least 2 micro-batches

    val got = spark.sql("SELECT * FROM tail_out")
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start").toString,
        r.getAs[String]("event_type")) -> (r.getAs[Long]("n"), r.getAs[Double]("total")))
      .toMap
    assert(got(("2024-01-01 00:00:00.0", "click")) === ((2L, 3.0)))
    assert(got(("2024-01-01 00:00:00.0", "view")) === ((1L, 3.0)))
    assert(got(("2024-01-01 01:00:00.0", "click")) === ((1L, 4.0)))
    assert(got(("2024-01-01 01:00:00.0", "view")) === ((1L, 5.0)))
  }

  test("foreachBatch LWW sink converges under batch replay") {
    val target = Files.createTempDirectory("lww_sink").toString + "/table"
    val b1 = Seq(("k1", 1, "a"), ("k2", 1, "b")).toDF("key", "v", "payload")
    val b2 = Seq(("k1", 2, "a2")).toDF("key", "v", "payload")
    val sink = Tail.lwwSink(target, Seq("key"), Seq("v")) _
    sink(b1, 0L)
    sink(b2, 1L)
    sink(b2, 1L) // replayed micro-batch (task retry semantics)
    val got = spark.read.parquet(target).collect()
      .map(r => r.getAs[String]("key") -> (r.getAs[Int]("v"), r.getAs[String]("payload"))).toMap
    assert(got === Map("k1" -> ((2, "a2")), "k2" -> ((1, "b"))))
  }

  test("LWW sink rewrites only the buckets a micro-batch touches") {
    import java.nio.file.{Files => JFiles, Paths}
    val target = Files.createTempDirectory("lww_buckets").toString + "/table"
    val b1 = Seq(("k1", 1, "a"), ("k2", 1, "b")).toDF("key", "v", "payload")
    val b2 = Seq(("k1", 2, "a2")).toDF("key", "v", "payload")
    // buckets are a pure hash of the key, so this is deterministic
    val bucketOf = Map(
      "k1" -> b1.filter($"key" === "k1").select(Tail.bucketExpr(Seq("key"), 32)).head().getInt(0),
      "k2" -> b1.filter($"key" === "k2").select(Tail.bucketExpr(Seq("key"), 32)).head().getInt(0))
    assert(bucketOf("k1") !== bucketOf("k2")) // distinct dirs for the assertion below
    val sink = Tail.lwwSink(target, Seq("key"), Seq("v")) _
    sink(b1, 0L)
    def dirState(b: Int): Seq[(String, Long)] = {
      val d = Paths.get(target, s"__bucket=$b")
      JFiles.list(d).toArray.map(_.toString).sorted.toSeq
        .map(p => p -> JFiles.getLastModifiedTime(Paths.get(p)).toMillis)
    }
    val k2DirBefore = dirState(bucketOf("k2"))
    val k1DirBefore = dirState(bucketOf("k1"))
    Thread.sleep(1100) // mtime granularity
    sink(b2, 1L) // touches only k1's bucket
    assert(dirState(bucketOf("k2")) === k2DirBefore) // untouched bucket: same files, same mtimes
    assert(dirState(bucketOf("k1")) !== k1DirBefore) // touched bucket rewritten
    val got = spark.read.parquet(target).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Int]("v")).toMap
    assert(got === Map("k1" -> 2, "k2" -> 1))
  }
}
