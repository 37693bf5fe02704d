package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Drives the stateful streaming operators with a file source (one
  * parquet file per micro-batch, as TailSpec). */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  private def mkDirs() =
    (Files.createTempDirectory("sess_src").toString,
      Files.createTempDirectory("sess_ckpt").toString)

  private def writeFile(dir: String, file: String, rows: Seq[(Long, String, Double)]): Unit =
    rows.toDF("user_id", "tss", "value")
      .select($"user_id", to_timestamp($"tss").as("ts"), $"value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$file")

  test("flatMapGroupsWithState sessionization closes sessions by gap and by timeout") {
    val (dir, ckpt) = mkDirs()
    // user 1: two sessions 30+ min apart; user 2: one session.
    writeFile(dir, "f1", Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 00:10:00", 2.0),
      (2L, "2024-01-01 00:05:00", 5.0)))
    writeFile(dir, "f2", Seq(
      (1L, "2024-01-01 01:00:00", 3.0))) // gap-crossing: closes session 1
    // f3 only advances the watermark far past everything open
    writeFile(dir, "f3", Seq(
      (9L, "2024-01-01 09:00:00", 0.0)))

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*").as[Sessionize.Ev]
    val q = Sessionize.sessions(stream).writeStream
      .outputMode("append").format("memory").queryName("sess_out")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT * FROM sess_out").as[Sessionize.ClosedSession]
      .collect().map(s => (s.user_id, s.session_start_us) -> ((s.n, s.total))).toMap
    val base = 1704067200000000L // 2024-01-01T00:00:00Z epoch micros
    val min = 60000000L
    assert(got((1L, base)) === ((2L, 3.0)))            // closed by the gap-crossing event
    assert(got((2L, base + 5 * min)) === ((1L, 5.0)))  // closed by event-time timeout
    assert(got((1L, base + 60 * min)) === ((1L, 3.0))) // closed by timeout after f3
  }

  test("late-but-allowed event extends an open session's start downward") {
    val (dir, ckpt) = mkDirs()
    writeFile(dir, "f1", Seq(
      (1L, "2024-01-01 00:10:00", 1.0)))
    // batch 2: late event at 00:05 — within the watermark, inside the
    // gap relative to the open session — must LOWER session_start_us
    writeFile(dir, "f2", Seq(
      (1L, "2024-01-01 00:05:00", 2.0)))
    writeFile(dir, "f3", Seq(
      (9L, "2024-01-01 09:00:00", 0.0))) // watermark push: closes user 1

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*").as[Sessionize.Ev]
    val q = Sessionize.sessions(stream).writeStream
      .outputMode("append").format("memory").queryName("sess_late_out")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT * FROM sess_late_out").as[Sessionize.ClosedSession]
      .collect().filter(_.user_id == 1L)
    val base = 1704067200000000L
    val min = 60000000L
    assert(got.length === 1)
    assert(got.head.session_start_us === base + 5 * min) // extended down to 00:05
    assert(got.head.n === 2L && got.head.total === 3.0)
  }

  test("dropDuplicatesWithinWatermark suppresses replayed keys across micro-batches") {
    val (dir, ckpt) = mkDirs()
    writeFile(dir, "f1", Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (2L, "2024-01-01 00:01:00", 2.0)))
    writeFile(dir, "f2", Seq(
      (1L, "2024-01-01 00:00:00", 1.0),   // exact replay (K8 idempotence)
      (3L, "2024-01-01 00:02:00", 3.0)))

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
    val q = Sessionize.dedupWithinWatermark(stream, Seq("user_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()

    val users = spark.sql("SELECT user_id FROM dedup_out").collect().map(_.getLong(0)).sorted
    assert(users === Array(1L, 2L, 3L))
  }

  test("streaming corpus ingest drops corpus dups and in-stream replays") {
    val (dir, ckpt) = mkDirs()
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ingest_ts", TimestampType),
      StructField("text", StringType)))
    def writeDocs(file: String, rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "tss", "text")
        .select($"doc_id", to_timestamp($"tss").as("ingest_ts"), $"text")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$file")

    writeDocs("f1", Seq(
      (10L, "2024-01-01 00:00:00", "already in corpus"),
      (11L, "2024-01-01 00:00:30", "brand new a")))
    writeDocs("f2", Seq(
      (12L, "2024-01-01 00:01:00", "brand new a"), // in-stream replay of 11
      (13L, "2024-01-01 00:01:30", "brand new b")))

    val corpusHashes = Seq("already in corpus").toDF("t")
      .select(md5($"t").as("text_hash"))
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
    val q = Ingest.dedupedStream(stream, corpusHashes)
      .writeStream.outputMode("append").format("memory").queryName("ingest_out")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()

    val ids = spark.sql("SELECT doc_id FROM ingest_out").collect().map(_.getLong(0)).sorted
    assert(ids === Array(11L, 13L)) // 10 = corpus dup, 12 = stream replay
  }

  test("stream-stream interval join matches only rows inside the band") {
    val (ldir, ckpt) = mkDirs()
    val rdir = Files.createTempDirectory("sess_r").toString
    writeFile(ldir, "f1", Seq((1L, "2024-01-01 01:00:00", 10.0)))
    writeFile(rdir, "f1", Seq(
      (1L, "2024-01-01 00:30:00", 1.0),   // inside 60-min band
      (1L, "2024-01-01 02:00:00", 2.0),   // after the event -> excluded
      (1L, "2023-12-31 23:00:00", 3.0)))  // too old -> excluded

    val l = spark.readStream.schema(schema).parquet(ldir + "/*")
    val r = spark.readStream.schema(schema).parquet(rdir + "/*")
    val q = Sessionize.intervalJoin(l, r, "user_id")
      .writeStream.outputMode("append").format("memory").queryName("join_out")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT r_value FROM join_out").collect().map(_.getDouble(0))
    assert(got.toSeq === Seq(1.0))
  }
}
