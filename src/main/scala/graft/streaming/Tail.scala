package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Lww

/** The reference's `tail` loop (`nft/bin/tail.py:90-204`) as Structured
  * Streaming: each poll cycle = one micro-batch (the `async with
  * data_bus` chunk barrier IS the micro-batch epoch, `core/bus.py:127-144`);
  * `--trail-blocks` reorg lag = the watermark (T2); `last_block_id`
  * checkpoint = the streaming commit log (K11/T5).
  *
  * At scale this runs against a custom MicroBatchStream whose
  * `latestOffset` = chain height − trail; here the transforms are
  * source-agnostic so tests drive them with a MemoryStream and prod
  * wires a file/rate source.
  */
object Tail {

  /** Windowed per-type aggregation with event-time watermark: late rows
    * beyond `trailLag` are dropped exactly like blocks above
    * height − trail_blocks are not processed (`tail.py:163-164`). */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     trailLag: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", trailLag)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** foreachBatch LWW sink: each micro-batch upserts into `target`
    * parquet with the A4 argmax semantics — replay-idempotent, so task
    * retries / batch replays converge (the reference's idempotence
    * invariant). */
  def lwwSink(target: String, keys: Seq[String], versionCols: Seq[String])
             (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val merged =
      try Lww.upsert(spark.read.parquet(target), batch, keys, versionCols)
      catch { case _: org.apache.spark.sql.AnalysisException => batch } // first batch
    val tmp = target + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(target)
  }

  /** File-source tail: treats new parquet files in `dir` as arriving
    * micro-batches (one file per trigger = one poll cycle). */
  def fileTail(spark: SparkSession, dir: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
}
