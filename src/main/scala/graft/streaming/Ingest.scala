package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous corpus ingestion — the streaming twin of
  * `Dedup.incrementalExact`. New documents arrive as a stream; each
  * micro-batch drops docs already in the standing corpus (stream-static
  * anti join against the content-hash index) and replays/dups within
  * the stream itself (watermarked stateful dedup, state bounded by the
  * watermark, not by stream length).
  *
  * Scale: the static index side is a parquet table bucketed by hash —
  * each micro-batch probes it with a hash-keyed join without rewriting
  * or re-scanning the corpus; dedup state shards across executors via
  * the state store. Downstream, the surviving docs append to the corpus
  * AND its hash index (e.g. via `foreachBatch`), so the next batch's
  * probe sees them.
  */
object Ingest {

  def dedupedStream(newDocs: DataFrame, corpusHashes: DataFrame,
      tsCol: String = "ingest_ts", watermark: String = "10 minutes"): DataFrame =
    newDocs.withColumn("text_hash", md5(col("text")))
      .withWatermark(tsCol, watermark)
      .join(corpusHashes, Seq("text_hash"), "left_anti")
      .dropDuplicatesWithinWatermark(Seq("text_hash"))
}
