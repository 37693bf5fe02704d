package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Reachability

/** Continuous k-hop reachability maintenance — the streaming face of
  * [[Reachability.refreshHops]], in the standing-state ingest mold of
  * [[RankIngest]] (epoch-partitioned parquet, idempotent dynamic
  * overwrite, probe-excludes-own-partition): each micro-batch of
  * directed edges lands in a standing edge store, and the label table
  * gains one SNAPSHOT partition per epoch, refreshed incrementally
  * from the previous epoch's labels — the standing BFS never re-runs,
  * each epoch pays only the batch's affected neighborhood.
  *
  * Convergence contract (ReachIngestSpec) — EXACT, not a band:
  * reachability is monotone under insert-only arrival, so after any
  * prefix of batches [[currentHops]] equals a cold
  * [[Reachability.hops]] run over every stored edge, label for label.
  * (Contrast [[RankIngest]], whose integer fixpoint is only unique up
  * to the floor-truncation band.) The replay rules are RankIngest's:
  * normalized + anti-joined batch edges (re-sent edges contribute
  * nothing), every standing read bounded strictly below the epoch's
  * own batch_id (edges AND the label seed), so a replay recomputes the
  * identical snapshot even out of order — later epochs' partitions are
  * invisible to it by construction — and dynamic partition overwrite
  * keyed on batch_id. */
object ReachIngest {

  /** One micro-batch of directed (src, dst) edges against the seed set
    * `seeds` (id column; must be the same every epoch — it defines the
    * query). */
  def processEdgeBatch(batch: DataFrame, seeds: DataFrame, edgePath: String,
      hopPath: String, batchId: Long, maxHop: Int): Unit = {
    val spark = batch.sparkSession
    val raw = batch.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val standingEdges = standing(spark, edgePath)
      .map(_.filter(col("batch_id").cast("long") < batchId)
        .select(col("src"), col("dst")))
    val fresh = (standingEdges match {
      case Some(se) => raw.join(se, Seq("src", "dst"), "left_anti")
      case None => raw
    }).persist()
    try {
      if (fresh.isEmpty) return // replay-safe skip (zero-row write rule)
      val merged = standingEdges.fold(fresh)(_.unionByName(fresh)).localCheckpoint(true)
      val prior = latestSnapshot(spark, hopPath, beforeBatch = batchId)
        .getOrElse(Reachability.hops(
          spark.emptyDataFrame.select(lit(0L).as("src"), lit(0L).as("dst")).limit(0),
          seeds, maxHop))
      val hops = Reachability.refreshHops(prior, merged, fresh, maxHop)
        .select(col("id"), col("hop"))
      writePartition(fresh, edgePath, batchId)
      writePartition(hops, hopPath, batchId)
    } finally fresh.unpersist()
  }

  /** The ledger read: the newest epoch's (id, hop) snapshot. */
  def currentHops(spark: SparkSession, hopPath: String): DataFrame =
    latestSnapshot(spark, hopPath, beforeBatch = Long.MaxValue)
      .getOrElse(spark.emptyDataFrame
        .select(lit(0L).as("id"), lit(0L).as("hop")).limit(0))

  private def latestSnapshot(spark: SparkSession, hopPath: String,
      beforeBatch: Long): Option[DataFrame] =
    StandingStore.latestSnapshot(spark, hopPath, beforeBatch, Seq("id", "hop"))

  private def standing(spark: SparkSession, path: String): Option[DataFrame] =
    StandingStore.standing(spark, path)

  private def writePartition(df: DataFrame, target: String, batchId: Long): Unit =
    StandingStore.writePartition(df, target, batchId)
}
