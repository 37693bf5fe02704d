package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.KCore

/** Continuous k-core maintenance — the streaming face of
  * [[KCore.refreshCore]], completing the standing-state ledger family
  * (ranks, hop labels, community labels, triangle deltas, now cores):
  * each micro-batch of undirected (id_a, id_b) edges lands in a
  * standing edge store, and the core table gains one SNAPSHOT
  * partition per epoch, refreshed from the previous epoch's core with
  * work proportional to the ACTIVE region (the standing core is
  * protected — insert-only arrival means it can only grow).
  *
  * Contract (CoreIngestSpec) — EXACT, like [[ReachIngest]] and unlike
  * the rank band: the k-core is unique and the protected refresh
  * provably reaches it, so after any prefix of batches
  * [[currentCore]] equals a cold [[KCore.core]] run over every stored
  * edge, degree for degree. Replay rules are [[RankIngest]]'s
  * verbatim: normalized + anti-joined batch edges, every standing
  * read bounded STRICTLY BELOW the epoch's own batch_id (edges and
  * the core seed — out-of-order replays rewrite historical snapshots
  * identically), dynamic partition overwrite keyed on batch_id
  * ([[StandingStore]]). */
object CoreIngest {

  /** One micro-batch of undirected (id_a, id_b) edge pairs. Writes a
    * fresh-edge partition and a core-snapshot partition keyed on
    * `batchId`; a batch with no genuinely-new edges writes neither.
    * Pairs are canonicalized (a < b) so the two orientations of one
    * undirected edge cannot double-count a degree. */
  def processEdgeBatch(batch: DataFrame, edgePath: String, corePath: String,
      batchId: Long, k: Int): Unit = {
    val spark = batch.sparkSession
    val raw = batch
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .distinct()
    val standingEdges = standing(spark, edgePath)
      .map(_.filter(col("batch_id").cast("long") < batchId)
        .select(col("id_a"), col("id_b")))
    val fresh = (standingEdges match {
      case Some(se) => raw.join(se, Seq("id_a", "id_b"), "left_anti")
      case None => raw
    }).persist()
    try {
      if (fresh.isEmpty) return // replay-safe skip (zero-row write rule)
      val merged = standingEdges.fold(fresh)(_.unionByName(fresh))
      val seed = latestSnapshot(spark, corePath, beforeBatch = batchId)
        .getOrElse(emptyCore(spark))
      val core = KCore.refreshCore(seed, merged, k)
        .select(col("node_id"), col("core_deg"))
      writePartition(fresh, edgePath, batchId)
      writePartition(core, corePath, batchId)
    } finally fresh.unpersist()
  }

  /** The ledger read: the newest epoch's (node_id, core_deg) snapshot. */
  def currentCore(spark: SparkSession, corePath: String): DataFrame =
    latestSnapshot(spark, corePath, beforeBatch = Long.MaxValue)
      .getOrElse(emptyCore(spark))

  private def emptyCore(spark: SparkSession): DataFrame =
    spark.emptyDataFrame
      .select(lit(0L).as("node_id"), lit(0L).as("core_deg")).limit(0)

  private def latestSnapshot(spark: SparkSession, corePath: String,
      beforeBatch: Long): Option[DataFrame] =
    StandingStore.latestSnapshot(spark, corePath, beforeBatch,
      Seq("node_id", "core_deg"))

  private def standing(spark: SparkSession, path: String): Option[DataFrame] =
    StandingStore.standing(spark, path)

  private def writePartition(df: DataFrame, target: String, batchId: Long): Unit =
    StandingStore.writePartition(df, target, batchId)
}
