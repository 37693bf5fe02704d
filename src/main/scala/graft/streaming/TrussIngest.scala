package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.KTruss

/** Continuous k-truss maintenance — the streaming face of
  * [[KTruss.refreshTruss]], the edge-cohesion member of the
  * standing-state ledger family (ranks, hop labels, community labels,
  * triangle deltas, cores, now trusses): each micro-batch of
  * undirected (id_a, id_b) edges lands in a standing edge store, and
  * the truss table gains one SNAPSHOT partition per epoch, refreshed
  * from the previous epoch's truss with triangle work anchored on the
  * ACTIVE region (the standing truss is protected — insert-only
  * arrival means triangles only form and the truss only grows).
  *
  * Contract (TrussIngestSpec) — EXACT, the [[CoreIngest]] contract
  * one notch up: the k-truss is unique and the protected refresh
  * provably reaches it, so after any prefix of batches
  * [[currentTruss]] equals a cold [[KTruss.truss]] run over every
  * stored edge, support for support. Replay rules are [[RankIngest]]'s
  * verbatim: canonicalized + anti-joined batch edges, every standing
  * read bounded STRICTLY BELOW the epoch's own batch_id, dynamic
  * partition overwrite keyed on batch_id ([[StandingStore]]). */
object TrussIngest {

  /** One micro-batch of undirected (id_a, id_b) edge pairs. Writes a
    * fresh-edge partition and a truss-snapshot partition keyed on
    * `batchId`; a batch with no genuinely-new edges writes neither.
    * Pairs are canonicalized (a < b) so the two orientations of one
    * undirected edge cannot double-count a triangle. */
  def processEdgeBatch(batch: DataFrame, edgePath: String, trussPath: String,
      batchId: Long, k: Int): Unit = {
    val spark = batch.sparkSession
    val raw = batch
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .distinct()
    val standingEdges = StandingStore.standing(spark, edgePath)
      .map(_.filter(col("batch_id").cast("long") < batchId)
        .select(col("id_a"), col("id_b")))
    val fresh = (standingEdges match {
      case Some(se) => raw.join(se, Seq("id_a", "id_b"), "left_anti")
      case None => raw
    }).persist()
    try {
      if (fresh.isEmpty) return // replay-safe skip (zero-row write rule)
      val merged = standingEdges.fold(fresh)(_.unionByName(fresh))
      val seed = latestSnapshot(spark, trussPath, beforeBatch = batchId)
        .getOrElse(emptyTruss(spark))
      val truss = KTruss.refreshTruss(seed, merged, k)
        .select(col("id_a"), col("id_b"), col("support"))
      StandingStore.writePartition(fresh, edgePath, batchId)
      StandingStore.writePartition(truss, trussPath, batchId)
    } finally fresh.unpersist()
  }

  /** The ledger read: the newest epoch's (id_a, id_b, support)
    * snapshot. */
  def currentTruss(spark: SparkSession, trussPath: String): DataFrame =
    latestSnapshot(spark, trussPath, beforeBatch = Long.MaxValue)
      .getOrElse(emptyTruss(spark))

  private def emptyTruss(spark: SparkSession): DataFrame =
    spark.emptyDataFrame
      .select(lit(0L).as("id_a"), lit(0L).as("id_b"), lit(0L).as("support"))
      .limit(0)

  private def latestSnapshot(spark: SparkSession, trussPath: String,
      beforeBatch: Long): Option[DataFrame] =
    StandingStore.latestSnapshot(spark, trussPath, beforeBatch,
      Seq("id_a", "id_b", "support"))
}
