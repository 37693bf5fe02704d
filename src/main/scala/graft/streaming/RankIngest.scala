package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.PageRank

/** Continuous PageRank maintenance — the streaming face of
  * [[PageRank.warmStart]], in the standing-state ingest mold of
  * [[GraphIngest]] (epoch-partitioned parquet, idempotent dynamic
  * overwrite, probe-excludes-own-partition): each micro-batch of
  * directed edges lands in a standing edge store, and the rank table
  * gains one SNAPSHOT partition per epoch, warm-started from the
  * previous epoch's snapshot and refined for `rounds` iterations over
  * the merged graph. Ranks are not additive (unlike the triangle
  * ledger's deltas), so the ledger read is "latest snapshot", not a
  * sum — and the warm start is exactly why per-epoch work stays small:
  * the previous fixpoint is already near the new one, so a few
  * contraction rounds absorb the batch instead of re-running the full
  * cold chain per epoch.
  *
  * Convergence contract (RankIngestSpec): after any prefix of batches,
  * [[currentRanks]] equals the deterministic warm-start fold of the
  * same batch sequence through [[PageRank.warmStart]] — and once
  * ingest goes quiescent, [[refine]] epochs drive the snapshot into
  * the same narrow truncation band a cold start on the final graph
  * settles into (the power iteration contracts to one fixpoint from
  * any seed in real arithmetic; the integer floor can leave a limit
  * cycle a few units wide — PageRankSpec pins the band exactly on its
  * fixture). The rules that make it hold:
  *  - batch edges are normalized (self-loops dropped, distinct) and
  *    anti-joined against the standing store, so a re-sent edge
  *    contributes nothing and an all-replayed batch writes nothing;
  *  - every standing read an epoch makes is bounded STRICTLY BELOW its
  *    own batch_id — the edge probe/merge reads batch_id < e and the
  *    warm seed is the newest snapshot with batch_id < e — so a replay
  *    of epoch e recomputes the identical snapshot (integer arithmetic,
  *    no accumulation drift) even OUT OF ORDER, after later epochs
  *    committed: later partitions are invisible to e by construction,
  *    not merely absent at first write;
  *  - both writes key on batch_id with dynamic partition overwrite,
  *    the GraphIngest idempotence discipline.
  */
object RankIngest {

  /** One micro-batch of directed (src, dst) edges. Writes a fresh-edge
    * partition and a rank-snapshot partition keyed on `batchId`; a
    * batch with no genuinely-new edges writes neither (ranks only
    * advance when the graph changes — call [[refine]] to iterate in
    * place). */
  def processEdgeBatch(batch: DataFrame, edgePath: String, rankPath: String,
      batchId: Long, rounds: Int = 3): Unit = {
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
      val merged = standingEdges.fold(fresh)(_.unionByName(fresh))
      val seed = latestSnapshot(spark, rankPath, beforeBatch = batchId)
        .getOrElse(emptyRanks(spark))
      val ranks = PageRank.warmStart(seed, merged, rounds)
      writePartition(fresh, edgePath, batchId)
      writePartition(ranks, rankPath, batchId)
    } finally fresh.unpersist()
  }

  /** A quiescent epoch: no new edges, `rounds` more warm iterations
    * over the standing graph (drives the snapshot toward the
    * fixpoint). Requires a non-empty edge store. */
  def refine(spark: SparkSession, edgePath: String, rankPath: String,
      batchId: Long, rounds: Int = 3): Unit = {
    val edges = standing(spark, edgePath)
      .map(_.select(col("src"), col("dst")))
      .getOrElse(throw new IllegalStateException("rank_ingest: no standing edges to refine"))
    val seed = latestSnapshot(spark, rankPath, beforeBatch = batchId)
      .getOrElse(emptyRanks(spark))
    writePartition(PageRank.warmStart(seed, edges, rounds), rankPath, batchId)
  }

  /** The ledger read: the newest epoch's rank snapshot as (id, pr). */
  def currentRanks(spark: SparkSession, rankPath: String): DataFrame =
    latestSnapshot(spark, rankPath, beforeBatch = Long.MaxValue)
      .getOrElse(emptyRanks(spark))

  private def emptyRanks(spark: SparkSession): DataFrame =
    spark.emptyDataFrame.select(lit(0L).as("id"), lit(0L).as("pr")).limit(0)

  /** Newest snapshot with batch_id < `beforeBatch` — the replay rule:
    * an epoch's seed is always the snapshot written BEFORE it
    * ([[StandingStore.latestSnapshot]]). */
  private def latestSnapshot(spark: SparkSession, rankPath: String,
      beforeBatch: Long): Option[DataFrame] =
    StandingStore.latestSnapshot(spark, rankPath, beforeBatch, Seq("id", "pr"))

  private def standing(spark: SparkSession, path: String): Option[DataFrame] =
    StandingStore.standing(spark, path)

  private def writePartition(df: DataFrame, target: String, batchId: Long): Unit =
    StandingStore.writePartition(df, target, batchId)
}
