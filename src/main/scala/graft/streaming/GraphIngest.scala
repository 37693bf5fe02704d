package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Triangles

/** Continuous triangle maintenance — the streaming face of
  * [[Triangles.newTrianglesPerNode]], in the standing-state ingest
  * mold (epoch-partitioned parquet, idempotent dynamic overwrite,
  * probe-excludes-own-partition): each micro-batch of undirected edges
  * lands in a standing edge store, and the per-node triangle ledger
  * gains one DELTA partition per epoch — counts never rewrite, they
  * accumulate, so the ledger read is a plain sum and a replayed epoch
  * overwrites its own delta instead of double-counting.
  *
  * Convergence contract (GraphIngestSpec): after any prefix of
  * batches, [[currentCounts]] == [[Triangles.perNodeCounts]] over
  * every stored edge. The rules that make it hold:
  *  - batch edges are normalized (a < b, self-loops dropped, distinct)
  *    and anti-joined against the standing store, so a re-sent edge
  *    contributes nothing (the replayed-edge rule as a filter);
  *  - each epoch's delta counts exactly the triangles that involve ≥ 1
  *    genuinely-new edge (the newTrianglesPerNode guarantee), and
  *    every triangle is new in exactly one epoch — the one where its
  *    LAST edge arrives;
  *  - both writes key on batch_id, so an at-least-once replay (even
  *    one that died between the two writes) recomputes the identical
  *    delta and overwrites its own partitions.
  */
object GraphIngest {

  /** One micro-batch of (id_a, id_b) edges. */
  def processEdgeBatch(batch: DataFrame, edgePath: String, countPath: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val raw = batch.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
    val standingEdges = standing(spark, edgePath)
      .map(_.filter(col("batch_id") =!= batchId).select(col("id_a"), col("id_b")))
    val fresh = (standingEdges match {
      case Some(se) => raw.join(se, Seq("id_a", "id_b"), "left_anti")
      case None => raw
    }).persist()
    try {
      if (fresh.isEmpty) return // replay-safe skip (zero-row write rule)
      val corpus = standingEdges.getOrElse(
        spark.emptyDataFrame.select(lit(0L).as("id_a"), lit(0L).as("id_b")).limit(0))
      val deltas = Triangles.newTrianglesPerNode(corpus, fresh)
        .select(col("node"), col("n_tri_new"))
      writePartition(fresh, edgePath, batchId)
      writePartition(deltas, countPath, batchId)
    } finally fresh.unpersist()
  }

  /** The ledger read: per-node triangle counts = sum of the epoch
    * deltas. Nodes in no triangle have no rows (the perNodeCounts
    * contract). */
  def currentCounts(spark: SparkSession, countPath: String): DataFrame =
    standing(spark, countPath) match {
      case Some(c) => c.groupBy(col("node"))
        .agg(sum(col("n_tri_new")).as("n_tri"))
      case None => spark.emptyDataFrame
        .select(lit(0L).as("node"), lit(0L).as("n_tri")).limit(0)
    }

  private def standing(spark: SparkSession, path: String): Option[DataFrame] =
    StandingStore.standing(spark, path)

  private def writePartition(df: DataFrame, target: String, batchId: Long): Unit =
    StandingStore.writePartition(df, target, batchId)
}
