package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Lpa

/** Continuous community maintenance — the streaming face of
  * [[Lpa.warmStart]], completing the ledger family ([[RankIngest]] for
  * ranks, [[ReachIngest]] for hop labels): each micro-batch of directed
  * edges lands in a standing edge store, and the community table gains
  * one SNAPSHOT partition per epoch, warm-started from the previous
  * epoch's labels and run for `rounds` synchronous LPA rounds over the
  * merged graph. Like ranks (and unlike hop labels), communities are
  * not additive — the ledger read is "latest snapshot".
  *
  * Contract (CommunityIngestSpec): after any prefix of batches,
  * [[currentCommunities]] equals the deterministic warm-start fold of
  * the same batch sequence through [[Lpa.warmStart]] — LPA offers no
  * contraction theorem (contrast PageRank), so the ledger's claim is
  * exactly that fold: deterministic, batch-absorbing, replay-stable.
  * The replay rules are [[RankIngest]]'s verbatim: normalized +
  * anti-joined batch edges (re-sent edges contribute nothing, an
  * all-replayed batch writes nothing); every standing read bounded
  * STRICTLY BELOW the epoch's own batch_id (edges and the label seed),
  * so a replay — even out of order, after later epochs committed —
  * recomputes the identical snapshot; dynamic partition overwrite
  * keyed on batch_id ([[StandingStore]]).
  */
object CommunityIngest {

  /** One micro-batch of directed (src, dst) edges. Writes a fresh-edge
    * partition and a label-snapshot partition keyed on `batchId`; a
    * batch with no genuinely-new edges writes neither. */
  def processEdgeBatch(batch: DataFrame, edgePath: String, labelPath: String,
      batchId: Long, rounds: Int = 2): Unit = {
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
      val seed = latestSnapshot(spark, labelPath, beforeBatch = batchId)
        .getOrElse(emptyLabels(spark))
      val labels = Lpa.warmStart(seed, merged, rounds)
      writePartition(fresh, edgePath, batchId)
      writePartition(labels, labelPath, batchId)
    } finally fresh.unpersist()
  }

  /** The ledger read: the newest epoch's (node, lbl) snapshot. */
  def currentCommunities(spark: SparkSession, labelPath: String): DataFrame =
    latestSnapshot(spark, labelPath, beforeBatch = Long.MaxValue)
      .getOrElse(emptyLabels(spark))

  private def emptyLabels(spark: SparkSession): DataFrame =
    spark.emptyDataFrame.select(lit(0L).as("node"), lit(0L).as("lbl")).limit(0)

  private def latestSnapshot(spark: SparkSession, labelPath: String,
      beforeBatch: Long): Option[DataFrame] =
    StandingStore.latestSnapshot(spark, labelPath, beforeBatch, Seq("node", "lbl"))

  private def standing(spark: SparkSession, path: String): Option[DataFrame] =
    StandingStore.standing(spark, path)

  private def writePartition(df: DataFrame, target: String, batchId: Long): Unit =
    StandingStore.writePartition(df, target, batchId)
}
