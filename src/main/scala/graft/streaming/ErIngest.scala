package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, EntityResolution, FuzzyJoin}

/** Continuous entity resolution — the streaming twin of
  * [[EntityResolution.assignBatch]], wired the way the near-dup ingest
  * gates are (epoch-partitioned standing state, idempotent dynamic
  * overwrite, probe-excludes-own-partition): each micro-batch of
  * (record_id, name) rows is placed against the standing corpus with
  * O(batch) pairing work, and the state it appends is exactly what the
  * next epoch probes.
  *
  * Standing state, two tables:
  *  - `indexPath`: the FastSS deletion-variant rows (v, r_id, r_str)
  *    of every ingested record — the fuzzy probe target, bucketed by
  *    variant at rest (the [[FuzzyJoin.deleteVariantIndex]] layout);
  *  - `assignPath`: an EDGE list. One row per ingested record
  *    (record_id → its component-min label at write time, name
  *    riding along) plus one MERGE row (old_label → new_label, null
  *    name) whenever a batch record bridges standing entities. Storing
  *    edges rather than final labels is the trick that makes merges
  *    durable without rewriting history: connectivity is append-only,
  *    so every later epoch's connected-components pass sees the bridge
  *    transitively, stale stored labels notwithstanding. The
  *    compaction ([[compactAssignments]]) folds the edge log back to
  *    canonical labels.
  *
  * Convergence contract (proven in ErIngestSpec): after any prefix of
  * batches, [[currentAssignments]] equals
  * [[EntityResolution.resolve]] over all records ingested so far —
  * including bridges across batch boundaries — and a replayed epoch
  * (at-least-once delivery) rewrites its own partitions to the
  * identical state instead of duplicating.
  */
object ErIngest {

  /** One micro-batch. `batch` must carry (record_id: long, name:
    * string) with globally unique record ids (the doc_id contract). */
  def processErBatch(batch: DataFrame, indexPath: String, assignPath: String,
      batchId: Long, k: Int = 1, tau: Double = 0.9): Unit = {
    val spark = batch.sparkSession
    val b = batch.select(col("record_id").cast("long").as("id"), col("name"))
      .persist()
    try {
      if (b.isEmpty) return // replay-safe skip (writeBatchPartition doc)
      // batch-internal verified pairs (the resolve() match stage)
      val bb = EntityResolution.matchPairs(b, k, tau)
      // batch -> standing-corpus pairs: probe the stored variant index,
      // excluding this epoch's own partition (replay correctness), then
      // verify the trigram conjunct inline — r_str rides in the index
      // rows, so no second corpus fetch
      val bc = standing(spark, indexPath) match {
        case Some(idx) =>
          FuzzyJoin.probeDeletes(b, col("id"), col("name"),
              idx.filter(col("batch_id") =!= batchId), k)
            .select(col("probe_id").as("id_a"), col("match_id").as("id_b"))
            .join(b.select(col("id").as("id_a"),
              EntityResolution.charTrigrams(col("name")).as("ts_a")), "id_a")
            .join(idx.select(col("r_id").as("id_b"),
                EntityResolution.charTrigrams(col("r_str")).as("ts_b")).distinct(),
              "id_b")
            .filter(size(col("ts_a")) > 0 && size(col("ts_b")) > 0)
            .withColumn("inter", size(array_intersect(col("ts_a"), col("ts_b"))))
            .filter(col("inter").cast("double") /
              (size(col("ts_a")) + size(col("ts_b")) - col("inter")).cast("double") >= tau)
            .select(col("id_a"), col("id_b"))
        case None => emptyPairs(spark)
      }
      // standing connectivity: every stored edge (record->label and
      // old->new merge rows), pre-coarsened — same components as a
      // full re-resolve (the assignBatch argument)
      val corpusEdges = standing(spark, assignPath) match {
        case Some(a) => a.filter(col("batch_id") =!= batchId)
          .filter(col("record_id") =!= col("entity_id"))
          .select(col("record_id").as("id_a"), col("entity_id").as("id_b"))
        case None => emptyPairs(spark)
      }
      val labels = Dedup.connectedComponents(bc.union(bb).union(corpusEdges))
        .select(col("node").as("id"), col("label")).persist()
      try {
        val batchRows = b.join(labels, Seq("id"), "left")
          .select(col("id").as("record_id"),
            coalesce(col("label"), col("id")).as("entity_id"), col("name"))
        // merge rows: a standing record whose stored label differs from
        // its fresh component label bridges old -> new. One row per
        // (old, new) pair, not per member — the edge log stays skinny.
        val merges = standing(spark, assignPath) match {
          case Some(a) => a.filter(col("batch_id") =!= batchId)
            .filter(col("name").isNotNull)
            .select(col("record_id").as("id"), col("entity_id").as("old_label"))
            .join(labels, Seq("id"))
            .filter(col("label") =!= col("old_label"))
            .select(col("old_label").as("record_id"), col("label").as("entity_id"))
            .distinct()
            .withColumn("name", lit(null).cast("string"))
          case None => spark.emptyDataFrame
            .select(lit(0L).as("record_id"), lit(0L).as("entity_id"),
              lit(null).cast("string").as("name")).limit(0)
        }
        writePartition(batchRows.unionByName(merges), assignPath, batchId)
        writePartition(
          FuzzyJoin.deleteVariantIndex(b, col("id"), col("name"), k),
          indexPath, batchId)
      } finally labels.unpersist()
    } finally b.unpersist()
  }

  /** Canonical (record_id, entity_id, name) view of the edge log:
    * connected components over every stored edge, record rows only.
    * This is what "the standing entity table" means at read time;
    * after [[compactAssignments]] the stored labels equal it directly. */
  def currentAssignments(spark: SparkSession, assignPath: String): DataFrame =
    standing(spark, assignPath) match {
      case Some(a) =>
        // distinct: a crash between a compaction's base write and its
        // partition deletes leaves record rows duplicated until the
        // next fold (the compactIndex recovery argument)
        val recs = a.filter(col("name").isNotNull)
          .select(col("record_id"), col("name")).distinct()
        val edges = a.filter(col("record_id") =!= col("entity_id"))
          .select(col("record_id").as("id_a"), col("entity_id").as("id_b"))
        val labels = Dedup.connectedComponents(edges)
          .select(col("node").as("record_id"), col("label"))
        recs.join(labels, Seq("record_id"), "left")
          .select(col("record_id"),
            coalesce(col("label"), col("record_id")).as("entity_id"), col("name"))
      case None => spark.emptyDataFrame
        .select(lit(0L).as("record_id"), lit(0L).as("entity_id"),
          lit(null).cast("string").as("name")).limit(0)
    }

  /** Fold the edge log to canonical labels (one row per record, labels
    * = component min, merge rows retired) — the compactIndex shape:
    * sibling-dir write, rename into a negative base partition, delete
    * folded partitions; a replayed compaction is a no-op. */
  def compactAssignments(spark: SparkSession, assignPath: String, batchId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(assignPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val baseId = -(batchId + 1)
    if (!fs.exists(p)) return
    if (fs.exists(new org.apache.hadoop.fs.Path(p, s"batch_id=$baseId"))) return // replay
    val parts = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
    if (parts.length <= 1) return
    val folded = currentAssignments(spark, assignPath)
    if (folded.isEmpty) return
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, p.getName + s".compact$baseId")
    folded.write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(p, s"batch_id=$baseId")))
      throw new java.io.IOException(
        s"compactAssignments: rename $tmp -> $assignPath/batch_id=$baseId failed")
    parts.foreach(id =>
      fs.delete(new org.apache.hadoop.fs.Path(p, s"batch_id=$id"), true))
  }

  private def emptyPairs(spark: SparkSession): DataFrame =
    spark.emptyDataFrame.select(lit(0L).as("id_a"), lit(0L).as("id_b")).limit(0)

  /** Missing/data-less path = empty state ([[StandingStore.standing]]
    * semantics — real read errors propagate loudly). */
  private def standing(spark: SparkSession, path: String): Option[DataFrame] =
    StandingStore.standing(spark, path)

  private def writePartition(df: DataFrame, target: String, batchId: Long): Unit =
    StandingStore.writePartition(df, target, batchId)
}
