package graft.pipelines

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Packing, Sampling, TextOps}
import graft.tables.Tables

/** End-to-end training-corpus preparation: the pipeline a user of the
  * engine actually runs over raw documents, composed from the operator
  * library —
  *
  *   0b. compress gate  — OPTIONAL DEFLATE-ratio junk floor
  *                        (TextOps.compressionRatio, map-side — the
  *                        cheapest discriminator runs first)
  *   1. quality gate    — drop each language's worst tail
  *                        (broadcast-cutoff twin: no per-language
  *                        serialization on a skewed corpus)
  *   1b. classifier gate — OPTIONAL learned margin threshold
  *                        (Classify.scoreLinear, projection-only)
  *   1c. decontamination — OPTIONAL benchmark shingle gate
  *                        (Decontaminate.benchGate bloom + exact)
  *   2. dedup           — keep one canonical doc per MinHash duplicate
  *                        cluster (connected components over bucket
  *                        stars)
  *   3. PII redaction   — mask emails / long digit runs map-side
  *   4. downsampling    — deterministic md5-bucket stratified rates
  *   5. shard write     — hash-bucketed parquet, parallel writers, no
  *                        tiny files, layout reusable for co-located
  *                        joins downstream
  *   6. sequence layout — concat-and-chunk pack of the final corpus
  *                        into fixed-length training sequences
  *                        (written beside the shards as `packing/`)
  *
  * Every stage is one of the library's tested operators; the composition
  * adds no new shuffle beyond what each stage documents. Returns a
  * per-stage row-count funnel (computed from one cached pass per stage
  * boundary, not a re-run of the whole upstream).
  */
object Prepare {

  def run(spark: SparkSession, dir: String, outDir: String,
      qualityFrac: Double = 0.25,
      rates: Map[String, Int] = Map("en" -> 205), defaultRate: Int = 256,
      nShards: Int = 16, seqLen: Long = 256L,
      classifier: Option[(Seq[(String, Long)], Long, Double)] = None,
      bench: Option[DataFrame] = None,
      minCompressRatio: Option[Double] = None): DataFrame = {
    import spark.implicits._

    val rawDocs = Tables.documents(spark, dir)
    val n0 = rawDocs.count()

    // 0b. compression-ratio junk gate (optional, FIRST: it is the
    // cheapest discriminator — one map-side deflate per doc, zero
    // shuffle — so boilerplate dies before any scoring/shingling
    // spends on it). Docs whose DEFLATE ratio falls below the floor
    // are template spam / pathological repetition (TextOps
    // .compressionRatio); empty docs carry a null ratio and are kept —
    // emptiness is the LENGTH gate's verdict to make, not this one's.
    val docs = minCompressRatio match {
      case Some(floor) => rawDocs.join(
        TextOps.compressionRatio(rawDocs)
          .filter(col("ratio") < floor).select("doc_id"),
        Seq("doc_id"), "left_anti")
      case None => rawDocs
    }
    val n0b = minCompressRatio.fold(n0)(_ => docs.count())

    // 1. quality gate (approximate per-language cutoff, broadcast back).
    // The gated corpus is STAGED to parquet rather than cached: dedup
    // makes several passes over it (signatures + the keep join), and a
    // durable staging table is the 100 TB answer — resumable, survives
    // executor loss, and each pass is a column-pruned scan of compact
    // parquet instead of a re-run of the gate.
    TextOps.qualityFilterByCutoff(docs, qualityFrac)
      .select("doc_id").join(docs, "doc_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/stage_gated")
    val gatedC = spark.read.parquet(s"$outDir/stage_gated")
    val n1 = gatedC.count()

    // 1b. learned quality gate (optional): fastText-style margin
    // threshold, projection-only. STAGED like every other gate result:
    // the count, the decontamination probe and dedup's several passes
    // would otherwise each re-run the scoring scan (the stage-1
    // rationale applies to every stage boundary).
    val classified = classifier match {
      case Some((w, bias, thr)) =>
        graft.ops.Classify.scoreLinear(gatedC, w, bias, thr)
          .filter(col("keep")).select("doc_id").join(gatedC, "doc_id")
          .write.mode(SaveMode.Overwrite).parquet(s"$outDir/stage_classified")
        spark.read.parquet(s"$outDir/stage_classified")
      case None => gatedC
    }
    val n1b = classifier.fold(n1)(_ => classified.count())

    // 1c. benchmark decontamination (optional): drop docs sharing
    // enough shingles with the eval set — the bloom-pruned exact gate;
    // staged so dedup's multiple passes read compact parquet, not the
    // gate chain
    val curated = bench match {
      case Some(b) =>
        val gate = graft.ops.Decontaminate.benchGate(b)
        try {
          classified.join(graft.ops.Decontaminate.contaminatedIds(classified, gate),
              Seq("doc_id"), "left_anti")
            .write.mode(SaveMode.Overwrite).parquet(s"$outDir/stage_curated")
        } finally gate.release()
        spark.read.parquet(s"$outDir/stage_curated")
      case None => classified
    }
    val n1c = bench.fold(n1b)(_ => curated.count())

    // 2. one doc per duplicate cluster. The keep set (a doc_id list) is
    // staged too, so the CC computation runs exactly once — the join
    // below and the funnel count both read the staged result.
    Dedup.clusters(curated).filter(col("keep") === 1L).select("doc_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/stage_keep")
    val keep = spark.read.parquet(s"$outDir/stage_keep")
    val n2 = keep.count() // keep join is 1:1 -> this IS the deduped count
    val deduped = curated.join(keep, "doc_id")

    // 3. PII redaction (map-side; masked text replaces the original)
    val masked = TextOps.piiMask(deduped, col("text"))
      .drop("text").withColumnRenamed("masked", "text")

    // 4. deterministic stratified downsample
    val sampled = Sampling.stratified(masked, col("doc_id"), col("lang"),
      rates, defaultRate)

    // 5. deterministic shuffle-shard write: shard AND within-shard
    // position are pure functions of (doc_id, salt) — the trainer reads
    // physically pos-ordered shard files, so the training data ORDER is
    // reproducible across re-runs (and re-dealable per epoch by salt)
    // without any global sort. Retry/backfill stable for the same
    // reason. The pos ordering in the files comes from shuffleShards'
    // own window sort (shard, salted-md5, key): the dynamic-partition
    // writer requires a sort on the partition column, and the window's
    // existing (shard, ...) sort already satisfies it, so the plan adds
    // no exchange or sort here — verified in the executed plan.
    Sampling.shuffleShards(sampled, col("doc_id"), nShards)
      .write.mode(SaveMode.Overwrite).partitionBy("shard")
      .parquet(s"$outDir/corpus")
    val n3 = spark.read.parquet(s"$outDir/corpus").count()

    // 6. training-sequence layout over the WRITTEN corpus (so the pack
    // reads compact staged parquet, not the transform chain), written
    // beside the shards — the trainer-facing index (doc chunk ->
    // sequence + offset), recomputable from the corpus alone. The pack
    // streams each shard in the SAME pos order as the shard files
    // (packWithOrder), so the index and the physical layout describe
    // one token stream — two contradictory orders here would hand the
    // trainer wrong offsets.
    Packing.packWithOrder(spark.read.parquet(s"$outDir/corpus"), seqLen,
        Seq(col("pos"), col("chunk_idx")))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/packing")
    val n4 = spark.read.parquet(s"$outDir/packing").count()

    Seq(
      ("input", n0),
      ("compress_gated", n0b),
      ("quality_gated", n1),
      ("classifier_gated", n1b),
      ("decontaminated", n1c),
      ("deduped", n2),
      ("sampled_written", n3),
      ("packed_chunks", n4)
    ).toDF("stage", "rows")
  }
}
