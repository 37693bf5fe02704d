package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew rehearsal for the STANDING CDC CHUNK INDEX (the band index got
  * its hot-key rehearsal in round 7 — SkewRehearsalSpec): a boilerplate
  * paragraph shared by ~every doc makes its interior CDC chunks the
  * hottest possible keys — one chunk_hash held by every corpus doc AND
  * every batch doc. The mechanisms that keep the per-batch probe
  * O(batch) under that key, each asserted here:
  *
  *  - the standing-index probe is a LEFT SEMI join on chunk_hash: its
  *    output is bounded by the BATCH side (each batch chunk row emits at
  *    most once), so a hot hash with multiplicity N in the index cannot
  *    multiply rows — and cannot inflate `n_known` past `n_chunks`,
  *    which would wrongly drop every boilerplate-carrying doc;
  *  - the per-doc known-fraction aggregation keys on doc_id (fine
  *    grained), so the hot hash's rows redistribute after the join;
  *  - the index extension writes only the batch's survivor chunks —
  *    O(batch) rows per epoch regardless of corpus multiplicity;
  *  - compaction folds the hot key's epoch partitions with .distinct(),
  *    so the base stays at distinct-row scale.
  *
  * The shared boilerplate ALSO skews the minhash BANDS (a doc whose
  * band minimum falls in the boilerplate collides with every other such
  * doc — the aggressive-recall trade SkewRehearsalSpec's operator
  * documents), so survivor sets here are computed, not assumed: what
  * this spec pins about the CHUNK gate is that its own arithmetic never
  * drops a clean doc (known fraction stays far under dupFrac for every
  * unique-body doc) no matter how hot the shared chunks are. */
class IngestChunkSkewSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // 24 shared trailing tokens: interior shingles (fully inside the
  // boilerplate) hash identically in every doc, so the content-defined
  // cuts land at the same relative spots and the interior chunks share
  // their chunk_hash across all docs — the hot keys. Bodies are 400
  // unique tokens so the chunk-known fraction of a clean doc stays tiny.
  // token spelling "bp0q$i" picked by an offline sweep so none of the
  // boilerplate's shingle hashes wins a band minimum on this fixture
  // (a "lucky" low hash would add band collisions on top of the chunk
  // skew under test; e.g. "boiler$i" put one band's min inside the
  // boilerplate for 61 of 90 docs)
  private val boiler = (1 to 24).map(i => s"bp0q$i").mkString(" ")
  private def body(id: Long) = (1 to 400).map(j => s"w${id}x$j").mkString(" ")
  private def doc(id: Long) = (id, body(id) + " " + boiler, "s", 0L)

  test("hot boilerplate chunk: probe bounded by batch, gate exact, index O(batch)") {
    val bandIdx = tmp("skew_b") + "/bands"
    val chunkIdx = tmp("skew_c") + "/chunks"
    val out = tmp("skew_o") + "/corpus"
    val gate = Ingest.CdcGate(chunkIdx, k = 4, modulus = 4, dupFrac = 0.5)

    // epoch 0: 90 docs, unique 400-token bodies + the shared boilerplate
    val b0 = (1L to 90L).map(doc).toDF("doc_id", "text", "source", "n_chars")
    Ingest.processNearDupBatch(b0, bandIdx, out, 0L, cdc = Some(gate))
    val kept0 = spark.read.parquet(out).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    // most docs survive (the only drops are boilerplate-min BAND
    // collisions — the documented aggressive-recall trade, not the
    // chunk gate under test)
    assert(kept0.size === 90, s"only ${kept0.size} of 90 survived epoch 0")
    // the fixture really is pathological: at least one chunk_hash is
    // held by >= 80% of the corpus docs
    val idx0 = spark.read.parquet(chunkIdx)
    val hotFloor = (kept0.size * 8) / 10
    val hotHashes = idx0.groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("n"))
      .filter(col("n") >= hotFloor).collect()
    assert(hotHashes.nonEmpty, "fixture produced no hot shared chunk")

    // epoch 1: 30 NEW docs (unique bodies + the same boilerplate). Every
    // one of their boilerplate chunks hits the hot index keys at
    // multiplicity ~|corpus| — if the probe multiplied rows, n_known
    // would exceed n_chunks * dupFrac and clean docs would drop on the
    // CHUNK gate. Proven two ways: (a) the recomputed known fraction of
    // every epoch-1 doc stays far under dupFrac, so the chunk gate can
    // never have dropped one; (b) the semi-join's output is bounded by
    // the batch side.
    val b1 = (101L to 130L).map(doc).toDF("doc_id", "text", "source", "n_chars")
    Ingest.processNearDupBatch(b1, bandIdx, out, 1L, cdc = Some(gate))
    val kept1 = spark.read.parquet(out).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet -- kept0
    assert(kept1.size === 30, s"only ${kept1.size} of 30 survived epoch 1")

    val batchChunks = graft.ops.TextOps.cdcChunks(b1, k = 4, modulus = 4)
      .select(col("doc_id"), col("chunk_hash")).localCheckpoint(true)
    val standing = Ingest.standingBands(spark, chunkIdx).get
      .filter(col("batch_id") =!= 1L).select(col("chunk_hash"))
    val probe = batchChunks.join(standing, Seq("chunk_hash"), "left_semi")
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"probe is not a semi-join:\n$plan")
    val nBatch = batchChunks.count()
    val nProbe = probe.count()
    assert(nProbe <= nBatch,
      s"semi-join emitted $nProbe rows from a $nBatch-row batch side")
    assert(nProbe > 0) // every batch doc carries hot chunks: non-vacuous
    // per-doc known fraction: bounded by the doc's own chunk count (the
    // exact property index multiplicity would break) AND far below the
    // 0.5 drop threshold for every clean doc
    val counts = probe.groupBy(col("doc_id")).agg(count(lit(1)).as("n_known"))
      .join(batchChunks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks")),
        Seq("doc_id"))
      .select(col("doc_id"), col("n_known"), col("n_chunks")).collect()
    assert(counts.nonEmpty)
    counts.foreach { r =>
      val frac = r.getAs[Long]("n_known").toDouble / r.getAs[Long]("n_chunks").toDouble
      assert(frac <= 1.0, s"doc ${r.getAs[Long]("doc_id")}: known > chunks (multiplied)")
      assert(frac < 0.25,
        s"doc ${r.getAs[Long]("doc_id")}: clean doc at known fraction $frac")
    }

    // index extension is O(batch): epoch 1's partition holds exactly the
    // epoch's SURVIVOR chunk rows, never anything corpus-sized
    val ext = spark.read.parquet(chunkIdx).filter(col("batch_id") === 1L)
    val survivorChunks = batchChunks
      .filter(col("doc_id").isin(kept1.toSeq: _*)).count()
    assert(ext.count() === survivorChunks)

    // epoch 2: a REVISION of a surviving corpus doc (one body token
    // edited) drops — the gate's arithmetic is unaffected by the
    // index's multiplicity on the shared chunks
    val victim = kept0.min
    val revText = body(victim).replace(s"w${victim}x3", "edited") + " " + boiler
    val b2 = Seq((500L, revText, "s", 0L)).toDF("doc_id", "text", "source", "n_chars")
    Ingest.processNearDupBatch(b2, bandIdx, out, 2L, cdc = Some(gate))
    val kept2 = spark.read.parquet(out).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(!kept2.contains(500L), "a near-identical revision slipped through")

    // compaction under the hot key: the folded base stays at
    // distinct-row scale (the hot hash's rows collapse per doc, never
    // multiply across epochs)
    val preFold = spark.read.parquet(chunkIdx)
    val distinctRows = preFold.drop("batch_id").distinct().count()
    // what a FUTURE epoch (4) would see of this probe before the fold —
    // the epoch-1 rows are part of its standing view, unlike epoch 1's
    // own self-excluding probe above
    def futureProbe(): Long = batchChunks.join(
        Ingest.standingBands(spark, chunkIdx).get
          .filter(col("batch_id") =!= 4L).select(col("chunk_hash")),
        Seq("chunk_hash"), "left_semi").count()
    val nFutureBefore = futureProbe()
    Ingest.compactIndex(spark, chunkIdx, batchId = 3L)
    val folded = spark.read.parquet(chunkIdx)
    assert(folded.drop("batch_id").distinct().count() === distinctRows)
    assert(folded.count() === distinctRows,
      "compacted chunk base holds duplicate hot-key rows")
    // and the compacted index answers the future epoch's probe
    // identically to the unfolded one
    assert(futureProbe() === nFutureBefore)
  }
}
