package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class IngestNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("two micro-batches: near-dups of batch 1 are dropped in batch 2, state stays bounded") {
    val idx = tmp("nd_idx") + "/bands"
    val out = tmp("nd_out") + "/corpus"
    val ckpt = tmp("nd_ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long)]
    val docs = input.toDF.toDF("doc_id", "text", "source", "n_chars")
    val q = Ingest.startNearDupIngest(docs, idx, out, ckpt)
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog", "s1", 43L),
        (2L, "completely different words appear here entirely now", "s1", 51L))
      q.processAllAvailable()
      // batch 2: 10 duplicates corpus doc 1 (must be dropped by the
      // standing-index probe); 11 is new (kept); 12/13 duplicate each
      // other within the batch (greedy keep-min keeps 12 only)
      input.addData(
        (10L, "the quick brown fox jumps over the lazy dog", "s2", 43L),
        (11L, "yet another brand new unique document text", "s2", 42L),
        (12L, "twin documents sharing the very same words", "s2", 42L),
        (13L, "twin documents sharing the very same words", "s2", 42L))
      q.processAllAvailable()
    } finally q.stop()

    val kept = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 11L, 12L))
    // the ONLY dedup state is the band index: survivors x numHashes rows,
    // nothing proportional to stream length or dropped docs
    val bands = spark.read.parquet(idx)
    assert(bands.count() === 4L * 4L)
    assert(bands.select("doc_id").distinct().collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L, 11L, 12L))
    // replaying the dropped doc in a LATER batch still drops it (the
    // index persisted across batches)
    val replayIdx = idx
    val batch3 = Seq((20L, "the quick brown fox jumps over the lazy dog", "s3", 43L))
      .toDF("doc_id", "text", "source", "n_chars")
    Ingest.processNearDupBatch(batch3, replayIdx, out, batchId = 100L)
    val kept3 = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept3 === Set(1L, 2L, 11L, 12L))
  }

  test("--drift wiring: the ingest stream feeds the drift ledger per micro-batch") {
    val idx = tmp("nd_idxd") + "/bands"
    val out = tmp("nd_outd") + "/corpus"
    val ckpt = tmp("nd_ckptd")
    val droot = tmp("nd_drift") + "/drift"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long)]
    val docs = input.toDF.toDF("doc_id", "text", "source", "n_chars")
    val q = Ingest.startNearDupIngest(docs, idx, out, ckpt, drift = Some(droot))
    try {
      input.addData((1L, "alpha beta gamma delta epsilon zeta", "s1", 35L))
      q.processAllAvailable()
      input.addData((2L, "alpha beta gamma NEW WORDS HERE NOW", "s1", 35L))
      q.processAllAvailable()
    } finally q.stop()
    val hist = DriftIngest.driftHistory(spark, s"$droot/ledger")
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(hist.keySet === Set(1L), s"exactly batch 1 has a baseline: $hist")
    assert(hist(1L) > 0L, "a shifted batch must register non-zero drift")
    // counts accumulated over both batches (the raw pre-gate stream)
    val total = DriftIngest.currentCounts(spark, s"$droot/counts")
      .agg(org.apache.spark.sql.functions.sum("cnt")).head().getLong(0)
    assert(total === 13L, s"expected 13 tokens across the two batches (6 + 7), got $total")
  }

  test("batch replay is idempotent: re-running an epoch adds nothing (at-least-once safety)") {
    // foreachBatch delivers at-least-once; a replayed epoch must not
    // duplicate the corpus. Both sinks are partitioned by batch_id and
    // overwritten, and the probe excludes the epoch's own partition —
    // the replay recomputes the identical survivor set and rewrites its
    // own partitions in place.
    val idx = tmp("nd_idx3") + "/bands"
    val out = tmp("nd_out3") + "/corpus"
    val batch = Seq(
      (1L, "first document with enough tokens to band", "s", 42L),
      (2L, "second totally different text also banded", "s", 42L))
      .toDF("doc_id", "text", "source", "n_chars")
    Ingest.processNearDupBatch(batch, idx, out, batchId = 7L)
    val afterOnce = spark.read.parquet(out).count()
    val bandsOnce = spark.read.parquet(idx).count()
    Ingest.processNearDupBatch(batch, idx, out, batchId = 7L) // the replay: SAME epoch id
    assert(spark.read.parquet(out).count() === afterOnce)
    assert(spark.read.parquet(idx).count() === bandsOnce)
  }

  test("first batch against a missing index bootstraps it (no corpus yet)") {
    val idx = tmp("nd_idx2") + "/bands"
    val out = tmp("nd_out2") + "/corpus"
    val batch = Seq(
      (1L, "some perfectly ordinary first document here", "s", 43L),
      (2L, "some perfectly ordinary first document here", "s", 43L))
      .toDF("doc_id", "text", "source", "n_chars")
    Ingest.processNearDupBatch(batch, idx, out, batchId = 0L)
    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L))
    assert(spark.read.parquet(idx).count() === 4L)
  }

  test("two batches through the STANDING bench gate: contaminated docs dropped, O(batch) per epoch") {
    // The streaming corpus gate must match the batch decontamination
    // gate: the benchmark bloom + shingle relation are built ONCE at
    // stream start (benchGate) and probed per micro-batch — never
    // rebuilt, never rescanned.
    import graft.ops.Decontaminate
    val idx = tmp("nd_idxg") + "/bands"
    val out = tmp("nd_outg") + "/corpus"
    val bench = Seq(
      (900L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val gate = Decontaminate.benchGate(bench, minOverlap = 3)
    try {
      // the bench relation is CACHED: each epoch probes memory, not a
      // re-derivation — the O(batch)-per-epoch claim
      assert(gate.benchShingles.storageLevel.useMemory,
        "bench shingles must be persisted for the per-batch probe")
      // batch 1: doc 1 embeds a 6-word bench span (4 shared 3-gram
      // shingles >= minOverlap 3) -> contaminated; doc 2 is clean
      Ingest.processNearDupBatch(Seq(
        (1L, "noise words alpha beta gamma delta epsilon zeta more stuff", "s", 58L),
        (2L, "perfectly original training content with no leaks", "s", 49L))
        .toDF("doc_id", "text", "source", "n_chars"),
        idx, out, batchId = 0L, bench = Some(gate))
      assert(spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).toSet === Set(2L))
      // the leaked doc must NOT have extended the band index either
      assert(spark.read.parquet(idx).select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet === Set(2L))
      // batch 2 through the SAME gate object: a new contaminated doc is
      // still dropped, a clean one still kept
      Ingest.processNearDupBatch(Seq(
        (10L, "prefix gamma delta epsilon zeta eta theta suffix words", "s", 54L),
        (11L, "another clean and unrelated document entirely here", "s", 50L))
        .toDF("doc_id", "text", "source", "n_chars"),
        idx, out, batchId = 1L, bench = Some(gate))
      assert(spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).toSet === Set(2L, 11L))
      // a sub-threshold overlap (2 shared shingles < minOverlap 3)
      // survives — the gate thresholds, it doesn't keyword-match
      Ingest.processNearDupBatch(Seq(
        (20L, "mentions alpha beta gamma delta only briefly today", "s", 50L))
        .toDF("doc_id", "text", "source", "n_chars"),
        idx, out, batchId = 2L, bench = Some(gate))
      assert(spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).toSet === Set(2L, 11L, 20L))
    } finally gate.release()
  }

  test("a contaminated doc is NOT the dedup representative: its clean near-dup survives") {
    // Counter-review finding: in-batch pair generation once ran over
    // the FULL batch, so a clean doc whose only band collision was a
    // contaminated doc got dropped with it — content lost entirely.
    // Contaminated ids must leave the band relation BEFORE pairing.
    import graft.ops.{Decontaminate, Dedup}
    val idx = tmp("nd_idxr") + "/bands"
    val out = tmp("nd_outr") + "/corpus"
    val bench = Seq((900L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val gate = Decontaminate.benchGate(bench, minOverlap = 3)
    try {
      // doc 1 embeds a 5-word bench span (3 shared shingles -> leaked);
      // doc 2 is doc 1 with one span word changed (2 shared -> clean)
      val contaminatedDoc = "x1 x2 alpha beta gamma delta epsilon x3 x4 x5"
      val cleanTwin = "x1 x2 alpha beta gamma delta epsilonX x3 x4 x5"
      val batch = Seq(
        (1L, contaminatedDoc, "s", 46L),
        (2L, cleanTwin, "s", 47L))
        .toDF("doc_id", "text", "source", "n_chars")
      // precondition: the twins genuinely share a MinHash band —
      // without a collision this test would pass vacuously
      val bands = Dedup.bandIndex(batch, numHashes = 4, maxBucket = 1000)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"), r.getAs[String]("h")))
      val shared = bands.filter(_._1 == 1L).map(b => (b._2, b._3)).toSet
        .intersect(bands.filter(_._1 == 2L).map(b => (b._2, b._3)).toSet)
      assert(shared.nonEmpty, "fixture must band-collide the twins")
      Ingest.processNearDupBatch(batch, idx, out, batchId = 0L, bench = Some(gate))
      assert(spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).toSet === Set(2L),
        "the clean twin must survive its contaminated representative")
      assert(spark.read.parquet(idx).select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet === Set(2L))
    } finally gate.release()
  }

  test("classifier gate per micro-batch: sub-threshold docs neither land nor index") {
    val idx = tmp("nd_idxc") + "/bands"
    val out = tmp("nd_outc") + "/corpus"
    // margin = weighted token mean: doc 1 scores positive, doc 2 negative
    val clf = Some((Seq("good" -> 2000L, "bad" -> -2000L), 0L, 0.5))
    Ingest.processNearDupBatch(Seq(
      (1L, "good good quality document with plenty good words", "s", 49L),
      (2L, "bad bad junk document with plenty bad words here", "s", 48L))
      .toDF("doc_id", "text", "source", "n_chars"),
      idx, out, batchId = 0L, classifier = clf)
    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L))
    assert(spark.read.parquet(idx).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet === Set(1L),
      "a gated doc must not extend the band index either")
    // second batch through the SAME gate config still filters
    Ingest.processNearDupBatch(Seq(
      (10L, "bad junk again with more bad words than good here", "s", 49L),
      (11L, "good fresh good unique good content entirely new", "s", 48L))
      .toDF("doc_id", "text", "source", "n_chars"),
      idx, out, batchId = 1L, classifier = clf)
    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 11L))
  }

  test("an ALL-gated first batch writes nothing and does not poison the next epoch") {
    // Counter-review finding: a zero-row parquet write leaves a
    // schema-less marker dir, and the next epoch's standingBands read
    // would die on schema inference — killing the stream permanently.
    val idx = tmp("nd_idxe") + "/bands"
    val out = tmp("nd_oute") + "/corpus"
    val clf = Some((Seq("bad" -> -9000L), 0L, 0.0))
    Ingest.processNearDupBatch(Seq(
      (1L, "bad bad bad entirely rejected document text here", "s", 48L))
      .toDF("doc_id", "text", "source", "n_chars"),
      idx, out, batchId = 0L, classifier = clf)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(idx)),
      "an all-gated batch must not create the index dir")
    // the next epoch proceeds normally against the (absent) index
    Ingest.processNearDupBatch(Seq(
      (2L, "perfectly fine surviving document with plenty words", "s", 51L))
      .toDF("doc_id", "text", "source", "n_chars"),
      idx, out, batchId = 1L, classifier = clf)
    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(2L))
    // short-doc edge: a surviving doc too short to band (< 3 tokens)
    // writes the corpus but NOT the index; the epoch after still works
    Ingest.processNearDupBatch(Seq(
      (3L, "tiny doc", "s", 8L))
      .toDF("doc_id", "text", "source", "n_chars"),
      idx, out, batchId = 2L, classifier = clf)
    Ingest.processNearDupBatch(Seq(
      (4L, "another normal document that bands and survives fine", "s", 52L))
      .toDF("doc_id", "text", "source", "n_chars"),
      idx, out, batchId = 3L, classifier = clf)
    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(2L, 3L, 4L))
  }

  test("index compaction folds old epochs, keeps the current one, preserves dedup + replay") {
    val idx = tmp("cpt_idx") + "/bands"
    val out = tmp("cpt_out") + "/corpus"
    val every = Some(2L)
    def run(id: Long, text: String, epoch: Long): Unit =
      Ingest.processNearDupBatch(
        Seq((id, text, "s", text.length.toLong)).toDF("doc_id", "text", "source", "n_chars"),
        idx, out, epoch, compactIndexEvery = every)
    def dirs: Set[String] = new java.io.File(idx).listFiles
      .map(_.getName).filter(_.startsWith("batch_id=")).toSet
    val alpha = "alpha words making one unique document here"
    val beta = "beta phrasing entirely different from the others"
    run(1L, alpha, 0L)
    run(2L, beta, 1L)
    // epoch 2 compacts: folds 0 and 1 into base -(2+1), keeps its own
    run(3L, "gamma text also fully distinct in content", 2L)
    assert(dirs === Set("batch_id=-3", "batch_id=2"), s"got $dirs")
    // dedup against the COMPACTED base still works
    run(10L, alpha, 3L)
    def kept: Set[Long] = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 3L))
    // REPLAY of the compaction epoch: base already exists -> compaction
    // skipped, and the epoch's own partition was never folded, so the
    // replay cannot collide with itself — identical survivors
    run(3L, "gamma text also fully distinct in content", 2L)
    assert(kept === Set(1L, 2L, 3L))
    assert(dirs.contains("batch_id=-3") && dirs.contains("batch_id=2"))
    // the next compaction point folds the old base + later epochs again
    run(4L, "delta words new and previously unseen here", 4L)
    assert(dirs === Set("batch_id=-5", "batch_id=4"), s"got $dirs")
    // and a dup of a doc now living in the twice-folded base still drops
    run(11L, beta, 5L)
    assert(kept === Set(1L, 2L, 3L, 4L))
  }

  test("CDC chunk gate: a re-chunked revision that evades EVERY minhash band is caught") {
    // Construct (A, B) = shared 80-word prefix + two DIFFERENT 40-word
    // tails such that all 4 minhash values differ (no band collision —
    // banding provably cannot pair them) while the prefix's
    // content-defined chunks are byte-identical in both docs. Band
    // minima are random shingles, so a deterministic search over tail
    // pairs finds one whose minima both sit in the tails (~10% per
    // pair): that is exactly the revision class banding misses and
    // chunk-grain probing catches.
    val prefix = (0 until 80).map(i => s"tok${i}x${i % 7}")
    def tail(seed: Int): Seq[String] = (0 until 40).map(i => s"w${seed}n${i}q")
    val cand = (0 until 200).map { j => (tail(2 * j), tail(2 * j + 1)) }
    val sigRows = graft.ops.Dedup.minhashSignatures(
        cand.zipWithIndex.flatMap { case ((ta, tb), j) =>
          Seq((2L * j, (prefix ++ ta).mkString(" ")),
            (2L * j + 1, (prefix ++ tb).mkString(" ")))
        }.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
      .toMap
    val evading = (0 until 200).find { j =>
      val sa = sigRows(2L * j); val sb = sigRows(2L * j + 1)
      sa._1 != sb._1 && sa._2 != sb._2 && sa._3 != sb._3 && sa._4 != sb._4
    }
    assert(evading.isDefined, "no tail pair evaded all four bands — enlarge the search")
    val textA = (prefix ++ cand(evading.get)._1).mkString(" ")
    val textB = (prefix ++ cand(evading.get)._2).mkString(" ")
    // fixture guard: B's chunk-hash occurrences shared with A must
    // reach the gate's dupFrac (the shared prefix chunks), or the
    // construction no longer demonstrates what it claims
    val chunkSets = graft.ops.TextOps.cdcChunks(
        Seq((0L, textA), (1L, textB)).toDF("doc_id", "text"))
      .select(col("doc_id"), col("chunk_hash")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSeq).toMap
    val aHashes = chunkSets(0L).groupBy(identity).view.mapValues(_.size).toMap
    val shared = chunkSets(1L).count(h => aHashes.getOrElse(h, 0) > 0)
    val share = shared.toDouble / chunkSets(1L).size
    assert(share >= 0.3, s"fixture chunk share $share below the gate threshold")

    def run(withCdc: Boolean): Set[Long] = {
      val idx = tmp("cdc_idx") + "/bands"
      val out = tmp("cdc_out") + "/corpus"
      val cdc = if (withCdc) Some(Ingest.CdcGate(tmp("cdc_cidx") + "/chunks", dupFrac = 0.3))
                else None
      val b1 = Seq((1L, textA, "s", textA.length.toLong),
        (2L, "a completely unrelated short corpus document here", "s", 49L))
        .toDF("doc_id", "text", "source", "n_chars")
      Ingest.processNearDupBatch(b1, idx, out, batchId = 0L, cdc = cdc)
      val b2 = Seq((10L, textB, "s", textB.length.toLong),
        (11L, "fresh never seen words forming an honestly new document", "s", 55L))
        .toDF("doc_id", "text", "source", "n_chars")
      Ingest.processNearDupBatch(b2, idx, out, batchId = 1L, cdc = cdc)
      cdc.foreach { c =>
        // the standing chunk index carries SURVIVOR chunks only
        val chunkDocs = spark.read.parquet(c.indexPath).select("doc_id")
          .collect().map(_.getLong(0)).toSet
        assert(chunkDocs === Set(1L, 2L, 11L), s"chunk index holds $chunkDocs")
      }
      spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).toSet
    }

    // control: bands alone MISS the revision (it survives) — the exact
    // gap the chunk gate closes
    assert(run(withCdc = false) === Set(1L, 2L, 10L, 11L))
    // with the gate: the revision is dropped, genuinely new docs keep
    assert(run(withCdc = true) === Set(1L, 2L, 11L))
  }
}
