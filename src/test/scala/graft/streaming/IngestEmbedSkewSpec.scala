package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew rehearsal for the STANDING EMBEDDING INDEX (the band and chunk
  * indexes got theirs in SkewRehearsalSpec / IngestChunkSkewSpec): a
  * corpus whose every embedding lands in ONE sign bucket — all leading
  * `bits` components positive, the worst case an 8-bit sign hash
  * admits — makes that bucket the hottest possible key: every standing
  * vector AND every batch vector (times its probe fan-out) meets in it.
  * What must hold, each asserted here:
  *
  *  - the probe fan-out (bucket flips) rides the BATCH side only: the
  *    standing index stores one row per surviving doc per epoch, never
  *    a widened copy per probe mask;
  *  - bucket collision alone drops nothing: scored pairs stream through
  *    the exact quantized cosine, and the distinct hit set is bounded
  *    by the batch's doc ids — with 60 standing vectors sharing the
  *    bucket, a 20-doc orthogonal batch survives 20/20;
  *  - a true near-dup hiding in the hot bucket still drops (the gate
  *    stays functional under maximal occupancy);
  *  - the probe plans as a hash equi-join on the bucket key — never a
  *    nested loop over the index;
  *  - a replayed epoch under the hot bucket recomputes the identical
  *    survivor set (the idempotence contract is occupancy-independent).
  *
  * The intrinsic cost left over — |bucket occupancy| x |batch| scored
  * pairs as streamed CPU — is the documented sign-LSH trade: at corpus
  * scale the occupancy bound comes from widening `bits`, not from this
  * gate (Similarity.signBucket scaladoc). */
class IngestEmbedSkewSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // all vectors: tiny positive leading 8 dims (quantize to +1 — one
  // shared sign bucket 255), identity carried by a 2-sparse +-0.5
  // combination in the trailing 8 dims. Distinct (p, q, signs) combos
  // are pairwise cosine <= 0.5 (one shared position at equal sign:
  // 0.25 / 0.5), far under the 0.9 threshold.
  private def combo(i: Int): Array[Float] = {
    val pairs = (for { p <- 0 until 8; q <- p + 1 until 8 } yield (p, q)).toArray
    val (p, q) = pairs((i / 2) % pairs.length)
    val s2 = if (i % 2 == 0) 0.5f else -0.5f
    val tail = Array.fill(8)(0.0f)
    tail(p) = 0.5f; tail(q) = s2
    Array.fill(8)(0.001f) ++ tail
  }
  private def doc(id: Long) =
    (id, s"unique body ${id}a ${id}b ${id}c ${id}d ${id}e", combo(id.toInt))

  test("one-bucket corpus: fan-out batch-side only, no false drops, gate functional, replay exact") {
    val bandIdx = tmp("es_band") + "/bands"
    val embIdx = tmp("es_emb") + "/vecs"
    val out = tmp("es_out") + "/corpus"
    val gate = Some(Ingest.EmbedGate(embIdx, threshold = 0.9))

    // epoch 0: 36 docs, every embedding in sign bucket 255
    val b0 = (0L until 36L).map(doc).toDF("doc_id", "text", "embedding")
    Ingest.processNearDupBatch(b0, bandIdx, out, 0L, embed = gate)
    val kept0 = spark.read.parquet(out).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(kept0.size === 36, s"epoch 0 false drops: ${36 - kept0.size}")

    // the fixture really is pathological: ONE bucket holds every row,
    // and the index stores exactly one row per doc (no probe widening
    // at rest — flips ride the query side only)
    val idx0 = spark.read.parquet(embIdx)
    assert(idx0.select("bucket").distinct().count() === 1L,
      "fixture failed to collapse the index into one bucket")
    assert(idx0.count() === 36L, "standing index widened beyond one row per doc")
    assert(!idx0.columns.contains("flip"), "probe fan-out leaked into the index")

    // epoch 1: 20 NEW orthogonal combos (ids 36-55 -> pair indices
    // 18-27, disjoint from the corpus's 0-17) + 1 true near-dup of doc
    // 3 (same direction scaled 1.01 — cosine ~1) hiding in the hot
    // bucket
    val fresh = (36L until 56L).map(doc)
    val nearDup = (99L, "totally rephrased content here", combo(3).map(_ * 1.01f))
    val b1 = (fresh :+ nearDup).toDF("doc_id", "text", "embedding")
    Ingest.processNearDupBatch(b1, bandIdx, out, 1L, embed = gate)
    val kept1 = spark.read.parquet(out).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet -- kept0
    assert(kept1 === (36L until 56L).toSet,
      s"epoch 1: expected exactly the 20 orthogonal docs, got $kept1")

    // index extension is O(batch survivors): epoch 1's partition holds
    // exactly the 20 survivors' rows
    assert(spark.read.parquet(embIdx).filter(col("batch_id") === 1L).count() === 20L)

    // the probe is a hash equi-join on the bucket key: rebuild epoch
    // 1's probe shape and pin the plan (no BNLJ, no cartesian — a
    // nested loop here would score |index| x |batch| REGARDLESS of
    // bucket, not just inside the hot one)
    val pe = b1.select(col("doc_id"),
        graft.ops.Similarity.quantize(col("embedding")).as("qv"))
      .withColumn("nrm", graft.ops.Similarity.sqNorm(col("qv")))
      .withColumn("bucket", graft.ops.Similarity.signBucket(col("qv"), 8))
    val corpus = Ingest.standingBands(spark, embIdx).get
      .filter(col("batch_id") =!= 1L)
      .select(col("bucket"), col("qv").as("c_qv"), col("nrm").as("c_nrm"))
    val probe = corpus.join(
        pe.withColumn("flip", explode(array(
          graft.ops.Similarity.probeMasks(8, 1).map(lit): _*)))
          .withColumn("bucket", col("bucket").bitwiseXOR(col("flip"))),
        Seq("bucket"))
      .filter(graft.ops.Similarity.cosine(col("qv"), col("c_qv"),
        col("nrm"), col("c_nrm")) >= 0.9)
      .select(col("doc_id")).distinct()
    val plan = probe.queryExecution.sparkPlan
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, s"cartesian:\n$plan")
    assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty, s"BNLJ:\n$plan")
    // and the GENERATE (probe explode) sits under the batch subtree,
    // not above the standing-index scan: the index scan's subtree must
    // contain no Generate
    val gens = plan.collect { case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(gens.nonEmpty, "probe fan-out vanished")
    assert(gens.forall(g => !g.toString.contains("parquet")),
      "probe fan-out applied above the standing-index scan")

    // replay epoch 1 under the hot bucket: identical survivor set,
    // identical index partition (idempotence is occupancy-independent)
    Ingest.processNearDupBatch(b1, bandIdx, out, 1L, embed = gate)
    val keptReplay = spark.read.parquet(out).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet -- kept0
    assert(keptReplay === kept1, "replayed epoch diverged under the hot bucket")
    assert(spark.read.parquet(embIdx).filter(col("batch_id") === 1L).count() === 20L)
  }
}
