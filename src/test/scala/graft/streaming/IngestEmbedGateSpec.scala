package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The semantic near-dup gate: a paraphrase shares NO shingles (every
  * band minimum moves, every CDC chunk changes) but its embedding
  * barely moves — only the standing embedding index can catch it. */
class IngestEmbedGateSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def vec(first8: Seq[Float], rest: Seq[Float]): Array[Float] =
    (first8 ++ rest).toArray

  // all-positive leading signs -> bucket 255
  private val base = vec(Seq.fill(8)(0.1f), 0.1f +: Seq.fill(7)(0.0f))
  // dim 4 sits just above zero — its sign is one jitter away from flipping
  private val base2 = vec(Seq(0.1f, 0.1f, 0.1f, 0.005f, 0.1f, 0.1f, 0.1f, 0.1f),
    0.0f +: 0.1f +: Seq.fill(6)(0.0f))

  test("embedding gate drops paraphrases the text gates cannot see (incl. one sign flip)") {
    val bandIdx = tmp("eg_band") + "/bands"
    val embIdx = tmp("eg_emb") + "/vecs"
    val out = tmp("eg_out") + "/corpus"
    val ckpt = tmp("eg_ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Array[Float])]
    val docs = input.toDF.toDF("doc_id", "text", "embedding")
    val q = Ingest.startNearDupIngest(docs, bandIdx, out, ckpt,
      embed = Some(Ingest.EmbedGate(embIdx, threshold = 0.9)))
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog", base),
        (2L, "completely different words appear here entirely now", base2))
      q.processAllAvailable()
      input.addData(
        // paraphrase of doc 1: zero shared shingles, embedding scaled
        // 1.01x (cosine 1.0) — only the embed gate can drop it
        (10L, "a swift russet canine leaps above an idle hound", base.map(_ * 1.01f)),
        // paraphrase of doc 2 whose near-zero dim flipped sign: lands
        // one bucket away — recovered by the probeDist=1 fan-out
        (11L, "utterly dissimilar tokens occupy this line instead",
          base2.updated(3, -0.005f)),
        // SAME bucket as doc 1 (all leading signs positive) but nearly
        // orthogonal — bucket collision alone must NOT drop it
        (12L, "sharing the sign pattern yet pointing somewhere else",
          vec(Seq.fill(8)(0.001f), 0.0f +: 0.0f +: Seq.fill(6)(0.5f))),
        // opposite sign pattern everywhere: unreachable by 1-bit probes
        (13L, "this vector points the other way around wholly",
          base.map(x => -x)))
      q.processAllAvailable()
    } finally q.stop()

    val kept = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 12L, 13L))
    // the embed index holds exactly the survivors' quantized vectors
    val idx = spark.read.parquet(embIdx)
    assert(idx.select("doc_id").collect().map(_.getLong(0)).toSet === kept)
    assert(idx.columns.toSet === Set("doc_id", "qv", "nrm", "bucket", "batch_id"))
  }

  test("PQ mode: same verdicts from an index of 8-byte codes, books persisted once") {
    // the 100 TB configuration — the standing index stores PQ codes +
    // reconstruction norm instead of raw vectors; scoring is ADC
    // against the batch's EXACT vectors, and near-identical embeddings
    // keep ADC cosine ~1, so the gate's verdicts must match exact mode
    // on the same scenario
    val bandIdx = tmp("eg_band_pq") + "/bands"
    val embIdx = tmp("eg_emb_pq") + "/vecs"
    val out = tmp("eg_out_pq") + "/corpus"
    val gate = Some(Ingest.EmbedGate(embIdx, threshold = 0.9, usePq = true,
      pqM = 4, pqDims = 16, pqCodes = 4))
    def batch(rows: Seq[(Long, String, Array[Float])]) =
      rows.toDF("doc_id", "text", "embedding")
    Ingest.processNearDupBatch(batch(Seq(
      (1L, "the quick brown fox jumps over the lazy dog", base),
      (2L, "completely different words appear here entirely now", base2))),
      bandIdx, out, batchId = 0L, embed = gate)
    Ingest.processNearDupBatch(batch(Seq(
      (10L, "a swift russet canine leaps above an idle hound", base.map(_ * 1.01f)),
      (11L, "utterly dissimilar tokens occupy this line instead",
        base2.updated(3, -0.005f)),
      (12L, "sharing the sign pattern yet pointing somewhere else",
        vec(Seq.fill(8)(0.001f), 0.0f +: 0.0f +: Seq.fill(6)(0.5f))),
      (13L, "this vector points the other way around wholly",
        base.map(x => -x)))),
      bandIdx, out, batchId = 1L, embed = gate)
    val kept = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 12L, 13L))
    // the index holds CODES, not vectors: m byte-sized codes + rnrm
    val idx = spark.read.parquet(embIdx)
    assert(idx.columns.toSet ===
      (Set("doc_id", "bucket", "rnrm", "batch_id") ++ (0 until 4).map(t => s"code_$t")))
    assert(idx.select("doc_id").collect().map(_.getLong(0)).toSet === kept)
    // books trained once on the first batch and persisted beside the index
    assert(graft.ops.Pq.booksFromDf(
      spark.read.parquet(embIdx + "_books")).nonEmpty)
  }

  test("replaying an epoch converges (idempotent overwrite, no self-collision)") {
    val bandIdx = tmp("eg_band2") + "/bands"
    val embIdx = tmp("eg_emb2") + "/vecs"
    val out = tmp("eg_out2") + "/corpus"
    val gate = Some(Ingest.EmbedGate(embIdx, threshold = 0.9))
    val b1 = Seq((1L, "the quick brown fox jumps over the lazy dog", base))
      .toDF("doc_id", "text", "embedding")
    Ingest.processNearDupBatch(b1, bandIdx, out, batchId = 0L, embed = gate)
    // replay the SAME epoch: the probe excludes its own partition, so
    // doc 1 must not collide with itself and vanish
    Ingest.processNearDupBatch(b1, bandIdx, out, batchId = 0L, embed = gate)
    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(spark.read.parquet(embIdx).count() === 1L)
  }

  test("null embeddings pass the gate unindexed (no dead rows, no null-cosine drops)") {
    val bandIdx = tmp("eg_band4") + "/bands"
    val embIdx = tmp("eg_emb4") + "/vecs"
    val out = tmp("eg_out4") + "/corpus"
    val gate = Some(Ingest.EmbedGate(embIdx, threshold = 0.9))
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", Some(base)),
      (2L, "completely different words appear here entirely now", Option.empty[Array[Float]]))
      .toDF("doc_id", "text", "embedding")
    Ingest.processNearDupBatch(b1, bandIdx, out, batchId = 0L, embed = gate)
    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    // only the embedded doc's vector landed in the index
    assert(spark.read.parquet(embIdx).select("doc_id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("a stream without an embedding column fails loudly, not silently ungated") {
    val b = Seq((1L, "some text", "s1", 9L)).toDF("doc_id", "text", "source", "n_chars")
    val e = intercept[IllegalArgumentException] {
      Ingest.processNearDupBatch(b, tmp("eg_b3"), tmp("eg_o3"), batchId = 0L,
        embed = Some(Ingest.EmbedGate(tmp("eg_e3"))))
    }
    assert(e.getMessage.contains("embedding"))
  }
}
