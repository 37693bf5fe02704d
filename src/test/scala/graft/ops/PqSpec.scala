package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic 16-dim corpus: smooth but distinct vectors.
  private def corpus(n: Int = 12, dims: Int = 16) =
    (0 until n).map { i =>
      val v = Array.tabulate(dims)(d => math.sin(i * 1.7 + d * 0.37).toFloat)
      (i.toLong, v, 0)
    }.toDF("vec_id", "embedding", "label")

  // Three separated blobs (the SimilarityTrainedSpec pattern, 16-dim).
  private def blobs =
    (for {
      (c, base) <- Seq((0.9f, 0L), (-0.9f, 100L), (0.05f, 200L))
      i <- 0 until 10
    } yield {
      val jitter = (i % 5) * 0.01f
      val v = Array.tabulate(16)(d =>
        if (c == 0.05f) (if (d % 2 == 0) jitter else 0.9f + jitter)
        else c * (if (d % 3 == 0) -1 else 1) + jitter)
      (base + i, v, 0)
    }).toDF("vec_id", "embedding", "label")

  test("codebook training is deterministic across runs (hash seeding, no RNG)") {
    val a = Pq.trainCodebooks(corpus(), m = 4, k = 4, iters = 2, dims = 16)
    val b = Pq.trainCodebooks(corpus(), m = 4, k = 4, iters = 2, dims = 16)
    assert(a.toSeq === b.toSeq)
    assert(a.map(_.sub).distinct.sorted.toSeq === Seq(0, 1, 2, 3))
    assert(a.forall(_.cv.length === 4)) // dsub = dims / m
    assert(a.forall(b => b.cnrm === b.cv.map(x => x * x).sum))
  }

  test("k = N degenerates to exact reconstruction: ADC == brute force bit-for-bit") {
    // With one code per corpus vector, every sub-vector is its own
    // centroid, the reconstruction is the original quantized vector,
    // and the asymmetric distance IS the exact cosine — so the full
    // ADC pipeline (train -> encode -> dot-table scoring) must
    // reproduce bruteForceTopK exactly, scores included. This pins the
    // whole arithmetic chain (slicing, code lookup, rnrm, numerator)
    // with zero quantization-error tolerance.
    val c = corpus(n = 12)
    val q = c.filter(col("vec_id") % 5 === 0)
    val books = Pq.trainCodebooks(c, m = 4, k = 12, iters = 2, dims = 16)
    val adc = Pq.adcTopK(c, q, k = 3, books, m = 4, dims = 16, codes = 12)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Int]("rank"), r.getAs[Double]("score")))
    val brute = Similarity.bruteForceTopK(c, q, k = 3)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Int]("rank"), r.getAs[Double]("score")))
    assert(adc.toSeq === brute.toSeq)
  }

  test("lossy codebook still recovers blob structure (top-1 stays in-blob)") {
    val books = Pq.trainCodebooks(blobs, m = 4, k = 4, iters = 2, dims = 16)
    val q = blobs.filter(col("vec_id").isin(3L, 103L, 203L))
    val top1 = Pq.adcTopK(blobs, q, k = 1, books, m = 4, dims = 16, codes = 4)
      .collect().map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("c_id"))
    assert(top1.nonEmpty)
    top1.foreach { case (qid, cid) =>
      assert(qid / 100 === cid / 100, s"query $qid left its blob for $cid")
    }
    // recon cosine is a true cosine: bounded
    val scores = Pq.adcTopK(blobs, q, k = 3, books, m = 4, dims = 16, codes = 4)
      .select("score").as[Double].collect()
    assert(scores.forall(s => s >= -1.0001 && s <= 1.0001))
  }

  test("full-corpus shortlist rerank == brute force, even under a LOSSY codebook") {
    // With the shortlist spanning every candidate, the exact rerank
    // must reproduce brute force bit-for-bit regardless of how bad the
    // ADC ordering was — the complementary pin to the k = N case: that
    // one proves the ADC arithmetic, this one proves the rerank stage.
    val c = corpus(n = 12)
    val q = c.filter(col("vec_id") % 5 === 0)
    val books = Pq.trainCodebooks(c, m = 4, k = 2, iters = 1, dims = 16) // coarse!
    val rr = Pq.adcRerankTopK(c, q, k = 3, books, m = 4, dims = 16,
        codes = 2, shortlist = 11)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Int]("rank"), r.getAs[Double]("score")))
    val brute = Similarity.bruteForceTopK(c, q, k = 3)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Int]("rank"), r.getAs[Double]("score")))
    assert(rr.toSeq === brute.toSeq)
  }

  test("IVFADC with full probe + full shortlist == brute force exactly") {
    // nprobe = nlist prunes nothing; an all-candidate shortlist makes
    // the exact rerank total — so the whole three-stage composition
    // (coarse assign, code scoring, rerank) must collapse back to
    // brute force bit-for-bit. Pins the cell equi-join (no pair lost
    // or duplicated across cells) on top of the two rerank pins.
    val c = corpus(n = 12)
    val q = c.filter(col("vec_id") % 5 === 0)
    val cents = Similarity.kmeansCentroids(c, nlist = 3, iters = 2)
    val books = Pq.trainCodebooks(c, m = 4, k = 2, iters = 1, dims = 16) // coarse!
    val ivfadc = Pq.ivfAdcRerankTopK(c, q, k = 3, books, cents, nprobe = 3,
        shortlist = 11, m = 4, dims = 16, codes = 2)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Int]("rank"), r.getAs[Double]("score")))
    val brute = Similarity.bruteForceTopK(c, q, k = 3)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Int]("rank"), r.getAs[Double]("score")))
    assert(ivfadc.toSeq === brute.toSeq)
  }

  test("residual IVFADC: k = N residual books collapse to brute force bit-for-bit") {
    // With one residual code per vector, recon = coarse_cv + (x −
    // coarse_cv) = x EXACTLY, so the full residual chain — coarse
    // assignment, residual training, cross-term reconstruction norm,
    // coarse-dot + residual-table numerator, rerank — must reproduce
    // brute force with zero tolerance. Pins every piece of the
    // residual arithmetic at once.
    val c = corpus(n = 12)
    val q = c.filter(col("vec_id") % 5 === 0)
    val cents = Similarity.kmeansCentroids(c, nlist = 3, iters = 2)
    val books = Pq.trainResidualCodebooks(c, cents, m = 4, k = 12, iters = 2, dims = 16)
    // shortlist = k: the rerank gets NO slack to repair a wrong ADC
    // order (a full shortlist would make any ADC pass look exact —
    // that case is the lossy-codebook test above); here the selective
    // shortlist only equals brute force if the residual ADC scores
    // are themselves exact
    val res = Pq.ivfAdcResidualRerankTopK(c, q, k = 3, books, cents, nprobe = 3,
        shortlist = 3, m = 4, dims = 16, codes = 12)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Int]("rank"), r.getAs[Double]("score")))
    val brute = Similarity.bruteForceTopK(c, q, k = 3)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Int]("rank"), r.getAs[Double]("score")))
    assert(res.toSeq === brute.toSeq)
  }

  test("encode emits m codes + reconstruction norm; codes come from the books") {
    val books = Pq.trainCodebooks(corpus(), m = 4, k = 4, iters = 1, dims = 16)
    val enc = Pq.encode(corpus(), books, m = 4, dims = 16)
    assert(enc.columns.toSeq === Seq("vec_id", "code_0", "code_1", "code_2", "code_3", "rnrm"))
    val byKey = books.map(b => (b.sub, b.code) -> b.cnrm).toMap
    enc.collect().foreach { r =>
      val rn = (0 until 4).map(t => byKey((t, r.getAs[Long](s"code_$t")))).sum
      assert(r.getAs[Long]("rnrm") === rn, s"rnrm mismatch for vec ${r.get(0)}")
    }
  }

  test("a codebook wider than the declared dot table fails at plan build") {
    // codes=2 table vs k=4 books: a code 3 would index a NEIGHBORING
    // subspace's dot slot — must die loudly before any scoring
    val c = corpus()
    val books = Pq.trainCodebooks(c, m = 4, k = 4, iters = 1, dims = 16)
    val e = intercept[IllegalArgumentException] {
      Pq.adcTopK(c, c.filter(col("vec_id") === 0), k = 3, books,
        m = 4, dims = 16, codes = 2)
    }
    assert(e.getMessage.contains("exceeds the declared"))
  }

  test("wrong-width vectors fail loudly, not as silent tail corruption") {
    val bad = corpus(n = 6, dims = 8) // 8-dim rows into a 16-dim PQ
    val e = intercept[Throwable] {
      Pq.trainCodebooks(bad, m = 4, k = 4, iters = 1, dims = 16)
    }
    // raise_error surfaces as SparkRuntimeException (local) or wrapped
    // SparkException (executor) depending on where the task dies
    assert(e.getMessage.contains("expected 16-dim") ||
      Option(e.getCause).exists(_.getMessage.contains("expected 16-dim")),
      s"unexpected failure: $e")
  }
}
