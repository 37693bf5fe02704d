package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilarityTrainedSpec extends SparkSpec {
  import spark.implicits._

  // Three well-separated gaussian-ish blobs in 4-D (deterministic values):
  // k-means with k=3 must recover them regardless of init.
  private def blobs = {
    val rows = for {
      (cx, base) <- Seq((0.9f, 0L), (-0.9f, 100L), (0.0f, 200L))
      i <- 0 until 20
    } yield {
      val jitter = (i % 5) * 0.01f
      val v = cx match {
        case 0.0f => Array(jitter, 0.9f + jitter, jitter, -0.9f)
        case c    => Array(c + jitter, -c, c, c + jitter)
      }
      (base + i, v, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("array<double> embeddings quantize identically to array<float> (drift armor)") {
    // If the driver testdata ever ships embeddings as array<double>,
    // the quantize kernel must dispatch on the 8-byte element width —
    // reading unsafe double slots with getFloat is silent garbage, so
    // the two plans agreeing end-to-end is the proof the dispatch works.
    val asDouble = blobs.withColumn("embedding",
      transform(col("embedding"), v => v.cast("double")))
    val qf = blobs.select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
      .orderBy("vec_id").collect().map(r => r.getAs[Seq[Long]]("qv").toList).toSeq
    val qd = asDouble.select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
      .orderBy("vec_id").collect().map(r => r.getAs[Seq[Long]]("qv").toList).toSeq
    assert(qd === qf)
    // and a non-numeric element type fails analysis loudly, not silently
    val bad = blobs.withColumn("embedding", transform(col("embedding"), v => v.cast("string")))
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(Similarity.quantize(col("embedding"))).collect()
    }
  }

  test("kmeans centroids: deterministic across runs, one centroid per blob") {
    val a = Similarity.kmeansCentroids(blobs, nlist = 3, iters = 2).collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Seq[Long]]("cv").toList).toMap
    val b = Similarity.kmeansCentroids(blobs, nlist = 3, iters = 2).collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Seq[Long]]("cv").toList).toMap
    assert(a === b) // rerun-stable (hash seeding, no RNG)
    assert(a.size === 3)
    // each blob's sign pattern shows up in exactly one centroid
    val signs = a.values.map(cv => cv.map(x => math.signum(x.toDouble)).toList).toSet
    assert(signs.size === 3)
  }

  test("trained IVF with full probe matches brute force exactly") {
    // nprobe = nlist: no cells are pruned, so the trained index must
    // return exactly the brute-force neighbors (same scores, same order)
    val q = blobs.filter(col("vec_id") % 20 === 0)
    val bf = Similarity.bruteForceTopK(blobs, q, k = 3).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"), r.getAs[Int]("rank"))).toSet
    val ivf = Similarity.ivfTrainedTopK(blobs, q, k = 3, nlist = 3, iters = 2, nprobe = 3)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"), r.getAs[Int]("rank"))).toSet
    assert(ivf === bf)
  }

  test("kmeans degrades cleanly: nlist larger than the corpus") {
    val tiny = blobs.limit(3)
    val cents = Similarity.kmeansCentroids(tiny, nlist = 5, iters = 2).collect()
    assert(cents.length <= 3 && cents.nonEmpty) // at most one cell per vector
    val got = Similarity.ivfTrainedTopK(tiny, tiny.limit(1), k = 2,
      nlist = 5, iters = 2, nprobe = 5).count()
    assert(got <= 2)
  }

  test("build-once/search-many equals the one-shot train+search path") {
    // the production shape: kmeansCentroids builds the index relation
    // ONCE; ivfSearch probes it. Must return exactly what the one-shot
    // convenience (train inside the call) returns — glued by construction,
    // enforced here so the two paths can never drift.
    val q = blobs.filter(col("vec_id") % 20 === 0)
    val cents = Similarity.kmeansCentroids(blobs, nlist = 3, iters = 2)
    val fromIndex = Similarity.ivfSearch(cents, blobs, q, k = 3, nprobe = 2).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"), r.getAs[Int]("rank"))).toSet
    val oneShot = Similarity.ivfTrainedTopK(blobs, q, k = 3, nlist = 3, iters = 2, nprobe = 2)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"), r.getAs[Int]("rank"))).toSet
    assert(fromIndex === oneShot)
  }

  test("trained IVF with nprobe=1 keeps in-blob neighbors (pruning works)") {
    val q = blobs.filter(col("vec_id") === 0L) // a blob-0 member
    val got = Similarity.ivfTrainedTopK(blobs, q, k = 3, nlist = 3, iters = 2, nprobe = 1)
      .collect().map(_.getAs[Long]("c_id"))
    assert(got.length === 3)
    assert(got.forall(id => id >= 1L && id < 100L)) // all neighbors from blob 0
  }

  test("lshTopKMulti: identical vectors always collide; pairs scored once") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.5f, -0.25f, 0.75f)),
      (100L, Array(1.0f, 0.5f, -0.25f, 0.75f)), // identical to 0
      (2L, Array(-1.0f, -0.5f, 0.25f, -0.75f))  // opposite signs everywhere
    ).toDF("vec_id", "embedding")
    val res = Similarity.lshTopKMulti(emb, emb.filter(col("vec_id") === 0L),
        k = 3, bits = 2, tables = 2).collect()
    val ids = res.map(_.getAs[Long]("c_id"))
    assert(ids.contains(100L), "identical vector must collide in every table")
    assert(!ids.contains(2L), "all-opposite-sign vector cannot collide in any table")
    // colliding in BOTH tables must not duplicate the pair
    assert(ids.count(_ == 100L) === 1)
  }

  test("probeMasks: complete distinct mask set; probeDist=0 degenerates to the plain table") {
    // counts: sum of C(bits, w) for w <= dist; all masks distinct and
    // weight-bounded — the fan-out contract the oracle mirrors
    assert(Similarity.probeMasks(8, 0) === Seq(0L))
    val m1 = Similarity.probeMasks(8, 1)
    assert(m1.length === 9 && m1.distinct.length === 9)
    val m2 = Similarity.probeMasks(8, 2)
    assert(m2.length === 37 && m2.distinct.length === 37)
    assert(m2.forall(m => java.lang.Long.bitCount(m) <= 2))
    // dist 0 == the plain single-table results, row for row
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val plain = Similarity.lshTopK(emb, k = 3, queryStride = 100, bits = 8)
      .collect().map(_.toString).sorted.toSeq
    val p0 = Similarity.lshTopKProbe(emb,
        emb.filter(org.apache.spark.sql.functions.col("vec_id") % 100 === 0),
        k = 3, bits = 8, probeDist = 0)
      .collect().map(_.toString).sorted.toSeq
    assert(p0 === plain)
  }

  test("recall@3 floors hold at the gate SFs (the recall/cost dial is real)") {
    // ann_recall is oracle-checked for VALUES; this pins the QUALITY
    // floor so a param change that silently craters recall turns red.
    // Measured: ivf 0.67/0.52, lsh_multi 0.73/0.62 at sf0.01/sf0.1 —
    // floors leave drift margin.
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val rec = graft.SparkEntry.queries("ann_recall")(spark, dir).collect()
        .map(r => r.getAs[String]("method") -> r.getAs[Double]("recall")).toMap
      assert(rec("ivf") >= 0.4, s"$dir: ivf recall ${rec("ivf")} < 0.4")
      assert(rec("lsh_multi") >= 0.5, s"$dir: lsh_multi recall ${rec("lsh_multi")} < 0.5")
      assert(rec("lsh_multi") >= rec("lsh"),
        s"$dir: OR-amplification must not lose recall vs one table")
      // multi-probe repairs the single table (measured 0.40/0.37 at
      // sf0.01/0.1 vs the plain table's honest 0.0) while scoring only
      // ~14% of bucket space (37 of 256 probes)
      assert(rec("lsh_probe") >= 0.25, s"$dir: lsh_probe recall ${rec("lsh_probe")} < 0.25")
      assert(rec("lsh_probe") >= rec("lsh"),
        s"$dir: probing supersets the plain bucket — recall cannot drop")
      info(s"$dir recall map: $rec")
      // pq is an EXHAUSTIVE scan — recall measures pure quantization
      // loss of the m=8 x 16-code books (measured 0.33/0.10 at
      // sf0.01/sf0.1 — honest, like the plain lsh 0.0); the production
      // config is the 32-deep exact rerank (measured 0.60/0.42)
      assert(rec("pq") >= 0.05, s"$dir: pq recall ${rec("pq")} < 0.05")
      assert(rec("pq_rerank") >= 0.3,
        s"$dir: pq_rerank recall ${rec("pq_rerank")} < 0.3")
      // a truth pair is top-3 by EXACT score globally, so inside any
      // shortlist that contains it it stays top-3 exact — rerank recall
      // therefore dominates pure-ADC recall, structurally
      assert(rec("pq_rerank") >= rec("pq"),
        s"$dir: exact rerank of an ADC-superset shortlist cannot lose recall")
      // the production composition: cell-pruned + code-scored + exact
      // rerank (measured 0.67/0.33 at sf0.01/sf0.1 — tracks ivf at
      // small N; at 32k vectors the 32-deep ADC ordering inside the
      // probed cells drops some truth pairs, the honest IVFADC trade).
      assert(rec("ivfpq") >= 0.25, s"$dir: ivfpq recall ${rec("ivfpq")} < 0.25")
    }
  }
}
