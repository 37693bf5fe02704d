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
}
