package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "s1", 43L),
    (2L, "the quick brown fox jumps over the lazy dog", "s1", 43L), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat", "s1", 43L), // near dup of 1
    (4L, "completely different words here entirely now", "s2", 45L),
    (5L, "a b", "s2", 3L) // < 3 tokens: no shingles
  ).toDF("doc_id", "text", "source", "n_chars")

  test("exact dedup groups identical texts, keeps min doc_id") {
    val got = Dedup.exact(docs).collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(got(1L) === 2L) // docs 1+2 collapse
    assert(got(3L) === 1L)
    assert(got.values.sum === 5L)
  }

  test("minhash: identical docs always pair; short docs drop out") {
    val sigs = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(sigs === Set(1L, 2L, 3L, 4L)) // doc 5 has < 3 tokens
    val pairs = Dedup.minhashCandidatePairs(docs).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L))) // identical => all 4 bands agree
  }

  test("simhash: identical docs get identical signatures") {
    val got = Dedup.simhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(got(1L) === got(2L))
    assert(got.values.forall(v => v >= 0 && v < (1L << 16)))
  }

  test("jaccard: identical docs = 1.0 within blocking") {
    val got = Dedup.ngramJaccardPairs(docs).collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")), r.getAs[Double]("jaccard"))).toMap
    assert(got((1L, 2L)) === 1.0)
    // 1 vs 3: tokens distinct sets {the,quick,brown,fox,jumps,over,lazy,dog/cat}
    // |A|=|B|=8, inter=7, union=9
    assert(math.abs(got((1L, 3L)) - 7.0 / 9.0) < 1e-15)
  }

  test("degenerate hot bucket is capped: pair count bounded by maxBucket^2, not m^2") {
    // 50 identical docs land in ONE (band, h) bucket on every band.
    // Uncapped that is 50*49/2 = 1225 pairs; maxBucket=8 bounds it to
    // 8*7/2 = 28 (the 8 smallest doc_ids), deterministically.
    val hot = (1L to 50L).map(i => (i, "same text repeated again and again", "s", 34L))
      .toDF("doc_id", "text", "source", "n_chars")
    val pairs = Dedup.minhashCandidatePairs(hot, maxBucket = 8).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.size === 28)
    assert(pairs.forall { case (a, b) => a < b && a <= 8 && b <= 8 })
    // Same bound flows through the jaccard scorer (candidates are shared).
    val j = Dedup.ngramJaccardPairs(hot, maxBucket = 8).collect()
    assert(j.length === 28 && j.forall(_.getAs[Double]("jaccard") === 1.0))
    // And the embedding block cap: one hot label, maxBlock=4 -> 6 pairs.
    val emb = (1L to 20L).map(i => (i, Array(1.0f, 2.0f, 3.0f), 7)).toDF("vec_id", "embedding", "label")
    val nd = Similarity.nearDupPairs(emb, threshold = 0.0, maxBlock = 4).collect()
    assert(nd.length === 6)
    assert(nd.forall(r => r.getAs[Long]("id_a") <= 4 && r.getAs[Long]("id_b") <= 4))
  }

  test("text ops: stats, quality, langid, fingerprint") {
    val one = Seq((1L, "the cat and the hat", "en", "s", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val stats = TextOps.tokenStats(one).head()
    assert(stats.getAs[Int]("n_tokens") === 5)
    assert(stats.getAs[Int]("n_unique") === 4)
    val q = TextOps.quality(one).head()
    assert(q.getAs[Int]("n_stop") === 3) // the, and, the
    assert(q.getAs[Double]("stop_ratio") === 0.6)
    assert(q.getAs[Double]("mean_tok_len") === 3.0) // (3+3+3+3+3)/5
    val l = TextOps.langId(one).head()
    assert(l.getAs[String]("lang_guess") === "en")
    val fp = TextOps.fingerprint(one).head()
    assert(fp.getAs[String]("fp").length === 16)
    assert(fp.getAs[String]("min_shingle_fp") !== null)
  }

  test("similarity: identical vectors rank first with score 1") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (100L, Array(1.0f, 0.0f, 0.0f), 0), // identical to 0
      (2L, Array(0.0f, 1.0f, 0.0f), 0),
      (3L, Array(-1.0f, 0.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val top = Similarity.bruteForceTopK(emb, k = 3, queryStride = 100).collect()
      .filter(_.getAs[Long]("q_id") == 0L).sortBy(_.getAs[Int]("rank"))
    assert(top.head.getAs[Long]("c_id") === 100L)
    assert(top.head.getAs[Double]("score") === 1.0)
    assert(top.last.getAs[Double]("score") === -1.0)
    val ivf = Similarity.ivfTopK(emb, k = 3, queryStride = 100)
    assert(ivf.count() > 0)
    val pairs = Similarity.nearDupPairs(emb, threshold = 0.99).collect()
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 0L && r.getAs[Long]("id_b") == 100L))
    // LSH sub-bucket variant: identical vectors share the sign bucket,
    // so the pair survives; the opposite-sign vector 3 cannot pair with 0
    val lsh = Similarity.nearDupPairsLsh(emb, threshold = -1.0).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(lsh.contains((0L, 100L)))
    assert(!lsh.contains((0L, 3L)))
  }
}
