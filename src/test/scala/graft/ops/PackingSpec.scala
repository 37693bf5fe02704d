package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("pack: single shard lays out a concatenated stream, docs straddle") {
    // tokens: A=3, B=4, C=2 with seqLen 4 -> stream [A A A B][B B B C][C ...]
    val got = Packing.pack(
      docsOf((1L, "a b c"), (2L, "d e f g"), (3L, "h i")),
      seqLen = 4L, shards = 1)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("chunk_tokens"), r.getAs[Long]("start_tok"),
        r.getAs[Long]("seq_id"), r.getAs[Long]("seq_off")))
    assert(got === Array(
      (1L, 0L, 3L, 0L, 0L, 0L), // fills seq 0 positions 0..2
      (2L, 0L, 4L, 3L, 0L, 3L), // starts at seq 0 off 3, straddles into seq 1
      (3L, 0L, 2L, 7L, 1L, 3L)  // starts at seq 1 off 3
    ))
  }

  test("pack: a long doc splits into seqLen-bounded chunks") {
    // 10 tokens, seqLen 4 -> chunks of 4, 4, 2 at stream offsets 0, 4, 8
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val got = Packing.pack(docsOf((7L, text)), seqLen = 4L, shards = 1)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Long]("chunk_tokens"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("seq_id"), r.getAs[Long]("seq_off")))
    assert(got === Array((0L, 4L, 0L, 0L, 0L), (1L, 4L, 4L, 1L, 0L), (2L, 2L, 8L, 2L, 0L)))
  }

  test("pack: sharding is deterministic and covers every doc exactly once per chunk") {
    val docs = docsOf((1L to 40L).map(i => (i, s"w$i x y")): _*)
    val a = Packing.pack(docs, seqLen = 8L, shards = 4).collect()
    val b = Packing.pack(docs, seqLen = 8L, shards = 4).collect()
    assert(a.map(_.toString).sorted === b.map(_.toString).sorted) // rerun-stable
    assert(a.map(_.getAs[Long]("doc_id")).sorted === (1L to 40L).toArray) // 3 tokens < 8: one chunk each
    assert(a.map(_.getAs[Long]("shard")).distinct.sorted.forall(s => s >= 0 && s < 4))
    // within each shard, offsets are a gapless prefix-sum of chunk sizes
    a.groupBy(_.getAs[Long]("shard")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("start_tok"))
      val expectStarts = sorted.map(_.getAs[Long]("chunk_tokens")).scanLeft(0L)(_ + _).init
      assert(sorted.map(_.getAs[Long]("start_tok")).toSeq === expectStarts.toSeq)
    }
  }

  test("pack matches an independent sequential reference on random corpora") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 3) {
      val seqLen = 1L + rnd.nextInt(9)
      val shards = 1 + rnd.nextInt(4)
      val rows = (1L to 50L).map(i =>
        (i, Seq.fill(rnd.nextInt(25))("w" + rnd.nextInt(3)).mkString(" ")))
      // reference: same 32-bit md5 bucket (hashBucket32 — the 256-bucket
      // hash would skew/empty non-divisor shard counts), chunks laid out
      // sequentially per shard
      val expected = rows.map { case (id, text) =>
        val bucket = java.lang.Long.parseLong(md5hex(id.toString).substring(0, 8), 16)
        (id, bucket % shards, text.split(" ", -1).length.toLong)
      }.groupBy(_._2).flatMap { case (shard, docs) =>
        var off = 0L
        docs.sortBy(_._1).flatMap { case (id, _, n) =>
          val chunks = (0L until math.max(1L, (n + seqLen - 1) / seqLen)).map { ci =>
            val ct = math.min(seqLen, n - ci * seqLen)
            val r = ((id, ci), (shard, ct, off, off / seqLen, off % seqLen))
            off += ct
            r
          }
          chunks
        }
      }
      val got = Packing.pack(rows.toDF("doc_id", "text"), seqLen, shards).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx")) ->
          ((r.getAs[Long]("shard"), r.getAs[Long]("chunk_tokens"),
            r.getAs[Long]("start_tok"), r.getAs[Long]("seq_id"),
            r.getAs[Long]("seq_off")))).toMap
      assert(got === expected.toMap, s"trial $trial seqLen=$seqLen shards=$shards")
    }
  }

  test("packStats: every sequence except the shard tail is full") {
    // 6 docs x 4 tokens, one shard, seqLen 8 -> 3 sequences, 2 chunks start in each
    val docs = docsOf((1L to 6L).map(i => (i, "a b c d")): _*)
    val stats = Packing.packStats(Packing.pack(docs, seqLen = 8L, shards = 1))
      .orderBy("seq_id").collect()
    assert(stats.map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("n_chunks_starting"),
      r.getAs[Long]("tokens_started_here"))).toSeq ===
      Seq((0L, 2L, 8L), (1L, 2L, 8L), (2L, 2L, 8L)))
  }
}
