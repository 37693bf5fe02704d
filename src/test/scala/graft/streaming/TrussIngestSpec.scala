package graft.streaming

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec
import graft.ops.KTruss
import org.apache.spark.sql.functions._

/** Streaming truss ledger: EXACT per-epoch convergence to the cold
  * peel over the standing store (the k-truss is unique and the
  * protected refresh reaches it), replay idempotence in and out of
  * order, and the re-sent-edge / canonicalization rules — the
  * CoreIngest contract lifted to edge supports. */
class TrussIngestSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3

  private def truss(path: String): Map[(Long, Long), Long] =
    TrussIngest.currentTruss(spark, path)
      .select(col("id_a"), col("id_b"), col("support"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap

  private def coldTruss(edges: Seq[(Long, Long)]): Map[(Long, Long), Long] =
    KTruss.truss(edges.toDF("id_a", "id_b"), K)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap

  test("ledger equals the cold peel over the stored edges after every epoch") {
    val ep = Files.createTempDirectory("tri_e").toString + "/edges"
    val tp = Files.createTempDirectory("tri_t").toString + "/truss"
    val rnd = new Random(31)
    val all = (for {
      i <- 0L until 30L; j <- i + 1 until 30L if rnd.nextDouble() < 0.2
    } yield (i, j)).toSeq
    val batches = all.grouped((all.size + 2) / 3).toSeq
    var sofar = Seq.empty[(Long, Long)]
    batches.zipWithIndex.foreach { case (b, i) =>
      TrussIngest.processEdgeBatch(b.toDF("id_a", "id_b"), ep, tp, i.toLong, K)
      sofar ++= b
      assert(truss(tp) === coldTruss(sofar), s"epoch $i diverged from the cold peel")
    }

    // in-order replay: identical snapshot, ledger unchanged
    val before = truss(tp)
    TrussIngest.processEdgeBatch(batches.last.toDF("id_a", "id_b"), ep, tp,
      (batches.size - 1).toLong, K)
    assert(truss(tp) === before, "replayed epoch changed the snapshot")

    // re-sent edges under a NEW batch id (flipped orientation —
    // canonicalization must catch them): nothing written
    val flipped = batches.head.map { case (a, b) => (b, a) }
    TrussIngest.processEdgeBatch(flipped.toDF("id_a", "id_b"), ep, tp, 99L, K)
    assert(truss(tp) === before, "re-sent (flipped) edges advanced the truss")

    // OUT-OF-ORDER replay of a historical epoch rewrites identically
    def snapshot(id: Long): Map[(Long, Long), Long] =
      spark.read.parquet(tp).filter(col("batch_id").cast("long") === id)
        .select(col("id_a"), col("id_b"), col("support"))
        .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val snap1 = snapshot(1L)
    TrussIngest.processEdgeBatch(batches(1).toDF("id_a", "id_b"), ep, tp, 1L, K)
    assert(snapshot(1L) === snap1,
      "out-of-order replay of epoch 1 rewrote its snapshot with different content")
    assert(truss(tp) === before, "out-of-order replay disturbed the ledger head")
  }

  test("a batch edge that closes a wedge promotes all three edges into the truss") {
    val ep = Files.createTempDirectory("tri_e2").toString + "/edges"
    val tp = Files.createTempDirectory("tri_t2").toString + "/truss"
    // epoch 0: open wedge — 3-truss empty
    TrussIngest.processEdgeBatch(Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b"),
      ep, tp, 0L, K)
    assert(truss(tp) === Map.empty)
    // epoch 1: the closing edge (sent flipped + with a self-loop —
    // canonicalization applies on ingest)
    TrussIngest.processEdgeBatch(Seq((3L, 2L), (2L, 2L)).toDF("id_a", "id_b"),
      ep, tp, 1L, K)
    assert(spark.read.parquet(ep).count() === 3L,
      "store must hold canonical distinct non-loop pairs")
    assert(truss(tp) ===
      Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 1L))
  }
}
