package graft.streaming

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec
import graft.ops.KCore
import org.apache.spark.sql.functions._

/** Streaming core ledger: EXACT per-epoch convergence to the cold peel
  * over the standing store (the k-core is unique and the protected
  * refresh reaches it), replay idempotence in and out of order, and
  * the re-sent-edge / canonicalization rules. */
class CoreIngestSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3

  private def core(path: String): Map[Long, Long] =
    CoreIngest.currentCore(spark, path)
      .select(col("node_id"), col("core_deg")).as[(Long, Long)].collect().toMap

  private def coldCore(edges: Seq[(Long, Long)]): Map[Long, Long] =
    KCore.core(edges.toDF("id_a", "id_b"), K)
      .select(col("node_id"), col("core_deg")).as[(Long, Long)].collect().toMap

  test("ledger equals the cold peel over the stored edges after every epoch") {
    val ep = Files.createTempDirectory("coi_e").toString + "/edges"
    val cp = Files.createTempDirectory("coi_c").toString + "/core"
    val rnd = new Random(23)
    val all = (for {
      i <- 0L until 40L; j <- i + 1 until 40L if rnd.nextDouble() < 0.12
    } yield (i, j)).toSeq
    val batches = all.grouped((all.size + 2) / 3).toSeq
    var sofar = Seq.empty[(Long, Long)]
    batches.zipWithIndex.foreach { case (b, i) =>
      CoreIngest.processEdgeBatch(b.toDF("id_a", "id_b"), ep, cp, i.toLong, K)
      sofar ++= b
      assert(core(cp) === coldCore(sofar), s"epoch $i diverged from the cold peel")
    }

    // in-order replay: identical snapshot, ledger unchanged
    val before = core(cp)
    CoreIngest.processEdgeBatch(batches.last.toDF("id_a", "id_b"), ep, cp,
      (batches.size - 1).toLong, K)
    assert(core(cp) === before, "replayed epoch changed the snapshot")

    // re-sent edges under a NEW batch id (including flipped
    // orientation — canonicalization must catch them): nothing written
    val flipped = batches.head.map { case (a, b) => (b, a) }
    CoreIngest.processEdgeBatch(flipped.toDF("id_a", "id_b"), ep, cp, 99L, K)
    assert(core(cp) === before, "re-sent (flipped) edges advanced the core")

    // OUT-OF-ORDER replay of a historical epoch: standing reads are
    // bounded batch_id < e, so epoch 1's snapshot rewrites identically
    def snapshot(id: Long): Map[Long, Long] =
      spark.read.parquet(cp).filter(col("batch_id").cast("long") === id)
        .select(col("node_id"), col("core_deg")).as[(Long, Long)].collect().toMap
    val snap1 = snapshot(1L)
    CoreIngest.processEdgeBatch(batches(1).toDF("id_a", "id_b"), ep, cp, 1L, K)
    assert(snapshot(1L) === snap1,
      "out-of-order replay of epoch 1 rewrote its snapshot with different content")
    assert(core(cp) === before, "out-of-order replay disturbed the ledger head")
  }

  test("edges canonicalize on ingest (orientation, self-loops, duplicates)") {
    val ep = Files.createTempDirectory("coi_e2").toString + "/edges"
    val cp = Files.createTempDirectory("coi_c2").toString + "/core"
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 2L), (1L, 3L), (2L, 3L))
    CoreIngest.processEdgeBatch(messy.toDF("id_a", "id_b"), ep, cp, 1L, 2)
    assert(spark.read.parquet(ep).count() === 3L,
      "store must hold canonical distinct non-loop pairs")
    // triangle 1-2-3: every node is in the 2-core with degree 2
    assert(core(cp) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }
}
