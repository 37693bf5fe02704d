package graft.streaming

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec
import graft.ops.Reachability
import org.apache.spark.sql.functions._

/** Streaming reachability ledger: EXACT per-epoch convergence to the
  * cold BFS over the standing store (monotone insert-only arrival),
  * replay idempotence, and the re-sent-edge rule. */
class ReachIngestSpec extends SparkSpec {
  import spark.implicits._

  private def hops(path: String): Map[Long, Long] =
    ReachIngest.currentHops(spark, path)
      .select(col("id"), col("hop")).as[(Long, Long)].collect().toMap

  private def coldHops(edges: Seq[(Long, Long)], seeds: Seq[Long]): Map[Long, Long] =
    Reachability.hops(edges.toDF("src", "dst"), seeds.toDF("id"), maxHop = 3)
      .select(col("id"), col("hop")).as[(Long, Long)].collect().toMap

  test("ledger equals the cold BFS over the stored edges after every epoch") {
    val ep = Files.createTempDirectory("rci_e").toString + "/edges"
    val hp = Files.createTempDirectory("rci_h").toString + "/hops"
    val seeds = Seq(0L, 7L)
    val rnd = new Random(41)
    val all = (for {
      i <- 0L until 40L; j <- i + 1 until 40L if rnd.nextDouble() < 0.05
    } yield Seq((i, j), (j, i))).flatten
    val batches = all.grouped((all.size + 3) / 4).toSeq
    var sofar = Seq.empty[(Long, Long)]
    batches.zipWithIndex.foreach { case (b, i) =>
      ReachIngest.processEdgeBatch(b.toDF("src", "dst"), seeds.toDF("id"),
        ep, hp, i.toLong, maxHop = 3)
      sofar ++= b
      assert(hops(hp) === coldHops(sofar, seeds), s"epoch $i diverged from cold BFS")
    }

    // replayed epoch: identical snapshot, ledger unchanged
    val before = hops(hp)
    ReachIngest.processEdgeBatch(batches.last.toDF("src", "dst"), seeds.toDF("id"),
      ep, hp, (batches.size - 1).toLong, maxHop = 3)
    assert(hops(hp) === before, "replayed epoch changed the snapshot")

    // re-sent edges under a NEW batch id: dropped by the anti-join,
    // nothing written, snapshot stands
    ReachIngest.processEdgeBatch(batches.head.toDF("src", "dst"), seeds.toDF("id"),
      ep, hp, 99L, maxHop = 3)
    assert(hops(hp) === before, "re-sent edges advanced the labels")

    // OUT-OF-ORDER replay of a historical epoch: standing reads are
    // bounded batch_id < e, so epoch 1's snapshot is recomputed from
    // exactly the state it saw the first time — rewritten identically,
    // later snapshots untouched
    def snapshot(id: Long): Map[Long, Long] =
      spark.read.parquet(hp).filter(col("batch_id").cast("long") === id)
        .select(col("id"), col("hop")).as[(Long, Long)].collect().toMap
    val snap1 = snapshot(1L)
    ReachIngest.processEdgeBatch(batches(1).toDF("src", "dst"), seeds.toDF("id"),
      ep, hp, 1L, maxHop = 3)
    assert(snapshot(1L) === snap1,
      "out-of-order replay of epoch 1 rewrote its snapshot with different content")
    assert(hops(hp) === before, "out-of-order replay disturbed the ledger head")
  }
}
