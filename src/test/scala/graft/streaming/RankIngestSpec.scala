package graft.streaming

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec
import graft.ops.PageRank
import org.apache.spark.sql.functions._

/** Streaming rank ledger: per-epoch convergence to the warm-start fold
  * over the accumulated edge store, replay idempotence, the re-sent-
  * edge rule, and quiescent refinement. */
class RankIngestSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(path: String): Map[Long, Long] =
    RankIngest.currentRanks(spark, path)
      .select(col("id"), col("pr")).as[(Long, Long)].collect().toMap

  test("ledger tracks the warm-start fold over the standing store epoch by epoch") {
    val ep = Files.createTempDirectory("rki_e").toString + "/edges"
    val rp = Files.createTempDirectory("rki_r").toString + "/ranks"
    val rnd = new Random(29)
    val all = (for {
      i <- 0L until 30L; j <- i + 1 until 30L if rnd.nextDouble() < 0.2
    } yield Seq((i, j), (j, i))).flatten
    val batches = all.grouped((all.size + 2) / 3).toSeq

    // ground truth maintained in-spec: the same warmStart fold over
    // the accumulated edge list — what the store plumbing must equal
    var sofar = Seq.empty[(Long, Long)]
    var truth = spark.emptyDataFrame.select(lit(0L).as("id"), lit(0L).as("pr")).limit(0)
    batches.zipWithIndex.foreach { case (b, i) =>
      RankIngest.processEdgeBatch(b.toDF("src", "dst"), ep, rp, i.toLong, rounds = 2)
      sofar = (sofar ++ b).distinct
      truth = PageRank.warmStart(truth, sofar.toDF("src", "dst"), rounds = 2)
      val want = truth.select(col("id"), col("pr")).as[(Long, Long)].collect().toMap
      assert(ranks(rp) === want, s"epoch $i diverged from the warm-start fold")
    }

    // replayed epoch: same batch id re-seeds from the snapshot BEFORE
    // it and recomputes the identical ranks — ledger unchanged
    val before = ranks(rp)
    RankIngest.processEdgeBatch(batches.last.toDF("src", "dst"), ep, rp,
      (batches.size - 1).toLong, rounds = 2)
    assert(ranks(rp) === before, "replayed epoch changed the snapshot")

    // re-sent edges under a NEW batch id: anti-join drops them all,
    // nothing is written, the snapshot stands
    RankIngest.processEdgeBatch(batches.head.toDF("src", "dst"), ep, rp, 99L, rounds = 2)
    assert(ranks(rp) === before, "re-sent edges advanced the ranks")

    // quiescent refinement: equals iterating the op directly from the
    // standing snapshot over the full graph
    val want = PageRank.warmStart(
        before.toSeq.toDF("id", "pr"), sofar.toDF("src", "dst"), rounds = 2)
      .select(col("id"), col("pr")).as[(Long, Long)].collect().toMap
    RankIngest.refine(spark, ep, rp, batchId = 100L, rounds = 2)
    assert(ranks(rp) === want, "refine diverged from the direct warm iterate")
  }

  test("OUT-OF-ORDER replay rewrites a historical snapshot identically") {
    // epoch e's standing reads are bounded batch_id < e, so replaying
    // e after e+1 committed must not absorb e+1's edges into e's
    // recomputed snapshot — historical snapshots are replay-stable,
    // not just the newest one
    val ep = Files.createTempDirectory("rki_e3").toString + "/edges"
    val rp = Files.createTempDirectory("rki_r3").toString + "/ranks"
    val batches = Seq(
      Seq((1L, 2L), (2L, 1L)),
      Seq((2L, 3L), (3L, 2L)),
      Seq((3L, 4L), (4L, 3L)))
    batches.zipWithIndex.foreach { case (b, i) =>
      RankIngest.processEdgeBatch(b.toDF("src", "dst"), ep, rp, i.toLong, rounds = 2)
    }
    def snapshot(id: Long): Map[Long, Long] =
      spark.read.parquet(rp).filter(col("batch_id").cast("long") === id)
        .select(col("id"), col("pr")).as[(Long, Long)].collect().toMap
    val snap1 = snapshot(1L)
    val cur = ranks(rp)
    RankIngest.processEdgeBatch(batches(1).toDF("src", "dst"), ep, rp, 1L, rounds = 2)
    assert(snapshot(1L) === snap1,
      "out-of-order replay of epoch 1 rewrote its snapshot with different content")
    assert(ranks(rp) === cur, "out-of-order replay disturbed the ledger head")
  }

  test("edges normalize on ingest (self-loops, duplicates) and store stays distinct") {
    val ep = Files.createTempDirectory("rki_e2").toString + "/edges"
    val rp = Files.createTempDirectory("rki_r2").toString + "/ranks"
    val messy = Seq((1L, 2L), (1L, 2L), (2L, 1L), (3L, 3L))
    RankIngest.processEdgeBatch(messy.toDF("src", "dst"), ep, rp, 1L, rounds = 1)
    assert(spark.read.parquet(ep).count() === 2L, "store must hold distinct non-loop edges")
    // 1<->2: deg 1 each, seed 10⁶ -> pr = 150000 + 850000 = 1000000
    assert(ranks(rp) === Map(1L -> 1000000L, 2L -> 1000000L))
  }
}
