package graft.streaming

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec
import graft.ops.Lpa
import org.apache.spark.sql.functions._

/** Streaming community ledger: per-epoch equality with the
  * deterministic warm-start fold over the standing store, replay
  * idempotence (in-order AND out-of-order), and the re-sent-edge
  * rule. */
class CommunityIngestSpec extends SparkSpec {
  import spark.implicits._

  private def labels(path: String): Map[Long, Long] =
    CommunityIngest.currentCommunities(spark, path)
      .select(col("node"), col("lbl")).as[(Long, Long)].collect().toMap

  test("ledger tracks the warm-start LPA fold over the standing store epoch by epoch") {
    val ep = Files.createTempDirectory("cmi_e").toString + "/edges"
    val lp = Files.createTempDirectory("cmi_l").toString + "/labels"
    val rnd = new Random(17)
    val all = (for {
      i <- 0L until 30L; j <- i + 1 until 30L if rnd.nextDouble() < 0.15
    } yield Seq((i, j), (j, i))).flatten
    val batches = all.grouped((all.size + 2) / 3).toSeq

    var sofar = Seq.empty[(Long, Long)]
    var truth = spark.emptyDataFrame.select(lit(0L).as("node"), lit(0L).as("lbl")).limit(0)
    batches.zipWithIndex.foreach { case (b, i) =>
      CommunityIngest.processEdgeBatch(b.toDF("src", "dst"), ep, lp, i.toLong, rounds = 2)
      sofar = (sofar ++ b).distinct
      truth = Lpa.warmStart(truth, sofar.toDF("src", "dst"), rounds = 2)
      val want = truth.select(col("node"), col("lbl")).as[(Long, Long)].collect().toMap
      assert(labels(lp) === want, s"epoch $i diverged from the warm-start fold")
    }

    // in-order replay of the newest epoch: identical snapshot, ledger unchanged
    val before = labels(lp)
    CommunityIngest.processEdgeBatch(batches.last.toDF("src", "dst"), ep, lp,
      (batches.size - 1).toLong, rounds = 2)
    assert(labels(lp) === before, "replayed epoch changed the snapshot")

    // re-sent edges under a NEW batch id: anti-join drops them all,
    // nothing written, snapshot stands
    CommunityIngest.processEdgeBatch(batches.head.toDF("src", "dst"), ep, lp,
      99L, rounds = 2)
    assert(labels(lp) === before, "re-sent edges advanced the labels")

    // OUT-OF-ORDER replay of a historical epoch: standing reads are
    // bounded batch_id < e, so epoch 1's snapshot is rewritten with
    // exactly its original content and later snapshots stand
    def snapshot(id: Long): Map[Long, Long] =
      spark.read.parquet(lp).filter(col("batch_id").cast("long") === id)
        .select(col("node"), col("lbl")).as[(Long, Long)].collect().toMap
    val snap1 = snapshot(1L)
    CommunityIngest.processEdgeBatch(batches(1).toDF("src", "dst"), ep, lp,
      1L, rounds = 2)
    assert(snapshot(1L) === snap1,
      "out-of-order replay of epoch 1 rewrote its snapshot with different content")
    assert(labels(lp) === before, "out-of-order replay disturbed the ledger head")
  }

  test("edges normalize on ingest (self-loops, duplicates) and store stays distinct") {
    val ep = Files.createTempDirectory("cmi_e2").toString + "/edges"
    val lp = Files.createTempDirectory("cmi_l2").toString + "/labels"
    val messy = Seq((1L, 2L), (1L, 2L), (2L, 1L), (3L, 3L))
    CommunityIngest.processEdgeBatch(messy.toDF("src", "dst"), ep, lp, 1L, rounds = 1)
    assert(spark.read.parquet(ep).count() === 2L, "store must hold distinct non-loop edges")
    // 1<->2, one round: each adopts the other's (identity) label, ties
    // to the smaller — both vote sets are singletons, so 1 takes 2's
    // label and 2 takes 1's
    assert(labels(lp) === Map(1L -> 2L, 2L -> 1L))
  }
}
