package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.Drift
import org.apache.spark.sql.functions._

/** Streaming drift ledger: per-epoch L1 equals the batch-vs-standing
  * Drift summary, the first batch writes counts but no baseline-less
  * drift row, counts stay additive under replay (in and out of
  * order). */
class DriftIngestSpec extends SparkSpec {
  import spark.implicits._

  private def history(path: String): Map[Long, (Long, Long, Long, Long)] =
    DriftIngest.driftHistory(spark, path)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  private def counts(path: String): Map[String, Long] =
    DriftIngest.currentCounts(spark, path)
      .as[(String, Long)].collect().toMap

  test("per-epoch drift rows equal the op's batch-vs-standing summary") {
    val cp = Files.createTempDirectory("dri_c").toString + "/counts"
    val dp = Files.createTempDirectory("dri_d").toString + "/drift"
    val batches = Seq(
      Seq("a", "a", "b", "c"),
      Seq("a", "b", "b", "b"),
      Seq("d", "d", "d", "a"))
    var sofar = Seq.empty[String]
    batches.zipWithIndex.foreach { case (b, i) =>
      DriftIngest.processBatch(b.toDF("k"), col("k"), cp, dp, i.toLong)
      if (i > 0) {
        val want = Drift.l1Summary(
            sofar.groupBy(identity).view.mapValues(_.size.toLong).toSeq
              .toDF("key", "cnt_a"),
            b.groupBy(identity).view.mapValues(_.size.toLong).toSeq
              .toDF("key", "cnt_b"))
          .collect().head
        assert(history(dp)(i.toLong) ===
          (want.getLong(0), want.getLong(1), want.getLong(2), want.getLong(3)),
          s"epoch $i drift row diverged from the op summary")
      }
      sofar ++= b
      assert(counts(cp) ===
        sofar.groupBy(identity).view.mapValues(_.size.toLong).toMap,
        s"epoch $i standing counts diverged")
    }
    assert(!history(dp).contains(0L), "first epoch must not write a baseline-less drift row")

    // replay of epoch 1 (out of order, after epoch 2): counts must not
    // double, and the historical drift row rewrites identically
    val h1 = history(dp)(1L)
    val c = counts(cp)
    DriftIngest.processBatch(batches(1).toDF("k"), col("k"), cp, dp, 1L)
    assert(counts(cp) === c, "replayed epoch double-counted the distribution")
    assert(history(dp)(1L) === h1, "out-of-order replay rewrote epoch 1's drift row differently")

    // empty batch: nothing written
    DriftIngest.processBatch(Seq.empty[String].toDF("k"), col("k"), cp, dp, 9L)
    assert(counts(cp) === c && !history(dp).contains(9L), "empty batch wrote state")
  }
}
