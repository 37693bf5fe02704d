package graft.streaming

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec
import graft.ops.Triangles
import org.apache.spark.sql.functions._

/** Streaming triangle ledger: per-epoch convergence to the batch
  * recount, replayed-edge and replayed-epoch idempotence, and edge
  * normalization. */
class GraphIngestSpec extends SparkSpec {
  import spark.implicits._

  private def counts(path: String): Map[Long, Long] =
    GraphIngest.currentCounts(spark, path)
      .as[(Long, Long)].collect().toMap

  private def batchCounts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNodeCounts(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("ledger converges to the batch recount after every epoch") {
    val ep = Files.createTempDirectory("gti_e").toString + "/edges"
    val cp = Files.createTempDirectory("gti_c").toString + "/counts"
    val rnd = new Random(13)
    val all = (for {
      i <- 0L until 40L; j <- i + 1 until 40L if rnd.nextDouble() < 0.2
    } yield (i, j)).toSeq
    val batches = all.grouped((all.size + 2) / 3).toSeq
    var sofar = Seq.empty[(Long, Long)]
    batches.zipWithIndex.foreach { case (b, i) =>
      GraphIngest.processEdgeBatch(b.toDF("id_a", "id_b"), ep, cp, i.toLong)
      sofar ++= b
      assert(counts(cp) === batchCounts(sofar), s"epoch $i diverged")
    }
    // replayed epoch: same batch id, same edges — ledger unchanged
    val before = counts(cp)
    GraphIngest.processEdgeBatch(batches.last.toDF("id_a", "id_b"), ep, cp,
      (batches.size - 1).toLong)
    assert(counts(cp) === before, "replayed epoch double-counted")
    // re-sent edges under a NEW batch id: anti-join drops them all,
    // the epoch writes nothing, the ledger is unchanged
    GraphIngest.processEdgeBatch(batches.head.toDF("id_a", "id_b"), ep, cp, 99L)
    assert(counts(cp) === before, "re-sent edges re-counted")
  }

  test("edges normalize on ingest (orientation, self-loops, duplicates)") {
    val ep = Files.createTempDirectory("gti_e2").toString + "/edges"
    val cp = Files.createTempDirectory("gti_c2").toString + "/counts"
    // a triangle sent reversed + duplicated + with a self-loop
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 1L), (2L, 3L), (4L, 4L))
    GraphIngest.processEdgeBatch(messy.toDF("id_a", "id_b"), ep, cp, 1L)
    assert(counts(cp) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(spark.read.parquet(ep).count() === 3L, "store must hold normalized edges")
  }
}
