package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental CC: refresh == cold over random splits (including
  * multi-batch chains), plus the merge/new-node/internal-edge hand
  * fixtures. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cold(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("refresh equals the cold CC of the merged graph, batch after batch") {
    for (seed <- Seq(7, 41)) {
      val rnd = new Random(seed)
      val all = (for {
        i <- 0L until 60L; j <- i + 1 until 60L if rnd.nextDouble() < 0.03
      } yield (i, j)).toSeq
      val batches = all.grouped((all.size + 2) / 3).toSeq
      var standing = cold(batches.head)
      var sofar = batches.head
      batches.tail.foreach { b =>
        val refreshed = Components.refreshComponents(
            standing.toSeq.toDF("node", "label"), b.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
        sofar ++= b
        assert(refreshed === cold(sofar), s"seed=$seed diverged after a batch")
        standing = refreshed
      }
    }
  }

  test("hand fixtures: merge, internal edge, brand-new island") {
    // standing: {1,2} labeled 1, {5,6} labeled 5
    val standing = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))
      .toDF("node", "label")
    // batch: bridge 2-5 (merges to min label 1), internal 5-6 (no-op),
    // island 8-9 (new nodes, label 8)
    val batch = Seq((2L, 5L), (5L, 6L), (8L, 9L)).toDF("id_a", "id_b")
    val got = Components.refreshComponents(standing, batch)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L,
      8L -> 8L, 9L -> 8L), s"got: $got")
  }

  test("an all-internal batch changes nothing and invents no labels") {
    val standing = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("node", "label")
    val got = Components.refreshComponents(standing,
        Seq((2L, 3L), (3L, 1L)).toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
