package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic walk corpus: in-memory differential (same md5 draw,
  * no Spark), dead-end starts, and rerun stability. */
class WalksSpec extends SparkSpec {
  import spark.implicits._

  /** The reference walk: dst-sorted adjacency, draw =
    * first-8-hex-chars-of-md5("walkId:t") mod degree. */
  private def refWalks(edges: Seq[(Long, Long)], starts: Seq[Long],
      steps: Int): Set[(Long, Long, Long)] = {
    val adj = edges.distinct.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    starts.distinct.flatMap { w =>
      var node = w
      var alive = true
      (w, 0L, w) +: (1 to steps).flatMap { t =>
        if (!alive) Nil
        else adj.get(node) match {
          case None => alive = false; Nil
          case Some(ns) =>
            val draw = java.lang.Long.parseLong(md5hex(s"$w:$t").take(8), 16)
            node = ns((draw % ns.size).toInt)
            Seq((w, t.toLong, node))
        }
      }
    }.toSet
  }

  test("walks match the in-memory md5 reference") {
    val rnd = new Random(61)
    val edges = (for {
      i <- 0L until 30L; j <- 0L until 30L
      if i != j && rnd.nextDouble() < 0.12
    } yield (i, j)).toSeq
    val starts = Seq(0L, 3L, 7L, 11L, 28L)
    val got = Walks.deterministicWalks(
        edges.toDF("src", "dst"), starts.toDF("id"), steps = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === refWalks(edges, starts, 5))
  }

  test("a start with no outgoing edges emits only its step-0 row; reruns are identical") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val starts = Seq(1L, 99L) // 99 is not in the graph
    def run() = Walks.deterministicWalks(
        edges.toDF("src", "dst"), starts.toDF("id"), steps = 3)
      .as[(Long, Long, Long)].collect().toSet
    val got = run()
    assert(got.filter(_._1 == 99L) === Set((99L, 0L, 99L)))
    assert(got.count(_._1 == 1L) === 4, s"walk 1 must take all 3 steps: $got")
    assert(got === run(), "walks must be rerun-stable")
  }
}
