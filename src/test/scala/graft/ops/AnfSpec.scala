package graft.ops

import scala.util.Random

import graft.SparkSpec

/** ANF/HyperBall: estimates against the exact in-memory neighborhood
  * function on random graphs (HLL at these ball sizes runs in sparse
  * mode, so the envelope is tight), plus closed-form fixtures. */
class AnfSpec extends SparkSpec {
  import spark.implicits._

  /** Exact N(h): per node BFS ball sizes, summed. */
  private def exactNf(edges: Seq[(Long, Long)], maxHop: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    (1 to maxHop).map { h =>
      val total = nodes.map { s =>
        var ball = Set(s)
        var frontier = Set(s)
        for (_ <- 1 to h) {
          frontier = frontier.flatMap(v => adj.getOrElse(v, Nil)) -- ball
          ball ++= frontier
        }
        ball.size.toLong
      }.sum
      h.toLong -> total
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)], maxHop: Int): Map[Long, Long] =
    Anf.neighborhoodFunction(edges.toDF("src", "dst"), maxHop)
      .as[(Long, Long)].collect().toMap

  test("estimates track the exact neighborhood function within the HLL envelope") {
    for (seed <- Seq(7, 37)) {
      val rnd = new Random(seed)
      val edges = (for {
        i <- 0L until 60L; j <- 0L until 60L
        if i != j && rnd.nextDouble() < 0.05
      } yield (i, j)).toSeq
      val est = run(edges, maxHop = 3)
      val exact = exactNf(edges, maxHop = 3)
      for (h <- 1L to 3L) {
        val e = exact(h).toDouble
        assert(math.abs(est(h) - e) <= math.max(e * 0.10, 10.0),
          s"seed=$seed hop=$h est=${est(h)} exact=${exact(h)}")
      }
      // N(h) is monotone in h
      assert(est(1L) <= est(2L) && est(2L) <= est(3L))
    }
  }

  test("closed forms: a directed chain's balls telescope; an isolated pair stalls") {
    // chain 0 -> 1 -> 2 -> 3: N(1) = 4 + 3 reached = 7; N(2) = 4+3+2 = 9;
    // N(3) = 4+3+2+1 = 10 (small sets — HLL sparse mode is exact here)
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    assert(run(chain, 3) === Map(1L -> 7L, 2L -> 9L, 3L -> 10L))
    // two disconnected dyads: N(h) fixed at 4 nodes + 2 reached = 6
    val dyads = Seq((0L, 1L), (5L, 6L))
    assert(run(dyads, 2) === Map(1L -> 6L, 2L -> 6L))
  }
}
