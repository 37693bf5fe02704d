package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Motif census: brute-force differential on random graphs plus
  * closed-form fixtures (clique, cycle, star). */
class MotifsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute force, no identities: enumerate wedges, triangles, and
    * 4-cycles directly. */
  private def ref(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
    val canon = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }.toSet
    val nbrs = canon.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = nbrs.keys.toSeq
    val wedges = nodes.map { v => val d = nbrs(v).size.toLong; d * (d - 1) / 2 }.sum
    // count(), never `for { c <- aSet } yield 1L` — a Set generator
    // DEDUPS the yielded 1s to a single element per edge (caught live:
    // the comprehension reported #edges-with-a-triangle, not
    // #triangles)
    val tris = canon.toSeq
      .map { case (a, b) => nbrs(a).count(c => c > b && nbrs(b)(c)).toLong }.sum
    // independent 4-cycle brute: ordered closed 4-walks on distinct
    // nodes, divided by the 8 symmetries (4 rotations x 2 directions)
    val cycles = (for {
      a <- nodes; b <- nodes if b != a && nbrs(a)(b)
      c <- nodes if c != a && c != b && nbrs(b)(c)
      d <- nodes if d != a && d != b && d != c && nbrs(c)(d) && nbrs(d)(a)
    } yield 1L).sum / 8
    (nodes.size.toLong, canon.size.toLong, wedges, tris, cycles)
  }

  private def run(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
    val r = Motifs.census(edges.toDF("id_a", "id_b")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("census matches the brute-force enumeration on random graphs") {
    for (seed <- Seq(5, 29)) {
      val rnd = new Random(seed)
      val edges = (for {
        i <- 0L until 20L; j <- i + 1 until 20L if rnd.nextDouble() < 0.25
      } yield (i, j)).toSeq
      assert(run(edges) === ref(edges), s"seed=$seed")
    }
  }

  test("closed forms: K5, C6, and a star") {
    // K5: C(5,2)=10 edges, wedges 5*C(4,2)=30, triangles C(5,3)=10,
    // 4-cycles 3*C(5,4)=15 (each 4-subset holds 3 cycles)
    val k5 = for (i <- 0L to 4L; j <- i + 1 to 4L) yield (i, j)
    assert(run(k5) === (5L, 10L, 30L, 10L, 15L))
    // C6 hexagon: 6 wedges, 0 triangles, 0 four-cycles
    val c6 = (0L to 5L).map(i => (i, (i + 1) % 6)).map {
      case (a, b) => (math.min(a, b), math.max(a, b)) }
    assert(run(c6) === (6L, 6L, 6L, 0L, 0L))
    // star K1,4: wedges C(4,2)=6, nothing closed
    val star = (1L to 4L).map(i => (0L, i))
    assert(run(star) === (5L, 4L, 6L, 0L, 0L))
  }
}
