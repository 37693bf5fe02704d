package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Degree assortativity: in-JVM differential (exact sums AND the IEEE
  * formula), the star's disassortativity, and the regular-graph NULL. */
class AssortativitySpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]) = {
    val r = Assortativity.degreeAssortativity(edges.toDF("id_a", "id_b")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), if (r.isNullAt(6)) None else Some(r.getDouble(6)))
  }

  private def ref(edges: Seq[(Long, Long)]) = {
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val dir = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val xs = dir.map(e => deg(e._1)); val ys = dir.map(e => deg(e._2))
    val m = dir.size.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val (sxx, syy) = (xs.map(x => x * x).sum, ys.map(y => y * y).sum)
    val (vx, vy) = (m * sxx - sx * sx, m * syy - sy * sy)
    val r = if (vx == 0L || vy == 0L) None
      else Some((m * sxy - sx * sy).toDouble /
        (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble)))
    (m, sx, sy, sxy, sxx, syy, r)
  }

  test("matches the in-JVM moments and formula on random graphs") {
    for (seed <- Seq(7, 18)) {
      val rnd = new Random(seed)
      val edges = (for {
        i <- 0L until 40L; j <- i + 1 until 40L if rnd.nextDouble() < 0.08
      } yield (i, j)).toSeq
      assert(run(edges) === ref(edges), s"seed $seed diverged")
    }
  }

  test("a star is disassortative; a cycle (regular) has NULL r") {
    val star = (1L to 8L).map(i => (0L, i))
    val got = run(star)
    assert(got === ref(star))
    assert(got._7.exists(_ < -0.99), s"star should be maximally disassortative: $got")
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L))
    assert(run(cycle)._7 === None, "degree-regular graph must yield NULL, not NaN")
  }
}
