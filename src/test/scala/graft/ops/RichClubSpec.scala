package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Rich-club profile: in-memory differential on random graphs plus
  * closed forms (clique oligarchy, star anti-club). */
class RichClubSpec extends SparkSpec {
  import spark.implicits._

  private def ref(edges: Seq[(Long, Long)], ks: Seq[Long])
      : Map[Long, (Long, Long, Option[Double])] = {
    val deg = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    ks.map { k =>
      val club = deg.filter(_._2 > k).keySet
      val n = club.size.toLong
      val ee = edges.count { case (a, b) => club(a) && club(b) }.toLong
      k -> (n, ee,
        if (n >= 2) Some(2.0 * ee / (n * (n - 1)).toDouble) else None)
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)], ks: Seq[Long])
      : Map[Long, (Long, Long, Option[Double])] =
    RichClub.profile(edges.toDF("id_a", "id_b"), ks)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap

  test("profile matches the in-memory reference on random graphs") {
    for (seed <- Seq(3, 31)) {
      val rnd = new Random(seed)
      val edges = (for {
        i <- 0L until 30L; j <- i + 1 until 30L if rnd.nextDouble() < 0.15
      } yield (i, j)).toSeq
      val ks = Seq(1L, 2L, 4L, 8L)
      assert(run(edges, ks) === ref(edges, ks), s"seed=$seed")
    }
  }

  test("closed forms: a clique-with-whiskers rich club is complete; a star has no club") {
    // K4 on {0..3} (each deg 3 + a whisker each -> deg 4), whisker
    // tips deg 1: at k = 2 the club is the K4 and phi = 1.0
    val k4 = for (i <- 0L to 3L; j <- i + 1 to 3L) yield (i, j)
    val edges = k4 ++ (0L to 3L).map(i => (i, i + 10L))
    val got = run(edges, Seq(2L, 4L))
    assert(got(2L) === ((4L, 6L, Some(1.0))), s"got: $got")
    assert(got(4L) === ((0L, 0L, None)), "empty club must be NULL, not 0-dense")
    // star: the hub alone can't form a club — phi undefined at every k
    val star = (1L to 5L).map(i => (0L, i))
    assert(run(star, Seq(1L)).apply(1L) === ((1L, 0L, None)))
  }
}
