package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Link-prediction features: in-memory differential of the capped
  * wedge semantics on random graphs, a closed-form hand fixture, the
  * existing-edge exclusion, and the hub cap. */
class LinkPredictionSpec extends SparkSpec {
  import spark.implicits._

  /** Same definition, no Spark: candidates + features both through
    * centers of degree <= cap; jaccard over TRUE degrees. */
  private def ref(edges: Seq[(Long, Long)], cap: Long)
      : Map[(Long, Long), (Long, Long, Long, Long)] = {
    val canon = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }.toSet
    val nbrs = canon.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = nbrs.view.mapValues(_.size.toLong).toMap
    val pairs = for {
      (z, ns) <- nbrs.toSeq if deg(z) <= cap
      u <- ns; w <- ns if u < w && !canon((u, w))
    } yield (u, w, z)
    pairs.groupBy(p => (p._1, p._2)).map { case ((u, w), zs) =>
      val cn = zs.size.toLong
      val ra = zs.map(p => 1000000L / deg(p._3)).sum
      (u, w) -> (cn, ra, deg(u) * deg(w),
        cn * 1000000L / (deg(u) + deg(w) - cn))
    }
  }

  private def run(edges: Seq[(Long, Long)], cap: Long)
      : Map[(Long, Long), (Long, Long, Long, Long)] =
    LinkPrediction.features(edges.toDF("id_a", "id_b"), cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

  test("features match the in-memory reference on random graphs, capped and not") {
    for (seed <- Seq(7, 23); cap <- Seq(3L, 100L)) {
      val rnd = new Random(seed)
      val edges = (for {
        i <- 0L until 30L; j <- i + 1 until 30L if rnd.nextDouble() < 0.12
      } yield (i, j)).toSeq
      assert(run(edges, cap) === ref(edges, cap), s"seed=$seed cap=$cap")
    }
  }

  test("path fixture: endpoints of a 2-path are the one candidate, with exact indices") {
    // 0 - 1 - 2: candidate (0,2) through center 1 (deg 2);
    // cn=1, ra=500000, pa=1*1=1, jaccard=1e6/(1+1-1)=1000000
    assert(run(Seq((0L, 1L), (1L, 2L)), cap = 10L) ===
      Map((0L, 2L) -> (1L, 500000L, 1L, 1000000L)))
    // close the triangle: (0,2) is now an edge — no candidates at all
    assert(run(Seq((0L, 1L), (1L, 2L), (0L, 2L)), cap = 10L) === Map.empty)
  }

  test("hub cap removes wedges through the hub but keeps true degrees in jaccard") {
    // star center 9 (deg 3) + path 1-2: with cap 2 the star's wedges
    // vanish; (1,3)-type pairs survive only via permitted centers
    val edges = Seq((1L, 9L), (2L, 9L), (3L, 9L), (1L, 2L))
    val capped = run(edges, cap = 2L)
    // center 1 (deg 2) gives wedge (2,9); center 2 (deg 2) gives (1,9)
    // — but both are existing edges, so nothing survives; center 9 is
    // capped so (1,2)/(1,3)/(2,3) wedges never form
    assert(capped === Map.empty, s"capped: $capped")
    val full = run(edges, cap = 10L)
    assert(full.contains((1L, 3L)) && full.contains((2L, 3L)), s"full: $full")
    // jaccard of (1,3): cn=1 (center 9), deg(1)=2, deg(3)=1 -> 1e6/2
    assert(full((1L, 3L)) === (1L, 333333L, 2L, 500000L))
  }

  test("refreshFeatures equals the cold features of the merged graph (random splits)") {
    // caps chosen to EXERCISE the touched-center cap flip: at cap 3
    // some centers cross maxHubDeg when batch edges land on them —
    // the case that must route through the uncapped touched-center
    // generator, not carry stale
    for (seed <- Seq(13, 47); cap <- Seq(3L, 100L)) {
      val rnd = new Random(seed)
      val all = (for {
        i <- 0L until 25L; j <- i + 1 until 25L if rnd.nextDouble() < 0.15
      } yield (i, j)).toSeq
      val (corpus, batch) = all.partition(_ => rnd.nextDouble() < 0.7)
      if (batch.nonEmpty) {
        val standing = LinkPrediction.features(corpus.toDF("id_a", "id_b"), cap)
        val got = LinkPrediction.refreshFeatures(standing,
            all.toDF("id_a", "id_b"), batch.toDF("id_a", "id_b"), cap)
          .collect().map(r => (r.getLong(0), r.getLong(1)) ->
            ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)),
              if (r.isNullAt(6)) None else Some(r.getLong(6)))).toMap
        assert(got.view.mapValues(_._1).toMap === ref(all, cap),
          s"seed=$seed cap=$cap refresh diverged from cold")
        // delta audit: prev = the standing row's common-neighbor count
        val prev = standing.collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        got.foreach { case (p, (_, pv)) =>
          assert(pv === prev.get(p), s"seed=$seed cap=$cap pair $p prev drifted")
        }
      }
    }
  }

  test("refresh hand fixture: a batch edge kills its candidate and shifts RA via the new degree") {
    // corpus path 0-1-2: one candidate (0,2) via center 1. Batch adds
    // (0,2): the candidate becomes an edge and a NEW candidate set
    // appears through the now-triangle (none — K3 has no distance-2
    // pairs). Batch also adds (2,3): candidates (1,3) via center 2.
    val corpus = Seq((0L, 1L), (1L, 2L))
    val batch = Seq((0L, 2L), (2L, 3L))
    val standing = LinkPrediction.features(corpus.toDF("id_a", "id_b"), 10L)
    val got = LinkPrediction.refreshFeatures(standing,
        (corpus ++ batch).toDF("id_a", "id_b"), batch.toDF("id_a", "id_b"), 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)),
          if (r.isNullAt(6)) None else Some(r.getLong(6)))).toMap
    assert(!got.contains((0L, 2L)), "edge-ified candidate survived the refresh")
    // (1,3) through center 2 (deg 3): cn=1, ra=333333, pa=deg1*deg3=2*1,
    // jac=1e6/(2+1-1)=500000; promoted -> prev NULL
    assert(got((1L, 3L)) === ((1L, 333333L, 2L, 500000L), None), s"got: $got")
    // (0,3) through center 2 as well: deg0=2 -> pa=2, same cn/ra
    assert(got((0L, 3L)) === ((1L, 333333L, 2L, 500000L), None))
  }

  test("the cap guard is loud") {
    val e = intercept[IllegalArgumentException](
      LinkPrediction.features(Seq((1L, 2L)).toDF("id_a", "id_b"), 0L))
    assert(e.getMessage.contains("maxHubDeg"))
  }
}
