package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic synchronous Louvain level: in-memory differential of
  * the exact move rule on random graphs, a hand fixture where the
  * communities are known, modularity improvement over the start
  * partition, and the loud guards. */
class LouvainSpec extends SparkSpec {
  import spark.implicits._

  /** The op's per-round scheduling color: low bit of the 8th hex
    * digit of md5(node ":" round) — see Louvain.active. */
  private def isActive(v: Long, r: Int): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$v:$r".getBytes("UTF-8"))
    (d(3) & 1) == 0
  }

  /** The same synchronous round, no Spark: per node in the round's
    * parity class, candidates = neighbor communities ∪ current;
    * score = 2m·k_ic − k_i·(tot_c − [c = cur]·k_i); max score, ties
    * to the smallest label; off-parity nodes carry. */
  private def refRounds(edges: Seq[(Long, Long)], init: Map[Long, Long],
      rounds: Int): Map[Long, Long] = {
    val m = edges.size.toLong
    val ed = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = ed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var lab = init
    for (r <- 1 to rounds) {
      val sigma = lab.toSeq.groupBy(_._2).view
        .mapValues(_.map(x => deg(x._1)).sum).toMap
      val kic = ed.groupBy(x => (x._1, lab(x._2))).view
        .mapValues(_.size.toLong).toMap
      lab = lab.map { case (i, cur) =>
        if (!isActive(i, r)) i -> cur
        else {
          val cands = kic.keysIterator.collect { case (n, c) if n == i => c }.toSet + cur
          val scored = cands.map { c =>
            val tot = sigma(c) - (if (c == cur) deg(i) else 0L)
            (2L * m * kic.getOrElse((i, c), 0L) - deg(i) * tot, c)
          }
          val ms = scored.map(_._1).max
          i -> scored.filter(_._1 == ms).map(_._2).min
        }
      }
    }
    lab
  }

  private def undirected(seed: Int, n: Int, p: Double): Seq[(Long, Long)] = {
    val rnd = new Random(seed)
    (for {
      i <- 0L until n.toLong; j <- i + 1 until n.toLong
      if rnd.nextDouble() < p
    } yield (i, j)).toSeq
  }

  test("oneLevel matches the in-memory move rule on random graphs") {
    for (seed <- Seq(5, 17); rounds <- Seq(1, 3)) {
      val edges = undirected(seed, n = 30, p = 0.12)
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val init = nodes.map(v => v -> v).toMap
      val got = Louvain.oneLevel(edges.toDF("id_a", "id_b"),
          init.toSeq.toDF("node", "lbl"), rounds)
        .as[(Long, Long)].collect().toMap
      assert(got === refRounds(edges, init, rounds),
        s"seed $seed rounds $rounds diverged")
    }
  }

  test("two triangles with a bridge: singletons merge into the two triangles and Q rises") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L),
      (2L, 3L)).toDF("id_a", "id_b")
    // 6 rounds: the per-round hashed activation needs a split round
    // per merge pair, so small fixtures converge in ~2x the fixed-
    // alternation round count
    val lab = Louvain.fromSingletons(edges, rounds = 6)
      .as[(Long, Long)].collect().toMap
    assert(lab(0L) === lab(1L) && lab(1L) === lab(2L), s"left triangle split: $lab")
    assert(lab(3L) === lab(4L) && lab(4L) === lab(5L), s"right triangle split: $lab")
    assert(lab(0L) !== lab(3L), s"bridge absorbed both triangles: $lab")
    def q(labels: Map[Long, Long]): Double =
      Modularity.ofPartition(edges, labels.toSeq.toDF("node", "lbl"))
        .select(col("q_total")).head().getDouble(0)
    val singles = (0L to 5L).map(v => v -> v).toMap
    assert(q(lab) > q(singles), "greedy moves did not improve modularity")
  }

  /** Weighted reference: same rule with weight mass (self-loops ride
    * only the degree). `g`: (id_a <= id_b, w). */
  private def refWeighted(g: Seq[(Long, Long, Long)], rounds: Int): Map[Long, Long] = {
    val wTot = g.map(_._3).sum
    val nonSelf = g.filterNot(x => x._1 == x._2)
    val ed = nonSelf.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val deg = (ed.map(x => (x._1, x._3)) ++
        g.collect { case (a, b, w) if a == b => (a, 2 * w) })
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    var lab = deg.keys.map(v => v -> v).toMap
    for (r <- 1 to rounds) {
      val sigma = lab.toSeq.groupBy(_._2).view
        .mapValues(_.map(x => deg(x._1)).sum).toMap
      val kic = ed.groupBy(x => (x._1, lab(x._2))).view
        .mapValues(_.map(_._3).sum).toMap
      lab = lab.map { case (i, cur) =>
        if (!isActive(i, r)) i -> cur
        else {
          val cands = kic.keysIterator.collect { case (n, c) if n == i => c }.toSet + cur
          val scored = cands.map { c =>
            val tot = sigma(c) - (if (c == cur) deg(i) else 0L)
            (2L * wTot * kic.getOrElse((i, c), 0L) - deg(i) * tot, c)
          }
          val ms = scored.map(_._1).max
          i -> scored.filter(_._1 == ms).map(_._2).min
        }
      }
    }
    lab
  }

  test("oneLevelWeighted matches the weighted reference on random multigraphs") {
    for (seed <- Seq(41, 59); rounds <- Seq(1, 3)) {
      val rnd = new Random(seed)
      val g = ((for {
        i <- 0L until 20L; j <- i + 1 until 20L
        if rnd.nextDouble() < 0.14
      } yield (i, j, 1L + rnd.nextInt(5).toLong)) ++
        (0L until 20L).filter(_ => rnd.nextDouble() < 0.3)
          .map(v => (v, v, 1L + rnd.nextInt(3).toLong))).toSeq
      if (g.nonEmpty) {
        val got = Louvain.oneLevelWeighted(g.toDF("id_a", "id_b", "w"), rounds)
          .as[(Long, Long)].collect().toMap
        assert(got === refWeighted(g, rounds), s"seed=$seed rounds=$rounds")
      }
    }
  }

  test("unit weights with no self-loops reduce to the unweighted level exactly") {
    val edges = undirected(83, n = 25, p = 0.14)
    val unweighted = Louvain.fromSingletons(edges.toDF("id_a", "id_b"), rounds = 3)
      .as[(Long, Long)].collect().toMap
    val weighted = Louvain.oneLevelWeighted(
        edges.map { case (a, b) => (a, b, 1L) }.toDF("id_a", "id_b", "w"), rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(weighted === unweighted)
  }

  test("coarsened level 2 keeps well-separated communities apart and absorbs satellites") {
    // two triangles + bridge contract (via the level-1 labels) into
    // two supernodes with self-loop weight 3 each and ONE inter edge;
    // the weighted pass must NOT merge them (merging two dense
    // supernodes over a weight-1 bridge lowers Q)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L),
      (2L, 3L)).toDF("id_a", "id_b")
    val l1 = Louvain.fromSingletons(edges, rounds = 6)
    val cg = Coarsen.contract(edges, l1)
      .as[(Long, Long, Long)].collect().toSet
    val c1 = l1.as[(Long, Long)].collect().toMap.apply(0L)
    val c2 = l1.as[(Long, Long)].collect().toMap.apply(3L)
    assert(cg === Set((c1, c1, 3L), (c2, c2, 3L),
      (math.min(c1, c2), math.max(c1, c2), 1L)), s"coarsened: $cg")
    val l2 = Louvain.oneLevelWeighted(
        Coarsen.contract(edges, l1), rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(l2(c1) !== l2(c2), s"bridge merged the triangles at level 2: $l2")
  }

  test("multiLevel converges on a hierarchical fixture: >= 3 levels, Q non-decreasing, loud bound") {
    // seeded stochastic-block hierarchy built to NEED multiple
    // contraction levels: 8 six-node blocks (intra p 0.62), pairs of
    // blocks tied at p 0.20, pairs-of-pairs at p 0.10, one weak super
    // tie — level 1 resolves blocks, each contraction exposes the
    // next tier (probed: seed 13 converges at exactly 3 levels).
    // Random ties, not structured offsets: any fixed offset pattern
    // between blocks composes into accidental cross-cliques that
    // level 1 adopts (observed twice while building this fixture).
    val rnd = new Random(13)
    val blocks = (0 until 8).map(b => (b * 6L until b * 6L + 6L).toSeq)
    def cross(xs: Seq[Long], ys: Seq[Long], p: Double) =
      for (x <- xs; y <- ys if rnd.nextDouble() < p)
        yield (math.min(x, y), math.max(x, y))
    val intra = blocks.flatMap(ns =>
      for (i <- ns; j <- ns if i < j && rnd.nextDouble() < 0.62) yield (i, j))
    val pair = Seq((0, 1), (2, 3), (4, 5), (6, 7)).flatMap { case (x, y) =>
      cross(blocks(x), blocks(y), 0.20) }
    val quad = Seq((0, 2), (0, 3), (1, 2), (1, 3), (4, 6), (4, 7), (5, 6), (5, 7))
      .flatMap { case (x, y) => cross(blocks(x), blocks(y), 0.10) }
    val sup = cross(blocks.take(4).flatten, blocks.drop(4).flatten, 0.004)
    val all = (intra ++ pair ++ quad ++ sup).distinct
    val edges = all.toDF("id_a", "id_b")
    val ml = Louvain.multiLevel(edges, level1Rounds = 6, weightedRounds = 3,
      maxLevels = 10)
    val rows = ml.as[(Long, Long, Int)].collect()
    val levels = rows.map(_._3).distinct
    assert(levels.length === 1, s"levels column must be constant: ${levels.toSeq}")
    assert(levels.head >= 3, s"fixture was built to need >= 3 levels, got ${levels.head}")
    assert(rows.map(_._1).toSet === all.flatMap(e => Seq(e._1, e._2)).toSet,
      "must label every edge endpoint")
    // Q(converged) strictly above Q(level 1 alone) — the outer loop
    // only accepts improving levels, so the fixture must show gain
    def q(lab: Map[Long, Long]): Double =
      Modularity.ofPartition(edges, lab.toSeq.toDF("node", "lbl"))
        .select(col("q_total")).head().getDouble(0)
    val l1 = Louvain.fromSingletons(edges, rounds = 6)
      .as[(Long, Long)].collect().toMap
    val mlLab = rows.map(r => r._1 -> r._2).toMap
    assert(q(mlLab) > q(l1), "multi-level must improve on the single level here")
    // the bound is loud: capping at 1 level throws while improving
    val e = intercept[IllegalArgumentException](
      Louvain.multiLevel(edges, 6, 3, maxLevels = 1))
    assert(e.getMessage.contains("still improving"))
  }

  test("wide lattice: weights past 2^31 score exactly on DECIMAL(38,0) — scale invariance") {
    // modularity gain scores scale by c^2 when every weight scales by
    // c, so the ARGMAX (and the labels) are scale-invariant; running
    // the same multigraph at w and at w * 2^31 must agree label for
    // label. At c = 2^31 the totals pass W > 2^31 and the products
    // 2W·k_ic overflow BIGINT by ~20 bits — the case the old m < 1e9
    // refusal guarded; the DECIMAL(38,0) lattice scores it exactly.
    val rnd = new Random(97)
    val g = ((for {
      i <- 0L until 18L; j <- i + 1 until 18L if rnd.nextDouble() < 0.2
    } yield (i, j, 1L + rnd.nextInt(4).toLong)) ++
      Seq((2L, 2L, 2L), (7L, 7L, 1L))).toSeq
    val c = 1L << 31
    val narrow = Louvain.oneLevelWeighted(g.toDF("id_a", "id_b", "w"), rounds = 3)
      .as[(Long, Long)].collect().toMap
    val wide = Louvain.oneLevelWeighted(
        g.map { case (a, b, w) => (a, b, w * c) }.toDF("id_a", "id_b", "w"),
        rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(wide === narrow, "wide-lattice labels diverged from the scale-invariant result")
    val wTot = g.map(_._3).sum * c
    assert(wTot > (1L << 31), s"fixture too small to exercise the wide lattice: $wTot")
  }

  test("weighted guards are loud: null/non-positive weights and empty graphs") {
    val bad = Seq((1L, 2L, Some(0L))).toDF("id_a", "id_b", "w")
    val e1 = intercept[IllegalArgumentException](Louvain.oneLevelWeighted(bad, 1))
    assert(e1.getMessage.contains("positive"))
    val e2 = intercept[IllegalArgumentException](Louvain.oneLevelWeighted(
      Seq.empty[(Long, Long, Long)].toDF("id_a", "id_b", "w"), 1))
    assert(e2.getMessage.contains("empty"))
  }

  test("empty and oversized edge sets fail loudly") {
    val e1 = intercept[IllegalArgumentException](
      Louvain.oneLevel(Seq.empty[(Long, Long)].toDF("id_a", "id_b"),
        Seq((1L, 1L)).toDF("node", "lbl"), rounds = 1))
    assert(e1.getMessage.contains("empty"))
    val e2 = intercept[IllegalArgumentException](
      Louvain.oneLevel(Seq((1L, 2L)).toDF("id_a", "id_b"),
        Seq((1L, 1L)).toDF("node", "lbl"), rounds = 0))
    assert(e2.getMessage.contains("rounds"))
  }
}
