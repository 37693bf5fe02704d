package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fixed-point integer PageRank recurrence: differential against
  * an in-memory reference fold, warm-start seeding rules, and the
  * quiescent-convergence property the streaming ledger's contract
  * rests on — warm and cold starts both reach TRUE stationary points
  * of the recurrence, and those fixpoints agree within the floor-
  * truncation band (floor makes the fixpoint a narrow band, not a
  * single point: each in-edge loses < 1 unit per round, amplified by
  * at most 1/(1-d) by the recursion; the probe fixture's observed max
  * gap is 3 units of 10⁶ — relative 3e-6, invisible to ranking). */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory reference of one recurrence step — the same integer
    * math, no Spark, so the DataFrame formulation can't drift. */
  private def refStep(edges: Seq[(Long, Long)], r: Map[Long, Long]): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    edges.groupBy(_._2).view.mapValues { in =>
      150000L + in.map { case (s, _) => r(s) * 85 / (100 * deg(s)) }.sum
    }.toMap
  }

  private def collectRanks(df: DataFrame): Map[Long, Long] =
    df.select(col("id"), col("pr")).as[(Long, Long)].collect().toMap

  /** Bidirectional random graph — every node has in- and out-edges, so
    * the rank relation tracks all nodes (the g8/g13 regime). */
  private def fixture(seed: Int, n: Int, p: Double): Seq[(Long, Long)] = {
    val rnd = new Random(seed)
    (for {
      i <- 0L until n.toLong; j <- i + 1 until n.toLong
      if rnd.nextDouble() < p
    } yield Seq((i, j), (j, i))).flatten
  }

  test("cold iterate matches the in-memory reference fold exactly") {
    val edges = fixture(seed = 7, n = 30, p = 0.2)
    val got = collectRanks(PageRank.cold(edges.toDF("src", "dst"), rounds = 4))
    var want = edges.map(_._1).distinct.map(_ -> PageRank.InitRank).toMap
    for (_ <- 1 to 4) want = refStep(edges, want)
    assert(got === want)
  }

  test("warm start seeds standing nodes from their ranks and new nodes at InitRank") {
    // standing: 1<->2; batch adds 2<->3. Node 3 is new.
    val standing = Seq((1L, 777000L), (2L, 888000L)).toDF("id", "pr")
    val merged = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val got = collectRanks(PageRank.warmStart(standing, merged, rounds = 1))
    // deg(1)=1, deg(2)=2, deg(3)=1; seeds: 1->777000, 2->888000, 3->1000000
    // pr'(1) = 150000 + 888000*85/200 = 527400
    // pr'(2) = 150000 + 777000*85/100 + 1000000*85/100 = 1660450
    // pr'(3) = 150000 + 888000*85/200 = 527400
    assert(got === Map(1L -> 527400L, 2L -> 1660450L, 3L -> 527400L))
  }

  /** Reference personalized step: base and init restricted to seeds. */
  private def refPprStep(edges: Seq[(Long, Long)], seeds: Set[Long],
      r: Map[Long, Long]): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    edges.groupBy(_._2).view.mapValues { in =>
      in.map { case (s, _) => r(s) * 85 / (100 * deg(s)) }.sum
    }.toMap.map { case (v, cs) => v -> (cs + (if (seeds(v)) 150000L else 0L)) }
  }

  test("personalized matches the in-memory reference; non-seeds start and teleport at zero") {
    val edges = fixture(seed = 31, n = 35, p = 0.15)
    val seeds = Set(0L, 9L, 20L)
    val got = collectRanks(PageRank.personalized(
      edges.toDF("src", "dst"), seeds.toSeq.toDF("id"), rounds = 4))
    var want = edges.map(_._1).distinct
      .map(v => v -> (if (seeds(v)) PageRank.InitRank else 0L)).toMap
    for (_ <- 1 to 4) want = refPprStep(edges, seeds, want)
    assert(got === want)
    // rank measures seed proximity: a seed outranks any node with the
    // same in-profile minus the teleport, and unreached nodes sit at 0
    assert(seeds.forall(s => got(s) >= 150000L))
  }

  /** Weighted reference step: contribution (pr·85·w) / (100·W(src)). */
  private def refWeightedStep(edges: Seq[(Long, Long, Long)],
      r: Map[Long, Long]): Map[Long, Long] = {
    val tw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    edges.groupBy(_._2).view.mapValues { in =>
      150000L + in.map { case (s, _, w) => r(s) * 85 * w / (100 * tw(s)) }.sum
    }.toMap
  }

  test("weighted matches the in-memory reference; w == 1 reduces to cold") {
    val rnd = new Random(13)
    val base = fixture(seed = 13, n = 30, p = 0.2)
    val weighted = base.map { case (s, d) => (s, d, rnd.nextInt(9).toLong + 1L) }
    var want = weighted.map(_._1).distinct.map(_ -> 1000000L).toMap
    for (_ <- 1 to 4) want = refWeightedStep(weighted, want)
    val got = collectRanks(
      PageRank.weighted(weighted.toDF("src", "dst", "w"), rounds = 4))
    assert(got === want, "weighted recurrence diverged from the reference")
    // unit weights: the weighted walk IS the uniform walk
    val unit = base.map { case (s, d) => (s, d, 1L) }
    assert(collectRanks(PageRank.weighted(unit.toDF("src", "dst", "w"), rounds = 3))
      === collectRanks(PageRank.cold(base.toDF("src", "dst"), rounds = 3)),
      "w == 1 must reduce to the unweighted recurrence")
  }

  test("weighted rejects non-positive weights loudly") {
    val bad = Seq((1L, 2L, 0L), (2L, 1L, 3L)).toDF("src", "dst", "w")
    val e = intercept[IllegalArgumentException](PageRank.weighted(bad, rounds = 1))
    assert(e.getMessage.contains("positive"))
  }

  test("weighted rejects NULL weights loudly (w <= 0 is NULL for them, not true)") {
    val bad = Seq((1L, 2L, Some(3L)), (2L, 1L, Option.empty[Long]))
      .toDF("src", "dst", "w")
    val e = intercept[IllegalArgumentException](PageRank.weighted(bad, rounds = 1))
    assert(e.getMessage.contains("positive"))
  }

  test("quiescent convergence: warm and cold starts settle into the same truncation band") {
    // Real-arithmetic PageRank contracts to ONE fixpoint from any
    // seed; the floor in the integer recurrence can leave a small
    // limit cycle instead of a single stationary point, so the honest
    // exact property is a BAND: iterated far past mixing, warm- and
    // cold-started chains stay within a few truncation units of each
    // other (≤ 1 lost unit per in-edge per round, amplified at most
    // 1/(1−d) ≈ 6.7× by the recursion — minuscule against SCALE 10⁶
    // and invisible to ranking). Phases of the two limit cycles need
    // not align, hence the min over a 1-step shift.
    val edges = fixture(seed = 13, n = 40, p = 0.15)
    val corpus = edges.filter { case (a, b) => (a + b) % 10 < 6 }

    def run(r0: Map[Long, Long], rounds: Int): Map[Long, Long] =
      (1 to rounds).foldLeft(r0)((r, _) => refStep(edges, r))

    val cold300 = run(edges.map(_._1).distinct.map(_ -> PageRank.InitRank).toMap, 300)
    val cold301 = refStep(edges, cold300)

    // warm path: 5 rounds on the corpus, then refine on the full graph
    var standing = corpus.map(_._1).distinct.map(_ -> PageRank.InitRank).toMap
    for (_ <- 1 to 5) standing = refStep(corpus, standing)
    val warmSeed = edges.map(_._1).distinct
      .map(v => v -> standing.getOrElse(v, PageRank.InitRank)).toMap
    val warm300 = run(warmSeed, 300)

    def maxGap(a: Map[Long, Long], b: Map[Long, Long]): Long =
      a.keySet.map(v => math.abs(a(v) - b(v))).max
    val gap = math.min(maxGap(warm300, cold300), maxGap(warm300, cold301))
    assert(gap <= 256,
      s"warm/cold bands diverge past the truncation bound: $gap units of 1e6")

    // and the Spark op reproduces the reference warm chain exactly
    val standingDf = standing.toSeq.toDF("id", "pr")
    val sparkWarm = collectRanks(
      PageRank.warmStart(standingDf, edges.toDF("src", "dst"), rounds = 3))
    var refWarm = warmSeed
    for (_ <- 1 to 3) refWarm = refStep(edges, refWarm)
    assert(sparkWarm === refWarm)
  }
}
