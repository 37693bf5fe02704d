package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One LEVEL of Louvain-style greedy modularity optimization (Blondel
  * et al. 2008, "Fast unfolding of communities in large networks"),
  * made deterministic and synchronous so it can be oracled: each
  * round, every node in the round's PARITY CLASS (node id mod 2 ==
  * round mod 2) considers moving to the community of one of its
  * neighbors (or staying), picks the candidate maximizing the
  * modularity gain, and all moves apply at once; a fixed round count
  * replaces the sequential sweep (classic Louvain moves nodes one at
  * a time in visit order — irreproducible across partitionings; the
  * synchronous variant is a pure function of (edges, labels, rounds),
  * the [[Lpa]] determinism trade, and is the standard distributed
  * formulation). The parity half-sweep is the symmetry breaker:
  * full-synchronous moves two-color OSCILLATE (two singleton
  * neighbors each greedily adopt the other's community and swap
  * forever — observed on the triangle fixture); restricting each
  * round to one parity class is the deterministic version of the
  * coloring schedule parallel Louvain uses (Lu, Halappanavar &
  * Kalyanaraman 2015, "Parallel heuristics for scalable community
  * detection"), and it mirrors in SQL as one WHERE clause. The class
  * is the parity of an md5 DIGIT of the node id, not of the id
  * itself: contracted supernode labels are arbitrary surviving
  * community ids whose raw parities can collapse onto one class
  * (observed: a coarsened clique hierarchy whose every label was
  * even — the odd half-sweeps moved nobody and every same-class
  * merge pair swap-oscillated), while the hashed coloring stays
  * balanced for ANY label structure — the Walks md5-bucket
  * discipline applied to scheduling.
  *
  * The gain is compared on the SAME integer lattice
  * [[Modularity.ofPartition]] scores on: moving node i (degree k_i)
  * into community c changes Q by (k_{i,c} − k_i·Σtot_c / 2m) / m plus
  * terms constant across candidates, so candidates order by the exact
  * BIGINT score
  *   `2m·k_{i,c} − k_i·(Σtot_c − [c = cur]·k_i)`
  * (the self-degree leaves Σtot of the CURRENT community when
  * comparing against staying — the standard remove-then-place
  * bookkeeping). Argmax is ONE aggregate — `max(struct(score, −lbl))`
  * is lexicographically (max score, then MIN label among achievers) —
  * fully deterministic in both engines (the r17 reshape; the oracle
  * keeps the equivalent two-step SQL).
  *
  * Scale shape (post-r17): per round ONE equi-join of the
  * mover-filtered bidirectional edge relation against the skinny
  * label relation (k_{i,c} counts; the mover restriction is a
  * map-side `active(src, round)` filter, not a join), ONE shared
  * label⋈degree join (`labk`) feeding both the Σtot aggregate and the
  * mover side, and the single-aggregate argmax — everything keyed,
  * nothing quadratic; labels staged per round.
  * Bounds: scores live on a DECIMAL(38,0) lattice — 2m·k_{i,c} and
  * k_i·Σtot_c are both ≤ 4m², which fits DECIMAL(38) up to m ≤ 10¹⁸
  * edges (any conceivable corpus; the counts themselves overflow
  * BIGINT degrees first). Exactness is unchanged: decimal128
  * arithmetic at scale 0 is exact integer arithmetic, and the scored
  * relation is skinny (one row per mover-candidate), so the wider
  * lattice never touches a corpus-scale column. The DuckDB oracle
  * keeps BIGINT arithmetic — identical integers at any SF it runs,
  * since DuckDB verifies only at test scales.
  */
object Louvain {

  /** The scheduling 2-coloring, RE-DRAWN PER ROUND: low bit of the
    * 8th hex digit of md5(node ‖ ":" ‖ round) — the Walks draw keying
    * applied to scheduling. A FIXED coloring (id parity, or one hash)
    * leaves some favorable merge pairs same-colored forever, and
    * same-colored partners swap-oscillate instead of merging
    * (observed on an all-even-label coarsened hierarchy AND on a
    * same-color triangle); re-drawing each round splits every pair in
    * ~half the rounds, so every favorable move gets a round where
    * exactly one partner is active. Deterministic, engine-exact:
    * mirrors in SQL as one position()-over-substr expression. */
  private def active(c: org.apache.spark.sql.Column, r: Int): org.apache.spark.sql.Column =
    conv(substring(md5(concat(c.cast("string"), lit(s":$r"))), 8, 1), 16, 10)
      .cast("long") % 2L === 0L

  /** `rounds` synchronous greedy-move rounds from `labels` (node,
    * lbl) over undirected `edges` (id_a, id_b — distinct, a < b, no
    * self-loops). Returns (node, lbl) for every edge endpoint. */
  def oneLevel(edges: DataFrame, labels: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "louvain: rounds >= 1")
    val e = Staging.fresh(edges.select(col("id_a"), col("id_b")))
    val m = e.count()
    require(m > 0L, "louvain: empty edge set has no modularity to optimize")
    require(m <= 1000000000000000000L, // 10^18: 4m^2 <= 4e36 < 10^38
      s"louvain: $m edges — 4m^2 exceeds the DECIMAL(38,0) score lattice")
    val ed = Staging.fresh(
      e.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(e.select(col("id_b").as("src"), col("id_a").as("dst"))))
    val deg = Staging.fresh(
      ed.groupBy(col("src").as("node")).agg(count(lit(1)).as("k")))
    var lab = Staging.fresh(labels.select(col("node"), col("lbl")))
    for (r <- 1 to rounds) {
      // one deg join feeds BOTH Σtot and the mover side (r17: deg was
      // joined twice per round — once for sigma, once inside scored)
      val labk = lab.join(deg, Seq("node"))
      // Σtot per community: degree mass of its members
      val sigma = labk.groupBy(col("lbl")).agg(sum(col("k")).as("tot"))
      // this round's parity class re-decides; the other half carries
      val movers = labk.filter(active(col("node"), r))
      val keepers = lab.filter(!active(col("node"), r))
      // k_{i,c}: edges from mover i into community c. The mover
      // restriction is the MAP-SIDE src-activity filter — the md5
      // parity draw is a pure function of (src, round), so filtering
      // the edge relation before the label join is exactly the old
      // movers left-semi-join, minus one shuffle-join per round and
      // with ~half the rows entering the aggregate (guide §2.3/§2.4)
      val kic = ed.filter(active(col("src"), r))
        .join(lab.select(col("node").as("dst"), col("lbl")), Seq("dst"))
        .groupBy(col("src").as("node"), col("lbl"))
        .agg(count(lit(1)).as("kic"))
      // candidate set per mover: neighbor communities ∪ its CURRENT
      // community (staying must stay comparable even with no
      // intra-community neighbor left); max() dedups the overlap —
      // the current-community row carries its true kic when it is
      // also a neighbor community, else 0
      val cand = kic.unionByName(
          movers.select(col("node"), col("lbl")).withColumn("kic", lit(0L)))
        .groupBy(col("node"), col("lbl")).agg(max(col("kic")).as("kic"))
      val scored = cand
        .join(sigma, Seq("lbl"))
        .join(movers.select(col("node"), col("lbl").as("cur"), col("k")),
          Seq("node"))
        .select(col("node"), col("lbl"),
          (lit(BigDecimal(2L) * BigDecimal(m)).cast("decimal(38,0)")
              * col("kic").cast("decimal(38,0)") -
            col("k").cast("decimal(38,0)") * (col("tot") -
              when(col("lbl") === col("cur"), col("k")).otherwise(lit(0L)))
              .cast("decimal(38,0)"))
            .as("score"))
      // argmax in ONE aggregate: max(struct(score, −lbl)) orders by
      // score then by SMALLEST label (struct comparison is
      // lexicographic) — the same (max score, min label among
      // achievers) pick the old max-then-join-then-min computed with
      // an extra aggregate + join per round
      lab = Staging.fresh(keepers.unionByName(argmaxLabel(scored)))
    }
    lab
  }

  /** (node, lbl) of the max-score candidate per node, ties to the
    * SMALLEST label — one HashAggregate over the scored relation:
    * max(struct(score, −lbl)) is (max score, then min label)
    * lexicographically, exactly the two-aggregate argmax it replaces. */
  private def argmaxLabel(scored: DataFrame): DataFrame =
    scored.groupBy(col("node"))
      .agg(max(struct(col("score"), (-col("lbl")).as("nl"))).as("b"))
      .select(col("node"), (-col("b.nl")).as("lbl"))

  /** The classic level-1 entry: every node starts as its own
    * community (the singleton partition scores Q-contributions of
    * −k_i²/4m², so first-round moves are pure merges). */
  def fromSingletons(edges: DataFrame, rounds: Int): DataFrame = {
    val nodes = edges.select(col("id_a").as("node"))
      .unionByName(edges.select(col("id_b").as("node"))).distinct()
    oneLevel(edges, nodes.withColumn("lbl", col("node")), rounds)
  }

  /** MULTI-LEVEL Louvain to CONVERGENCE — the full Blondel et al.
    * 2008 outer loop: level 1 = [[fromSingletons]] move rounds on the
    * base graph, then repeatedly [[Coarsen.contract]] the partition
    * into a weighted supernode multigraph and run
    * [[oneLevelWeighted]], ACCEPTING a level only while the exact
    * integer modularity numerator (Σ_c 4m·in_c − deg_c², the
    * [[Modularity.ofPartition]] lattice — shared denominator, so the
    * numerator total orders partitions exactly) strictly improves on
    * the BASE graph. The loop is bounded by `maxLevels` LOUDLY: a
    * partition still improving at the bound throws rather than
    * silently shipping a non-converged level (the KTruss maxRounds
    * rule). Each accepted level's projected labels are staged; Q is
    * scored per level off the level's contracted multigraph (whose
    * self-loop / degree weights carry the base graph's intra counts
    * and degree mass exactly), and each level contracts the PREVIOUS
    * level's multigraph rather than the base edge set — the base
    * edges are label-joined exactly once in the whole loop, every
    * later pass is supernode-relation-sized.
    *
    * Returns (node, lbl, levels) over the BASE nodes — `levels` = the
    * accepted level count (constant column, audit surface). */
  def multiLevel(edges: DataFrame, level1Rounds: Int, weightedRounds: Int,
      maxLevels: Int): DataFrame = {
    require(maxLevels >= 1, "louvain: maxLevels >= 1")
    val e = Staging.fresh(edges.select(col("id_a"), col("id_b")))
    val m = e.count()
    require(m > 0L, "louvain: empty edge set has no modularity to optimize")
    require(m <= 1000000000000000000L, // contract preserves total weight = m
      s"louvain: $m edges — 4m^2 exceeds the DECIMAL(38,0) score lattice")
    // lean per-level Q scorer, READ OFF THE CONTRACTED MULTIGRAPH: the
    // [[Modularity.ofPartition]] numerator total (Σ_c 4m·in_c − deg_c²,
    // the exact partition order — shared denominator). Contraction
    // preserves the counts the numerator is made of EXACTLY — in_c is
    // the supernode self-loop weight (= the base graph's intra-
    // community edge count), deg_c is 2·w_self + Σ inter weights (= the
    // base degree mass; the explode emits a self-loop's endpoint twice,
    // so its w is counted twice) — so the score equals the base-graph
    // aggregate the r16 version joined the full edge set twice per
    // level to compute, at supernode-relation cost (guide §2.4: the
    // contraction already paid the only edge-scale pass a level needs).
    def qNumerContracted(cg: DataFrame): java.math.BigDecimal = {
      val deg = cg
        .select(explode(array(col("id_a"), col("id_b"))).as("lbl"), col("w"))
        .groupBy(col("lbl")).agg(sum(col("w")).as("deg_sum"))
      val selfw = cg.filter(col("id_a") === col("id_b"))
        .select(col("id_a").as("lbl"), col("w").as("in_edges"))
      deg.join(selfw, Seq("lbl"), "left")
        .agg(sum(
          lit(BigDecimal(4L) * BigDecimal(m)).cast("decimal(38,0)")
            * coalesce(col("in_edges"), lit(0L)).cast("decimal(38,0)")
          - col("deg_sum").cast("decimal(38,0)")
            * col("deg_sum").cast("decimal(38,0)")))
        .collect().head.getDecimal(0)
    }
    // level-1 labels arrive already staged (oneLevel stages its final
    // round); the base-node projection of later levels is COMPOSED
    // LAZILY — each accepted level appends one join against its staged
    // skinny super-label relation instead of materializing a base-
    // node-scale checkpoint per level (lineage depth = accepted
    // levels, bounded by maxLevels; every join side is a staged leaf)
    var lab = fromSingletons(e, level1Rounds)
    // the level's contracted multigraph is computed ONCE and serves
    // three readers — the Q scorer, the next weighted move pass, and
    // (via [[Coarsen.contractWeighted]]) the NEXT level's contraction —
    // so the base edge set is label-joined exactly once in the whole
    // outer loop (level-1's contract) instead of 3× per level (the r16
    // shape: contract + two qNumer edge joins per accepted level)
    var cg = Staging.fresh(Coarsen.contract(e, lab))
    var q = qNumerContracted(cg)
    var levels = 1
    var converged = false
    while (!converged) {
      // contraction preserves the weight mass (Σw = m, positive by
      // construction: every supernode pair/self-loop carries a count),
      // so the weighted pass skips the public entry's re-validation
      val sup = weightedMoves(cg, weightedRounds, bigW = m)
      // the candidate's contraction: contracting the current multigraph
      // by the super labels equals contracting the base graph by the
      // composed labels — every base edge lands in the same
      // (super_a, super_b) cell either way, same summed base counts
      val cg2 = Staging.fresh(Coarsen.contractWeighted(cg, sup))
      val q2 = qNumerContracted(cg2)
      if (q2.compareTo(q) > 0) {
        require(levels < maxLevels,
          s"louvain: modularity still improving after $maxLevels levels — raise maxLevels")
        lab = lab
          .join(sup.select(col("node").as("lbl"), col("lbl").as("super")),
            Seq("lbl"))
          .select(col("node"), col("super").as("lbl"))
        cg = cg2
        q = q2
        levels += 1
      } else converged = true
    }
    // stage the composed projection ONCE at loop exit: callers consume
    // the labels more than once (size counts + the output join), and
    // an unstaged multi-level join chain re-executes per consumer with
    // multiplicatively-inflated stats (the Staging hazard) — observed
    // 11 s → 36 s on g42 at sf0.1 before this final stage landed
    Staging.fresh(lab).withColumn("levels", lit(levels))
  }

  /** WEIGHTED move rounds over a multigraph with self-loops — the
    * level-2+ pass of multi-level Louvain, consuming
    * [[Coarsen.contract]]'s output directly. `g`: (id_a <= id_b, w)
    * with id_a == id_b rows as self-loops. Same lattice with weight
    * mass: W = Σw, weighted degree k_i = Σ_{j≠i} w_ij + 2·w_ii,
    * k_{i,c} = Σ w_ij over j ∈ c, j ≠ i (the self-loop travels with i
    * under every candidate, so it cancels out of the comparison and
    * rides only the degree), score 2W·k_ic − k_i·(Σtot_c − [cur]·k_i).
    * Same parity half-sweeps, same min-label argmax. Unit weights with
    * no self-loops reduce EXACTLY to [[oneLevel]] (spec-pinned).
    * Starts from singletons — the multi-level convention (level N's
    * input partition is the identity over level N−1's communities). */
  def oneLevelWeighted(g: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "louvain: rounds >= 1")
    val e = Staging.fresh(
      g.select(col("id_a"), col("id_b"), col("w").cast("long")))
    require(e.filter(col("w").isNull || col("w") <= 0L).isEmpty,
      "louvain: edge weights must be positive and non-null")
    val wRow = e.agg(sum(col("w"))).collect().head
    require(!wRow.isNullAt(0) && wRow.getLong(0) > 0L,
      "louvain: empty multigraph has no modularity to optimize")
    val bigW = wRow.getLong(0)
    // same DECIMAL(38,0) lattice as [[oneLevel]]: 4W^2 fits up to
    // W = 10^18 — i.e. any weight mass a BIGINT column can even hold
    require(bigW <= 1000000000000000000L,
      s"louvain: total weight $bigW — 4W^2 exceeds the DECIMAL(38,0) score lattice")
    weightedMoves(e, rounds, bigW)
  }

  /** The weighted move rounds over a VALIDATED staged multigraph `e`
    * (id_a, id_b, w long — positive, non-null, Σw = `bigW`):
    * [[oneLevelWeighted]] minus the entry checks, for callers that
    * guarantee them structurally ([[multiLevel]]'s contraction). */
  private def weightedMoves(e: DataFrame, rounds: Int, bigW: Long): DataFrame = {
    // non-self rows both directions for votes; self-loops only in deg
    val nonSelf = e.filter(col("id_a") =!= col("id_b"))
    val ed = Staging.fresh(
      nonSelf.select(col("id_a").as("src"), col("id_b").as("dst"), col("w"))
        .unionByName(nonSelf.select(col("id_b").as("src"), col("id_a").as("dst"), col("w"))))
    val deg = Staging.fresh(
      ed.select(col("src").as("node"), col("w"))
        .unionByName(e.filter(col("id_a") === col("id_b"))
          .select(col("id_a").as("node"), (col("w") * 2L).as("w")))
        .groupBy(col("node")).agg(sum(col("w")).as("k")))
    var lab = Staging.fresh(deg.select(col("node"), col("node").as("lbl")))
    for (r <- 1 to rounds) {
      // same r17 round-shape trims as [[oneLevel]]: one deg join per
      // round, map-side src-activity filter instead of the movers
      // semi-join, single-aggregate argmax
      val labk = lab.join(deg, Seq("node"))
      val sigma = labk.groupBy(col("lbl")).agg(sum(col("k")).as("tot"))
      val movers = labk.filter(active(col("node"), r))
      val keepers = lab.filter(!active(col("node"), r))
      val kic = ed.filter(active(col("src"), r))
        .join(lab.select(col("node").as("dst"), col("lbl")), Seq("dst"))
        .groupBy(col("src").as("node"), col("lbl"))
        .agg(sum(col("w")).as("kic"))
      val cand = kic.unionByName(
          movers.select(col("node"), col("lbl")).withColumn("kic", lit(0L)))
        .groupBy(col("node"), col("lbl")).agg(max(col("kic")).as("kic"))
      val scored = cand
        .join(sigma, Seq("lbl"))
        .join(movers.select(col("node"), col("lbl").as("cur"), col("k")),
          Seq("node"))
        .select(col("node"), col("lbl"),
          (lit(BigDecimal(2L) * BigDecimal(bigW)).cast("decimal(38,0)")
              * col("kic").cast("decimal(38,0)") -
            col("k").cast("decimal(38,0)") * (col("tot") -
              when(col("lbl") === col("cur"), col("k")).otherwise(lit(0L)))
              .cast("decimal(38,0)"))
            .as("score"))
      lab = Staging.fresh(keepers.unionByName(argmaxLabel(scored)))
    }
    lab
  }
}
