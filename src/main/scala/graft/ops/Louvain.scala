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
  * bookkeeping). Argmax is two aggregates — max score per node, then
  * MIN label among the achievers — fully deterministic in both
  * engines, no packing needed since scores exceed 32 bits.
  *
  * Scale shape: per round ONE equi-join of the bidirectional edge
  * relation against the skinny label relation (k_{i,c} counts), one
  * label⋈degree aggregate (Σtot), and the two argmax aggregates —
  * everything keyed, nothing quadratic; labels staged per round.
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
      // Σtot per community: degree mass of its members
      val sigma = lab.join(deg, Seq("node"))
        .groupBy(col("lbl")).agg(sum(col("k")).as("tot"))
      // this round's parity class re-decides; the other half carries
      val movers = lab.filter(active(col("node"), r))
      val keepers = lab.filter(!active(col("node"), r))
      // k_{i,c}: edges from mover i into community c
      val kic = ed
        .join(lab.select(col("node").as("dst"), col("lbl")), Seq("dst"))
        .groupBy(col("src").as("node"), col("lbl"))
        .agg(count(lit(1)).as("kic"))
        .join(movers.select(col("node")), Seq("node"), "left_semi")
      // candidate set per mover: neighbor communities ∪ its CURRENT
      // community (staying must stay comparable even with no
      // intra-community neighbor left); max() dedups the overlap —
      // the current-community row carries its true kic when it is
      // also a neighbor community, else 0
      val cand = kic.unionByName(
          movers.withColumn("kic", lit(0L)))
        .groupBy(col("node"), col("lbl")).agg(max(col("kic")).as("kic"))
      val scored = cand
        .join(deg, Seq("node"))
        .join(sigma, Seq("lbl"))
        .join(movers.withColumnRenamed("lbl", "cur"), Seq("node"))
        .select(col("node"), col("lbl"), col("cur"),
          (lit(BigDecimal(2L) * BigDecimal(m)).cast("decimal(38,0)")
              * col("kic").cast("decimal(38,0)") -
            col("k").cast("decimal(38,0)") * (col("tot") -
              when(col("lbl") === col("cur"), col("k")).otherwise(lit(0L)))
              .cast("decimal(38,0)"))
            .as("score"))
      val best = scored.groupBy(col("node")).agg(max(col("score")).as("ms"))
      lab = Staging.fresh(keepers.unionByName(
          scored.join(best, Seq("node"))
            .filter(col("score") === col("ms"))
            .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))))
    }
    lab
  }

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
    * scored per level as one aggregate over the per-community
    * decomposition — O(levels) extra passes, each on the skinny
    * label relation plus one edge join.
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
    // lean per-level Q scorer: the [[Modularity.ofPartition]] numerator
    // total (Σ_c 4m·in_c − deg_c², the exact partition order — shared
    // denominator), as ONE aggregate job instead of the decomposition's
    // staged relation (m is counted once up front, never per level)
    def qNumer(lab: DataFrame): java.math.BigDecimal = {
      val l = lab.select(col("node"), col("lbl"))
      val intra = e
        .join(l.select(col("node").as("id_a"), col("lbl").as("la")), Seq("id_a"))
        .join(l.select(col("node").as("id_b"), col("lbl").as("lb")), Seq("id_b"))
        .filter(col("la") === col("lb"))
        .groupBy(col("la").as("lbl")).agg(count(lit(1)).as("in_edges"))
      val degs = e.select(col("id_a").as("node"))
        .unionByName(e.select(col("id_b").as("node")))
        .join(l, Seq("node"))
        .groupBy(col("lbl")).agg(count(lit(1)).as("deg_sum"))
      degs.join(intra, Seq("lbl"), "left")
        .agg(sum(
          lit(BigDecimal(4L) * BigDecimal(m)).cast("decimal(38,0)")
            * coalesce(col("in_edges"), lit(0L)).cast("decimal(38,0)")
          - col("deg_sum").cast("decimal(38,0)")
            * col("deg_sum").cast("decimal(38,0)")))
        .collect().head.getDecimal(0)
    }
    var lab = Staging.fresh(fromSingletons(e, level1Rounds))
    var q = qNumer(lab)
    var levels = 1
    var converged = false
    while (!converged) {
      // contraction preserves the weight mass (Σw = m, positive by
      // construction: every supernode pair/self-loop carries a count),
      // so the weighted pass skips the public entry's re-validation
      val cand = lab
        .join(weightedMoves(Staging.fresh(Coarsen.contract(e, lab)),
            weightedRounds, bigW = m)
          .select(col("node").as("lbl"), col("lbl").as("super")), Seq("lbl"))
        .select(col("node"), col("super").as("lbl"))
      val q2 = qNumer(cand)
      if (q2.compareTo(q) > 0) {
        require(levels < maxLevels,
          s"louvain: modularity still improving after $maxLevels levels — raise maxLevels")
        lab = Staging.fresh(cand)
        q = q2
        levels += 1
      } else converged = true
    }
    lab.withColumn("levels", lit(levels))
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
      val sigma = lab.join(deg, Seq("node"))
        .groupBy(col("lbl")).agg(sum(col("k")).as("tot"))
      val movers = lab.filter(active(col("node"), r))
      val keepers = lab.filter(!active(col("node"), r))
      val kic = ed
        .join(lab.select(col("node").as("dst"), col("lbl")), Seq("dst"))
        .groupBy(col("src").as("node"), col("lbl"))
        .agg(sum(col("w")).as("kic"))
        .join(movers.select(col("node")), Seq("node"), "left_semi")
      val cand = kic.unionByName(
          movers.withColumn("kic", lit(0L)))
        .groupBy(col("node"), col("lbl")).agg(max(col("kic")).as("kic"))
      val scored = cand
        .join(deg, Seq("node"))
        .join(sigma, Seq("lbl"))
        .join(movers.withColumnRenamed("lbl", "cur"), Seq("node"))
        .select(col("node"), col("lbl"), col("cur"),
          (lit(BigDecimal(2L) * BigDecimal(bigW)).cast("decimal(38,0)")
              * col("kic").cast("decimal(38,0)") -
            col("k").cast("decimal(38,0)") * (col("tot") -
              when(col("lbl") === col("cur"), col("k")).otherwise(lit(0L)))
              .cast("decimal(38,0)"))
            .as("score"))
      val best = scored.groupBy(col("node")).agg(max(col("score")).as("ms"))
      lab = Staging.fresh(keepers.unionByName(
          scored.join(best, Seq("node"))
            .filter(col("score") === col("ms"))
            .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))))
    }
    lab
  }
}
