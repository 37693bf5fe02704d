package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hop-bounded reachability (min-hop BFS) and its INCREMENTAL
  * maintenance under edge insertion — the k-hop counterpart of the
  * g11/g13 standing-state tiers: reachability is MONOTONE under
  * insert-only edge arrival (a new edge can only shrink hop
  * distances, never grow them), so the refreshed labels are exactly
  * recomputable from (standing labels, batch edges) with work
  * proportional to the batch's affected neighborhood — the standing
  * graph's BFS is never re-run.
  *
  * [[hops]] — the cold tier, g6's frontier-expansion shape factored
  * into an operator: per hop one equi-join of the skinny frontier
  * against the edge relation + one anti-join against the visited set;
  * frontiers are eagerly staged (the g6 lineage lesson: each hop's
  * definition nests the previous one's — unstaged, the final plan
  * re-derives every earlier hop inside every later one, 2^h scans).
  *
  * [[refreshHops]] — the incremental tier: batch edges seed candidate
  * improvements from already-labeled sources, then improvements relax
  * through the MERGED edge relation Dijkstra-style — a node re-enters
  * the frontier only when its best-known hop strictly drops, so
  * propagation touches exactly the improved region. An improvement
  * chain lengthens its hop value by 1 per round and values live in
  * [1, maxHop], so maxHop relaxation rounds are always enough — the
  * loop is bounded, no fixpoint detection needed. Correctness is
  * differential (ReachabilitySpec): refreshed labels equal a cold
  * [[hops]] run over the merged graph, on random graphs and on hand
  * fixtures for the newly-reachable / hop-shortcut / capped cases.
  *
  * Both take DIRECTED (src, dst) edges — callers union both
  * directions for undirected walks (the PageRank convention).
  */
object Reachability {

  /** Min-hop labels for every node within `maxHop` hops of `seeds`.
    * `edges`: (src, dst); `seeds`: (id). Returns (id, hop) with hop in
    * [0, maxHop] — one row per reachable node, seeds at 0. */
  def hops(edges: DataFrame, seeds: DataFrame, maxHop: Int): DataFrame = {
    require(maxHop >= 0, "reachability: maxHop >= 0")
    // only the frontiers are checkpointed (they nest hop over hop —
    // the g6 lineage lesson); the visited set is a UNION of already-
    // staged leaves, so it needs no checkpoint job of its own. The
    // emptiness probe rides the checkpoint job (Staging.freshCounted):
    // one driver job per hop, not two (§2.6).
    var (visited, fCount) = Staging.freshCounted(
      seeds.select(col("id")).distinct().withColumn("hop", lit(0L)))
    var frontier = visited
    var h = 1
    while (h <= maxHop && fCount > 0L) {
      val staged = Staging.freshCounted(edges
        .join(frontier.select(col("id").as("src")), Seq("src"), "left_semi")
        .select(col("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .withColumn("hop", lit(h.toLong)))
      frontier = staged._1
      fCount = staged._2
      visited = visited.unionByName(frontier)
      h += 1
    }
    visited
  }

  /** Hop-bounded WEIGHTED shortest distances (SSSP) from `seeds`:
    * dist(v) = min total weight over walks of at most `maxHop` edges
    * (positive weights ⇒ the min is attained by a simple path, so
    * "walks" costs nothing and needs no visited set). The engine is
    * the [[refreshHops]] improvement frontier, not the layer DP: per
    * round one equi-join of the CURRENT IMPROVEMENTS against the edge
    * relation + one map-side-combined min + one strict-improvement
    * probe against the best-known table — a node re-enters the
    * frontier only when its distance drops, so late rounds touch the
    * shrinking improved region, not every reached node (the DP
    * recomputes full node-sized layers every round). A candidate
    * pruned as not-better can never seed a better extension: its
    * extensions cost >= the known distance's own extensions, already
    * offered the round the known value landed. Exactly maxHop rounds
    * bound the loop (an improvement chain lengthens one edge per
    * round); the DuckDB oracle replays the equivalent layer DP.
    * Positive integer weights enforced loudly ([[PageRank.weighted]]'s
    * rule — a zero/negative weight breaks the pruning argument).
    * `edges`: (src, dst, w); returns (id, dist), seeds at 0. */
  def weightedDistances(edges: DataFrame, seeds: DataFrame, maxHop: Int): DataFrame = {
    require(maxHop >= 0, "reachability: maxHop >= 0")
    val e = edges.select(col("src"), col("dst"), col("w").cast("long"))
      .localCheckpoint(true)
    // NULL weights must hit the require too — `w <= 0` is NULL for
    // them, so without isNull they'd pass the guard and silently drop
    // relaxation candidates instead of failing loudly
    require(e.filter(col("w").isNull || col("w") <= 0L).isEmpty,
      "weighted distances: edge weights must be positive and non-null")
    var (best, fCount) = Staging.freshCounted(
      seeds.select(col("id").cast("long").as("id")).distinct()
        .withColumn("dist", lit(0L)))
    var frontier = best
    var h = 1
    while (h <= maxHop && fCount > 0L) {
      val staged = Staging.freshCounted(e
        .join(frontier.select(col("id").as("src"), col("dist").as("sdist")), Seq("src"))
        .groupBy(col("dst")).agg(min(col("sdist") + col("w")).as("cand"))
        .join(best.select(col("id").as("dst"), col("dist").as("known")), Seq("dst"), "left")
        .filter(col("cand") < coalesce(col("known"), lit(Long.MaxValue)))
        .select(col("dst").as("id"), col("cand").as("dist")))
      frontier = staged._1
      fCount = staged._2
      best = best.unionByName(frontier)
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
      h += 1
    }
    best
  }

  /** Hop-bounded TEMPORAL earliest-arrival reachability (Wu et al.
    * 2014, "Path problems in temporal graphs"): edges carry a
    * timestamp and a path must be time-respecting — edge (u, v, t) is
    * traversable only when t >= arrival(u) — so arrival(v) = the
    * earliest moment influence starting at the seeds (arrival 0) can
    * reach v through chronologically ordered events, within `maxHop`
    * edges. The primitive static reachability gets WRONG on event
    * data: a static path through edges that happened in the wrong
    * order claims influence that never flowed.
    *
    * Engine: the [[weightedDistances]] improvement frontier — per
    * round the current improvements equi-join the edge relation on the
    * node id with `t >= arrival` as a residual (the j6 band shape),
    * one map-side min, one strict-improvement probe. An improved
    * (lower) arrival only LOOSENS the residual, so improvements-only
    * candidate generation stays complete (the weightedDistances
    * argument, with monotone traversability on top). The oracle
    * replays the equivalent min-merged layer DP.
    * `edges`: (src, dst, t); returns (id, arr), seeds at 0. */
  def earliestArrival(edges: DataFrame, seeds: DataFrame, maxHop: Int): DataFrame = {
    require(maxHop >= 0, "reachability: maxHop >= 0")
    val e = edges.select(col("src"), col("dst"), col("t").cast("long"))
      .localCheckpoint(true)
    var (best, fCount) = Staging.freshCounted(
      seeds.select(col("id").cast("long").as("id")).distinct()
        .withColumn("arr", lit(0L)))
    var frontier = best
    var h = 1
    while (h <= maxHop && fCount > 0L) {
      val staged = Staging.freshCounted(e
        .join(frontier.select(col("id").as("src"), col("arr").as("sarr")), Seq("src"))
        .filter(col("t") >= col("sarr"))
        .groupBy(col("dst")).agg(min(col("t")).as("cand"))
        .join(best.select(col("id").as("dst"), col("arr").as("known")), Seq("dst"), "left")
        .filter(col("cand") < coalesce(col("known"), lit(Long.MaxValue)))
        .select(col("dst").as("id"), col("cand").as("arr")))
      frontier = staged._1
      fCount = staged._2
      best = best.unionByName(frontier)
        .groupBy(col("id")).agg(min(col("arr")).as("arr"))
      h += 1
    }
    best
  }

  /** Refreshed min-hop labels after `batchEdges` land on the graph
    * whose labels are `standing` (id, hop). `mergedEdges` is the full
    * post-batch edge relation (standing ∪ batch — the relaxation needs
    * it: an improvement propagates through OLD edges too). Returns the
    * complete refreshed table (id, hop, hop_prev) — hop_prev NULL for
    * newly-reachable nodes, so the delta is auditable in place (the
    * g13 output convention). */
  def refreshHops(standing: DataFrame, mergedEdges: DataFrame,
      batchEdges: DataFrame, maxHop: Int): DataFrame = {
    require(maxHop >= 0, "reachability: maxHop >= 0")
    val sentinel = maxHop.toLong + 1L // "unreached" for the strict compare
    def better(cands: DataFrame, best: DataFrame): DataFrame = cands
      .groupBy(col("id")).agg(min(col("cand")).as("cand"))
      .join(best.select(col("id"), col("hop").as("known")), Seq("id"), "left")
      .filter(col("cand") < coalesce(col("known"), lit(sentinel)))
      .select(col("id"), col("cand").as("hop"))

    // only the frontiers are checkpointed; the best-known relation
    // nests at most maxHop union/min layers over staged leaves
    // (standing + each round's frontier) — bounded, skinny, and
    // cheaper than paying a checkpoint barrier per round
    var best = standing.select(col("id"), col("hop"))
    // candidate improvements seeded by the batch edges alone: a batch
    // edge from a labeled source offers src.hop + 1 to its target
    var (frontier, fCount) = Staging.freshCounted(better(
      batchEdges
        .join(best.select(col("id").as("src"), col("hop").as("shop")), Seq("src"))
        .select(col("dst").as("id"), (col("shop") + 1L).as("cand"))
        .filter(col("cand") <= maxHop.toLong),
      best))
    // relax through the merged graph; value-k improvements only spawn
    // value-(k+1) ones, values live in [1, maxHop] -> maxHop rounds
    var r = 1
    while (r <= maxHop && fCount > 0L) {
      best = best.unionByName(frontier)
        .groupBy(col("id")).agg(min(col("hop")).as("hop"))
      val staged = Staging.freshCounted(better(
        mergedEdges
          .join(frontier.select(col("id").as("src"), col("hop").as("shop")), Seq("src"))
          .select(col("dst").as("id"), (col("shop") + 1L).as("cand"))
          .filter(col("cand") <= maxHop.toLong),
        best))
      frontier = staged._1
      fCount = staged._2
      r += 1
    }
    best.unionByName(frontier)
      .groupBy(col("id")).agg(min(col("hop")).as("hop"))
      .join(standing.select(col("id"), col("hop").as("hop_prev")), Seq("id"), "left")
      .select(col("id"), col("hop"), col("hop_prev"))
  }
}
