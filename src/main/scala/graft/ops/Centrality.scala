package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hop-bounded harmonic centrality from a seed cohort — the
  * closeness-family primitive beside PageRank's eigenvector family:
  * H(v) = Σ over seeds s with 0 < d(s, v) <= maxHop of 1/d(s, v),
  * scored in integer millionths (floor(1e6 / d) per reaching seed) so
  * the value is a pure function of the edge set and DuckDB-oracle-able
  * (Boldi & Vigna 2014, "Axioms for centrality" — harmonic handles
  * disconnected/unreached pairs by contributing zero, which is exactly
  * what a hop bound needs; classic closeness 1/Σd diverges there).
  *
  * The engine is a MULTI-SOURCE LABELED BFS: [[Reachability.hops]]
  * merges seeds into one min-hop frontier, but centrality needs the
  * distance from EVERY seed separately, so the frontier/visited keys
  * are (seed, id) PAIRS. Per hop: one equi-join of the pair frontier
  * against the edge relation + one anti-join against the visited pair
  * set, frontiers eagerly staged (the g6 lineage lesson, pair-keyed).
  * Work and state are O(seeds × reached) pairs — the seed cohort is
  * the knob (sampled cohorts for estimates, the Eppstein–Wang /
  * HyperBall trade made explicit), never all-pairs.
  */
object Centrality {

  /** (node_id, centrality_ppm, n_seeds_reaching) for every non-seed
    * node within `maxHop` of at least one seed — plus seed nodes when
    * another seed reaches them (self-distance contributes nothing).
    * `edges`: directed (src, dst); `seeds`: (id). */
  def harmonic(edges: DataFrame, seeds: DataFrame, maxHop: Int): DataFrame = {
    require(maxHop >= 1, "harmonic: maxHop >= 1")
    // layer 0: each seed at distance 0 of itself
    var visited = seeds.select(col("id").cast("long").as("seed"))
      .distinct()
      .select(col("seed"), col("seed").as("id"), lit(0L).as("hop"))
      .localCheckpoint(true)
    var frontier = visited
    var h = 1
    while (h <= maxHop && !frontier.isEmpty) {
      frontier = edges
        .join(frontier.select(col("seed"), col("id").as("src")), Seq("src"))
        .select(col("seed"), col("dst").as("id")).distinct()
        .join(visited.select(col("seed"), col("id")), Seq("seed", "id"), "left_anti")
        .withColumn("hop", lit(h.toLong)).localCheckpoint(true)
      visited = visited.unionByName(frontier)
      h += 1
    }
    // per-seed contribution floor(1e6 / hop) in INTEGER division (the
    // uint256/PageRank discipline: no float ever faces the oracle)
    visited.filter(col("hop") >= 1L)
      .groupBy(col("id"))
      .agg(sum(expr("1000000L div hop")).as("centrality_ppm"),
        count(lit(1)).as("n_seeds_reaching"))
      .select(col("id").as("node_id"), col("centrality_ppm"),
        col("n_seeds_reaching"))
  }
}
