package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-motif census of an undirected graph — node/edge/wedge/
  * triangle/4-cycle counts in one row, the structural fingerprint
  * subgraph-frequency analyses start from (Milo et al. 2002, "Network
  * motifs"). Everything is a closed-form aggregate, no enumeration of
  * the motifs themselves:
  *
  *   wedges     Σ_v C(deg v, 2)               one degree aggregate
  *   triangles  Σ_{u<w} codeg(u,w) over EDGES (each triangle counted
  *              once per side) div 3
  *   4-cycles   Σ_{u<w} C(codeg(u,w), 2) over ALL pairs div 2 — a
  *              4-cycle is a diagonal pair {u,w} plus a 2-subset of
  *              their common neighbors, and each cycle owns exactly
  *              two diagonals (Alon, Yuster & Zwick's identity)
  *
  * codeg comes from ONE wedge aggregation (the [[LinkPrediction]]
  * shape without the candidate filters): work is Σ_z deg(z)² — the
  * triangle-counting cost model; at hub-heavy scale the caller clamps
  * the graph (k-core / strong-tier the edges) BEFORE the census, the
  * same preparation every motif paper applies, because an exact
  * census through a 10⁶-degree hub is 10¹² wedges by definition, not
  * by implementation choice. All counts exact BIGINT — the census
  * oracles hash-exact. */
object Motifs {

  /** One row: (n_nodes, n_edges, n_wedges, n_triangles, n_four_cycles)
    * for `edges` (distinct undirected pairs, id_a < id_b, no
    * self-loops). */
  def census(edges: DataFrame): DataFrame = {
    val e = edges.select(col("id_a"), col("id_b")).localCheckpoint(true)
    val ed = e.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(e.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    val deg = ed.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val basics = deg.agg(count(lit(1)).as("n_nodes"),
      (sum(col("deg")) / 2L).cast("long").as("n_edges"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    // codeg per unordered pair from one wedge aggregation, staged —
    // the triangle and 4-cycle sums both read it
    val codeg = ed.as("x").join(ed.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .groupBy(col("x.dst").as("u"), col("y.dst").as("w"))
      .agg(count(lit(1)).as("cd"))
      .localCheckpoint(true)
    val tri = codeg
      .join(e.select(col("id_a").as("u"), col("id_b").as("w")), Seq("u", "w"),
        "left_semi")
      .agg(coalesce(sum(col("cd")), lit(0L)).as("tri3"))
      .select(expr("tri3 div 3").as("n_triangles"))
    val cyc = codeg
      .agg(coalesce(sum(expr("cd * (cd - 1) div 2")), lit(0L)).as("cyc2"))
      .select(expr("cyc2 div 2").as("n_four_cycles"))
    basics.join(broadcast(tri)).join(broadcast(cyc)) // 1-row scalars
  }
}
