package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition contraction — the multi-level step between community
  * rounds (Blondel et al. 2008's phase 2): collapse each community
  * into one supernode; edges between communities merge into ONE
  * weighted edge, edges inside a community become the supernode's
  * SELF-LOOP weight. The contracted multigraph preserves modularity
  * exactly (Q of a partition of the supernode graph equals Q of the
  * induced partition of the original — the identity multi-level
  * Louvain rests on), so a weighted move pass over supernodes
  * ([[Louvain.oneLevelWeighted]]) continues optimizing the SAME
  * objective at a fraction of the size.
  *
  * Shape: two label equi-joins onto the edge relation + one weighted
  * aggregate — O(|E|) once, output O(|communities|²) at worst but
  * community-graph-sized in practice. Output convention: one row per
  * supernode pair `(id_a <= id_b, w)`; `id_a == id_b` rows ARE the
  * self-loops (intra-community edge counts), the standard weighted-
  * multigraph encoding the weighted pass consumes directly.
  */
object Coarsen {

  /** Contract `edges` (distinct undirected pairs, id_a < b, no
    * self-loops) by `labels` (node, lbl — covering every endpoint).
    * Returns (id_a, id_b, w) with id_a <= id_b over community ids. */
  def contract(edges: DataFrame, labels: DataFrame): DataFrame = {
    val lab = labels.select(col("node"), col("lbl")).localCheckpoint(true)
    edges
      .join(lab.select(col("node").as("id_a"), col("lbl").as("la")), Seq("id_a"))
      .join(lab.select(col("node").as("id_b"), col("lbl").as("lb")), Seq("id_b"))
      .groupBy(least(col("la"), col("lb")).as("id_a"),
        greatest(col("la"), col("lb")).as("id_b"))
      .agg(count(lit(1)).as("w"))
  }

  /** Contract an already-weighted multigraph `g` (id_a <= id_b, w;
    * self-loops allowed) by `labels` (node, lbl — covering every
    * endpoint), SUMMING weights: contraction composes, so contracting
    * level N's multigraph by level N+1's labels equals contracting the
    * base graph by the composed labels — every base edge lands in the
    * same supernode cell either way, and the summed counts are the
    * same integers. This is what lets [[Louvain.multiLevel]] never
    * re-touch the base edge set past level 1 (r17, guide §2.4). */
  def contractWeighted(g: DataFrame, labels: DataFrame): DataFrame = {
    val lab = labels.select(col("node"), col("lbl")).localCheckpoint(true)
    g
      .join(lab.select(col("node").as("id_a"), col("lbl").as("la")), Seq("id_a"))
      .join(lab.select(col("node").as("id_b"), col("lbl").as("lb")), Seq("id_b"))
      .groupBy(least(col("la"), col("lb")).as("id_a"),
        greatest(col("la"), col("lb")).as("id_b"))
      .agg(sum(col("w")).as("w"))
  }
}
