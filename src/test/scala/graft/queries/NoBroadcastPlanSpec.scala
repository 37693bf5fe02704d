package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** The "plan at cluster scale" view for the round-13 operators: with
  * broadcast joins disabled (no side fits under any threshold at
  * 100 TB), every join must still plan as a hash/sort-merge EQUI join —
  * a query that silently degrades to a nested loop when its small side
  * outgrows the broadcast threshold is a 100 TB incident in waiting.
  * The one sanctioned exception is an EXPLICIT broadcast() of a
  * metadata-scale relation (documented at each site), which rightly
  * survives the threshold. */
class NoBroadcastPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planNoBroadcast(name: String): SparkPlan = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def assertEquiOnly(name: String, allowedBnlj: Int = 0): Unit = {
    val p = planNoBroadcast(name)
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      s"$name plans a cartesian without broadcast:\n$p")
    val bnlj = p.collect { case b: BroadcastNestedLoopJoinExec => b }
    assert(bnlj.size <= allowedBnlj,
      s"$name: ${bnlj.size} nested-loop joins without broadcast (allowed $allowedBnlj):\n$p")
  }

  test("j10 fuzzy join plans equi-only without broadcast") {
    assertEquiOnly("j10_fuzzy_join")
  }

  test("j11 set-similarity join plans equi-only without broadcast") {
    // the length filter and id ordering ride as residuals on the
    // prefix-token equi key, never as a join strategy downgrade
    assertEquiOnly("j11_set_sim_join")
  }

  test("g8 pagerank plans equi-only without broadcast") {
    assertEquiOnly("g8_pagerank")
  }

  test("g6/g7 keep their shapes without broadcast") {
    assertEquiOnly("g6_khop_reachability")
    // g7's single BNLJ is the explicit 1-row scalar-threshold
    // broadcast — metadata-scale by construction, sanctioned
    assertEquiOnly("g7_copurchase_projection", allowedBnlj = 1)
  }

  test("round-13 second-half queries plan equi-only without broadcast") {
    // t8's candidate set and x3/x5's 1-row scalar sides are explicit
    // broadcast() of capacity/metadata-scale relations (sanctioned);
    // none of these may fall back to a nested loop or cartesian
    assertEquiOnly("t8_heavy_hitters")
    assertEquiOnly("j12_entity_resolution")
    assertEquiOnly("j13_er_incremental")
    // g9/g10's adjacency + rank broadcasts are size-gated explicit
    // hints (Triangles scaladoc); the underlying joins are all equi
    assertEquiOnly("g9_triangles")
    assertEquiOnly("g10_clustering")
    assertEquiOnly("g11_tri_incremental")
    assertEquiOnly("g12_kcore")
    assertEquiOnly("g13_pagerank_incremental")
    assertEquiOnly("g14_reach_incremental")
    assertEquiOnly("g15_communities")
    assertEquiOnly("g16_walk_corpus")
    assertEquiOnly("g17_walk_pairs")
    assertEquiOnly("g18_ppr")
    assertEquiOnly("g19_components")
    assertEquiOnly("g20_coreness")
    assertEquiOnly("g21_communities_incremental")
    assertEquiOnly("g22_harmonic")
    assertEquiOnly("g23_pagerank_weighted")
    assertEquiOnly("g24_kcore_incremental")
    assertEquiOnly("g25_sssp")
    assertEquiOnly("g26_label_spread")
    assertEquiOnly("g27_temporal_reach")
    // g28's single BNLJ is the explicit 1-row numer-total broadcast
    // (the x4 scalar convention)
    assertEquiOnly("g28_modularity", allowedBnlj = 1)
    assertEquiOnly("g29_assortativity")
    assertEquiOnly("g30_node2vec_corpus")
    assertEquiOnly("g31_louvain")
    assertEquiOnly("g32_betweenness")
    assertEquiOnly("g33_link_features")
    assertEquiOnly("g34_ktruss")
    assertEquiOnly("g35_ktruss_incremental")
    assertEquiOnly("g36_louvain_multilevel")
    assertEquiOnly("x6_anf")
    assertEquiOnly("g37_link_incremental")
    // g38's two BNLJs are the explicit 1-row triangle/4-cycle scalar
    // broadcasts (the x4 convention)
    assertEquiOnly("g38_motifs", allowedBnlj = 2)
    // g39's two BNLJs are the deg>k / mindeg>k band joins against the
    // explicit broadcast 6-row literal threshold series
    assertEquiOnly("g39_richclub", allowedBnlj = 2)
    assertEquiOnly("g40_components_incremental")
    // drift's single BNLJ is the explicit 1-row l1-total broadcast
    // (the x4 scalar convention)
    assertEquiOnly("drift_at_rest")
    assertEquiOnly("text_drift_tv", allowedBnlj = 1)
    assertEquiOnly("embed_drift", allowedBnlj = 1)
    assertEquiOnly("x3_sketch_at_rest")
    assertEquiOnly("x5_quantile_at_rest")
    assertEquiOnly("x4_cms_bounds", allowedBnlj = 1) // explicit 1-row sketch scalar
  }
}
