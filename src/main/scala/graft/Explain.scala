package graft
import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan for the queries
  * whose scale behavior matters most (pushdown, broadcast, codegen
  * spans). Usage: runMain graft.Explain [name ...]
  *
  * SPARK_GRAFT_NO_BROADCAST=1 disables broadcast joins — the "plan at
  * cluster scale" view, where stats no longer fit any side under the
  * broadcast threshold and self-joins should show ReusedExchange.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val noBroadcast = sys.env.get("SPARK_GRAFT_NO_BROADCAST").contains("1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", if (noBroadcast) "-1" else "10MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s4_ranged_scan", "s7_time_dim_join", "a1_token_rollup",
        "k1_versioned_upsert", "dedup_minhash", "ann_bruteforce", "j2_full_outer_reconcile",
        // round-10 flagships: projection-only classifier, per-side OR
        // pushdown, self-aggregation join, banded LSH recall harness
        "text_classify", "q19_discounted_revenue", "q17_small_quantity", "ann_lsh_multi",
        // round-12 flagships: Expand-free double-distinct decorrelation,
        // window-min argmin (single fact scan), compressed cell-pruned
        // ANN, keyless bucketed range join, per-key gap-fill grid
        "q21_waiting_orders", "q2_min_cost_supplier", "ann_ivfpq",
        "j8_point_in_interval", "t6_resample",
        // round-13 flagships: deletion-neighborhood fuzzy join,
        // prefix-filtered set-similarity join, staged iterative
        // PageRank, chained-conditional-min funnel
        "j10_fuzzy_join", "j11_set_sim_join", "g8_pagerank", "o8_funnel",
        // round-13 second-half flagships: sketch-candidate + broadcast
        // recount heavy hitters, adjacency-intersection triangles,
        // blocked-conjunction entity resolution, sketch-at-rest rollup
        "t8_heavy_hitters", "g9_triangles", "j12_entity_resolution",
        "x3_sketch_at_rest",
        // round-14 flagships: warm-start incremental PageRank, exact
        // incremental reachability relabeling, packed-argmax LPA
        // communities, md5-drawn walk corpus
        "g13_pagerank_incremental", "g14_reach_incremental",
        "g15_communities", "g16_walk_corpus")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
