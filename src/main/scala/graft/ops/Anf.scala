package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate neighborhood function — ANF (Palmer, Gibbons &
  * Faloutsos 2002) by the HyperBall iteration (Boldi & Vigna 2013,
  * "In-core computation of geometric centralities with HyperBall"):
  * N(h) = Σ_v |ball_h(v)|, the number of ordered reachable pairs
  * within h hops — THE scalable way to read a 100 TB graph's
  * effective diameter and reach profile, because each node carries a
  * KB-scale mergeable HLL sketch of its ball instead of the ball
  * itself:
  *
  *   ball_h(v) = {v} ∪ ⋃ over out-edges (v, w) of ball_{h−1}(w)
  *
  * — per hop ONE equi-join of the edge relation against the skinny
  * (node, sketch) state + one hll_union_agg, state staged per hop.
  * Work is O(|E|) sketch merges per hop at ANY graph size; the exact
  * all-pairs BFS this replaces is O(Σ|ball|) rows — quadratic-ish and
  * the reason nobody computes exact diameters at scale.
  *
  * The estimates are approximate by definition, so the oracled
  * contract is the x2/x3 discipline: the QUERY asserts the per-hop
  * estimate against the exact pair count (its own BFS — the
  * documented exact-truth harness, dedup_recall's role) and ships
  * deterministic columns (hop, exact_pairs, ok-boolean); this op
  * ships only the sketch path. */
object Anf {

  /** Per-hop neighborhood function estimates: (hop, est_pairs) for
    * hop = 1..maxHop over directed `edges` (src, dst). est_pairs
    * INCLUDES the h=0 self-pairs (|ball_0| = 1 per node), matching
    * the classic N(h) definition. */
  def neighborhoodFunction(edges: DataFrame, maxHop: Int): DataFrame = {
    require(maxHop >= 1, "anf: maxHop >= 1")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    var state = nodes.groupBy(col("node"))
      .agg(hll_sketch_agg(col("node")).as("sk"))
      .localCheckpoint(true)
    var out = Seq.empty[DataFrame]
    for (h <- 1 to maxHop) {
      val nbr = e.join(state.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node")).agg(hll_union_agg(col("sk")).as("nsk"))
      state = state.join(nbr, Seq("node"), "left")
        .select(col("node"),
          when(col("nsk").isNull, col("sk"))
            .otherwise(hll_union(col("sk"), col("nsk"))).as("sk"))
        .localCheckpoint(true)
      out :+= state
        .agg(sum(hll_sketch_estimate(col("sk"))).as("est_pairs"))
        .select(lit(h.toLong).as("hop"), col("est_pairs"))
    }
    out.reduce(_.unionByName(_))
  }
}
