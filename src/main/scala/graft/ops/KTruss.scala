package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss decomposition by iterative support peeling (Cohen 2008,
  * "Trusses: cohesive subgraphs for social network analysis"): delete
  * every edge participating in fewer than k−2 triangles WITHIN the
  * surviving subgraph until no edge changes. The edge-cohesion
  * primitive one notch stronger than [[KCore]]'s node degree — a
  * k-truss is always inside the (k−1)-core, but demands the ties be
  * closed into triangles, which is what separates a genuine community
  * nucleus from a hub-and-spoke star.
  *
  * Per round (the [[KCore.peel]] discipline, lifted from node degrees
  * to edge supports):
  *  - triangles enumerate by DEGREE-ORDERED orientation exactly like
  *    [[Triangles.perNodeCounts]] (each triangle found once at its
  *    rank-min corner; wedge work is bounded by out-degrees ~
  *    arboricity, not raw hub degrees);
  *  - support = one aggregate over the 3 canonical edge projections of
  *    the triangle relation;
  *  - the surviving edge set is localCheckpoint-staged per round, so
  *    lineage stays one round deep; rounds bounded by `maxRounds`
  *    failing LOUDLY (the Dedup.clusters rule).
  *
  * The fixpoint is the unique maximal such subgraph (support only
  * drops when edges leave, so peeling is confluent — the Matula–Beck
  * argument edge-wise), hence DuckDB-oracle-able by unrolling rounds
  * with headroom (surplus rounds are the identity at the fixpoint).
  *
  * Requires k >= 3: the 2-truss is every edge (support >= 0) and the
  * inner support join would silently drop triangle-free edges —
  * enforce rather than special-case a vacuous tier. */
object KTruss {

  /** Edges of the k-truss of `edges` (distinct undirected pairs
    * id_a < id_b, no self-loops), plus each surviving edge's in-truss
    * support: (id_a, id_b, support). */
  def truss(edges: DataFrame, k: Int, maxRounds: Int = 64): DataFrame = {
    require(k >= 3, "k_truss: k >= 3 (the 2-truss is the whole graph)")
    require(maxRounds >= 1, "k_truss: maxRounds >= 1")
    var cur = edges.select(col("id_a"), col("id_b")).localCheckpoint(true)
    var curEdges = cur.count()
    var rounds = 0
    var result: DataFrame = null
    while (result == null) {
      require(rounds < maxRounds,
        s"k_truss: no fixpoint after $maxRounds peel rounds ($curEdges edges live)")
      val sup = support(cur)
      val next = cur.join(sup, Seq("id_a", "id_b"))
        .filter(col("support") >= k - 2)
      val nextEdges = next.count()
      if (nextEdges == curEdges || nextEdges == 0L) result = next
      else {
        cur = next.select(col("id_a"), col("id_b")).localCheckpoint(true)
        curEdges = nextEdges
        rounds += 1
      }
    }
    result
  }

  /** Per-edge triangle support within `e` (staged, a < b): degree-
    * ordered orientation, wedge join at the rank-min corner, closing-
    * edge probe, then one aggregate over the three canonical edge
    * projections. Edges in no triangle are ABSENT (callers join
    * inner — the k >= 3 contract makes that the filter they want). */
  private def support(e: DataFrame): DataFrame = {
    val deg = e.select(explode(array(col("id_a"), col("id_b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // the Triangles packed-rank domain rule: only total for ids in
    // [0, 2^32) — enforced loudly, map-side
    val vOk = when(col("v") >= 0 && col("v") < lit(1L << 32), col("v"))
      .otherwise(raise_error(concat(
        lit("k_truss: node id out of [0, 2^32): "), col("v").cast("string"))))
    val rk = deg.select(vOk.as("v"),
      (col("d") * lit(1L << 32) + col("v")).as("rk"))
    val oriented = e
      .join(broadcast(rk.select(col("v").as("id_a"), col("rk").as("rka"))), "id_a")
      .join(broadcast(rk.select(col("v").as("id_b"), col("rk").as("rkb"))), "id_b")
      .select(
        when(col("rka") < col("rkb"), col("id_a")).otherwise(col("id_b")).as("src"),
        when(col("rka") < col("rkb"), col("id_b")).otherwise(col("id_a")).as("dst"),
        greatest(col("rka"), col("rkb")).as("rkdst"))
      .localCheckpoint(true) // wedge sides + closing probe
    val tri = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.rkdst") < col("e2.rkdst"))
      .select(col("e1.src").as("v0"), col("e1.dst").as("v1"), col("e2.dst").as("v2"))
      .join(oriented.select(col("src").as("v1"), col("dst").as("v2")),
        Seq("v1", "v2"), "left_semi")
    // canonical (a < b) projections of each triangle's three edges
    tri.select(least(col("v0"), col("v1")).as("id_a"),
        greatest(col("v0"), col("v1")).as("id_b"))
      .unionByName(tri.select(least(col("v0"), col("v2")).as("id_a"),
        greatest(col("v0"), col("v2")).as("id_b")))
      .unionByName(tri.select(least(col("v1"), col("v2")).as("id_a"),
        greatest(col("v1"), col("v2")).as("id_b")))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("support"))
  }
}
