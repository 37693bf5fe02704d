package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Local link-prediction features (Liben-Nowell & Kleinberg 2003,
  * "The link prediction problem for social networks") — the graph
  * FEATURE-ENGINEERING primitive: for every candidate pair at distance
  * 2 (sharing at least one neighbor, not already linked), the classic
  * similarity indices a ranking model trains on:
  *
  *   common_neighbors    |Γ(u) ∩ Γ(w)| — exact integer
  *   resource_alloc_ppm  Σ_z 10⁶ div deg(z) over common neighbors z —
  *                       Zhou, Lü & Zhang 2009's RA index; Adamic–Adar
  *                       is the same sum with 1/ln deg(z), and ln's
  *                       libm rounding differs across engines, so RA
  *                       is the oracled member of that family (the
  *                       drift TV-over-KL choice again)
  *   pref_attach         deg(u) · deg(w) — exact
  *   jaccard_ppm         |∩| · 10⁶ div (deg(u) + deg(w) − |∩|)
  *
  * Shape: candidate generation is WEDGE enumeration — one self-join of
  * the bidirectional edge relation on the shared endpoint z with
  * u < w as a residual (never a node×node cross product), one
  * anti-join against the existing edge set, one (u,w) aggregate, two
  * skinny degree joins. Work is Σ_z deg(z)² — the triangle-counting
  * cost model — so hubs above `maxHubDeg` are EXCLUDED as wedge
  * centers (the standard practicality cap for these indices: a
  * 10⁶-degree hub contributes 10¹² wedges and ~0 discriminative
  * signal; RA's own 1/deg weight says as much). The cap is part of
  * the FEATURE DEFINITION, not just candidate recall: every index
  * here counts/weighs only common neighbors of degree <= maxHubDeg
  * (counting hub commons exactly would require the very hub wedge
  * join the cap exists to avoid), and jaccard's denominator still
  * uses the TRUE degrees — both facts mirrored in the oracle. */
object LinkPrediction {

  /** `edges`: distinct undirected pairs (id_a, id_b), a < b, no
    * self-loops. Returns one row per distance-2 candidate pair
    * discovered through a wedge center of degree <= `maxHubDeg`:
    * (id_a, id_b, common_neighbors, resource_alloc_ppm, pref_attach,
    * jaccard_ppm), id_a < id_b. */
  def features(edges: DataFrame, maxHubDeg: Long): DataFrame = {
    require(maxHubDeg >= 1L, "link features: maxHubDeg >= 1")
    val e = edges.select(col("id_a"), col("id_b")).localCheckpoint(true)
    val ed = e.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(e.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true) // two consumers: degrees + both wedge sides
    val deg = ed.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true) // three consumers: center filter + u + w
    // wedges through permitted centers z: one equi-join on z, u < w
    val centers = ed.join(
      deg.filter(col("deg") <= maxHubDeg).select(col("node").as("src")),
      Seq("src"), "left_semi")
    val wedges = centers.as("x").join(centers.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .select(col("x.src").as("z"), col("x.dst").as("u"), col("y.dst").as("w"))
    // drop already-linked pairs (u < w matches the canonical edge order)
    val cand = wedges.join(
        e.select(col("id_a").as("u"), col("id_b").as("w")),
        Seq("u", "w"), "left_anti")
      .join(deg.select(col("node").as("z"), col("deg").as("deg_z")), Seq("z"))
      .groupBy(col("u"), col("w"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(expr("1000000L div deg_z")).as("resource_alloc_ppm"))
    cand
      .join(deg.select(col("node").as("u"), col("deg").as("deg_u")), Seq("u"))
      .join(deg.select(col("node").as("w"), col("deg").as("deg_w")), Seq("w"))
      .select(col("u").as("id_a"), col("w").as("id_b"),
        col("common_neighbors"), col("resource_alloc_ppm"),
        (col("deg_u") * col("deg_w")).as("pref_attach"),
        expr("(common_neighbors * 1000000L) div (deg_u + deg_w - common_neighbors)")
          .as("jaccard_ppm"))
  }
}
