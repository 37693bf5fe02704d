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

  /** INCREMENTAL feature refresh under insert-only edge arrival — the
    * delta-region recompute pattern (the g11 newTriangles discipline,
    * not the monotone-protection one: features are NOT monotone — a
    * batch edge kills its own candidate pair and rewrites every index
    * that touches its endpoints). Let T = the batch's endpoint set. A
    * feature row (u, w) can change ONLY if
    *   (a) u or w ∈ T (their degrees moved — jaccard/pref_attach — or
    *       the pair itself became an edge), or
    *   (b) some permitted common neighbor z ∈ T (its degree moved the
    *       RA term, its cap status flipped, or a batch edge at z
    *       created the wedge in the first place — a new wedge needs a
    *       batch edge, whose endpoints are all in T).
    * So: AFFECTED candidate pairs are generated anchored on T (wedges
    * with a T endpoint + wedges through a T center — every
    * intermediate bounded by T's 2-hop region), their features
    * recomputed IN FULL over the merged graph, and unaffected standing
    * rows carry verbatim. The result provably equals the cold
    * [[features]] of the merged graph (LinkPredictionSpec proves it
    * differentially on random splits).
    *
    * Output: the cold columns + `prev_common_neighbors` (NULL for
    * pairs the batch created — the g13/g24 delta convention).
    * `standingFeatures`: [[features]] over the pre-batch edges with
    * the SAME maxHubDeg. */
  def refreshFeatures(standingFeatures: DataFrame, mergedEdges: DataFrame,
      batchEdges: DataFrame, maxHubDeg: Long): DataFrame = {
    require(maxHubDeg >= 1L, "link features: maxHubDeg >= 1")
    val e = mergedEdges.select(col("id_a"), col("id_b")).localCheckpoint(true)
    val ed = e.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(e.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    val deg = ed.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val touched = batchEdges.select(col("id_a").as("node"))
      .unionByName(batchEdges.select(col("id_b").as("node"))).distinct()
      .localCheckpoint(true)
    val centers = ed.join(
      deg.filter(col("deg") <= maxHubDeg).select(col("node").as("src")),
      Seq("src"), "left_semi").localCheckpoint(true) // two anchored generators + the recompute
    // (a) wedges with a TOUCHED endpoint: anchor (z, u∈T), pair with
    // every other neighbor of z — output order-normalized
    val viaEndpoint = centers
      .join(touched.select(col("node").as("dst")), Seq("dst"), "left_semi")
      .select(col("src").as("z"), col("dst").as("t"))
      .join(centers.withColumnRenamed("src", "z"), Seq("z"))
      .filter(col("dst") =!= col("t"))
      .select(least(col("t"), col("dst")).as("u"),
        greatest(col("t"), col("dst")).as("w"))
    // (b) wedges through a TOUCHED center — over the UNCAPPED
    // adjacency, deliberately: a touched center whose degree crossed
    // maxHubDeg just left the permitted set, and the pairs that were
    // counting it must be refreshed (they'd carry stale through the
    // capped generator); degrees only grow under insert-only arrival,
    // so capped→permitted never happens and untouched centers never
    // flip. Cost is deg² per TOUCHED center only.
    val viaCenter = ed
      .join(touched.select(col("node").as("src")), Seq("src"), "left_semi")
    val viaCenterPairs = viaCenter.as("x").join(viaCenter.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .select(col("x.dst").as("u"), col("y.dst").as("w"))
    val affected = viaEndpoint.unionByName(viaCenterPairs).distinct()
      .join(e.select(col("id_a").as("u"), col("id_b").as("w")),
        Seq("u", "w"), "left_anti")
      .localCheckpoint(true)
    // full recompute of the affected pairs over the merged graph:
    // common neighbors via ONE pair⋈adjacency join + one existence
    // probe, work ∝ Σ deg(u) over affected pairs
    val recomputed = affected
      .join(centers.select(col("dst").as("u"), col("src").as("z")), Seq("u"))
      .join(ed.select(col("src").as("z"), col("dst").as("w")), Seq("z", "w"),
        "left_semi")
      .join(deg.select(col("node").as("z"), col("deg").as("deg_z")), Seq("z"))
      .groupBy(col("u"), col("w"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(expr("1000000L div deg_z")).as("resource_alloc_ppm"))
      .join(deg.select(col("node").as("u"), col("deg").as("deg_u")), Seq("u"))
      .join(deg.select(col("node").as("w"), col("deg").as("deg_w")), Seq("w"))
      .select(col("u").as("id_a"), col("w").as("id_b"),
        col("common_neighbors"), col("resource_alloc_ppm"),
        (col("deg_u") * col("deg_w")).as("pref_attach"),
        expr("(common_neighbors * 1000000L) div (deg_u + deg_w - common_neighbors)")
          .as("jaccard_ppm"))
    // unchanged standing rows carry; affected rows (including pairs
    // that lost their last permitted witness) are REPLACED by the
    // recompute — absent from it means gone. Pairs the batch turned
    // INTO edges need their own anti-join: the affected set excludes
    // merged edges by construction, so without this they'd carry as
    // stale candidates
    val carried = standingFeatures
      .select(col("id_a"), col("id_b"), col("common_neighbors"),
        col("resource_alloc_ppm"), col("pref_attach"), col("jaccard_ppm"))
      .join(affected.select(col("u").as("id_a"), col("w").as("id_b")),
        Seq("id_a", "id_b"), "left_anti")
      .join(e, Seq("id_a", "id_b"), "left_anti")
    carried.unionByName(recomputed)
      .join(standingFeatures.select(col("id_a"), col("id_b"),
        col("common_neighbors").as("prev_common_neighbors")),
        Seq("id_a", "id_b"), "left")
  }
}
