package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity of a node partition over an undirected graph —
  * the quality metric the community family (LPA, components) needs to
  * be judged by, not just produced: Q = Σ_c (in_c/m − (deg_c/2m)²),
  * in_c = intra-community edges, deg_c = degree mass, m = edges.
  *
  * Exactness discipline: everything is integer until ONE division —
  * per community the numerator 4·m·in_c − deg_c² is exact on a
  * DECIMAL(38,0) lattice (4m² fits up to m ≤ 10¹⁸ edges — decimal128
  * at scale 0 is exact integer arithmetic, so there is no refusal
  * ceiling left; the lattice columns are per-COMMUNITY, never
  * corpus-scale), the shared denominator is 4m², and the double
  * quotient is a single IEEE operation — deterministic across engines
  * (the o9_retention precedent), unlike a sum of per-term doubles.
  * BigDecimal→double conversion is correctly rounded, so the quotient
  * equals the BIGINT-lattice value wherever both representations hold
  * the same integer (hash parity with a BIGINT-arithmetic oracle).
  *
  * Shape: intra counts are one join of the (a < b) edge list against
  * the label relation on BOTH endpoints + one aggregate; degree mass
  * is one join of the bidirectional edges + one aggregate; totals ride
  * as a broadcast 1-row relation (the x4 scalar convention).
  */
object Modularity {

  /** Per-community modularity decomposition plus the whole-partition
    * score on every row: (community, n_members, in_edges, deg_sum,
    * numer, denom, q_contrib, q_total). `numer`/`denom` are
    * DECIMAL(38,0) — exact past the BIGINT range; consumers reporting
    * at verified SFs may cast them back to long. `edges`: distinct
    * undirected pairs (id_a, id_b), a < b, no self-loops; `labels`:
    * (node, lbl) covering every edge endpoint. */
  def ofPartition(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges.select(col("id_a"), col("id_b")).localCheckpoint(true)
    val lab = labels.select(col("node"), col("lbl")).localCheckpoint(true)
    val m = e.count()
    require(m <= 1000000000000000000L, // 10^18: 4m^2 <= 4e36 < 10^38
      s"modularity: $m edges — 4m^2 exceeds the DECIMAL(38,0) lattice")
    val intra = e
      .join(lab.select(col("node").as("id_a"), col("lbl").as("la")), Seq("id_a"))
      .join(lab.select(col("node").as("id_b"), col("lbl").as("lb")), Seq("id_b"))
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("lbl")).agg(count(lit(1)).as("in_edges"))
    val degs = e.select(col("id_a").as("node"))
      .unionByName(e.select(col("id_b").as("node")))
      .join(lab, Seq("node"))
      .groupBy(col("lbl"))
      .agg(count(lit(1)).as("deg_sum"), count_distinct(col("node")).as("n_members"))
    val per = degs.join(intra, Seq("lbl"), "left")
      .select(col("lbl").as("community"), col("n_members"),
        coalesce(col("in_edges"), lit(0L)).as("in_edges"), col("deg_sum"),
        (lit(BigDecimal(4L) * BigDecimal(m)).cast("decimal(38,0)")
            * coalesce(col("in_edges"), lit(0L)).cast("decimal(38,0)")
          - col("deg_sum").cast("decimal(38,0)")
            * col("deg_sum").cast("decimal(38,0)")).as("numer"),
        lit(BigDecimal(4L) * BigDecimal(m) * BigDecimal(m))
          .cast("decimal(38,0)").as("denom"))
      .withColumn("q_contrib",
        col("numer").cast("double") / col("denom").cast("double"))
    val total = per.agg(sum(col("numer")).as("numer_total"))
    per.join(broadcast(total))
      .withColumn("q_total",
        col("numer_total").cast("double") / col("denom").cast("double"))
      .drop("numer_total")
  }
}
