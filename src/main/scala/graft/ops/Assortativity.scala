package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree assortativity (Newman 2002): the Pearson correlation of
  * endpoint degrees over the directed edge list — do hubs attach to
  * hubs (r > 0, social-network-like) or to leaves (r < 0,
  * internet-like)? The one-number structural summary beside the
  * centrality/community families.
  *
  * Exactness discipline: the five moment sums (Σx, Σy, Σxy, Σx², Σy²)
  * and the edge count are exact BIGINTs from ONE aggregate; r is a
  * FIXED arithmetic tree on those scalars — divisions, multiplies and
  * IEEE-correctly-rounded sqrt only (sqrt rounds identically across
  * engines; ln does not — the Drift lesson), so the double replays
  * hash-exact in DuckDB. A zero variance side (degree-regular graph)
  * yields NULL, not a NaN/Inf parquet-vs-SQL mismatch. Overflow is
  * guarded loudly: m·dmax < 3·10⁹ keeps m·Σxy under 2⁶³ (beyond that
  * the sums upgrade to DECIMAL, documented here, unreachable at any
  * test SF). */
object Assortativity {

  /** One row: (m directed edges, sx, sy, sxy, sxx, syy, r).
    * `edges`: distinct undirected pairs (id_a, id_b), a < b. */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("id_a"), col("id_b")).localCheckpoint(true)
    val deg = e.select(col("id_a").as("v"))
      .unionByName(e.select(col("id_b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    // m·dmax bounds every moment product: m·Σxy <= m²·dmax², so
    // m·dmax < 3e9 keeps the largest term under 2⁶³
    val guard = deg.agg(sum(col("d")), max(col("d"))).collect().head
    if (!guard.isNullAt(1))
      require(BigInt(guard.getLong(0)) * BigInt(guard.getLong(1)) < BigInt(3000000000L),
        "assortativity: m*dmax too large for BIGINT moments — upgrade to DECIMAL")
    val dir = e.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(e.select(col("id_b").as("src"), col("id_a").as("dst")))
      .join(deg.select(col("v").as("src"), col("d").as("x")), Seq("src"))
      .join(deg.select(col("v").as("dst"), col("d").as("y")), Seq("dst"))
    dir.agg(count(lit(1)).as("m"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("r", when(
        col("m") * col("sxx") - col("sx") * col("sx") === 0L ||
          col("m") * col("syy") - col("sy") * col("sy") === 0L, lit(null))
        .otherwise(
          (col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double")) *
              sqrt((col("m") * col("syy") - col("sy") * col("sy")).cast("double")))))
  }
}
