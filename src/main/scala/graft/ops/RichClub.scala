package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rich-club profile (Zhou & Mondragón 2004, "The rich-club
  * phenomenon in the Internet topology"): for each degree threshold k,
  * how densely the nodes of degree > k connect among THEMSELVES —
  *   φ(k) = 2·E_k / (N_k·(N_k−1)),
  * N_k = nodes of degree > k, E_k = edges with BOTH endpoints in that
  * club. Rising φ(k) = hubs form an oligarchy; flat/falling = hubs
  * spread their links (the structural complement of [[Assortativity]]'s
  * one-number correlation).
  *
  * Shape: degrees once, each edge annotated with min(deg_a, deg_b)
  * once, then the whole profile is TWO grouped aggregates against a
  * broadcast literal threshold series (an edge is in club k iff its
  * min degree > k) — no per-k passes, no quadratic anything. Exactness
  * discipline: numerator 2·E_k and denominator N_k(N_k−1) are exact
  * BIGINT columns; φ is ONE IEEE division (NULL when the club has
  * fewer than two members — a density over zero pairs is undefined,
  * not zero). */
object RichClub {

  /** (k, n_rich, e_rich, phi_num, phi_den, phi) for each threshold in
    * `ks` (ascending recommended). `edges`: distinct undirected pairs
    * (id_a, id_b), a < b, no self-loops. */
  def profile(edges: DataFrame, ks: Seq[Long]): DataFrame = {
    require(ks.nonEmpty, "rich club: at least one threshold")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("id_a"), col("id_b")).localCheckpoint(true)
    val deg = e.select(col("id_a").as("node"))
      .unionByName(e.select(col("id_b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true) // the node profile + both edge annotations
    val series = broadcast(ks.toDF("k")) // literal thresholds, x4-style
    val nRich = deg.join(series, col("deg") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_rich"))
    val eRich = e
      .join(deg.select(col("node").as("id_a"), col("deg").as("da")), Seq("id_a"))
      .join(deg.select(col("node").as("id_b"), col("deg").as("db")), Seq("id_b"))
      .select(least(col("da"), col("db")).as("mindeg"))
      .join(series, col("mindeg") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("e_rich"))
    series.join(nRich, Seq("k"), "left").join(eRich, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("n_rich"), lit(0L)).as("n_rich"),
        coalesce(col("e_rich"), lit(0L)).as("e_rich"))
      .withColumn("phi_num", col("e_rich") * 2L)
      .withColumn("phi_den", col("n_rich") * (col("n_rich") - 1L))
      .withColumn("phi",
        when(col("phi_den") > 0L,
          col("phi_num").cast("double") / col("phi_den").cast("double")))
  }
}
