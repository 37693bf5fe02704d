package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation — the DeepWalk/node2vec
  * sampling stage (Perozzi et al. 2014, "DeepWalk: online learning of
  * social representations"): fixed-length walks over a graph whose
  * node sequences feed skip-gram embedding training exactly like text
  * sentences feed word2vec. The classic implementation draws neighbors
  * from a PRNG — irreproducible across engines, partitionings, and
  * retries. Here the draw at step t of walk w is
  * `md5(w ‖ ":" ‖ t) mod deg(v)` into the node's dst-sorted adjacency
  * — the engine's md5-bucket discipline (Sampling.scala) applied to
  * graph sampling — so the whole corpus is a pure function of
  * (edges, starts, steps): rerun-stable, retry-safe, and replayable
  * hash-exact in DuckDB.
  *
  * Scale shape: the indexed adjacency (rank within dst-sorted
  * neighbors + degree, both from ONE window partitioning on src) is
  * built once and staged — at production scale it is a Prepare-
  * convention artifact at rest, rebuilt per graph snapshot, not per
  * walk batch. Each step is then ONE equi-join of the skinny walk
  * frontier against the adjacency keyed on the current node, with the
  * rank match as a residual — no gather of neighbor lists, no
  * per-node arrays, frontier staged per step (the g6 lineage rule).
  * Walk count and length are the caller's budget; work per step is
  * O(walks), independent of graph size.
  */
object Walks {

  /** Fixed-length deterministic walks. `edges`: directed (src, dst),
    * distinct (union both directions for undirected graphs);
    * `starts`: (id) — starts absent from the edge relation emit only
    * their step-0 row (the walk has nowhere to go). Returns
    * (walk_id, step, node), step 0 = the start node. */
  def deterministicWalks(edges: DataFrame, starts: DataFrame, steps: Int): DataFrame = {
    require(steps >= 1, "walks: steps >= 1")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val w = Window.partitionBy(col("src")).orderBy(col("dst"))
    val adj = e
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("deg", count(lit(1)).over(w
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .localCheckpoint(true) // one consumer per step
    var cur = starts.select(col("id").cast("long").as("walk_id")).distinct()
      .select(col("walk_id"), lit(0L).as("step"), col("walk_id").as("node"))
      .localCheckpoint(true)
    var out = cur
    for (t <- 1 to steps) {
      cur = cur.join(adj,
          col("node") === col("src") && col("rk") === draw(t) % col("deg") + 1L)
        .select(col("walk_id"), lit(t.toLong).as("step"), col("dst").as("node"))
        .localCheckpoint(true)
      out = out.unionByName(cur)
    }
    out
  }

  /** The draw: 32-bit md5 bucket of (walk id, step) — identical
    * arithmetic on the oracle side (positional hex sums == conv
    * base-16). Uniform walks take it mod degree; biased walks take it
    * mod the candidate weight total. */
  private def draw(t: Int) = conv(substring(md5(
      concat(col("walk_id").cast("string"), lit(":"), lit(t.toString))),
    1, 8), 16, 10).cast("long")

  /** SECOND-ORDER (node2vec) biased walks — Grover & Leskovec 2016,
    * "node2vec: Scalable Feature Learning for Networks" — on the same
    * deterministic integer lattice as [[deterministicWalks]]: at step
    * t >= 2 the transition from `prev -> node` weights each candidate
    * neighbor x of `node` by
    *   `wRet` if x == prev          (the 1/p return bias),
    *   `wIn`  if edge (prev, x)     (distance-1 from prev),
    *   `wFar` otherwise             (the 1/q outward bias),
    * the classic alphas (1/p, 1, 1/q) scaled to POSITIVE INTEGERS by
    * the caller (p=2, q=1/2 ⟹ (1, 2, 4)). The weighted draw is the
    * same md5 bucket taken mod the walk's TOTAL candidate weight and
    * matched against the cumulative-weight interval of each candidate
    * in dst order — pure integer compare, so the corpus replays
    * hash-exact in SQL (cumulative sums are one window per step over
    * the O(walks·deg) candidate set, partitioned per walk).
    *
    * Step 1 has no `prev`, so it draws uniformly with the SAME md5 key
    * — hence `wRet == wIn == wFar == 1` reduces EXACTLY to
    * [[deterministicWalks]] (for equal weights w, the interval match
    * picks rank `r div w + 1` of `r = md5 mod (deg·w)`, which equals
    * `md5 mod deg + 1` only at w = 1 — the spec pins the reduction).
    *
    * Per step: ONE equi-join of the (walk, prev, node) frontier
    * against the staged adjacency, ONE equi-join against the edge set
    * for the distance-1 flag, one per-walk window — no gather of
    * neighbor lists, frontier staged per step. Returns
    * (walk_id, step, node), step 0 = the start node. */
  def biasedWalks(edges: DataFrame, starts: DataFrame, steps: Int,
      wRet: Long, wIn: Long, wFar: Long): DataFrame = {
    require(steps >= 1, "walks: steps >= 1")
    require(wRet >= 1L && wIn >= 1L && wFar >= 1L,
      "walks: bias weights must be positive integers")
    val maxW = Seq(wRet, wIn, wFar).max
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val w = Window.partitionBy(col("src")).orderBy(col("dst"))
    val adj = e
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("deg", count(lit(1)).over(w
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .localCheckpoint(true)
    // the draw is a 32-bit md5 bucket taken mod the per-step candidate
    // total deg·maxW (at most — mixed weights sum lower); once that
    // total reaches 2^32 the upper cumulative intervals become
    // UNREACHABLE (the draw never lands there), silently zeroing tail
    // candidates' probability — so the bound is enforced loudly against
    // the graph's ACTUAL max degree, not assumed from a weight cap
    // alone (the r16 ADVICE finding on the old maxW <= 2^20 require)
    val maxDeg = adj.agg(max(col("deg"))).collect().head.getLong(0)
    require(maxDeg * maxW < (1L << 32),
      s"walks: max degree $maxDeg x max bias weight $maxW >= 2^32 — the 32-bit " +
        "md5 draw cannot reach the tail cumulative intervals; lower the weights " +
        "(the candidate total must stay under 2^32)")
    // edge-existence probe side for the distance-1 flag (distinct by
    // construction when edges are — the adjacency convention)
    val probe = e.select(col("src").as("p_src"), col("dst").as("p_dst"))
      .withColumn("is_in", lit(1))
    val step0 = starts.select(col("id").cast("long").as("walk_id")).distinct()
      .select(col("walk_id"), lit(0L).as("step"), col("walk_id").as("node"))
      .localCheckpoint(true)
    // step 1: uniform (no prev yet), carrying prev forward for step 2
    var cur = step0.join(adj,
        col("node") === col("src") && col("rk") === draw(1) % col("deg") + 1L)
      .select(col("walk_id"), col("node").as("prev"), col("dst").as("node"))
      .localCheckpoint(true)
    var out = step0.unionByName(
      cur.select(col("walk_id"), lit(1L).as("step"), col("node")))
    for (t <- 2 to steps) {
      val ww = Window.partitionBy(col("walk_id")).orderBy(col("dst"))
      val scored = cur
        .join(adj, col("node") === col("src"))
        .join(probe, col("prev") === col("p_src") && col("dst") === col("p_dst"),
          "left")
        .withColumn("wt",
          when(col("dst") === col("prev"), lit(wRet))
            .when(col("is_in").isNotNull, lit(wIn))
            .otherwise(lit(wFar)))
        .withColumn("cum", sum(col("wt")).over(ww))
        .withColumn("tot", sum(col("wt")).over(ww
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      cur = scored
        .filter(draw(t) % col("tot") >= col("cum") - col("wt") &&
          draw(t) % col("tot") < col("cum"))
        .select(col("walk_id"), col("node").as("prev"), col("dst").as("node"))
        .localCheckpoint(true)
      out = out.unionByName(
        cur.select(col("walk_id"), lit(t.toLong).as("step"), col("node")))
    }
    out
  }
}
