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
      // the draw: 32-bit md5 bucket of (walk id, step) mod degree,
      // 1-based into the dst-sorted rank — identical arithmetic on the
      // oracle side (positional hex sums == conv base-16)
      val draw = conv(substring(md5(
          concat(col("walk_id").cast("string"), lit(":"), lit(t.toString))),
        1, 8), 16, 10).cast("long")
      cur = cur.join(adj,
          col("node") === col("src") && col("rk") === draw % col("deg") + 1L)
        .select(col("walk_id"), lit(t.toLong).as("step"), col("dst").as("node"))
        .localCheckpoint(true)
      out = out.unionByName(cur)
    }
    out
  }
}
