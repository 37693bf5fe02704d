package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.MisraGries

/** Exact frequency-threshold heavy hitters at bounded memory: find
  * every item whose count is ≥ (thetaNum/thetaDen) of all rows,
  * WITHOUT a full groupBy over the distinct-item space.
  *
  * Two passes (the dedup candidate→verify discipline):
  *  1. one global [[graft.expr.MisraGriesAgg]] sketch — each partition
  *     reduces to ≤ `capacity` counters, partials merge associatively,
  *     and the MG recall guarantee (undercount ≤ N/(capacity+1))
  *     means every item at or above the threshold is in the candidate
  *     set whenever capacity+1 > thetaDen/thetaNum — STRICTLY: MG only
  *     guarantees survival for counts strictly above N/(capacity+1),
  *     while the output filter is a non-strict ≥ threshold, so at
  *     equality an item with count exactly theta·N can be decremented
  *     out of the sketch (capacity=1, theta=1/2, stream "a,b");
  *  2. an exact recount of ONLY the candidates — a broadcast inner
  *     join (≤ capacity rows) onto the fact rows, then a hash
  *     aggregate whose distinct-key space is ≤ capacity.
  *
  * The sketch's weights and sub-threshold survivors vary with
  * partitioning; the recount + integer threshold filter make the final
  * answer exact and deterministic (and hence DuckDB-oracle-able). The
  * threshold compare is pure integer math (`cnt · thetaDen ≥ thetaNum
  * · N`) — no float threshold to drift between engines.
  *
  * 100 TB shape: pass 1 ships capacity-bounded buffers through one
  * exchange (no row-level shuffle); pass 2 shuffles only rows matching
  * ≤ capacity broadcast-resident items into a ≤ capacity-group
  * aggregate. Nothing scales with the distinct-item count.
  */
object HeavyHitters {

  /** (item, cnt, n_total) for every item with
    * cnt/n_total ≥ thetaNum/thetaDen. `item` is cast to string (the
    * sketch's key type). */
  def frequentItems(df: DataFrame, item: Column, thetaNum: Long,
      thetaDen: Long, capacity: Int): DataFrame = {
    require(thetaNum > 0 && thetaDen > 0, "heavy_hitters: theta > 0")
    require((capacity + 1).toLong * thetaNum > thetaDen,
      s"heavy_hitters: recall guarantee needs capacity+1 > thetaDen/thetaNum " +
        s"(= ${thetaDen.toDouble / thetaNum}), got capacity=$capacity")
    val rows = df.select(item.cast("string").as("item"))
    val cands = rows
      .agg(MisraGries.mgSketch(col("item"), capacity).as("sk"),
        count(lit(1)).as("n_total"))
      .select(col("n_total"), explode(col("sk")).as("c"))
      .select(col("c.item").as("item"), col("n_total"))
    rows.join(broadcast(cands), Seq("item"))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"), max(col("n_total")).as("n_total"))
      .filter(col("cnt") * lit(thetaDen) >= lit(thetaNum) * col("n_total"))
  }
}
