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
      thetaDen: Long, capacity: Int): DataFrame =
    frequentItemsTiered(df, item, Seq((Long.MaxValue, thetaNum, thetaDen)),
      capacity)

  /** [[frequentItems]] with a CORPUS-SIZE-TIERED threshold: `tiers` is
    * a schedule of `(nMax, thetaNum, thetaDen)` rows and the first tier
    * with `n_total ≤ nMax` supplies the threshold (the last tier must
    * be a `Long.MaxValue` catch-all).
    *
    * Why a schedule instead of one theta: an absolute-share threshold
    * is corpus-size-dependent whenever the item universe grows with the
    * corpus (uniform users at 10× the rows have 1/10 the share), so a
    * production job sweeping corpora of different magnitudes pins a
    * theta PER MAGNITUDE — and because both engines branch on the same
    * exact integer `n_total`, the schedule stays DuckDB-oracle-able as
    * a CASE on n_total. The MG capacity is sized once for the SMALLEST
    * theta in the schedule (the guard checks every tier), so the recall
    * guarantee holds whichever tier fires at runtime.
    */
  def frequentItemsTiered(df: DataFrame, item: Column,
      tiers: Seq[(Long, Long, Long)], capacity: Int): DataFrame = {
    require(tiers.nonEmpty && tiers.last._1 == Long.MaxValue,
      "heavy_hitters: tiers must end with a Long.MaxValue catch-all")
    tiers.foreach { case (nMax, num, den) =>
      require(num > 0 && den > 0, s"heavy_hitters: theta > 0 (tier nMax=$nMax)")
      require((capacity + 1).toLong * num > den,
        s"heavy_hitters: recall guarantee needs capacity+1 > thetaDen/thetaNum " +
          s"(= ${den.toDouble / num} at tier nMax=$nMax), got capacity=$capacity")
    }
    val rows = df.select(item.cast("string").as("item"))
    val cands = rows
      .agg(MisraGries.mgSketch(col("item"), capacity).as("sk"),
        count(lit(1)).as("n_total"))
      .select(col("n_total"), explode(col("sk")).as("c"))
      .select(col("c.item").as("item"), col("n_total"))
    // first-match tier selection as nested CASE on the exact n_total —
    // the same integer branch the oracle SQL takes
    val num = tiers.init.foldRight(lit(tiers.last._2)) { case ((nMax, n, _), e) =>
      when(col("n_total") <= nMax, lit(n)).otherwise(e)
    }
    val den = tiers.init.foldRight(lit(tiers.last._3)) { case ((nMax, _, d), e) =>
      when(col("n_total") <= nMax, lit(d)).otherwise(e)
    }
    rows.join(broadcast(cands), Seq("item"))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"), max(col("n_total")).as("n_total"))
      .filter(col("cnt") * den >= num * col("n_total"))
  }
}
