package graft.streaming

import org.apache.datasketches.hll.{HllSketch, TgtHllType}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the x3 sketch-at-rest rollup: per-window distinct
  * counts as `flatMapGroupsWithState` over an HLL sketch held in
  * state, one (window, estimate) row emitted when the watermark passes
  * the window's end.
  *
  * Why this twin is the EASY one (contrast StreamAnomaly/StreamFunnel,
  * which buffer until the watermark to neutralize arrival order): an
  * HLL register array depends only on the SET of values it absorbed —
  * update is commutative and idempotent — so arrival order and
  * duplicate micro-batch boundaries cannot change the final registers.
  * Every event folds into the sketch the moment it arrives; the only
  * watermark-gated thing is the EMISSION, which must wait until the
  * window can no longer receive in-watermark rows.
  *
  * Emission contract (proven in StreamDistinctSpec): once a finite
  * stream is processed and the watermark has passed every window, the
  * emitted rows equal the batch `hll_sketch_agg`/`hll_sketch_estimate`
  * rollup over the same events — estimates EXACTLY equal, because both
  * sides drive the same datasketches update path (lgK 12, HLL_8, the
  * builtin aggregate's defaults) over the same value set.
  *
  * State per key: one lgK=12 sketch — ≤ 4 KB however many events the
  * window sees (the whole point of the operator). The window key is a
  * precomputed long (e.g. epoch-us div week), so state count is the
  * number of OPEN windows per the lateness horizon, not corpus size.
  */
object StreamDistinct {

  case class WEv(window: Long, ts: java.sql.Timestamp, value: Long)
  case class WState(sk: Array[Byte], endUs: Long)
  case class WRow(window: Long, n_distinct: Long)

  def distinctPerWindow(events: Dataset[WEv], windowUs: Long,
      watermark: String = "10 seconds"): Dataset[WRow] = {
    require(windowUs > 0, "distinct: windowUs > 0")
    val spark = events.sparkSession
    import spark.implicits._
    // matches the builtin HllSketchAgg defaults so the twin's estimates
    // are comparable bit-for-bit with the batch rollup; local so the
    // fold closure doesn't capture the (non-serializable) outer object
    val lgK = 12

    def fold(window: Long, it: Iterator[WEv],
        state: GroupState[WState]): Iterator[WRow] = {
      if (state.hasTimedOut) {
        val st = state.get
        val est = Math.round(HllSketch.heapify(st.sk).getEstimate)
        state.remove()
        Iterator.single(WRow(window, est))
      } else {
        val sk = state.getOption match {
          case Some(st) => HllSketch.heapify(st.sk)
          case None => new HllSketch(lgK, TgtHllType.HLL_8)
        }
        it.foreach(e => sk.update(e.value))
        val endUs = (window + 1L) * windowUs
        val wmUs = state.getCurrentWatermarkMs() * 1000L
        if (wmUs >= endUs) {
          // the window closed while this batch was in flight — emit
          // now; a timeout for an already-passed timestamp won't fire
          val est = Math.round(sk.getEstimate)
          state.remove()
          Iterator.single(WRow(window, est))
        } else {
          state.update(WState(sk.toUpdatableByteArray, endUs))
          state.setTimeoutTimestamp(endUs / 1000L)
          Iterator.empty
        }
      }
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.window)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
