package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.expr.MisraGries

/** Streaming twin of [[graft.ops.HeavyHitters]]: per-window frequent-
  * item CANDIDATES as `flatMapGroupsWithState` holding one Misra–Gries
  * sketch per open window, emitted when the watermark passes the
  * window's end.
  *
  * Contract (proven in StreamHeavyHittersSpec) — this twin converges
  * on the GUARANTEE, not on exact counts: MG contents depend on
  * arrival order, so the emitted rows are not bit-identical to a batch
  * sketch of the same window. What IS order-independent, and what the
  * spec pins, is the part downstream consumers rely on:
  *  - every item with true count > N/(capacity+1) in its window is
  *    emitted (recall — no θ-heavy item can be missed when
  *    capacity+1 ≥ 1/θ);
  *  - each emitted lower bound satisfies lb ≤ true ≤ lb + N/(cap+1);
  *  - state is ≤ capacity counters per open window, whatever the
  *    window's row count.
  * In a lambda deployment the stream flags candidates in near-real
  * time and the batch recount ([[graft.ops.HeavyHitters.frequentItems]]
  * pass 2) confirms exact counts — the same candidate→verify split the
  * batch operator uses internally.
  *
  * Events fold into the sketch on arrival (no buffering): MG tolerates
  * any order within its bound, so the only watermark-gated step is
  * emission. The update step is [[MisraGries.updateStep]] — shared
  * with the batch aggregate so the two cannot drift.
  */
object StreamHeavyHitters {

  case class HEv(window: Long, ts: java.sql.Timestamp, item: String)
  case class HState(n: Long, items: List[(String, Long)])
  case class HRow(window: Long, item: String, lb: Long, n_window: Long)

  def candidatesPerWindow(events: Dataset[HEv], windowUs: Long, capacity: Int,
      watermark: String = "10 seconds"): Dataset[HRow] = {
    require(windowUs > 0 && capacity >= 1, "heavy_hitters: windowUs, capacity >= 1")
    val spark = events.sparkSession
    import spark.implicits._

    // local so the fold closure doesn't capture the outer object
    def emit(window: Long, st: HState): Iterator[HRow] =
      st.items.iterator.map { case (item, lb) => HRow(window, item, lb, st.n) }

    def fold(window: Long, it: Iterator[HEv],
        state: GroupState[HState]): Iterator[HRow] = {
      if (state.hasTimedOut) {
        val st = state.get
        state.remove()
        emit(window, st)
      } else {
        val st0 = state.getOption.getOrElse(HState(0L, Nil))
        val buf = mutable.HashMap.from(st0.items)
        var n = st0.n
        it.foreach { e =>
          MisraGries.updateStep[String](buf, e.item, capacity, identity)
          n += 1L
        }
        val endUs = (window + 1L) * windowUs
        val wmUs = state.getCurrentWatermarkMs() * 1000L
        val st = HState(n, buf.toList)
        if (wmUs >= endUs) {
          state.remove()
          emit(window, st)
        } else {
          state.update(st)
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
