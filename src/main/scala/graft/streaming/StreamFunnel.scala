package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch [[graft.ops.Funnel]]: per-user
  * first-touch funnel levels as `flatMapGroupsWithState`, each user's
  * row emitted exactly once — when the WATERMARK proves the funnel
  * window closed.
  *
  * Emission contract (proven in StreamFunnelSpec): once a finite
  * stream is processed and the watermark has passed every anchor's
  * window end, the emitted rows equal `Funnel.firstTouch` over the
  * same events, for streams whose lateness respects the watermark
  * (the StreamResample caveat). The rules that make it hold:
  *
  *  - the window is anchored at the user's EARLIEST step-1 event;
  *    until the watermark passes anchor + window, a within-watermark
  *    out-of-order event can still shift the anchor EARLIER or fill
  *    any level, so the fold BUFFERS the user's step events and defers
  *    the chain — running it greedily per micro-batch would bake in
  *    arrival order;
  *  - the chain runs ONCE, at close (event-time timeout at
  *    anchor + window), over the buffer sorted by (ts, step) — the
  *    same greedy-earliest recurrence as the batch operator, so the
  *    emitted levels match bit-for-bit;
  *  - a closed user leaves a TOMBSTONE (empty buffer, emitted flag):
  *    batch semantics are one first-touch row per user ever, so later
  *    step-1 events must not open a second funnel. Any event that
  *    could have re-anchored an emitted funnel is necessarily behind
  *    the watermark and never reaches the fold.
  *
  * State per user: the anchor + step events inside the (window +
  * allowed lateness) horizon — watermark-bounded exactly like
  * Sessionize's open sessions — then two scalars forever (tombstone).
  */
object StreamFunnel {

  case class FEv(key: Long, ts: java.sql.Timestamp, tpe: String)
  case class FState(anchorUs: Long, emitted: Boolean, buf: List[(Long, Int)])
  case class FRow(user_id: Long, t1_us: Long, level: Long)

  def funnel(events: Dataset[FEv], steps: Seq[String], windowUs: Long,
      watermark: String = "10 seconds"): Dataset[FRow] = {
    require(steps.size >= 2 && steps.size <= 8, "funnel: 2..8 steps")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap

    def chain(anchor: Long, buf: List[(Long, Int)]): FRow = {
      // the batch recurrence verbatim: t_{i+1} = earliest step-(i+1)
      // event at/after t_i, within windowUs of the anchor
      var level = 1L
      var t = anchor
      var i = 1
      var advanced = true
      while (i < steps.size && advanced) {
        val cand = buf.iterator
          .filter { case (us, idx) => idx == i && us >= t && us - anchor <= windowUs }
          .map(_._1)
        advanced = cand.nonEmpty
        if (advanced) { t = cand.min; level = i + 1L; i += 1 }
      }
      FRow(0L, anchor, level) // user filled by caller
    }

    def fold(key: Long, it: Iterator[FEv], state: GroupState[FState]): Iterator[FRow] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st0 = state.getOption.getOrElse(FState(Long.MaxValue, emitted = false, Nil))
      if (st0.emitted) { state.update(st0); return Iterator.empty }
      val incoming = it.flatMap { e =>
        stepIdx.get(e.tpe).map { idx =>
          val us = Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
          (us, idx)
        }
      }.toList
      val buf = st0.buf ++ incoming
      val anchor = buf.iterator.filter(_._2 == 0).map(_._1)
        .foldLeft(Long.MaxValue)(math.min)
      if (anchor == Long.MaxValue) {
        // no step-1 event yet — but later-step events must stay
        // buffered: an anchor arriving in a future batch can sit
        // EARLIER than them (in-watermark disorder) and chain through
        // them. The bound: any future anchor's event time is at or
        // above the CURRENT watermark (older would be dropped as
        // late), so buffered events below the watermark can never
        // satisfy us >= anchor — exactly those are dead. A user who
        // never anchors holds at most a lateness-horizon of step
        // events, the Sessionize state bound.
        state.update(FState(Long.MaxValue, emitted = false,
          buf.filter(_._1 >= wmUs)))
        return Iterator.empty
      }
      if (anchor + windowUs < wmUs) {
        // window closed: run the chain once, tombstone the user.
        // Strict <: an event timestamped exactly AT the watermark can
        // still arrive, and us == anchor + windowUs is in-window for
        // the batch chain — closing on the tie would silently drop it
        // after the tombstone (StreamAnomaly's readiness convention).
        val row = chain(anchor, buf).copy(user_id = key)
        state.update(FState(anchor, emitted = true, Nil))
        Iterator.single(row)
      } else {
        // still open: the anchor can only move EARLIER (min of step-1
        // events), so a pre-anchor step event may yet become eligible
        // and must stay buffered; only events beyond the window's
        // right edge are safely dead — anchor + W only DECREASES, so
        // us > anchor + W can never come back inside
        val kept = buf.filter { case (us, _) => us - anchor <= windowUs }
        state.update(FState(anchor, emitted = false, kept))
        state.setTimeoutTimestamp((anchor + windowUs) / 1000L + 1L)
        Iterator.empty
      }
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
