package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch [[graft.ops.Resample]]: per-key fixed-
  * step gap-fill as `flatMapGroupsWithState`, emitting each grid row
  * exactly once, when the WATERMARK proves it final.
  *
  * Emission contract (what "convergent with batch" means, proven in
  * StreamResampleSpec): after a finite stream is fully processed and
  * the watermark has passed every key's last observed step, the emitted
  * rows equal `Resample.resample` over the same events — including
  * bit-identical forward-filled doubles (the value is CARRIED through
  * state, never recomputed, the batch discipline). Two boundary rules
  * make that hold:
  *
  *  - a step S is final once wm >= (S+1)·step: any event that could
  *    still land in S would be behind the watermark and dropped before
  *    the fold sees it (so convergence assumes the stream's lateness
  *    respects the watermark — the standard stream==batch caveat,
  *    same as Sessionize);
  *  - gap rows (n_events = 0) between observed steps emit when the
  *    NEXT observed step finalizes, because the batch grid spans each
  *    key's [min, max] OBSERVED step — a trailing gap can only be
  *    known to exist once a later observation closes it. The grid
  *    therefore starts at the key's first finalized step and never
  *    emits past its last observed one.
  *
  * State per key: last emitted step + last observation (two scalars,
  * forever — they seed the fill across idle periods) plus the OPEN
  * (not-yet-final) step aggregates, which the watermark bounds the way
  * it bounds Sessionize's open sessions. An event-time timeout fires
  * when the watermark passes the earliest open step, so finalization
  * does not wait for the key's next event. The per-step aggregate is
  * the same argmax-by-(ts, tieBreak) struct max the batch side uses —
  * order-independent, so arrival order inside a batch cannot change
  * the result.
  *
  * The batch maxSteps guard carries over: a closed step more than
  * `maxSteps` beyond the last emitted one fails loudly instead of
  * emitting an unbounded gap run. */
object StreamResample {

  case class Ev(key: Long, ts: java.sql.Timestamp, tb: Long, v: Double)
  case class StepAgg(step: Long, n: Long, us: Long, tb: Long, v: Double)
  case class RState(lastEmitted: Option[Long], obsUs: Option[Long],
      obsTb: Option[Long], obsV: Option[Double], pending: List[StepAgg])
  case class Grid(key: Long, step: Long, step_start_us: Long,
      n_events: Long, last_value: Double)

  def resample(events: Dataset[Ev], stepUs: Long,
      watermark: String = "10 seconds", maxSteps: Int = 100000): Dataset[Grid] = {
    require(stepUs > 0, "stepUs must be positive")
    val spark = events.sparkSession
    import spark.implicits._

    def fold(key: Long, it: Iterator[Ev], state: GroupState[RState]): Iterator[Grid] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st0 = state.getOption.getOrElse(RState(None, None, None, None, Nil))
      val merged = scala.collection.mutable.Map(st0.pending.map(p => p.step -> p).toSeq: _*)
      it.foreach { e =>
        // full microsecond precision (the Sessionize convention)
        val us = Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
        val step = Math.floorDiv(us, stepUs)
        merged.get(step) match {
          case Some(p) =>
            // argmax by (us, tb) — (ts, tieBreak) unique per key, so
            // this is the batch's struct-max, order-independent
            val later = us > p.us || (us == p.us && e.tb > p.tb)
            merged(step) = StepAgg(step, p.n + 1,
              if (later) us else p.us, if (later) e.tb else p.tb,
              if (later) e.v else p.v)
          case None => merged(step) = StepAgg(step, 1L, us, e.tb, e.v)
        }
      }
      val (closed, open) = merged.values.toList.sortBy(_.step)
        .partition(p => (p.step + 1) * stepUs <= wmUs)
      val out = List.newBuilder[Grid]
      var lastEmitted = st0.lastEmitted
      var fill = st0.obsV
      var obs = (st0.obsUs, st0.obsTb, st0.obsV)
      closed.foreach { p =>
        lastEmitted.foreach { le =>
          require(p.step - le <= maxSteps,
            s"StreamResample: key $key spans more than $maxSteps steps " +
              s"(${p.step - le}) — widen stepUs or bound the time range")
          var g = le + 1
          while (g < p.step) {
            out += Grid(key, g, g * stepUs, 0L, fill.get)
            g += 1
          }
        }
        out += Grid(key, p.step, p.step * stepUs, p.n, p.v)
        obs = (Some(p.us), Some(p.tb), Some(p.v))
        fill = Some(p.v)
        lastEmitted = Some(p.step)
      }
      state.update(RState(lastEmitted, obs._1, obs._2, obs._3, open))
      if (open.nonEmpty)
        // strictly past the earliest open step's end; +1ms guards the
        // ms division edge (the Sessionize convention)
        state.setTimeoutTimestamp(((open.map(_.step).min + 1) * stepUs) / 1000L + 1L)
      out.result().iterator
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
