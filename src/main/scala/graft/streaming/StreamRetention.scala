package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch [[graft.ops.Retention]]: per-user
  * cohort-retention FACTS as `flatMapGroupsWithState`, each distinct
  * (user, cohort, offset) emitted exactly once. The matrix itself is a
  * stateless count over the fact stream (a grouped sink-side
  * aggregation) — the stateful hard part is the exactly-once fact set,
  * which is what this operator owns.
  *
  * Emission contract (proven in StreamRetentionSpec): once a finite
  * stream is processed and the watermark has passed every signup, the
  * emitted facts equal `Retention.activity` plus one `week_offset =
  * -1` membership row per `Retention.cohort` row, for streams whose
  * lateness respects the watermark (the StreamResample caveat). The
  * rules that make it hold:
  *
  *  - the cohort anchor is the user's EARLIEST signup, which can only
  *    move EARLIER while the watermark hasn't passed it — a
  *    within-watermark out-of-order signup can still lower the min, so
  *    offsets computed before the anchor is final would be wrong; the
  *    fold BUFFERS the user's distinct event periods until the
  *    watermark passes the current min signup (any later signup's
  *    event time is at or above the watermark and can't lower it);
  *  - at close (event-time timeout at the anchor), the membership fact
  *    and every buffered period's in-range offset emit once, and the
  *    buffer collapses to a 9-bit emitted-offset MASK;
  *  - after close, each arriving event's offset emits immediately iff
  *    its mask bit is clear — no further watermark wait, since the
  *    anchor is final and distinctness is the mask's job.
  *
  * State per user: before close, the min-signup scalar plus the
  * DISTINCT buffered periods inside [watermark period, anchor period +
  * maxOffset] — at most lateness-horizon + maxOffset + 1 values, the
  * Sessionize bound, however hot the user; after close, three scalars
  * forever. A user who never signs up keeps only periods at or above
  * the watermark period (a future anchor can't sit below the
  * watermark, so older periods can never reach offset >= 0).
  */
object StreamRetention {

  case class REv(key: Long, ts: java.sql.Timestamp, tpe: String)
  case class RState(minSignupUs: Long, closed: Boolean, mask: Int, periods: List[Long])
  /** `week_offset = -1` is the cohort-membership fact (one per signing
    * user); offsets 0..maxOffset are activity facts. */
  case class RFact(user_id: Long, cohort_week: Long, week_offset: Long)

  def facts(events: Dataset[REv], signupType: String = "signup",
      periodUs: Long = 604800000000L, maxOffset: Int = 8,
      watermark: String = "10 seconds"): Dataset[RFact] = {
    require(maxOffset >= 1 && maxOffset <= 30, "retention: maxOffset in [1, 30]")
    val spark = events.sparkSession
    import spark.implicits._

    def us(e: REv): Long =
      Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L

    def fold(key: Long, it: Iterator[REv], state: GroupState[RState]): Iterator[RFact] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st0 = state.getOption.getOrElse(RState(Long.MaxValue, closed = false, 0, Nil))
      val incoming = it.toList
      val minSignup = incoming.iterator.filter(_.tpe == signupType).map(us)
        .foldLeft(st0.minSignupUs)(math.min)
      val inPeriods = incoming.iterator.map(e => Math.floorDiv(us(e), periodUs))

      if (st0.closed) {
        // anchor final, mask owns distinctness: emit fresh in-range bits
        val cw = Math.floorDiv(st0.minSignupUs, periodUs)
        var mask = st0.mask
        val out = List.newBuilder[RFact]
        inPeriods.foreach { w =>
          val off = w - cw
          if (off >= 0 && off <= maxOffset && (mask & (1 << off.toInt)) == 0) {
            mask |= 1 << off.toInt
            out += RFact(key, cw, off)
          }
        }
        state.update(RState(st0.minSignupUs, closed = true, mask, Nil))
        return out.result().iterator
      }

      val periods0 = (st0.periods ++ inPeriods).distinct
      if (minSignup <= wmUs) {
        // watermark passed the min signup: no in-watermark arrival can
        // lower it, the cohort is final — emit membership + buffered
        // offsets once, collapse the buffer to the mask
        val cw = Math.floorDiv(minSignup, periodUs)
        var mask = 0
        val out = List.newBuilder[RFact]
        out += RFact(key, cw, -1L)
        periods0.sorted.foreach { w =>
          val off = w - cw
          if (off >= 0 && off <= maxOffset && (mask & (1 << off.toInt)) == 0) {
            mask |= 1 << off.toInt
            out += RFact(key, cw, off)
          }
        }
        state.update(RState(minSignup, closed = true, mask, Nil))
        out.result().iterator
      } else {
        // still open. Prune periods that no possible final anchor can
        // bring into [0, maxOffset]: the final anchor period lies in
        // [min(curAnchorPeriod, wmPeriod), curAnchorPeriod] (a future
        // signup's time is >= the watermark; the min only decreases),
        // so periods below that interval's floor are forever negative
        // offsets and periods above curAnchorPeriod + maxOffset only
        // drift further out as the anchor moves earlier.
        val wmW = Math.floorDiv(wmUs, periodUs)
        val kept =
          if (minSignup == Long.MaxValue) periods0.filter(_ >= wmW)
          else {
            val aw = Math.floorDiv(minSignup, periodUs)
            periods0.filter(w => w >= math.min(aw, wmW) && w <= aw + maxOffset)
          }
        state.update(RState(minSignup, closed = false, 0, kept))
        if (minSignup != Long.MaxValue)
          state.setTimeoutTimestamp(minSignup / 1000L + 1L)
        Iterator.empty
      }
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
