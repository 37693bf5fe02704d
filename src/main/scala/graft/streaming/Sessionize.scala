package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state beyond what windowed aggregation expresses
  * (task brief: `KeyValueGroupedDataset.flatMapGroupsWithState` for
  * custom state). Three stateful shapes:
  *
  *  - gap-based sessionization with event-time timeout: the streaming
  *    twin of the batch `t3_session_window` query — state is one open
  *    session per user, closed either by a gap-crossing event or by the
  *    watermark passing `last + gap`;
  *  - watermarked stateful dedup: `dropDuplicatesWithinWatermark`, the
  *    streaming form of the K8 idempotent append (state bounded by the
  *    watermark instead of growing forever — the property that matters
  *    on an unbounded stream);
  *  - stream-stream interval join with both sides watermarked, state
  *    GC'd once the band can no longer match.
  *
  * Scale: state lives in the HDFS/RocksDB state store partitioned by
  * the group key, so each of 1000 executors holds 1/1000th of the open
  * sessions; the watermark bounds state size on every shape.
  */
object Sessionize {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, total: Double)
  case class ClosedSession(user_id: Long, session_start_us: Long,
                           session_end_us: Long, n: Long, total: Double)

  /** Gap-based sessions per user — the streaming twin of the batch
    * `session_window` query. State is the user's OPEN sessions (plural:
    * a late-but-in-watermark event can land a full gap before every
    * open session and must start its own, which a later event may then
    * bridge); each invocation sweep-merges state + events as
    * gap-expanded intervals, and a session closes only when the
    * WATERMARK passes `last + gap` — the only proof no more events can
    * extend it. An earlier single-open-session fold merged any
    * out-of-order event into the open session unconditionally (the
    * `us - last < gap` test is vacuously true for negative deltas),
    * diverging from the batch twin whenever the allowed lateness
    * exceeds the gap.
    *
    * NOTE — state schema change: this fold keeps `List[OpenSession]`
    * where the previous version kept a single `OpenSession`. A
    * checkpoint written by the old fold cannot restore into this one
    * (Spark's state-schema check rejects it); resuming an in-flight
    * query across this upgrade requires a fresh checkpoint. */
  def sessions(events: Dataset[Ev], gapMinutes: Int = 30,
               watermark: String = "30 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def fold(userId: Long, it: Iterator[Ev],
             state: GroupState[List[OpenSession]]): Iterator[ClosedSession] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      // a session is final once the watermark proves no event can land
      // within its gap; everything else stays open
      def finalize(all: List[OpenSession]): (List[ClosedSession], List[OpenSession]) = {
        val (done, live) = all.partition(s => s.lastUs + gapUs <= wmUs)
        (done.map(s => ClosedSession(userId, s.startUs, s.lastUs, s.n, s.total)), live)
      }
      def park(live: List[OpenSession]): Unit =
        if (live.isEmpty) state.remove()
        else {
          state.update(live)
          // strictly past the watermark by construction (live sessions
          // have lastUs + gap > wmUs); +1ms guards the division edge
          state.setTimeoutTimestamp((live.map(_.lastUs).min + gapUs) / 1000L + 1L)
        }
      if (state.hasTimedOut) {
        val (done, live) = finalize(state.getOption.getOrElse(Nil))
        park(live)
        return done.iterator
      }
      // sweep-merge: events are unit intervals; sort by start and merge
      // anything within the gap. min/max/sum are order-independent, so
      // the result does not depend on arrival order — same property the
      // batch session_window relies on.
      val evs = it.map { e =>
        // full microsecond precision: getTime truncates to ms, the
        // sub-ms fraction lives in getNanos
        val us = Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
        OpenSession(us, us, 1, e.value)
      }.toList
      val all = (state.getOption.getOrElse(Nil) ++ evs).sortBy(s => (s.startUs, s.lastUs))
      val merged = all.foldLeft(List.empty[OpenSession]) { (acc, s) =>
        acc match {
          case h :: t if s.startUs < h.lastUs + gapUs =>
            OpenSession(h.startUs, math.max(h.lastUs, s.lastUs),
              h.n + s.n, h.total + s.total) :: t
          case _ => s :: acc
        }
      }.reverse
      val (done, live) = finalize(merged)
      park(live)
      done.iterator
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }

  /** Streaming idempotent append (K8): duplicates of `keyCols` arriving
    * within the watermark horizon are dropped; state for a key is
    * released once the watermark passes it. */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                           watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join: left events enriched with right rows
    * of the same key whose time is within [leftTs - band, leftTs]. Both
    * sides watermarked so matched state is GC-able. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   bandMinutes: Int = 60, watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right.select(col(key).as("r_key"), col("ts").as("r_ts"),
      col("value").as("r_value")).withWatermark("r_ts", watermark)
    l.join(r,
      col(key) === col("r_key") &&
        col("r_ts") <= col("ts") &&
        col("r_ts") >= col("ts") - expr(s"INTERVAL $bandMinutes MINUTES"))
  }
}
