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

  /** Gap-based sessions per user. Events inside one micro-batch are
    * folded in event-time order; sessions close when a later event
    * arrives past the gap or when the watermark passes last + gap. */
  def sessions(events: Dataset[Ev], gapMinutes: Int = 30,
               watermark: String = "30 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def fold(userId: Long, it: Iterator[Ev],
             state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(ClosedSession(userId, s.startUs, s.lastUs, s.n, s.total))
      }
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.value))
      var open = state.getOption
      val closed = Seq.newBuilder[ClosedSession]
      sorted.foreach { e =>
        val us = e.ts.getTime * 1000L
        open match {
          case Some(s) if us - s.lastUs < gapUs =>
            // min() on the start: a cross-batch out-of-order event still
            // inside the watermark can land before the open session's
            // start, and must extend it — keeps session_start_us in
            // lockstep with the batch session_window twin.
            open = Some(OpenSession(math.min(s.startUs, us),
              math.max(s.lastUs, us), s.n + 1, s.total + e.value))
          case Some(s) =>
            closed += ClosedSession(userId, s.startUs, s.lastUs, s.n, s.total)
            open = Some(OpenSession(us, us, 1, e.value))
          case None =>
            open = Some(OpenSession(us, us, 1, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastUs / 1000L + gapMinutes * 60L * 1000L)
      }
      closed.result().iterator
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
