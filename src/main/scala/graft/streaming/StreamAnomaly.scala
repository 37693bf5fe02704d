package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch [[graft.ops.Anomaly]]: per-key rolling
  * z-score verdicts as `flatMapGroupsWithState`, each event scored
  * exactly once against the trailing window of the values BEFORE it in
  * event time.
  *
  * Emission contract (proven in StreamAnomalySpec): once a finite
  * stream is processed and the watermark has passed every event, the
  * emitted rows equal `Anomaly.rolling` ordered by (ts, id) over the
  * same events — bit-for-bit, doubles included — for streams whose
  * lateness respects the watermark (the StreamResample caveat). The
  * rules that make it hold:
  *
  *  - an event's verdict depends on the `trail` values immediately
  *    BEFORE it in (ts, id) order, so scoring it on arrival would bake
  *    in arrival order: a within-watermark out-of-order event can
  *    still insert underneath it and shift its window. Events BUFFER
  *    until the watermark passes them (strictly — a future arrival may
  *    still tie the watermark and order-by-id underneath an equal
  *    timestamp), then score in (ts, id) order;
  *  - the trailing sums replay the batch operator's arithmetic
  *    exactly: values quantize to DECIMAL(18,2) (HALF_UP, the Spark
  *    cast), s1/s2 accumulate as exact decimals, and ONE fixed double
  *    expression derives mean/variance/z — so the doubles cannot
  *    drift between the window-aggregate and the fold replay;
  *  - below `minPrior` priors no verdict emits, but the value still
  *    enters the trail (the batch frame does the same).
  *
  * State per key: the last `trail` finalized values (a bounded ring)
  * plus the not-yet-final buffer, bounded by the lateness horizon —
  * the Sessionize bound. An event-time timeout at the earliest
  * buffered event flushes quiet keys as the watermark passes them.
  */
object StreamAnomaly {

  case class AEv(key: Long, id: Long, ts: java.sql.Timestamp, value: Double)
  case class AState(trail: List[Double], pending: List[(Long, Long, Double)])
  case class ARow(event_id: Long, user_id: Long, value: Double, n: Long,
      mean: Double, z: Option[Double], is_anomaly: Long)

  def detect(events: Dataset[AEv], trail: Int = 20, minPrior: Int = 5,
      sigma: Double = 3.0, watermark: String = "10 seconds"): Dataset[ARow] = {
    require(trail >= 2 && minPrior >= 2, "anomaly: trail/minPrior >= 2")
    val spark = events.sparkSession
    import spark.implicits._

    // Spark's double -> DECIMAL(18,2) cast: valueOf (shortest decimal
    // repr of the double), then HALF_UP to scale 2
    def dec(v: Double): JBigDecimal =
      JBigDecimal.valueOf(v).setScale(2, RoundingMode.HALF_UP)

    def score(id: Long, key: Long, v: Double, win: List[Double]): Option[ARow] = {
      val n = win.size
      if (n < minPrior) None
      else {
        val ds = win.map(dec)
        val s1 = ds.foldLeft(JBigDecimal.ZERO)(_.add(_)).doubleValue
        val s2 = ds.foldLeft(JBigDecimal.ZERO)((a, d) => a.add(d.multiply(d))).doubleValue
        // the batch expression tree verbatim (association order matters
        // for bit-for-bit double equality)
        val mean = s1 / n.toDouble
        val variance = (s2 - s1 * s1 / n.toDouble) / (n.toDouble - 1.0)
        val z = if (variance > 0) Some((v - mean) / math.sqrt(variance)) else None
        Some(ARow(id, key, v, n.toLong, mean, z,
          if (z.exists(x => math.abs(x) > sigma)) 1L else 0L))
      }
    }

    def fold(key: Long, it: Iterator[AEv], state: GroupState[AState]): Iterator[ARow] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st0 = state.getOption.getOrElse(AState(Nil, Nil))
      val incoming = it.map { e =>
        val us = Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
        (us, e.id, e.value)
      }.toList
      val (ready, rest) = (st0.pending ++ incoming).partition(_._1 < wmUs)
      var win = st0.trail
      val out = List.newBuilder[ARow]
      ready.sortBy(p => (p._1, p._2)).foreach { case (_, id, v) =>
        score(id, key, v, win).foreach(out += _)
        win = (win :+ v).takeRight(trail)
      }
      state.update(AState(win, rest))
      if (rest.nonEmpty)
        state.setTimeoutTimestamp(rest.map(_._1).min / 1000L + 1L)
      out.result().iterator
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
