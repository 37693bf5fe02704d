package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-traced pins for [[Funnel.firstTouch]] — the oracle proves
  * Spark == DuckDB, these prove both == the intended greedy-earliest
  * first-touch semantics. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val W = 100L // window in "us" for readability

  private def run(evs: Seq[(Long, Long, String)]) =
    Funnel.firstTouch(evs.toDF("user_id", "ts_us", "event_type"),
        col("user_id"), col("ts_us"), col("event_type"),
        Seq("a", "b", "c"), windowUs = W)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))).toMap

  test("full conversion, greedy-earliest transitions") {
    val m = run(Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 25L, "b"), (1L, 30L, "c")))
    assert(m(1L) === ((Some(10L), Some(20L), Some(30L), 3L)))
  }

  test("window anchors at the FIRST step-1 event, not per transition") {
    // b at 120 is 110 after the t1 anchor (10) — outside W=100 even
    // though it is only 20 after a later 'a' at 100; first-touch
    // semantics must NOT re-anchor
    val m = run(Seq((1L, 10L, "a"), (1L, 100L, "a"), (1L, 120L, "b")))
    assert(m(1L) === ((Some(10L), None, None, 1L)))
  }

  test("steps must occur in order — a 'b' before the anchor does not count") {
    val m = run(Seq((1L, 50L, "b"), (1L, 60L, "a"), (1L, 55L, "c")))
    assert(m(1L) === ((Some(60L), None, None, 1L)))
  }

  test("equal timestamps satisfy the at-or-after chain") {
    val m = run(Seq((1L, 10L, "a"), (1L, 10L, "b"), (1L, 10L, "c")))
    assert(m(1L) === ((Some(10L), Some(10L), Some(10L), 3L)))
  }

  test("users without the anchor step are absent; partial levels reported") {
    val m = run(Seq(
      (1L, 10L, "a"), (1L, 20L, "b"),     // level 2
      (2L, 10L, "b"), (2L, 20L, "c"),     // no anchor: absent
      (3L, 10L, "a")))                    // level 1
    assert(m.keySet === Set(1L, 3L))
    assert(m(1L)._4 === 2L)
    assert(m(3L) === ((Some(10L), None, None, 1L)))
  }

  test("greedy-earliest never forecloses a later level (earliest b still allows c)") {
    // the earliest 'b' (20) is before the only 'c' (90); a
    // latest-b strategy (80) would also work here, but greedy must too
    val m = run(Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 80L, "b"), (1L, 90L, "c")))
    assert(m(1L) === ((Some(10L), Some(20L), Some(90L), 3L)))
  }
}
