package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-event funnel analysis (the ClickHouse `windowFunnel` /
  * MATCH_RECOGNIZE-lite shape): per user, how far through an ordered
  * step sequence did they get, within a time window anchored at their
  * FIRST occurrence of step 1 — the first-touch conversion metric
  * product analytics runs daily.
  *
  * Semantics (deterministic, greedy-earliest): t1 = the user's earliest
  * step-1 event; t_{i+1} = the earliest step-{i+1} event at or after
  * t_i; level = the largest i with t_i defined and t_i - t1 <= window.
  * Greedy-earliest is exact for this metric (advancing a level sooner
  * never forecloses a later one), and every comparison is integer
  * microseconds — hash-exact replayable on any engine.
  *
  * Shape: one aggregation PER STEP (k is 3-5 in practice), each a
  * map-side-combined conditional min keyed by user, chained by a hash
  * equi-join on the user key against the previous level's skinny
  * per-user anchor relation. The filtered event relation is scanned
  * once per step carrying only (user, ts, type) — the price of the
  * chained dependency (t_{i+1} needs t_i), and the deliberate trade
  * against collecting per-user event arrays, which a hot user makes
  * unbounded. Every join and aggregation keys on the user, so all k
  * stages co-partition.
  */
object Funnel {

  /** (user, t1_us .. tk_us, level) for the ordered `steps` within
    * `windowUs` of the first step-1 event. Users with no step-1 event
    * are absent (level 0 rows carry no information the caller can't
    * derive). */
  def firstTouch(events: DataFrame, user: Column, tsUs: Column,
      typeCol: Column, steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.size >= 2 && steps.size <= 8, "funnel: 2..8 steps")
    val ev = events.select(user.as("u"), tsUs.as("us"), typeCol.as("tpe"))
    // level 1: earliest step-1 event per user
    var acc = ev.filter(col("tpe") === steps.head)
      .groupBy(col("u")).agg(min(col("us")).as("t1_us"))
    // level i+1: earliest step-(i+1) event at/after t_i, within window
    steps.zipWithIndex.tail.foreach { case (st, i) =>
      val prev = s"t${i}_us"
      val cur = s"t${i + 1}_us"
      val next = ev.filter(col("tpe") === st)
        .join(acc.select(col("u"), col(prev), col("t1_us").as("anchor")), "u")
        .filter(col("us") >= col(prev) && col("us") - col("anchor") <= windowUs)
        .groupBy(col("u")).agg(min(col("us")).as(cur))
      acc = acc.join(next, Seq("u"), "left")
    }
    val levels = (1 to steps.size).map(i => s"t${i}_us")
    acc.withColumn("level",
        levels.zipWithIndex.foldLeft(lit(0L)) { case (e, (c, i)) =>
          when(col(c).isNotNull, lit(i + 1L)).otherwise(e)
        })
      .select(col("u").as("user_id") +: levels.map(col) :+ col("level"): _*)
  }
}
