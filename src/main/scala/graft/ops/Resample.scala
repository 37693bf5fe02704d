package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: collapse an irregular event stream onto a
  * fixed-step grid per key, forward-filling the last observation
  * across empty steps — the gap-fill shape every monitoring /
  * feature-engineering pipeline needs and SQL engines only express as
  * generate_series + ASOF acrobatics.
  *
  * Scale shape (everything keyed, nothing driver-side):
  *   1. one (key, step)-grained aggregate — map-side partial combine
  *      collapses the raw stream before its only shuffle, so a hot key
  *      costs its distinct STEPS, not its events;
  *   2. the grid is generated per key from that aggregate's own
  *      min/max step (sequence + explode — rows never leave the key's
  *      partition lineage), guarded by `maxSteps` the way RangeJoin
  *      guards interval fan-out: a key spanning years at second grain
  *      fails loudly instead of exploding quietly;
  *   3. one window per key (ordered by step, rows-unbounded-preceding)
  *      forward-fills — Spark's WindowExec streams it in one pass over
  *      the sorted partition.
  *
  * Determinism: "last observation" inside a step is argmax by
  * (ts, tieBreak) via a packed struct max — exact, order-independent,
  * replayable in any engine (the DuckDB oracle uses row_number DESC).
  * The filled value is CARRIED, never recomputed, so double values
  * survive bit-identically.
  */
object Resample {

  /** Per (key, step) grid with `n_events` (0 on gap rows) and
    * `last_value` forward-filled from the most recent step with data.
    * `tsUs` and `stepUs` share a unit (epoch micros in the query
    * layer); `tieBreak` must make (tsUs, tieBreak) unique per key —
    * a row id. Grid spans each key's own [min, max] step. */
  def resample(df: DataFrame, key: Column, tsUs: Column, value: Column,
      tieBreak: Column, stepUs: Long, maxSteps: Int = 100000): DataFrame = {
    require(stepUs > 0, "stepUs must be positive")
    val obs = df.select(key.as("k"), floor(tsUs / stepUs).as("step"),
      tsUs.as("us"), tieBreak.as("tb"), value.as("v"))
    val perStep = obs.groupBy(col("k"), col("step"))
      .agg(count(lit(1)).as("n_events"),
        // struct max = argmax by (us, tb): the step's LAST observation
        max(struct(col("us"), col("tb"), col("v"))).as("last_obs"))
    val grid = perStep.groupBy(col("k"))
      .agg(min(col("step")).as("lo"), max(col("step")).as("hi"))
      .select(col("k"), explode(
        when(col("hi") - col("lo") + 1 <= maxSteps,
          sequence(col("lo"), col("hi")))
          .otherwise(raise_error(concat(
            lit(s"Resample: key spans more than $maxSteps steps ("),
            (col("hi") - col("lo") + 1).cast("string"),
            lit(") — widen stepUs or bound the time range"))))).as("step"))
    val w = Window.partitionBy(col("k")).orderBy(col("step"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perStep, Seq("k", "step"), "left")
      .withColumn("filled", last(col("last_obs"), ignoreNulls = true).over(w))
      .select(col("k").as("key"), col("step"),
        (col("step") * stepUs).as("step_start_us"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("filled.v").as("last_value"))
  }
}
