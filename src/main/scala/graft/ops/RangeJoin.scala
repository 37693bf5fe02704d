package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed range joins — point-in-interval and interval-overlap —
  * WITHOUT a cartesian product.
  *
  * Spark has no native range-join strategy: a pure inequality join
  * plans as BroadcastNestedLoopJoin (every point against every
  * interval), which is O(P·I) pairs and dies first at scale. The
  * standard fix (the published partitioned range-join / "bucketed
  * banding" design, same family as the Databricks range-join hint) is
  * to discretize the domain into fixed-width buckets: an interval
  * emits one skinny row per covered bucket, a point emits one, and the
  * bucket id becomes an ordinary EQUI-join key — one hash shuffle,
  * per-bucket residual evaluation, O(P + I·span + matches) total work.
  *
  * No dedup pass exists in either operator, by construction:
  *   - point-in-interval: a point lives in exactly ONE bucket, so a
  *     (point, interval) pair can meet at most once;
  *   - interval-overlap: a pair is allocated to the single bucket
  *     containing the LATER of the two starts — which, when the
  *     intervals overlap at all, lies inside both intervals' bucket
  *     ranges — so each overlapping pair meets exactly once.
  *
  * Skew: one interval spanning the whole domain would fan out to every
  * bucket (the hot row that re-creates the cross join). `maxSpanBuckets`
  * fails loudly per row instead of silently exploding — size
  * `bucketWidth` to the expected interval length (span ≈ 2 buckets),
  * exactly like choosing a shuffle partition count.
  *
  * Units are caller-chosen integers (epoch micros in the query layer):
  * all bucket arithmetic is exact BIGINT floor division, identical in
  * any engine — the DuckDB oracles replay only the BETWEEN semantics
  * and must hash-match.
  */
object RangeJoin {

  /** All buckets an [start, end) interval covers, as an exploded
    * column; end-exclusive, so the last covered unit is end-1. The
    * span guard runs BEFORE the fan-out (on the sequence bounds, not
    * the emitted rows) — the checkedQv convention. */
  private def coveredBuckets(start: Column, end: Column, width: Long,
      maxSpanBuckets: Int): Column = {
    val lo = floor(start / width)
    val hi = floor((end - 1) / width)
    explode(when(hi - lo + 1 <= maxSpanBuckets, sequence(lo, hi))
      .otherwise(raise_error(concat(
        lit(s"RangeJoin: interval spans more than $maxSpanBuckets buckets ("),
        (hi - lo + 1).cast("string"),
        lit(") — widen bucketWidth or split the interval")))))
  }

  /** Join each point to every interval containing it:
    * result (interval_id, point_id), one row per containment.
    * `points`: (id, ts); `intervals`: (id, start, end) — end exclusive,
    * empty/negative intervals dropped. All three range columns share
    * one integer unit. */
  def pointInInterval(points: DataFrame, pointId: Column, pointTs: Column,
      intervals: DataFrame, intervalId: Column, start: Column, end: Column,
      bucketWidth: Long, maxSpanBuckets: Int = 64): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.select(pointId.as("point_id"), pointTs.as("p_ts"))
      .withColumn("bucket", floor(col("p_ts") / bucketWidth))
    val i = intervals
      .select(intervalId.as("interval_id"), start.as("i_start"), end.as("i_end"))
      .filter(col("i_end") > col("i_start"))
      .withColumn("bucket",
        coveredBuckets(col("i_start"), col("i_end"), bucketWidth, maxSpanBuckets))
    p.join(i, Seq("bucket"))
      .filter(col("p_ts") >= col("i_start") && col("p_ts") < col("i_end"))
      .select(col("interval_id"), col("point_id"))
  }

  /** Join two interval relations on overlap ([aStart, aEnd) meets
    * [bStart, bEnd) iff aStart < bEnd AND bStart < aEnd): result
    * (a_id, b_id), exactly one row per overlapping pair. */
  def intervalOverlap(a: DataFrame, aId: Column, aStart: Column, aEnd: Column,
      b: DataFrame, bId: Column, bStart: Column, bEnd: Column,
      bucketWidth: Long, maxSpanBuckets: Int = 64): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def sides(df: DataFrame, id: Column, s: Column, e: Column, p: String) =
      df.select(id.as(s"${p}_id"), s.as(s"${p}_start"), e.as(s"${p}_end"))
        .filter(col(s"${p}_end") > col(s"${p}_start"))
        .withColumn("bucket",
          coveredBuckets(col(s"${p}_start"), col(s"${p}_end"), bucketWidth, maxSpanBuckets))
    val l = sides(a, aId, aStart, aEnd, "a")
    val r = sides(b, bId, bStart, bEnd, "b")
    l.join(r, Seq("bucket"))
      .filter(col("a_start") < col("b_end") && col("b_start") < col("a_end") &&
        // allocate the pair to the ONE bucket holding the later start —
        // inside both intervals whenever they overlap, so no dedup
        floor(greatest(col("a_start"), col("b_start")) / bucketWidth) === col("bucket"))
      .select(col("a_id"), col("b_id"))
  }
}
