package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass column profiling — the data-quality sweep a 100 TB
  * corpus gets before anything else reads it: per column, row/null
  * counts, distinct cardinality, min/max.
  *
  * Shape: ALL columns' statistics are computed in ONE aggregation over
  * ONE scan (the naive per-column loop reads the table N times).
  * Min/max aggregate in the column's native type — ordering numerics as
  * strings would be wrong — and only the final scalar is rendered to
  * string for the uniform report schema. The single wide row is
  * unpivoted driver-free with `stack`.
  *
  * Distinct tiers: exact `count_distinct` plans through Expand (one
  * shuffle, row multiplier = number of profiled columns) — right for
  * the oracle and fine into the terabytes; `approxDistinct = true`
  * swaps in HLL++ (`approx_count_distinct`), collapsing the plan to a
  * plain partial+final aggregate with sketch buffers — the 100 TB tier,
  * same output schema. */
object Profile {

  /** Fixed-width histogram of an integer measure — the corpus
    * length-distribution sweep (token/char counts per bucket) that
    * sizes packing, chunking, and truncation decisions. One partial+
    * final aggregation on the bucket id (bucket cardinality, not row
    * cardinality, crosses the exchange); empty buckets are absent by
    * construction — the report joins against a bucket spine if it
    * needs dense axes. */
  def histogram(df: DataFrame, measure: org.apache.spark.sql.Column,
      width: Long): DataFrame = {
    require(width > 0, "histogram width must be positive")
    val m = measure.cast("long")
    df.select(m.as("v"))
      .groupBy((floor(col("v") / width) * width).as("bucket_lo"))
      .agg(count(lit(1)).as("n"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      .withColumn("bucket_hi", col("bucket_lo") + width)
      .select(col("bucket_lo"), col("bucket_hi"), col("n"), col("min_v"), col("max_v"))
  }

  def columns(df: DataFrame, cols: Seq[String], approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        (count(lit(1)) - count(col(c))).as(s"${c}__nn"),
        (if (approxDistinct) approx_count_distinct(col(c)) else count_distinct(col(c)))
          .as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `${c}__n`, `${c}__nn`, `${c}__nd`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_rows, n_null, n_distinct, min_str, max_str)")
  }
}
