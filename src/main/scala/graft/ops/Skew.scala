package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys.
  *
  * AQE's skew-join handling covers joins; for aggregations over a
  * power-law key (one collection with 100M transfers) the classic fix
  * is two-phase salted aggregation: shuffle once on (key, salt) so the
  * hot key spreads over `buckets` reducers, partially aggregate, then
  * re-aggregate the per-salt partials on the key alone — the second
  * shuffle moves only `buckets` rows per key.
  *
  * Works for any algebraic aggregate (sum/count/min/max); the caller
  * provides both the partial and the merge form.
  */
object Skew {

  final case class SaltedAgg(partial: Seq[Column], merge: Seq[Column])

  /** sum/count example shapes prebuilt for convenience. */
  def sumCount(valueCol: String): SaltedAgg = SaltedAgg(
    partial = Seq(sum(col(valueCol)).as(s"__p_sum"), count(lit(1)).as("__p_cnt")),
    merge = Seq(sum(col("__p_sum")).as(s"${valueCol}_sum"), sum(col("__p_cnt")).as("n")))

  def saltedAggregate(df: DataFrame, keys: Seq[String], agg: SaltedAgg,
                      buckets: Int = 32): DataFrame = {
    // The salt is a pure function of row content (hash of every
    // column), NOT spark_partition_id/monotonically_increasing_id: a
    // nondeterministic shuffle key marks the stage indeterminate, and
    // one fetch failure then recomputes the whole stage on a large
    // cluster. Content hashing keeps retries cheap; rows of a hot key
    // still spread because their non-key columns differ (fully
    // identical rows share a bucket, which algebraic aggregates absorb).
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(agg.partial.head, agg.partial.tail: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(agg.merge.head, agg.merge.tail: _*)
  }
}
