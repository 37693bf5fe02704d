package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, value, id): user 1 has a 3-step gap and an in-step tie;
  // user 2 is a single observation (degenerate 1-row grid).
  private val rows = Seq(
    (1L, 100L, 10.0, 1L),
    (1L, 105L, 11.0, 2L), // same step as ts=100 (step width 10)
    (1L, 105L, 99.0, 3L), // SAME ts — tie broken by id: 99.0 wins
    (1L, 149L, 14.0, 4L), // step 14, leaving steps 11-13 empty
    (2L, 305L, 30.0, 5L))
  private def df = rows.toDF("k", "ts", "v", "id")

  test("gap steps appear with n_events = 0 and the forward-filled value") {
    val got = Resample.resample(df, col("k"), col("ts"), col("v"), col("id"),
        stepUs = 10L)
      .orderBy("key", "step").collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("step"),
        r.getAs[Long]("step_start_us"), r.getAs[Long]("n_events"),
        r.getAs[Double]("last_value")))
    assert(got.toSeq === Seq(
      (1L, 10L, 100L, 3L, 99.0), // tie at ts=105 -> highest id wins
      (1L, 11L, 110L, 0L, 99.0), // gap: carried forward
      (1L, 12L, 120L, 0L, 99.0),
      (1L, 13L, 130L, 0L, 99.0),
      (1L, 14L, 140L, 1L, 14.0),
      (2L, 30L, 300L, 1L, 30.0)))
  }

  test("grid spans each key's own range — no global min/max bleed") {
    val got = Resample.resample(df, col("k"), col("ts"), col("v"), col("id"),
        stepUs = 10L)
      .groupBy("key").count().collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Long]("count")).toMap
    assert(got === Map(1L -> 5L, 2L -> 1L)) // user 2 never inherits user 1's span
  }

  test("a key spanning more than maxSteps fails loudly") {
    val wide = Seq((1L, 0L, 1.0, 1L), (1L, 10000L, 2.0, 2L)).toDF("k", "ts", "v", "id")
    val e = intercept[Throwable] {
      Resample.resample(wide, col("k"), col("ts"), col("v"), col("id"),
        stepUs = 1L, maxSteps = 100).count()
    }
    assert(e.getMessage.contains("spans more than 100 steps") ||
      Option(e.getCause).exists(_.getMessage.contains("spans more than 100 steps")),
      s"unexpected failure: $e")
  }

  test("the raw stream collapses BEFORE its shuffle (map-side partial agg)") {
    val plan = Resample.resample(df, col("k"), col("ts"), col("v"), col("id"),
      stepUs = 10L).queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), s"no partial aggregate in plan:\n$plan")
  }
}
