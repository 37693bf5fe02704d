package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join without a shuffle (the write-once-shuffle-once layout)") {
    val facts = (1L to 10000L).map(i => (i % 500, i, i * 2.0)).toDF("k", "id", "v")
    val dims = (0L until 500L).map(i => (i, s"dim_$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "b_facts", Seq("k"), 8)
    Bucketing.writeBucketed(dims, "b_dims", Seq("k"), 8)

    // broadcast disabled so the join must pick SMJ — the regime where
    // bucket co-location matters; bucketed layout must supply the
    // partitioning with NO runtime exchange on either side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.read(spark, "b_facts")
        .join(Bucketing.read(spark, "b_dims"), "k")
      assert(joined.count() === 10000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")

      // aggregation on the bucket key rides the same layout: partials
      // feed the final HashAggregate with no exchange
      val agg = Bucketing.read(spark, "b_facts").groupBy("k").agg(sum($"v"))
      assert(agg.count() === 500L)
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}
