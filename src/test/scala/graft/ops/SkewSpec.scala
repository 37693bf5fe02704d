package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct aggregation on a skewed key") {
    // 90% of rows share one key — the skew shape
    val df = spark.range(0, 100000)
      .select(when(col("id") % 10 =!= 0, lit("hot")).otherwise(concat(lit("k"), col("id") % 97)).as("key"),
        (col("id") % 1000).as("v"))
    val direct = df.groupBy("key").agg(sum(col("v")).as("v_sum"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Skew.saltedAggregate(df, Seq("key"), Skew.sumCount("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted === direct)
    assert(salted("hot")._2 === 90000L)
  }
}
