package graft.expr

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorSumSpec extends SparkSpec {
  import spark.implicits._

  private def vs = VectorSum.vectorSumLong(col("v"))

  test("element-wise sum matches the posexplode formulation") {
    val df = Seq(
      (1L, Seq(1L, 2L, 3L)),
      (1L, Seq(10L, 20L, 30L)),
      (2L, Seq(-5L, 5L, 0L)),
      (2L, Seq(7L, -7L, 7L)),
      (2L, Seq(1L, 1L, 1L))
    ).toDF("k", "v")
    val native = df.groupBy($"k").agg(vs.as("s"))
      .select($"k", posexplode($"s").as(Seq("dim", "x")))
    val exploded = df.select($"k", posexplode($"v").as(Seq("dim", "x")))
      .groupBy($"k", $"dim").agg(sum($"x").as("x"))
      .select($"k", $"dim", $"x")
    assert(native.sort("k", "dim").collect().toSeq ===
      exploded.sort("k", "dim").collect().toSeq)
  }

  test("null rows are ignored; all-null group yields null") {
    val df = Seq(
      (1L, Some(Seq(1L, 2L))),
      (1L, None),
      (2L, None)
    ).toDF("k", "v")
    val out = df.groupBy($"k").agg(vs.as("s")).sort("k").collect()
    assert(out(0).getSeq[Long](1) === Seq(1L, 2L))
    assert(out(1).isNullAt(1))
  }

  test("ragged lengths sum over the longest; missing tail contributes 0") {
    val df = Seq(
      (1L, Seq(1L, 2L, 3L, 4L)),
      (1L, Seq(10L)),
      (1L, Seq.empty[Long])
    ).toDF("k", "v")
    val out = df.groupBy($"k").agg(vs.as("s")).collect()
    assert(out.head.getSeq[Long](1) === Seq(11L, 2L, 3L, 4L))
  }

  test("partial+final merge across partitions matches single-partition result") {
    val rows = (1L to 1000L).map(i => (i % 7, Seq(i, 2 * i, i * i)))
    val wide = rows.toDF("k", "v").repartition(8)
    val narrow = rows.toDF("k", "v").coalesce(1)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"k").agg(vs.as("s")).sort("k").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    assert(run(wide) === run(narrow))
  }

  test("plan aggregates partially below the exchange (map-side combine)") {
    val df = (1L to 100L).map(i => (i % 3, Seq(i, i))).toDF("k", "v")
      .repartition(4)
    val plan = df.groupBy($"k").agg(vs.as("s"))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate runs in partial mode before the shuffle: the
    // property that keeps the shuffled volume at one d-long buffer per
    // key per partition instead of N rows.
    assert(plan.contains("ObjectHashAggregate"))
    assert("partial_vector_sum_long".r.findFirstIn(plan).isDefined,
      s"expected a partial aggregation phase in:\n$plan")
  }
}
