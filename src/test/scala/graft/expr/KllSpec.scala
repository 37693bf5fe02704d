package graft.expr

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KLL at rest: build→store→merge→read must answer rank queries
  * within the sketch's error envelope on every run (KLL is randomized,
  * so the assertions are rank-accuracy properties, never byte or
  * estimate equality — the expr/Kll.scala caveat). */
class KllSpec extends SparkSpec {
  import spark.implicits._

  test("merged daily sketches answer weekly quantiles within rank error") {
    val rnd = new Random(11)
    // 14 days × 3000 values of a skewed distribution
    val rows = for (d <- 0 until 14; _ <- 0 until 3000)
      yield (d.toLong, math.pow(rnd.nextDouble(), 3.0) * 1000.0)
    val df = rows.toDF("day", "v").repartition(8)
    val est = df.groupBy($"day")
      .agg(Kll.kllSketch($"v").as("sk"))
      .groupBy(($"day" / 7L).cast("long").as("week"))
      .agg(Kll.kllMerge($"sk").as("sk"))
      .select($"week",
        Kll.kllQuantile($"sk", lit(0.5)).as("p50"),
        Kll.kllQuantile($"sk", lit(0.95)).as("p95"))
      .as[(Long, Double, Double)].collect()
    assert(est.length === 2)
    val byWeek = rows.groupBy(_._1 / 7L).view.mapValues(_.map(_._2).sorted).toMap
    for ((week, p50, p95) <- est; vals = byWeek(week)) {
      def rankOf(x: Double): Double = vals.count(_ <= x).toDouble / vals.size
      assert(math.abs(rankOf(p50) - 0.5) <= 0.05, s"week $week p50 rank ${rankOf(p50)}")
      assert(math.abs(rankOf(p95) - 0.95) <= 0.05, s"week $week p95 rank ${rankOf(p95)}")
      // estimates are real data values from the week, not interpolations
      assert(vals.contains(p50) && vals.contains(p95))
    }
  }

  test("empty sketch reads null; wrong types fail analysis") {
    val sk = Seq.empty[Double].toDF("v").agg(Kll.kllSketch($"v").as("sk"))
    assert(sk.select(Kll.kllQuantile($"sk", lit(0.5))).head().isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("v").agg(Kll.kllSketch($"v")).head()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1.0).toDF("v").agg(Kll.kllMerge($"v")).head()
    }
  }
}
