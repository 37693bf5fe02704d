package graft.expr

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** cms_estimate: partitioning-invariance of the builtin CMS binary
  * (additive counters), the one-sided over-count guarantee, and the
  * envelope at the x4 parameters. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private val vals: Seq[Long] = {
    val rnd = new Random(3)
    Seq.fill(20000)(rnd.nextInt(500).toLong)
  }

  private def estimates(parts: Int): Map[Long, Long] = {
    val df = vals.toDF("v").repartition(parts)
    val sk = df.agg(count_min_sketch($"v", lit(0.005), lit(0.999), lit(42)).as("sk"))
    df.distinct().crossJoin(broadcast(sk))
      .select($"v", Cms.cmsEstimate($"sk", $"v").as("est"))
      .as[(Long, Long)].collect().toMap
  }

  test("estimates are identical under any partitioning (additive counters)") {
    val a = estimates(1)
    val b = estimates(16)
    assert(a === b, "CMS estimate depended on partitioning")
  }

  test("one-sided error: est >= exact always, est <= exact + 2*eps*N here") {
    val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = estimates(8)
    val envelope = Math.ceil(vals.size * 0.01).toLong
    exact.foreach { case (v, t) =>
      assert(est(v) >= t, s"$v: CMS under-counted ($t -> ${est(v)})")
      assert(est(v) <= t + envelope, s"$v: est ${est(v)} outside $t + $envelope")
    }
  }

  test("null sketch or item yields null, wrong types fail analysis") {
    val sk = vals.take(100).toDF("v")
      .agg(count_min_sketch($"v", lit(0.01), lit(0.99), lit(1)).as("sk"))
    val r = sk.select(Cms.cmsEstimate($"sk", lit(null).cast("bigint"))).head()
    assert(r.isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      sk.select(Cms.cmsEstimate($"sk", lit("notlong"))).head()
    }
  }
}
