package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

/** Quality-classifier inference (Classify.scoreLinear): hand-checkable
  * margins, OOV/empty-text conventions, and the projection-only plan
  * claim the scaladoc makes. */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private val w = Seq("good" -> 1000L, "bad" -> -1000L)

  test("margin is the length-normalized milli-unit weighted sum") {
    val docs = Seq(
      (1L, "good good"),         // (0 + 2000) / (2*1000) = 1.0
      (2L, "good bad"),          // 0 / 2000 = 0.0
      (3L, "bad bad bad good"),  // -2000 / 4000 = -0.5
      (4L, "unknown words here") // OOV → bias only → 0.0
    ).toDF("doc_id", "text")
    val res = Classify.scoreLinear(docs, w, biasMilli = 0L, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(res(1L) === (1.0, true))
    assert(res(2L) === (0.0, false))
    assert(res(3L) === (-0.5, false))
    assert(res(4L) === (0.0, false))
  }

  test("bias shifts every margin; threshold is >= (boundary keeps)") {
    val docs = Seq((1L, "good")).toDF("doc_id", "text")
    val r = Classify.scoreLinear(docs, w, biasMilli = 500L, threshold = 1.5)
      .head()
    assert(r.getDouble(1) === 1.5) // (500 + 1000) / 1000
    assert(r.getBoolean(2), "margin == threshold must keep (>= contract)")
  }

  test("empty text scores bias/1000 (split('') is one empty token)") {
    val docs = Seq((1L, "")).toDF("doc_id", "text")
    val r = Classify.scoreLinear(docs, w, biasMilli = 250L, threshold = 0.0).head()
    assert(r.getDouble(1) === 0.25)
  }

  test("scoring plan is projection-only: no Exchange, no Join") {
    val docs = Seq((1L, "good bad good")).toDF("doc_id", "text")
    val df = Classify.scoreLinear(docs, w, 0L, 0.0)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.collect { case e: Exchange => e }.isEmpty,
      s"classifier inference must not shuffle:\n$plan")
    assert(!plan.toString.contains("Join"),
      s"classifier inference must not join:\n$plan")
  }

  test("guards: empty/duplicate/oversized vocab rejected") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Classify.scoreLinear(docs, Seq.empty, 0L, 0.0)
    }
    intercept[IllegalArgumentException] {
      Classify.scoreLinear(docs, Seq("t" -> 1L, "t" -> 2L), 0L, 0.0)
    }
    intercept[IllegalArgumentException] {
      Classify.scoreLinear(docs,
        (0 to Classify.MaxLiteralVocab).map(i => s"t$i" -> 1L), 0L, 0.0)
    }
  }

  test("scoreLinear keepCols carries dims through; best-per-source takes the group-limit plan") {
    val docs = Seq(
      (1L, "good good", "s1"), (2L, "bad", "s1"), (3L, "good", "s1"),
      (4L, "good bad", "s1"), (5L, "good good good", "s2"))
      .toDF("doc_id", "text", "source")
    val scored = Classify.scoreLinear(docs, w, 0L, 0.0, keepCols = Seq("source"))
    assert(scored.columns.toSeq === Seq("doc_id", "source", "margin", "keep"))
    // top-3 per source by margin — s1 keeps 1,3,4 (margins 1.0, 1.0,
    // 0.0), dropping 2 (-1.0); s2 keeps its only doc
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("margin").desc, col("doc_id").asc)
    val top = scored.withColumn("rank", org.apache.spark.sql.functions.row_number().over(w2))
      .filter(col("rank") <= 3)
    val rows = top.collect()
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"best-per-source must run the rank filter below the exchange:\n$plan")
    assert(rows.map(r => r.getAs[Long]("doc_id")).toSet === Set(1L, 3L, 4L, 5L))
  }

  test("text_classify gate splits the fixture corpus (non-degenerate)") {
    // An all-keep or all-drop gate would oracle-match trivially; pin the
    // fixture model to a real split at the smoke SF.
    val res = graft.SparkEntry.queries("text_classify")(spark, "/root/testdata/sf0.001")
      .groupBy(col("keep")).count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(res.getOrElse(true, 0L) > 0 && res.getOrElse(false, 0L) > 0,
      s"degenerate gate: $res")
  }
}
