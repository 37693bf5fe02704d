package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Executed-plan shape assertions for the claims the scaladocs make.
  * These exist so a silent regression (a Catalyst upgrade changing
  * canonicalization, a refactor moving the per-side renames below the
  * join) turns a performance claim into a RED TEST instead of a 2x
  * corpus re-scan nobody notices. */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  // AQE wraps the plan; reuse markers appear once stages materialize,
  // so execute first, then walk the FINAL adaptive plan. QueryStages
  // are leaf wrappers — descend into their inner plan; a ReusedExchange
  // is the reuse marker itself — never descend (its subtree belongs to
  // the original exchange).
  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def collectNodes(p: SparkPlan)(pred: SparkPlan => Boolean): Seq[SparkPlan] = {
    val self = if (pred(p)) Seq(p) else Seq.empty
    val kids = p match {
      case _: ReusedExchangeExec => Seq.empty
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self ++ kids.flatMap(collectNodes(_)(pred))
  }

  private def scanCount(p: SparkPlan): Int =
    collectNodes(p)(_.isInstanceOf[LocalTableScanExec]).size

  private def noBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private val embeddings = (1L to 200L).map { i =>
    val base = (i % 4).toFloat
    (i, Array(base + (i % 10) * 0.001f, 1.0f - base * 0.1f, base * 0.5f, 0.25f),
      s"label${i % 4}")
  }.toDF("vec_id", "embedding", "label")

  private val docs = (1L to 120L).map { i =>
    (i, s"shared prefix tokens for bucket ${i % 5} plus tail ${i % 7} words", "s", 40L + i % 9)
  }.toDF("doc_id", "text", "source", "n_chars")

  test("nearDupPairs self-join scans the corpus ONCE under SMJ (ReusedExchange)") {
    noBroadcast {
      val plan = finalPlan(Similarity.nearDupPairs(embeddings, threshold = -1.0))
      assert(scanCount(plan) === 1,
        s"corpus scanned ${scanCount(plan)}x — per-side renames no longer canonicalize:\n$plan")
    }
  }

  test("nearDupPairsLsh self-join scans the corpus ONCE under SMJ") {
    noBroadcast {
      val plan = finalPlan(Similarity.nearDupPairsLsh(embeddings, threshold = -1.0))
      assert(scanCount(plan) === 1,
        s"corpus scanned ${scanCount(plan)}x:\n$plan")
    }
  }

  test("ngramJaccardPairs tokenizes the corpus once for both join sides") {
    noBroadcast {
      val plan = finalPlan(Dedup.ngramJaccardPairs(docs))
      // one scan feeds the candidate pass (bandIndex), one feeds the
      // shared tokset relation; the second tokset side must be a reuse,
      // not a third scan + re-tokenize
      val scans = scanCount(plan)
      assert(scans <= 2, s"corpus scanned ${scans}x — tokset sides no longer share:\n$plan")
    }
  }

  test("nearDupImagePairs decodes the image corpus ONCE (band exchange reused)") {
    // The expensive pass is the PNG decode (mapPartitions ImageIO); the
    // self-join's two sides must share the banded exchange, not re-run
    // the decoder per side.
    implicit val s: org.apache.spark.sql.SparkSession = spark
    // 400 ids over the 200 synthetic groups -> every group has 2
    // members, so pairs exist and AQE cannot collapse to EmptyRelation
    val docs = (1L to 400L).toDF("doc_id")
    val plan = finalPlan(graft.mm.Media.nearDupImagePairs(
      graft.mm.Media.syntheticImages(docs), maxDist = 7, maxBucket = 20000))
    val decodes = collectNodes(plan) {
      case _: org.apache.spark.sql.execution.MapPartitionsExec => true
      case _ => false
    }
    assert(decodes.size === 1,
      s"image corpus decoded ${decodes.size}x — band exchange no longer reused:\n$plan")
    val reuses = collectNodes(plan)(_.isInstanceOf[ReusedExchangeExec])
    assert(reuses.nonEmpty, s"no ReusedExchange in the pairs plan:\n$plan")
  }

  test("temperature aggregates the corpus exactly once (n_min via window, not a second agg)") {
    val out = Sampling.temperature(docs, col("doc_id"), col("source"))
    val aggs = out.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size === 1,
      s"expected ONE corpus aggregation, found ${aggs.size}:\n${out.queryExecution.optimizedPlan}")
  }

  test("keepBest giant cluster: two-phase argmax, no Window on cluster_id") {
    // one pathological transitive cluster (1000 members after the bucket
    // cap) plus a singleton tail — exactly the shape that made the old
    // full-Window formulation a single hot task
    val giant = (1L to 1500L).map { i =>
      val text = if (i <= 1200) "same text repeated for the giant dup cluster case"
                 else s"unique tail document number $i with its own words"
      (i, text, "s", (i % 100) + 1)
    }.toDF("doc_id", "text", "source", "n_chars")
    val out = Dedup.keepBest(giant)
    val plan = finalPlan(out)
    val clusterWindows = collectNodes(plan) {
      case w: WindowExec => w.partitionSpec.exists(_.toString.contains("cluster_id"))
      case _ => false
    }
    assert(clusterWindows.isEmpty,
      s"keepBest still funnels whole clusters through a Window:\n$plan")
    val rows = out.collect()
    assert(rows.length === 1500)
    val best = rows.filter(_.getAs[Long]("keep_best") == 1L)
    // the capped giant cluster elects exactly one winner: max n_chars
    // (100, at doc_id 100 among the 1000 smallest ids), ties -> min id;
    // every uncapped/singleton doc wins its own cluster
    val clusters = rows.groupBy(_.getAs[Long]("cluster_id"))
    clusters.foreach { case (cid, members) =>
      val winners = members.filter(_.getAs[Long]("keep_best") == 1L)
      assert(winners.length === 1, s"cluster $cid elected ${winners.length} winners")
      val expect = members.maxBy(m => (m.getAs[Long]("n_chars"), -m.getAs[Long]("doc_id")))
      assert(winners.head.getAs[Long]("doc_id") === expect.getAs[Long]("doc_id"))
    }
    assert(best.length === clusters.size)
  }
}
