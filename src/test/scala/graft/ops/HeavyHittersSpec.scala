package graft.ops

import scala.util.Random

import graft.SparkSpec
import graft.expr.MisraGries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Misra–Gries sketch + exact-recount heavy hitters.
  *
  * The load-bearing claims, each tested directly:
  *  1. the sketch NEVER exceeds `capacity` entries;
  *  2. every weight is a lower bound, undercounting ≤ N/(capacity+1),
  *    under arbitrary partitioning (= arbitrary merge trees);
  *  3. hence every item above the threshold survives pass 1 — so
  *    frequentItems == the exact groupBy/HAVING answer, differentially,
  *    across partitionings including adversarial (sorted) layouts;
  *  4. exactness when capacity ≥ distinct items (no eviction ever);
  *  5. the recount join broadcasts and the sketch aggregates partially
  *    (the 100 TB shape: no row-level shuffle in pass 1).
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish corpus: item i ∈ [0, kinds) with weight ~ 1/(i+1). */
  private def corpus(n: Int, kinds: Int, seed: Int): Seq[String] = {
    val rnd = new Random(seed)
    val cum = (1 to kinds).map(i => 1.0 / i).scanLeft(0.0)(_ + _).tail
    val total = cum.last
    Seq.fill(n) {
      val x = rnd.nextDouble() * total
      s"it${cum.indexWhere(_ >= x)}"
    }
  }

  private def sketchOf(df: DataFrame, capacity: Int): Map[String, Long] =
    df.agg(MisraGries.mgSketch(col("item"), capacity).as("sk"))
      .select(explode(col("sk")).as("c")).select("c.item", "c.lb")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def exactCounts(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("bounded size + lower-bound weights + recall, across partitionings") {
    val items = corpus(20000, 400, seed = 7)
    val exact = exactCounts(items)
    val n = items.size.toLong
    val cap = 50
    val layouts = Seq(
      items.toDF("item").repartition(1),
      items.toDF("item").repartition(16),
      // adversarial: all copies of an item in one partition
      items.sorted.toDF("item").coalesce(4),
      items.toDF("item").repartition(16, col("item")))
    for (df <- layouts) {
      val sk = sketchOf(df, cap)
      assert(sk.size <= cap, s"sketch grew past capacity: ${sk.size}")
      val maxErr = n / (cap + 1).toLong
      sk.foreach { case (item, lb) =>
        val t = exact(item)
        assert(lb >= 1L && lb <= t, s"$item: lb=$lb not a lower bound of $t")
        assert(t - lb <= maxErr, s"$item: undercount ${t - lb} > N/(c+1)=$maxErr")
      }
      // recall: every item with true count > N/(cap+1) must be present
      exact.filter(_._2 > maxErr).keys.foreach { item =>
        assert(sk.contains(item), s"heavy item $item evicted — recall broken")
      }
    }
  }

  test("exact when capacity >= distinct items") {
    val items = corpus(5000, 60, seed = 11)
    val sk = sketchOf(items.toDF("item").repartition(8), capacity = 80)
    assert(sk === exactCounts(items))
  }

  test("frequentItems == exact groupBy/HAVING, differentially") {
    for (seed <- Seq(1, 2, 3); parts <- Seq(1, 4, 16)) {
      val items = corpus(8000, 300, seed)
      val df = items.toDF("item").repartition(parts)
      // theta = 1/200 -> capacity 199 suffices; use 220
      val got = HeavyHitters.frequentItems(df, col("item"), 1L, 200L, 220)
        .select("item", "cnt").as[(String, Long)].collect().toSet
      val n = items.size.toLong
      val want = exactCounts(items).filter { case (_, c) => c * 200L >= n }.toSet
      assert(got === want, s"seed=$seed parts=$parts")
    }
  }

  test("tiered threshold: the tier matching n_total fires, differentially") {
    // two corpora straddling the tier boundary; each must be filtered
    // by ITS tier's theta, exactly as the oracle's CASE on n_total
    val tiers = Seq((10000L, 1L, 100L), (Long.MaxValue, 1L, 400L))
    for ((n, num, den) <- Seq((8000, 1L, 100L), (12000, 1L, 400L))) {
      val items = corpus(n, 300, seed = n)
      val got = HeavyHitters.frequentItemsTiered(
          items.toDF("item").repartition(8), col("item"), tiers, capacity = 420)
        .select("item", "cnt").as[(String, Long)].collect().toSet
      val want = exactCounts(items)
        .filter { case (_, c) => c * den >= num * n.toLong }.toSet
      assert(got === want, s"n=$n")
    }
  }

  test("tiered guard: EVERY tier must satisfy the strict capacity bound") {
    val df = Seq("a").toDF("item")
    // capacity 150 covers tier 1 (theta 1/100) but not tier 2 (1/400)
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentItemsTiered(df, col("item"),
        Seq((10000L, 1L, 100L), (Long.MaxValue, 1L, 400L)), capacity = 150)
    }
    // schedule must end with a catch-all
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentItemsTiered(df, col("item"),
        Seq((10000L, 1L, 100L)), capacity = 500)
    }
  }

  test("empty input and all-null items yield no hitters") {
    val empty = Seq.empty[String].toDF("item")
    assert(HeavyHitters.frequentItems(empty, col("item"), 1L, 10L, 20).count() === 0L)
    val nulls = Seq[Option[String]](None, None).toDF("item")
    assert(HeavyHitters.frequentItems(nulls, col("item"), 1L, 10L, 20).count() === 0L)
  }

  test("guarantee precondition is enforced") {
    val df = Seq("a").toDF("item")
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentItems(df, col("item"), 1L, 1000L, 10)
    }
    // equality is NOT enough: with (capacity+1)*thetaNum == thetaDen an
    // item with count exactly theta*N can be decremented out of the MG
    // sketch (capacity=1, theta=1/2, stream "a","b") yet passes the
    // output's non-strict >= filter — the guard must be strict
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentItems(df, col("item"), 1L, 2L, 1)
    }
  }

  test("plan: partial sketch aggregation, broadcast recount, no row shuffle in pass 1") {
    val df = corpus(2000, 50, seed = 3).toDF("item").repartition(8)
    val plan = HeavyHitters.frequentItems(df, col("item"), 1L, 50L, 64)
      .queryExecution.executedPlan.toString
    // pass 1: TypedImperativeAggregate plans as ObjectHashAggregate
    // with a partial mode before the single-row final reduce
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_mg_sketch") || plan.contains("partial mg_sketch") ||
      plan.toLowerCase.contains("mg_sketch"), plan)
    // pass 2: candidates broadcast — never a shuffled join
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
