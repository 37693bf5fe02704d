package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftOuter, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.execution.{ExpandExec, FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}

/** Plan-shape pins for the round-12 TPC-H-style additions: each query's
  * scale-critical property asserted against the plan Catalyst actually
  * produces, so a future refactor that silently reintroduces the
  * expensive shape (an Expand, a duplicated fact scan, a global sort)
  * turns into a red test, not a 100 TB incident. Values are covered by
  * the DuckDB oracle; these tests are ONLY about plan shape.
  */
class CoreTpchPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  // sparkPlan (pre-AQE): the adaptive wrapper hides subtree nodes until
  // execution, and these are static-plan properties anyway.
  private def plan(name: String): SparkPlan = q(name).queryExecution.sparkPlan

  private def scanCount(p: SparkPlan, table: String): Int =
    p.collectLeaves().count {
      case s: FileSourceScanExec => s.metadata("Location").contains(table)
      case _ => false
    }

  test("q21: no Expand — the double countDistinct is a two-level pre-agg") {
    // countDistinct x2 plans an Expand that pushes 3x the joined fact
    // through the first exchange (measured 2.3x slower at sf0.1). The
    // rewrite collapses to (order, supplier, late_any) first; pin that
    // no Expand survives anywhere in the plan.
    val p = plan("q21_waiting_orders")
    assert(p.collect { case e: ExpandExec => e }.isEmpty,
      s"q21 plans an Expand again:\n$p")
    // and the fact is still scanned exactly once (no self-join pair)
    assert(scanCount(p, "lineitem") === 1, "q21 must scan the fact once")
  }

  test("q21: top-20 is TakeOrderedAndProject, not a global sort") {
    assert(plan("q21_waiting_orders").collect {
      case t: TakeOrderedAndProjectExec => t
    }.nonEmpty, "q21 top-k should be TakeOrderedAndProject")
  }

  test("q2: window-min decorrelation scans the offers fact exactly once") {
    // The textbook aggregate-join-back duplicates the offers subtree
    // (two lineitem scans, rescued only by AQE exchange reuse). The
    // window-min + filter form must keep a single fact scan.
    assert(scanCount(plan("q2_min_cost_supplier"), "lineitem") === 1,
      "q2 offers subtree duplicated — argmin join-back crept back in")
  }

  test("q4: the correlated EXISTS is a LeftSemi join (no row duplication)") {
    val semis = q("q4_order_priority").queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == LeftSemi => j
    }
    assert(semis.nonEmpty, "q4 must plan EXISTS as a semi join")
    // the residual (shipped > ordered + 60 days) references both sides,
    // so it must live INSIDE the join condition, not a post-filter that
    // would force inner + distinct
    assert(semis.head.condition.exists(_.references.size >= 2),
      s"q4 semi join lost its cross-side residual: ${semis.head.condition}")
  }

  test("q10: top-20 is TakeOrderedAndProject and the fact scan pushes returnflag") {
    val p = plan("q10_returned_items")
    assert(p.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "q10 top-k should be TakeOrderedAndProject")
    val l = p.collectLeaves().collectFirst {
      case s: FileSourceScanExec if s.metadata("Location").contains("lineitem") =>
        s.metadata("PushedFilters")
    }.getOrElse(fail("no lineitem scan"))
    assert(l.contains("EqualTo(l_returnflag,R)"), s"returnflag not pushed: $l")
  }

  test("q13: the join stays LeftOuter and the exclusion reaches the orders scan") {
    // a WHERE above the join would flip it inner and silently drop the
    // zero-order customers the histogram exists to count. Catalyst may
    // legally push the right-side-only predicate BELOW the outer join
    // (to the orders scan) — assert the join type survived and the
    // exclusion predicate landed in the scan's pushed filters.
    val qe = q("q13_order_distribution").queryExecution
    assert(qe.optimizedPlan.collect {
      case j: Join if j.joinType == LeftOuter => j
    }.nonEmpty, "q13 lost its outer join")
    val o = qe.sparkPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec if s.metadata("Location").contains("orders") =>
        s.metadata("PushedFilters")
    }.getOrElse(fail("no orders scan"))
    assert(o.contains("o_orderpriority"),
      s"q13 exclusion predicate did not reach the orders scan: $o")
  }

  test("q16: the excluded-supplier NOT IN is a LeftAnti join") {
    assert(q("q16_supplier_cnt").queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == LeftAnti => j
    }.nonEmpty, "q16 must plan NOT IN as an anti join")
  }

  test("q20/q22: semi/anti probes never duplicate their right side") {
    val q20 = q("q20_excess_suppliers").queryExecution.optimizedPlan
    assert(q20.collect { case j: Join if j.joinType == LeftSemi => j }.size >= 2,
      "q20 must keep both levels of its semi chain")
    val q22 = q("q22_sales_opportunity").queryExecution.optimizedPlan
    assert(q22.collect { case j: Join if j.joinType == LeftAnti => j }.nonEmpty,
      "q22 must plan no-recent-orders as an anti join")
  }

  test("q11/q22: the 1-row scalar rides a broadcast, not a shuffle") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    for (name <- Seq("q11_important_stock", "q22_sales_opportunity")) {
      val p = plan(name)
      assert(p.collect { case b: BroadcastNestedLoopJoinExec => b }.nonEmpty,
        s"$name: scalar threshold should be a broadcast nested-loop join:\n$p")
    }
  }
}
