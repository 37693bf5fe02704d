package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Smoke: every declared query runs on sf0.001 and produces a schema +
  * rows (value-level checking is the DuckDB differential oracle,
  * tools/check.py / the driver). */
class QueriesSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  // pair-producing queries may legitimately return 0 rows at tiny SF.
  // ann_lsh / dedup_embed_lsh are deliberately NOT here: their 8-bit
  // sign buckets are tuned to collide even at sf0.001, so an empty
  // result means the LSH gate went vacuous again (round-9 finding).
  private val mayBeEmpty =
    Set("dedup_embed_cosine", "dedup_minhash", "dedup_ngram_jaccard")

  test("oracleSql covers every query except declared rows-only ops") {
    // no 256-bit ints / keccak / DEFLATE in DuckDB; sketches are
    // approximate by definition; sample_weighted's E-S priority passes
    // through ln() (engine-libm) — WeightedSampleSpec carries the
    // exact JVM differential instead
    val rowsOnly = Set("p8_uint256_math", "p9_keccak", "x1_approx_sketch",
      "text_compress_ratio", "sample_weighted")
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet -- rowsOnly)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      assert(df.schema.nonEmpty)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("s4_ranged_scan pushes ts range AND event_type into the parquet scan") {
    // The whole point of eventsRange is that the time predicate prunes
    // row groups at the scan, not above a full-table read — on the REAL
    // driver testdata (whatever ts physical type it ships this round),
    // not just the committed fixtures (EventsTypeMatrixSpec covers those).
    val df = SparkEntry.queries("s4_ranged_scan")(spark, dir)
    val meta = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metadata
    }.getOrElse(fail("no FileSourceScanExec in s4 plan"))
    val pushed = meta("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(ts") && pushed.contains("LessThan(ts"),
      s"ts range not pushed: $pushed")
    assert(pushed.contains("EqualTo(event_type,click)"), s"type filter not pushed: $pushed")
    assert(!meta("ReadSchema").contains("props"),
      s"props not pruned from scan: ${meta("ReadSchema")}")
  }

  test("single-row aggregates q6/q14/q19 actually MATCH rows (no empty-set vacuity)") {
    // A global aggregate over an empty match set still returns 1 row
    // with NULL sums, so the n > 0 smoke guard cannot catch a fixture
    // drift that re-vacuates them (the round-9 q6 failure mode). Pin
    // n_items > 0 explicitly.
    for (q <- Seq("q6_forecast_revenue", "q14_promo_share", "q19_discounted_revenue",
        "q17_small_quantity")) {
      val n = SparkEntry.queries(q)(spark, dir)
        .select("n_items").head().getLong(0)
      assert(n > 0, s"$q matched zero rows — its predicates no longer hit the fixture")
    }
  }

  test("q19: the disjunctive predicate decomposes into pushed filters on BOTH scans") {
    // The property that makes q19 cheap at scale: Catalyst derives a
    // per-side OR from the cross-table disjunction and pushes each
    // into its parquet scan — neither side reads unfiltered.
    val df = SparkEntry.queries("q19_discounted_revenue")(spark, dir)
    // sparkPlan, not executedPlan: AQE wraps the joined plan and hides
    // the scan leaves behind the adaptive node before execution
    val scans = df.queryExecution.sparkPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metadata
    }
    val byTable = scans.map(m => m("Location") -> m("PushedFilters")).toMap
    val l = byTable.keys.find(_.contains("lineitem")).map(byTable)
      .getOrElse(fail("no lineitem scan"))
    val p = byTable.keys.find(_.contains("part")).map(byTable)
      .getOrElse(fail("no part scan"))
    assert(l.contains("Or(") && l.contains("l_quantity"),
      s"lineitem side must push its OR residual: $l")
    assert(p.contains("Or(") && p.contains("p_brand"),
      s"part side must push its OR residual: $p")
  }

  test("q12: the shipdate range reaches the lineitem scan; both scans prune columns") {
    val df = SparkEntry.queries("q12_ship_priority")(spark, dir)
    val scans = df.queryExecution.sparkPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metadata
    }
    val l = scans.find(_("Location").contains("lineitem"))
      .getOrElse(fail("no lineitem scan"))
    assert(l("PushedFilters").contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate range not pushed: ${l("PushedFilters")}")
    assert(!l("ReadSchema").contains("l_extendedprice"),
      s"q12 reads no prices — column not pruned: ${l("ReadSchema")}")
    val o = scans.find(_("Location").contains("orders"))
      .getOrElse(fail("no orders scan"))
    assert(!o("ReadSchema").contains("o_totalprice"),
      s"orders price not pruned: ${o("ReadSchema")}")
  }

  test("q17: the per-part threshold aggregate only sees brand-probed parts") {
    // The threshold is a within-part average, so the aggregate's input
    // must be semi-joined against the broadcast Brand#2 part set —
    // otherwise the self-aggregation shuffles the WHOLE fact table to
    // threshold parts the probe never reads (a 25x-too-wide exchange at
    // scale). Pin: the optimized plan's thr-aggregate subtree contains
    // a LeftSemi join.
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val df = SparkEntry.queries("q17_small_quantity")(spark, dir)
    val thrAggs = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(_.name == "thr") => a
    }
    assert(thrAggs.nonEmpty, "no thr aggregate in the optimized plan")
    val hasSemi = thrAggs.head.collect {
      case j: Join if j.joinType == LeftSemi => j
    }.nonEmpty
    assert(hasSemi,
      s"thr aggregate input is not brand-pruned:\n${df.queryExecution.optimizedPlan}")
  }

  test("fixture invariant: events.event_id is dense and contiguous (s1 contract)") {
    // s1_range_scan derives the dense id range as event_id - min(event_id),
    // which matches its row_number()-1 DuckDB oracle ONLY while event_id
    // has no gaps or duplicates. Pin the fixture invariant here so a
    // future fixture change turns into a red test instead of a silent
    // oracle hash mismatch.
    import org.apache.spark.sql.functions._
    val stats = graft.tables.Tables.events(spark, dir)
      .agg(min(col("event_id")).cast("long").as("mn"),
        max(col("event_id")).cast("long").as("mx"),
        count(lit(1)).as("n"), countDistinct(col("event_id")).as("nd"))
      .head()
    val (mn, mx, n, nd) =
      (stats.getAs[Long]("mn"), stats.getAs[Long]("mx"),
        stats.getAs[Long]("n"), stats.getAs[Long]("nd"))
    assert(nd === n, "event_id has duplicates — s1's density assumption is broken")
    assert(mx - mn + 1 === n, "event_id has gaps — s1's density assumption is broken")
  }
}
