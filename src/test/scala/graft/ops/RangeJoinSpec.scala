package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic pseudo-random longs (no RNG — rerun-stable).
  private def h(i: Long, salt: Long): Long =
    math.abs((i * 2654435761L + salt * 40503L) % 100000L)

  // points: 200 timestamps over [0, 100k); intervals: 60 windows of
  // wildly varying width (1 .. ~9k), some empty, some crossing many
  // buckets, some duplicated.
  private def points = (0L until 200L).map(i => (i, h(i, 7))).toDF("id", "ts")
  private def intervals = (0L until 60L).map { i =>
    val s = h(i, 13)
    val w = h(i, 29) % 9000L - 500L // negative/zero widths included
    (i, s, s + w)
  }.toDF("id", "start", "end")

  private def naiveContain: Set[(Long, Long)] = {
    val ps = points.collect().map(r => (r.getLong(0), r.getLong(1)))
    val is = intervals.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    (for {
      (iid, s, e) <- is
      (pid, ts) <- ps
      if ts >= s && ts < e
    } yield (iid, pid)).toSet
  }

  private def naiveOverlap(a: Seq[(Long, Long, Long)], b: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (ai, as_, ae) <- a
      (bi, bs, be) <- b
      if as_ < ae && bs < be // both non-empty
      if as_ < be && bs < ae
    } yield (ai, bi)).toSet

  test("pointInInterval matches the naive cross join across bucket widths") {
    for (width <- Seq(100L, 1000L, 9999L)) {
      val got = RangeJoin.pointInInterval(points, col("id"), col("ts"),
          intervals, col("id"), col("start"), col("end"),
          bucketWidth = width, maxSpanBuckets = 200)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === naiveContain, s"width=$width")
    }
  }

  test("pointInInterval emits no duplicate pairs (one bucket per point)") {
    val got = RangeJoin.pointInInterval(points, col("id"), col("ts"),
        intervals, col("id"), col("start"), col("end"),
        bucketWidth = 50L, maxSpanBuckets = 500) // tiny buckets: max fan-out
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.toSet.size, "duplicate (interval, point) pairs")
  }

  test("intervalOverlap matches naive, exactly once per pair, end-exclusive") {
    val a = (0L until 40L).map { i =>
      val s = h(i, 3); (i, s, s + h(i, 5) % 7000L)
    }
    val b = (0L until 40L).map { i =>
      val s = h(i, 11); (i, s, s + h(i, 17) % 7000L)
    } ++ Seq(
      (98L, 1000L, 2000L), // touching pair: [1000,2000) vs [2000,3000)
      (99L, 2000L, 3000L)) //   must NOT overlap (end-exclusive)
    val adf = a.toDF("id", "start", "end")
    val bdf = b.toDF("id", "start", "end")
    for (width <- Seq(128L, 1024L, 8192L)) {
      val rows = RangeJoin.intervalOverlap(adf, col("id"), col("start"), col("end"),
          bdf, col("id"), col("start"), col("end"),
          bucketWidth = width, maxSpanBuckets = 200)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length === rows.toSet.size, s"width=$width: pair emitted twice")
      assert(rows.toSet === naiveOverlap(a, b), s"width=$width")
    }
  }

  test("identical and contained intervals overlap; empty intervals never match") {
    val a = Seq((1L, 100L, 200L), (2L, 100L, 200L), (3L, 500L, 500L)).toDF("id", "start", "end")
    val b = Seq((10L, 100L, 200L), (11L, 120L, 130L), (12L, 499L, 501L)).toDF("id", "start", "end")
    val got = RangeJoin.intervalOverlap(a, col("id"), col("start"), col("end"),
        b, col("id"), col("start"), col("end"), bucketWidth = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // id 3 is empty [500,500) — matches nothing, not even the window
    // that spans 500
    assert(got === Set((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)))
  }

  test("an interval spanning more than maxSpanBuckets fails loudly") {
    val wide = Seq((1L, 0L, 1000000L)).toDF("id", "start", "end")
    val e = intercept[Throwable] {
      RangeJoin.pointInInterval(points, col("id"), col("ts"),
        wide, col("id"), col("start"), col("end"),
        bucketWidth = 100L, maxSpanBuckets = 64).count()
    }
    assert(e.getMessage.contains("spans more than 64 buckets") ||
      Option(e.getCause).exists(_.getMessage.contains("spans more than 64 buckets")),
      s"unexpected failure: $e")
  }

  test("bucket width is the skew dial: candidate volume collapses, results don't") {
    // Hot-window rehearsal: 20k points and 400 one-minute intervals all
    // inside ONE hour. A coarse bucket (the whole hour) funnels every
    // row into a single join key — the candidate volume (Σ_b |P_b|·|I_b|,
    // the rows the residual filter must touch) is the full cross
    // product, exactly the skew a careless width re-creates. Re-bucket
    // at the interval length and the SAME operator does ~30x less
    // residual work for an identical result — the capBuckets discipline,
    // expressed as a width choice. (A residual hot bucket beyond the
    // width dial is a plain shuffle-join partition, which AQE skew-split
    // handles like any other hot key.)
    val hour = 3600L
    val pts = (0L until 20000L).map(i => (i, h(i, 41) % hour)).toDF("id", "ts")
    val ivs = (0L until 400L).map { i =>
      val s = h(i, 43) % (hour - 60); (i, s, s + 60L)
    }.toDF("id", "start", "end")
    def candidates(width: Long): Long = {
      val pb = pts.groupBy(floor(col("ts") / width).as("b")).count()
        .withColumnRenamed("count", "np")
      val ib = ivs.select(explode(sequence(floor(col("start") / width),
          floor((col("end") - 1) / width))).as("b"))
        .groupBy("b").count().withColumnRenamed("count", "ni")
      pb.join(ib, "b").agg(sum(col("np") * col("ni"))).head().getLong(0)
    }
    val coarse = candidates(hour)
    val fine = candidates(60L)
    assert(coarse === 20000L * 400L, "coarse width should be the full cross product")
    assert(coarse / fine > 20, s"narrow buckets only cut candidates $coarse -> $fine")
    def run(width: Long) = RangeJoin.pointInInterval(pts, col("id"), col("ts"),
        ivs, col("id"), col("start"), col("end"), bucketWidth = width)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(hour) === run(60L), "width changed the answer")
  }

  test("epoch-scale bucket boundaries: floor(a/W) never misrounds below 2^53") {
    // The bucket id is floor(ts / width) computed in DOUBLE division.
    // For integer ts < 2^53 the rounding error (≤ ts·2^-53 / width
    // buckets) is strictly smaller than the 1/width gap between any
    // non-multiple ratio and its nearest integer, so the floor is
    // EXACT — but only because epoch micros stay under 2^53. Pin it at
    // realistic 2024 epochs with points sitting 1us around boundaries.
    val w = 7200000000L // 2h in micros
    val k = 1704067200000000L / w // a 2024 epoch boundary
    val pts = Seq((1L, k * w - 1L), (2L, k * w), (3L, k * w + 1L))
      .toDF("id", "ts")
    val ivs = Seq((10L, k * w, (k + 1) * w)).toDF("id", "start", "end")
    val got = RangeJoin.pointInInterval(pts, col("id"), col("ts"),
        ivs, col("id"), col("start"), col("end"), bucketWidth = w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ts = kW-1 is OUTSIDE [kW, (k+1)W); the other two are inside
    assert(got === Set((10L, 2L), (10L, 3L)))
  }

  test("the plan is a bucket EQUI join — no nested-loop, no cartesian") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    def assertNoCross(df: DataFrame, name: String): Unit = {
      val p = df.queryExecution.sparkPlan
      assert(p.collect {
        case b: BroadcastNestedLoopJoinExec => b
        case c: CartesianProductExec => c
      }.isEmpty, s"$name planned a cross-style join:\n$p")
    }
    assertNoCross(RangeJoin.pointInInterval(points, col("id"), col("ts"),
      intervals, col("id"), col("start"), col("end"), bucketWidth = 1000L), "pointInInterval")
    assertNoCross(RangeJoin.intervalOverlap(intervals, col("id"), col("start"), col("end"),
      intervals, col("id"), col("start"), col("end"), bucketWidth = 1000L), "intervalOverlap")
    // and the declared queries keep the property on the real fixture
    for (q <- Seq("j8_point_in_interval", "j9_interval_overlap"))
      assertNoCross(graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001"), q)
  }
}
