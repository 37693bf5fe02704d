package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: inclusive match, tiebreak, no-match null, key isolation") {
    val left = Seq(
      (1L, 100L, "e1"),  // matches r at t=100 (inclusive) -> tie: highest val wins
      (1L, 150L, "e2"),  // matches r at t=100 still
      (1L, 50L, "e3"),   // before any right -> null
      (2L, 500L, "e4"),  // key 2: matches its own right only
      (3L, 500L, "e5")   // key with no rights -> null
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, 100L, 10L), (1L, 100L, 11L), // equal-time pair: 11 must win
      (1L, 200L, 12L),                  // after e2 -> never matched here
      (2L, 400L, 20L),
      (4L, 1L, 40L)                     // unmatched right key
    ).toDF("k", "t", "v")

    val got = AsofJoin.asofJoin(left, right, "k", "k", "t", "t", Seq("v"))
      .select($"name", $"v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got === Map("e1" -> 11L, "e2" -> 11L, "e3" -> null,
      "e4" -> 20L, "e5" -> null))
  }

  test("non-integral key/time columns are rejected at plan-build time") {
    val l = Seq(("a", 1L, "x")).toDF("k", "t", "name")
    val r = Seq(("a", 1L, 1L)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(l, r, "k", "k", "t", "t", Seq("v"))
    }
    assert(e.getMessage.contains("must be an integral type"))
    val ld = Seq((1L, 1.5, "x")).toDF("k", "t", "name")
    val rd = Seq((1L, 1.5, 1L)).toDF("k", "t", "v")
    assert(intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(ld, rd, "k", "k", "t", "t", Seq("v"))
    }.getMessage.contains("left time"))
  }

  test("null keys: lefts emit unmatched, rights are ignored") {
    val left = Seq((Some(1L), 100L, "a"), (None, 100L, "b")).toDF("k", "t", "name")
    val right = Seq((Some(1L), 50L, 10L), (None, 50L, 99L)).toDF("k", "t", "v")
    val got = AsofJoin.asofJoin(left, right, "k", "k", "t", "t", Seq("v"))
      .collect().map(r => r.getAs[String]("name") ->
        (if (r.isNullAt(r.fieldIndex("v"))) null else r.getAs[Long]("v"))).toMap
    assert(got === Map("a" -> 10L, "b" -> null))
  }

  test("random differential: merge sweep equals an in-memory brute-force reference") {
    val rnd = new scala.util.Random(11)
    // few keys + small time domain on purpose: maximizes equal-time
    // collisions and per-key density, the hard cases for the sweep
    val leftRows = (1 to 400).map(i => (rnd.nextInt(8).toLong, rnd.nextInt(60).toLong, i.toLong))
    val rightRows = (1 to 400).map(_ => (rnd.nextInt(8).toLong, rnd.nextInt(60).toLong, rnd.nextInt(1000).toLong))
    val left = leftRows.toDF("k", "t", "name")
    val right = rightRows.toDF("k", "t", "v")
    val got = AsofJoin.asofJoin(left, right, "k", "k", "t", "t", Seq("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .sortBy(x => (x._1, x._2, x._3))
    val expected = leftRows.map { case (k, t, name) =>
      val cands = rightRows.filter(r => r._1 == k && r._2 <= t)
      val v = if (cands.isEmpty) None else {
        val maxT = cands.map(_._2).max
        // equal-time rights: sweep order is the tiebreak (rightVals asc),
        // last swept wins -> max v among the latest-time candidates
        Some(cands.filter(_._2 == maxT).map(_._3).max)
      }
      (k, t, name, v)
    }.sortBy(x => (x._1, x._2, x._3))
    assert(got.toSeq === expected)
  }

  test("merge strategy agrees with the compose-argmax strategy on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.SparkEntry.queries("j5_asof_join")(spark, dir)
    val b = graft.SparkEntry.queries("j7_asof_merge")(spark, dir)
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
    val norm = (df: org.apache.spark.sql.DataFrame) =>
      df.select("event_id", "user_id", "last_order_day", "last_orderkey")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3))).sortBy(_._1).toSeq
    assert(norm(a) === norm(b))
  }
}
