package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic walk corpus: in-memory differential (same md5 draw,
  * no Spark), dead-end starts, and rerun stability. */
class WalksSpec extends SparkSpec {
  import spark.implicits._

  /** The reference walk: dst-sorted adjacency, draw =
    * first-8-hex-chars-of-md5("walkId:t") mod degree. */
  private def refWalks(edges: Seq[(Long, Long)], starts: Seq[Long],
      steps: Int): Set[(Long, Long, Long)] = {
    val adj = edges.distinct.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    starts.distinct.flatMap { w =>
      var node = w
      var alive = true
      (w, 0L, w) +: (1 to steps).flatMap { t =>
        if (!alive) Nil
        else adj.get(node) match {
          case None => alive = false; Nil
          case Some(ns) =>
            val draw = java.lang.Long.parseLong(md5hex(s"$w:$t").take(8), 16)
            node = ns((draw % ns.size).toInt)
            Seq((w, t.toLong, node))
        }
      }
    }.toSet
  }

  test("walks match the in-memory md5 reference") {
    val rnd = new Random(61)
    val edges = (for {
      i <- 0L until 30L; j <- 0L until 30L
      if i != j && rnd.nextDouble() < 0.12
    } yield (i, j)).toSeq
    val starts = Seq(0L, 3L, 7L, 11L, 28L)
    val got = Walks.deterministicWalks(
        edges.toDF("src", "dst"), starts.toDF("id"), steps = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === refWalks(edges, starts, 5))
  }

  /** Reference for the node2vec bias: same md5 key, weighted
    * cumulative-interval pick over the dst-sorted candidates. */
  private def refBiased(edges: Seq[(Long, Long)], starts: Seq[Long], steps: Int,
      wRet: Long, wIn: Long, wFar: Long): Set[(Long, Long, Long)] = {
    val adj = edges.distinct.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val eset = edges.toSet
    starts.distinct.flatMap { w =>
      var prev = w
      var node = w
      var alive = true
      (w, 0L, w) +: (1 to steps).flatMap { t =>
        if (!alive) Nil
        else adj.get(node) match {
          case None => alive = false; Nil
          case Some(ns) =>
            val draw = java.lang.Long.parseLong(md5hex(s"$w:$t").take(8), 16)
            val nxt =
              if (t == 1) ns((draw % ns.size).toInt)
              else {
                val wts = ns.map(x =>
                  if (x == prev) wRet else if (eset((prev, x))) wIn else wFar)
                val r = draw % wts.sum
                var cum = 0L
                ns.zip(wts).collectFirst {
                  case (x, wt) if { cum += wt; r < cum } => x
                }.get
              }
            prev = node; node = nxt
            Seq((w, t.toLong, node))
        }
      }
    }.toSet
  }

  test("biased walks match the in-memory weighted-interval reference") {
    val rnd = new Random(97)
    val edges = (for {
      i <- 0L until 30L; j <- 0L until 30L
      if i != j && rnd.nextDouble() < 0.12
    } yield (i, j)).toSeq
    val starts = Seq(0L, 3L, 7L, 11L, 28L)
    for ((r, n, f) <- Seq((1L, 2L, 4L), (4L, 2L, 1L))) {
      val got = Walks.biasedWalks(
          edges.toDF("src", "dst"), starts.toDF("id"), steps = 5, r, n, f)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === refBiased(edges, starts, 5, r, n, f),
        s"weights ($r,$n,$f) diverged")
    }
  }

  test("equal unit weights reduce biased walks to the uniform walks exactly") {
    // (1,1,1) is the ONLY equal-weight tuple with this property: for
    // weight w the interval pick is (md5 mod deg*w) div w, which equals
    // md5 mod deg only at w = 1 — so pin (1,1,1), and pin that (2,2,2)
    // is allowed but NOT required to coincide
    val rnd = new Random(3)
    val edges = (for {
      i <- 0L until 25L; j <- 0L until 25L
      if i != j && rnd.nextDouble() < 0.15
    } yield (i, j)).toSeq
    val starts = Seq(0L, 5L, 10L)
    val uniform = Walks.deterministicWalks(
        edges.toDF("src", "dst"), starts.toDF("id"), steps = 4)
      .as[(Long, Long, Long)].collect().toSet
    val biased = Walks.biasedWalks(
        edges.toDF("src", "dst"), starts.toDF("id"), steps = 4, 1L, 1L, 1L)
      .as[(Long, Long, Long)].collect().toSet
    assert(biased === uniform)
  }

  test("biased walks reject non-positive and draw-overflowing weights loudly") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val starts = Seq(1L).toDF("id")
    val e1 = intercept[IllegalArgumentException](
      Walks.biasedWalks(edges, starts, 2, 0L, 1L, 1L))
    assert(e1.getMessage.contains("positive"))
    // the bound is on the ACTUAL candidate total deg·maxW, not a fixed
    // weight cap: deg 2 at weight 2^31 reaches 2^32, where the 32-bit
    // md5 draw can never land in the tail cumulative interval
    val wide = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val e2 = intercept[IllegalArgumentException](
      Walks.biasedWalks(wide, starts, 2, 1L, 1L, 1L << 31))
    assert(e2.getMessage.contains("2^32"))
    // the same weight is fine at degree 1 — the total stays under 2^32
    Walks.biasedWalks(edges, starts, 2, 1L, 1L, 1L << 31).count()
  }

  test("a start with no outgoing edges emits only its step-0 row; reruns are identical") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val starts = Seq(1L, 99L) // 99 is not in the graph
    def run() = Walks.deterministicWalks(
        edges.toDF("src", "dst"), starts.toDF("id"), steps = 3)
      .as[(Long, Long, Long)].collect().toSet
    val got = run()
    assert(got.filter(_._1 == 99L) === Set((99L, 0L, 99L)))
    assert(got.count(_._1 == 1L) === 4, s"walk 1 must take all 3 steps: $got")
    assert(got === run(), "walks must be rerun-stable")
  }
}
