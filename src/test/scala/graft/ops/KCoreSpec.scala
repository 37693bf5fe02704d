package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-core peeling. Load-bearing claims, each tested directly:
  *  1. the fixpoint equals an in-JVM reference peel, differentially,
  *     across random graphs, k values, and partitionings;
  *  2. the cascade is real: a cycle-with-tail graph needs one round per
  *     tail link and keeps exactly the cycle;
  *  3. empty core, empty input, and the tree/2-core identity;
  *  4. the maxRounds failsafe fails LOUDLY instead of looping;
  *  5. output degrees are the degrees WITHIN the core, not the input.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  /** In-JVM reference: iterate "drop nodes with degree < k" to fixpoint. */
  private def refCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var cur = edges
    var changed = true
    while (changed) {
      val deg = cur.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val next = cur.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != cur.size
      cur = next
    }
    cur.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
  }

  private def run(edges: Seq[(Long, Long)], k: Int, parts: Int = 4,
      maxRounds: Int = 64): Map[Long, Long] =
    KCore.core(edges.toDF("id_a", "id_b").repartition(parts), k,
        maxRounds = maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Random distinct undirected pairs over [0, n). */
  private def randomGraph(n: Int, m: Int, seed: Int): Seq[(Long, Long)] = {
    val rnd = new Random(seed)
    Iterator.continually {
      val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
      if (a < b) (a, b) else (b, a)
    }.filter(e => e._1 != e._2).distinct.take(m).toSeq
  }

  test("fixpoint == reference peel, differentially") {
    for (seed <- Seq(1, 2, 3); k <- Seq(2, 3, 4); parts <- Seq(1, 7)) {
      val edges = randomGraph(60, 150, seed)
      assert(run(edges, k, parts) === refCore(edges, k),
        s"seed=$seed k=$k parts=$parts")
    }
  }

  test("cycle with a tail: the cascade peels one tail link per round") {
    // 0-1-2-3-4-0 cycle, tail 4-5-6-7-8: the 2-core is exactly the
    // cycle, reached only after peeling 8, then 7, then 6, then 5 —
    // a genuinely sequential cascade no single-round filter can do
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 4L))
    val tail = Seq((4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L))
    val got = run(cycle ++ tail, k = 2)
    assert(got === Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("a tree has an empty 2-core; an empty input an empty core") {
    val tree = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L), (2L, 5L))
    assert(run(tree, k = 2) === Map.empty)
    assert(run(Seq.empty[(Long, Long)], k = 2) === Map.empty)
  }

  test("core degrees are in-core, not input degrees") {
    // triangle 0-1-2 plus a pendant 2-3: node 2 has input degree 3 but
    // core degree 2 once the pendant peels
    val g = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L))
    assert(run(g, k = 2) === Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
  }

  /** In-JVM reference coreness: peel at k = 1, 2, ... to exhaustion;
    * a node's core number is the last k whose core contained it. */
  private def refCoreness(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    var cur = edges
    var out = Map.empty[Long, Long]
    var k = 1L
    while (cur.nonEmpty) {
      out ++= cur.flatMap(e => Seq(e._1, e._2)).distinct.map(_ -> k)
      var changed = true
      while (changed) {
        val deg = cur.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
          .view.mapValues(_.size.toLong).toMap
        val keep = deg.filter(_._2 >= k + 1).keySet
        val next = cur.filter(e => keep(e._1) && keep(e._2))
        changed = next.size != cur.size
        cur = next
      }
      k += 1
    }
    out
  }

  private def runCoreness(edges: Seq[(Long, Long)], parts: Int = 4): Map[Long, Long] =
    KCore.coreness(edges.toDF("id_a", "id_b").repartition(parts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("coreness == reference level peel, differentially") {
    for (seed <- Seq(1, 4); parts <- Seq(1, 7)) {
      val edges = randomGraph(60, 150, seed)
      assert(runCoreness(edges, parts) === refCoreness(edges),
        s"seed=$seed parts=$parts")
    }
  }

  test("coreness is consistent with every single-k core") {
    val edges = randomGraph(50, 120, 9)
    val cn = runCoreness(edges)
    val maxK = cn.values.max.toInt
    for (k <- 1 to maxK + 1) {
      val want = run(edges, k).keySet
      assert(cn.filter(_._2 >= k).keySet === want,
        s"{v : coreness >= $k} != nodes of the $k-core")
    }
  }

  test("coreness on the cycle-with-tail: cycle 2, tail 1; empty input empty") {
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 4L))
    val tail = Seq((4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L))
    assert(runCoreness(cycle ++ tail) ===
      ((0L to 4L).map(_ -> 2L) ++ (5L to 8L).map(_ -> 1L)).toMap)
    assert(runCoreness(Seq.empty[(Long, Long)]) === Map.empty)
  }

  private def runRefresh(corpus: Seq[(Long, Long)], merged: Seq[(Long, Long)],
      k: Int): Map[Long, (Long, Option[Long])] = {
    val standing = KCore.core(corpus.toDF("id_a", "id_b"), k)
    KCore.refreshCore(standing, merged.toDF("id_a", "id_b"), k)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
  }

  test("refreshCore == cold core of the merged graph, differentially") {
    for (seed <- Seq(2, 8); k <- Seq(2, 3)) {
      val merged = randomGraph(60, 160, seed)
      val rnd = new Random(seed + 50)
      val corpus = merged.filter(_ => rnd.nextDouble() < 0.85)
      val got = runRefresh(corpus, merged, k)
      val want = refCore(merged, k)
      val prev = refCore(corpus, k)
      assert(got.view.mapValues(_._1).toMap === want, s"seed=$seed k=$k degrees diverged")
      assert(got.view.mapValues(_._2).toMap ===
        want.keys.map(v => v -> prev.get(v)).toMap,
        s"seed=$seed k=$k prev-degree audit column diverged")
    }
  }

  test("refreshCore: a batch edge promotes a whisker node into the core") {
    // corpus: triangle 0-1-2 with pendant 3 (2-core = triangle);
    // batch edge 3-0 closes a second cycle -> 3 joins the 2-core
    val corpus = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L))
    val merged = corpus :+ (0L, 3L)
    val got = runRefresh(corpus, merged, k = 2)
    assert(got === Map(
      0L -> (3L, Some(2L)), 1L -> (2L, Some(2L)),
      2L -> (3L, Some(2L)), 3L -> (2L, None)))
  }

  test("maxRounds failsafe fails loudly") {
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 4L))
    val tail = Seq((4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L))
    val e = intercept[IllegalArgumentException] {
      run(cycle ++ tail, k = 2, maxRounds = 2)
    }
    assert(e.getMessage.contains("no fixpoint"))
  }
}
