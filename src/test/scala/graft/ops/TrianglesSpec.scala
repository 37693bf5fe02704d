package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degree-oriented triangle counting: hand-traced shapes, a
  * differential against the naive triple check on random graphs, the
  * hub-skew case the orientation exists for, and a cartesian-free
  * plan pin. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNodeCounts(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  private def naive(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.toSet
    def has(a: Long, b: Long) = es.contains((a min b, a max b))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val out = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- i + 1 until nodes.size; k <- j + 1 until nodes.size
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if has(a, b) && has(b, c) && has(a, c)
    } { out(a) += 1; out(b) += 1; out(c) += 1 }
    out.toMap
  }

  test("K4: every node sits in 3 triangles") {
    val k4 = for (i <- 0L to 3L; j <- i + 1 to 3L) yield (i, j)
    assert(counts(k4) === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("id outside [0, 2^32) fails loudly instead of mis-orienting") {
    // rk = deg*2^32 + id is only a total order on that domain; a
    // silent collision would double- or zero-count triangles
    val big = 1L << 32
    val bad = Seq((0L, 1L), (1L, big), (0L, big))
    val ex = intercept[Exception] {
      Triangles.perNodeCounts(bad.toDF("id_a", "id_b")).collect()
    }
    assert(ex.getMessage.contains("2^32") ||
      Option(ex.getCause).exists(_.getMessage.contains("2^32")), ex.getMessage)
    val neg = Seq((-1L, 1L), (1L, 2L), (-1L, 2L))
    intercept[Exception] {
      Triangles.perNodeCounts(neg.toDF("id_a", "id_b")).collect()
    }
  }

  test("triangle-free shapes emit nothing") {
    assert(counts(Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L))).isEmpty, "4-cycle")
    assert(counts((1L to 5L).map(l => (0L, l))).isEmpty, "star")
  }

  test("hub skew: a degree-n vertex plus closures still counts exactly") {
    // hub 0 connected to 1..40, plus a chain of closure edges among
    // leaves — each closure (i, i+1) forms exactly one triangle with
    // the hub. The orientation pivots wedges at the LEAVES (low
    // degree), never enumerating the hub's deg² pairs.
    val edges = (1L to 40L).map(l => (0L, l)) ++ (1L until 40L).map(i => (i, i + 1))
    val got = counts(edges)
    assert(got(0L) === 39L, "hub closes 39 triangles")
    assert(got(1L) === 1L && got(40L) === 1L && got(20L) === 2L)
    assert(got === naive(edges))
  }

  test("differential vs naive triple check on random graphs") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new Random(seed)
      val n = 60
      val edges = (for {
        i <- 0L until n; j <- i + 1 until n if rnd.nextDouble() < 0.12
      } yield (i, j)).toSeq
      assert(counts(edges) === naive(edges), s"seed=$seed")
    }
  }

  test("both physical forms agree (adjacency-intersection vs wedge rows)") {
    for (seed <- Seq(5, 6)) {
      val rnd = new Random(seed)
      val edges = (for {
        i <- 0L until 50L; j <- i + 1 until 50L if rnd.nextDouble() < 0.15
      } yield (i, j)).toSeq
      val adjForm = counts(edges)
      val wedgeForm = Triangles
        .perNodeCounts(edges.toDF("id_a", "id_b"), broadcastEdgeLimit = 0L)
        .as[(Long, Long)].collect().toMap
      assert(adjForm === wedgeForm, s"seed=$seed")
      assert(adjForm === naive(edges), s"seed=$seed")
    }
  }

  test("incremental: new-triangle counts == recount(union) - recount(corpus)") {
    for (seed <- Seq(2, 5)) {
      val rnd = new Random(seed)
      val all = (for {
        i <- 0L until 50L; j <- i + 1 until 50L if rnd.nextDouble() < 0.15
      } yield (i, j)).toSeq
      val (batch, corpusE) = all.partition(_ => rnd.nextDouble() < 0.3)
      val got = Triangles
        .newTrianglesPerNode(corpusE.toDF("id_a", "id_b"), batch.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      val after = naive(all)
      val before = naive(corpusE)
      val want = after.map { case (n, c) => n -> (c - before.getOrElse(n, 0L)) }
        .filter(_._2 > 0L)
      assert(got === want, s"seed=$seed")
    }
  }

  test("incremental: a triangle with 2 or 3 batch edges counts once") {
    // corpus holds one side, the batch brings the other two — and a
    // second triangle arrives entirely in the batch
    val corpusE = Seq((1L, 2L))
    val batch = Seq((1L, 3L), (2L, 3L), (7L, 8L), (7L, 9L), (8L, 9L))
    val got = Triangles
      .newTrianglesPerNode(corpusE.toDF("id_a", "id_b"), batch.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 8L -> 1L, 9L -> 1L))
  }

  test("plan: equi-joins only — no cartesian, no nested loop") {
    val edges = (for (i <- 0L to 20L; j <- i + 1 to 20L if (i + j) % 3 != 0) yield (i, j)).toSeq
    val plan = Triangles.perNodeCounts(edges.toDF("id_a", "id_b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
