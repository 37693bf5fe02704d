package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Modularity decomposition: in-JVM integer differential on random
  * graphs with LPA partitions, and the classic two-cliques fixture
  * where Q is known in closed form. */
class ModularitySpec extends SparkSpec {
  import spark.implicits._

  private def ref(edges: Seq[(Long, Long)], labels: Map[Long, Long]): Map[Long, (Long, Long, Long)] = {
    val m = edges.size.toLong
    val byC = labels.groupBy(_._2)
    byC.map { case (c, members) =>
      val nodes = members.keySet
      val in = edges.count(e => nodes(e._1) && nodes(e._2) && labels(e._1) == labels(e._2)).toLong
      val deg = edges.flatMap(e => Seq(e._1, e._2)).count(nodes).toLong
      c -> (in, deg, 4L * m * in - deg * deg)
    }
  }

  private def run(edges: Seq[(Long, Long)], labels: Map[Long, Long]) =
    Modularity.ofPartition(edges.toDF("id_a", "id_b"),
        labels.toSeq.toDF("node", "lbl"))
      .collect().map(r => r.getLong(0) ->
        // numer/denom ride the DECIMAL(38,0) lattice; exact longs here
        (r.getLong(2), r.getLong(3),
          r.getDecimal(4).longValueExact(), r.getDecimal(5).longValueExact(),
          r.getDouble(6), r.getDouble(7))).toMap

  test("matches the integer reference on random LPA partitions") {
    for (seed <- Seq(3, 21)) {
      val rnd = new Random(seed)
      val pairs = (for {
        i <- 0L until 40L; j <- i + 1 until 40L if rnd.nextDouble() < 0.08
      } yield (i, j)).toSeq
      val bidir = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val labels = Lpa.propagate(bidir.toDF("src", "dst"), rounds = 3)
        .as[(Long, Long)].collect().toMap
      val m = pairs.size.toLong
      val want = ref(pairs, labels)
      val got = run(pairs, labels)
      assert(got.keySet === want.keySet)
      val numerTotal = want.values.map(_._3).sum
      want.foreach { case (c, (in, deg, numer)) =>
        val g = got(c)
        assert((g._1, g._2, g._3, g._4) === (in, deg, numer, 4L * m * m), s"community $c")
        assert(g._5 === numer.toDouble / (4L * m * m).toDouble, s"community $c q_contrib")
        assert(g._6 === numerTotal.toDouble / (4L * m * m).toDouble, s"community $c q_total")
      }
    }
  }

  test("two cliques plus one bridge: Q = 286/676") {
    val cliqueA = for (i <- 0L to 3L; j <- i + 1 to 3L) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- i + 1 to 13L) yield (i, j)
    val edges = (cliqueA ++ cliqueB :+ (3L, 10L)).toSeq
    val labels = ((0L to 3L).map(_ -> 0L) ++ (10L to 13L).map(_ -> 10L)).toMap
    val got = run(edges, labels)
    // m = 13; per clique: in = 6, deg = 13, numer = 4*13*6 - 169 = 143
    assert(got === Map(
      0L -> (6L, 13L, 143L, 676L, 143.0 / 676.0, 286.0 / 676.0),
      10L -> (6L, 13L, 143L, 676L, 143.0 / 676.0, 286.0 / 676.0)))
  }
}
