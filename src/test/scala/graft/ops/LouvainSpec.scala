package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic synchronous Louvain level: in-memory differential of
  * the exact move rule on random graphs, a hand fixture where the
  * communities are known, modularity improvement over the start
  * partition, and the loud guards. */
class LouvainSpec extends SparkSpec {
  import spark.implicits._

  /** The same synchronous round, no Spark: per node in the round's
    * parity class, candidates = neighbor communities ∪ current;
    * score = 2m·k_ic − k_i·(tot_c − [c = cur]·k_i); max score, ties
    * to the smallest label; off-parity nodes carry. */
  private def refRounds(edges: Seq[(Long, Long)], init: Map[Long, Long],
      rounds: Int): Map[Long, Long] = {
    val m = edges.size.toLong
    val ed = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = ed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var lab = init
    for (r <- 1 to rounds) {
      val sigma = lab.toSeq.groupBy(_._2).view
        .mapValues(_.map(x => deg(x._1)).sum).toMap
      val kic = ed.groupBy(x => (x._1, lab(x._2))).view
        .mapValues(_.size.toLong).toMap
      lab = lab.map { case (i, cur) =>
        if (i % 2 != r % 2) i -> cur
        else {
          val cands = kic.keysIterator.collect { case (n, c) if n == i => c }.toSet + cur
          val scored = cands.map { c =>
            val tot = sigma(c) - (if (c == cur) deg(i) else 0L)
            (2L * m * kic.getOrElse((i, c), 0L) - deg(i) * tot, c)
          }
          val ms = scored.map(_._1).max
          i -> scored.filter(_._1 == ms).map(_._2).min
        }
      }
    }
    lab
  }

  private def undirected(seed: Int, n: Int, p: Double): Seq[(Long, Long)] = {
    val rnd = new Random(seed)
    (for {
      i <- 0L until n.toLong; j <- i + 1 until n.toLong
      if rnd.nextDouble() < p
    } yield (i, j)).toSeq
  }

  test("oneLevel matches the in-memory move rule on random graphs") {
    for (seed <- Seq(5, 17); rounds <- Seq(1, 3)) {
      val edges = undirected(seed, n = 30, p = 0.12)
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val init = nodes.map(v => v -> v).toMap
      val got = Louvain.oneLevel(edges.toDF("id_a", "id_b"),
          init.toSeq.toDF("node", "lbl"), rounds)
        .as[(Long, Long)].collect().toMap
      assert(got === refRounds(edges, init, rounds),
        s"seed $seed rounds $rounds diverged")
    }
  }

  test("two triangles with a bridge: singletons merge into the two triangles and Q rises") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L),
      (2L, 3L)).toDF("id_a", "id_b")
    val lab = Louvain.fromSingletons(edges, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(lab(0L) === lab(1L) && lab(1L) === lab(2L), s"left triangle split: $lab")
    assert(lab(3L) === lab(4L) && lab(4L) === lab(5L), s"right triangle split: $lab")
    assert(lab(0L) !== lab(3L), s"bridge absorbed both triangles: $lab")
    def q(labels: Map[Long, Long]): Double =
      Modularity.ofPartition(edges, labels.toSeq.toDF("node", "lbl"))
        .select(col("q_total")).head().getDouble(0)
    val singles = (0L to 5L).map(v => v -> v).toMap
    assert(q(lab) > q(singles), "greedy moves did not improve modularity")
  }

  test("empty and oversized edge sets fail loudly") {
    val e1 = intercept[IllegalArgumentException](
      Louvain.oneLevel(Seq.empty[(Long, Long)].toDF("id_a", "id_b"),
        Seq((1L, 1L)).toDF("node", "lbl"), rounds = 1))
    assert(e1.getMessage.contains("empty"))
    val e2 = intercept[IllegalArgumentException](
      Louvain.oneLevel(Seq((1L, 2L)).toDF("id_a", "id_b"),
        Seq((1L, 1L)).toDF("node", "lbl"), rounds = 0))
    assert(e2.getMessage.contains("rounds"))
  }
}
