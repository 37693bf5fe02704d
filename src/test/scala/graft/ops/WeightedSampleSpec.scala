package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Efraimidis–Spirakis weighted sampling: exact JVM differential (the
  * oracle surrogate for the rows-only sample_weighted query),
  * partitioning invariance, weight monotonicity, and the
  * WindowGroupLimit plan pin. */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  /** The operator's priority, replayed independently: u from the first
    * 13 hex chars of md5(salt‖key), priority ln(u)/w. */
  private def priority(key: Long, w: Double, salt: String): Double = {
    val u = (java.lang.Long.parseLong(md5hex(salt + key.toString).take(13), 16) + 1L)
      .toDouble / 4503599627370496.0
    math.log(u) / w
  }

  private def reference(rows: Seq[(Long, Double, String)], k: Int,
      salt: String): Set[Long] =
    rows.filter(_._2 > 0).groupBy(_._3).values.flatMap { grp =>
      grp.map { case (id, w, _) => (priority(id, w, salt), id) }
        .sortBy { case (p, id) => (-p, id) }.take(k).map(_._2)
    }.toSet

  private def run(rows: Seq[(Long, Double, String)], k: Int, parts: Int,
      salt: String = "w0"): Set[Long] =
    Sampling.weightedTopK(rows.toDF("id", "w", "s").repartition(parts),
        col("id"), col("w"), col("s"), k, salt)
      .select("id").as[Long].collect().toSet

  private def corpus(seed: Int): Seq[(Long, Double, String)] = {
    val rnd = new Random(seed)
    Seq.tabulate(500)(i =>
      (i.toLong, rnd.nextInt(1000) + 1.0, s"s${i % 3}"))
  }

  test("selection == the independent E-S replay, across partitionings and salts") {
    for (seed <- Seq(1, 2); parts <- Seq(1, 16); salt <- Seq("w0", "epoch1")) {
      val rows = corpus(seed)
      assert(run(rows, 20, parts, salt) === reference(rows, 20, salt),
        s"seed=$seed parts=$parts salt=$salt")
    }
  }

  test("weight rules: non-positive/null weights drop; raising a weight never evicts itself") {
    val rows = Seq((1L, 0.0, "a"), (2L, -5.0, "a"), (3L, 2.0, "a"), (4L, 1.0, "a"))
    assert(run(rows, 10, 4) === Set(3L, 4L))
    // monotonicity: ln(u)/w rises with w (u fixed by the key), so a
    // selected id stays selected when only its own weight grows
    val base = corpus(7)
    val selected = run(base, 5, 4)
    val someId = selected.head
    val boosted = base.map { case (id, w, s) =>
      if (id == someId) (id, w * 100.0, s) else (id, w, s)
    }
    assert(run(boosted, 5, 4).contains(someId))
  }

  test("plan: rank filter stays a WindowGroupLimit (partial top-k before the shuffle)") {
    val plan = Sampling.weightedTopK(corpus(3).toDF("id", "w", "s"),
        col("id"), col("w"), col("s"), 15)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}
