package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Token-distribution drift: in-JVM integer differential, the
  * identical-corpora zero, and the disjoint-vocabulary maximum. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def run(a: Seq[String], b: Seq[String], k: Int = 100) =
    Drift.tokenDrift(a.toDF("text"), b.toDF("text"), col("text"), k)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))

  private def ref(a: Seq[String], b: Seq[String]): Map[String, (Long, Long, Long, Long, Long, Long)] = {
    val ca = a.flatMap(_.split(" ")).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cb = b.flatMap(_.split(" ")).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val na = ca.values.sum; val nb = cb.values.sum
    val toks = ca.keySet ++ cb.keySet
    val rows = toks.map { t =>
      val (x, y) = (ca.getOrElse(t, 0L), cb.getOrElse(t, 0L))
      val (pa, pb) = (x * 1000000L / na, y * 1000000L / nb)
      t -> (x, y, pa, pb, pa - pb)
    }.toMap
    val l1 = rows.values.map(r => math.abs(r._5)).sum
    rows.view.mapValues(r => (r._1, r._2, r._3, r._4, r._5, l1)).toMap
  }

  test("matches the integer reference, ordered by |delta| then token") {
    val a = Seq("the cat sat", "the dog ran", "the cat ran")
    val b = Seq("the cat sat", "a bird flew", "the bird flew")
    val got = run(a, b)
    val want = ref(a, b)
    assert(got.toMap === want)
    val deltas = got.map { case (t, r) => (math.abs(r._5), t) }
    assert(deltas === deltas.sortBy { case (d, t) => (-d, t) },
      "rows not ordered by |delta| desc, token asc")
  }

  test("identical corpora drift zero; disjoint vocabularies drift maximally") {
    val same = Seq("alpha beta", "gamma alpha")
    assert(run(same, same).forall { case (_, r) => r._5 == 0L && r._6 == 0L })
    val d = run(Seq("aa aa"), Seq("bb bb"))
    // each side's whole mass (1e6 ppm) moved: L1 = 2e6
    assert(d.forall { case (_, r) => r._6 == 2000000L })
  }

  test("top-k keeps the largest movers") {
    val a = Seq("x x x x x x y z")
    val b = Seq("y z q q q q q q")
    val top = run(a, b, k = 1)
    assert(top.length === 1)
    assert(Set("q", "x").contains(top.head._1), s"unexpected top mover: ${top.head}")
  }

  test("an empty side fails loudly instead of NULL-ppm rows") {
    // integer div by a zero total would yield NULL ppm shares that SUM
    // silently skips — drift would read near-zero exactly when the
    // input is most broken (a side vanished)
    val e1 = intercept[IllegalArgumentException](run(Seq.empty[String], Seq("a b")))
    assert(e1.getMessage.contains("side A has no observations"))
    val e2 = intercept[IllegalArgumentException](run(Seq("a b"), Seq.empty[String]))
    assert(e2.getMessage.contains("side B has no observations"))
  }

  test("the corpus-scale merge is staged: the final plan re-reads no source") {
    // The r15 defect: perKeyPpm hung four consumers off the full-outer
    // count merge with no staging, so the corpus re-scanned 12-24x in
    // one plan (text_drift_tv/embed_drift). Pin the fix shape: with the
    // merge checkpointed, the executed plan reads ONLY staged RDDs —
    // any file/local-table scan of the inputs here means a consumer
    // reached past the stage and the rescan regressed.
    val dir = java.nio.file.Files.createTempDirectory("drift_plan").toString
    Seq("the cat sat", "the dog ran").toDF("text")
      .write.parquet(s"$dir/a")
    Seq("the cat sat", "a bird flew").toDF("text")
      .write.parquet(s"$dir/b")
    val out = Drift.tokenDrift(spark.read.parquet(s"$dir/a"),
      spark.read.parquet(s"$dir/b"), col("text"), k = 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      s"corpus scan leaked past the stage:\n$plan")
  }
}
