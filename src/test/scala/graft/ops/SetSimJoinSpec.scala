package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential proof of [[SetSimJoin.jaccardSelfJoin]]'s prefix-filter
  * completeness against the naive all-pairs Jaccard — the FuzzyJoinSpec
  * discipline. Corpora deliberately include a corpus-wide template
  * region (the PassJoin failure mode prefix filtering exists to dodge)
  * and near-stopword-only documents (the worst case, where prefixes
  * must fall back to common tokens because nothing rare exists). */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def jac(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0.0
    else (a & b).size.toDouble / (a | b).size.toDouble

  private def runDiff(docs: Seq[(Long, String)], tau: Double): Unit = {
    val got = SetSimJoin.jaccardSelfJoinTokens(docs.toDF("doc_id", "text"), tau)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sets = docs.map { case (id, t) => id -> t.split(" ").toSet }
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia < ib && jac(sa, sb) >= tau
    } yield (ia, ib)).toSet
    assert(got === want,
      s"tau=$tau: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  private def corpus(seed: Int, n: Int, vocab: Int, len: Int,
      template: String = ""): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val body = Seq.fill(len)(s"w${rnd.nextInt(vocab)}").mkString(" ")
      (i.toLong, if (template.isEmpty) body else s"$body $template")
    }
  }

  test("matches naive all-pairs at tau 0.5 and 0.8 on random corpora") {
    runDiff(corpus(1, 50, vocab = 30, len = 12), tau = 0.5)
    runDiff(corpus(2, 50, vocab = 20, len = 8), tau = 0.8)
  }

  test("corpus-wide template region: still complete, candidates keyed on rare tokens") {
    val template = (1 to 10).map(i => s"tpl$i").mkString(" ")
    runDiff(corpus(3, 40, vocab = 60, len = 10, template = template), tau = 0.5)
  }

  test("near-identical and identical docs (overlap entirely in common tokens)") {
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, shared), (2L, shared), // identical: jaccard 1.0
      (3L, shared + " extra1"), (4L, shared + " extra2"),
      (5L, "totally different tokens here now"))
    runDiff(docs, tau = 0.7)
    runDiff(docs, tau = 1.0) // tau=1: prefix length 1, exact-set matches only
  }

  test("ceil boundary taus (0.7 over sizes where tau*n lands near integers)") {
    runDiff(corpus(4, 40, vocab = 15, len = 10), tau = 0.7)
    runDiff(corpus(5, 40, vocab = 15, len = 7), tau = 0.3)
  }
}
