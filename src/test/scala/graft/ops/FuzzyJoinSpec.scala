package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential proof of [[FuzzyJoin.edJoin]]'s blocking completeness:
  * the segment scheme + position window + short path must recover
  * EXACTLY the naive cross join's levenshtein pairs on random corpora —
  * the RangeJoinSpec discipline. Corpora deliberately include empty
  * strings, strings shorter than k+1 (the short path), and lengths
  * straddling the k+1 boundary, because those are where a blocking
  * scheme silently loses pairs.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def corpus(seed: Int, n: Int, alphabet: String, maxLen: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val len = rnd.nextInt(maxLen + 1) // includes 0: empty strings in play
      (i.toLong, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
  }

  private def runDiff(seed: Int, k: Int, alphabet: String, maxLen: Int,
      deletes: Boolean = false): Unit = {
    val idx = corpus(seed, 60, alphabet, maxLen)
    val prb = corpus(seed + 1000, 40, alphabet, maxLen)
    val idxDf = idx.toDF("id", "str")
    val prbDf = prb.toDF("id", "str")
    val joined =
      if (deletes) FuzzyJoin.edJoinDeletes(idxDf, col("id"), col("str"),
        prbDf, col("id"), col("str"), k)
      else FuzzyJoin.edJoin(idxDf, col("id"), col("str"),
        prbDf, col("id"), col("str"), k)
    val got = joined
      .select("probe_id", "match_id", "dist").as[(Long, Long, Long)]
      .collect().toSet
    val want = (for {
      (sid, s) <- prb
      (rid, r) <- idx
      d = lev(s, r) if d <= k
    } yield (sid, rid, d.toLong)).toSet
    assert(got === want,
      s"seed=$seed k=$k deletes=$deletes: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("edJoin matches the naive cross join (k=1, small alphabet, short strings)") {
    // small alphabet + short strings maximize near-duplicate density
    // and short-path traffic
    runDiff(seed = 42, k = 1, alphabet = "ab", maxLen = 5)
    runDiff(seed = 43, k = 1, alphabet = "abc", maxLen = 8)
  }

  test("edJoin matches the naive cross join (k=2, lengths straddle the segment boundary)") {
    runDiff(seed = 44, k = 2, alphabet = "ab", maxLen = 7)
    runDiff(seed = 45, k = 2, alphabet = "abcd", maxLen = 10)
  }

  test("edJoin matches the naive cross join (k=0 degenerates to exact match)") {
    runDiff(seed = 46, k = 0, alphabet = "abc", maxLen = 6)
  }

  test("edJoin k=3 on longer strings") {
    runDiff(seed = 47, k = 3, alphabet = "ab", maxLen = 12)
  }

  test("edJoinDeletes matches the naive cross join (k=1 and k=2, dup-heavy corpora)") {
    // small alphabet + short lengths make duplicate strings certain,
    // exercising the distinct-string collapse and id re-expansion
    runDiff(seed = 50, k = 1, alphabet = "ab", maxLen = 5, deletes = true)
    runDiff(seed = 51, k = 1, alphabet = "abc", maxLen = 8, deletes = true)
    runDiff(seed = 52, k = 2, alphabet = "ab", maxLen = 6, deletes = true)
    runDiff(seed = 53, k = 2, alphabet = "abcd", maxLen = 9, deletes = true)
  }

  test("edJoinDeletes plans equi-joins only — no cartesian, no nested loop") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val idxDf = corpus(60, 50, "abc", 8).toDF("id", "str")
    val prbDf = corpus(61, 30, "abc", 8).toDF("id", "str")
    val p = FuzzyJoin.edJoinDeletes(idxDf, col("id"), col("str"),
      prbDf, col("id"), col("str"), 2).queryExecution.sparkPlan
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty, s"cartesian:\n$p")
    assert(p.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty, s"BNLJ:\n$p")
  }

  test("incremental probe against a standing variant index == the batch join") {
    // the standing-index path must produce exactly edJoinDeletes'
    // answer for the same (batch x corpus) pairs — the convergence
    // contract every incremental tier here carries
    val corpus = this.corpus(70, 60, "abc", 7)
    val batch = this.corpus(71, 30, "abc", 7)
    for (k <- Seq(1, 2)) {
      val idx = FuzzyJoin.deleteVariantIndex(
        corpus.toDF("id", "str"), col("id"), col("str"), k)
      val got = FuzzyJoin.probeDeletes(
          batch.toDF("id", "str"), col("id"), col("str"), idx, k)
        .select("probe_id", "match_id", "dist").as[(Long, Long, Long)]
        .collect().toSet
      val want = FuzzyJoin.edJoinDeletes(
          corpus.toDF("id", "str"), col("id"), col("str"),
          batch.toDF("id", "str"), col("id"), col("str"), k)
        .select("probe_id", "match_id", "dist").as[(Long, Long, Long)]
        .collect().toSet
      assert(got === want, s"k=$k: probe diverged from the batch join")
      assert(want.nonEmpty, s"k=$k: vacuous fixture")
    }
  }

  test("hand case: edits spanning segment boundaries and shifted survivors") {
    // "abcdef" vs probes built by one deletion/insertion/substitution at
    // each position — every pair must surface with dist 1 despite the
    // surviving segment arriving shifted
    val base = "abcdef"
    val probes = (0 until base.length).flatMap { i =>
      Seq(base.take(i) + base.drop(i + 1), // delete at i
        base.take(i) + "x" + base.drop(i), // insert at i
        base.take(i) + "x" + base.drop(i + 1)) // substitute at i
    }.distinct.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = FuzzyJoin.edJoin(
        Seq((0L, base)).toDF("id", "str"), col("id"), col("str"),
        probes.toDF("id", "str"), col("id"), col("str"), k = 1)
      .select("probe_id").as[Long].collect().toSet
    assert(got === probes.map(_._1).toSet)
  }
}
