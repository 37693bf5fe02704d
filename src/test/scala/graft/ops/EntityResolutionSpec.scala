package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Entity resolution: differential proof against the naive all-pairs
  * resolver on random corpora with planted near-dups, plus the sf0.01
  * fixture shape and a no-cartesian plan pin. */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def trigrams(s: String): Set[String] =
    if (s.length < 3) Set.empty else (0 to s.length - 3).map(i => s.substring(i, i + 3)).toSet

  /** Naive reference: all-pairs rule check + local union-find. */
  private def naive(recs: Seq[(Long, String)], k: Int, tau: Double): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for {
      (ia, na) <- recs; (ib, nb) <- recs if ia < ib
      ta = trigrams(na); tb = trigrams(nb)
      if ta.nonEmpty && tb.nonEmpty
      inter = (ta & tb).size
      if inter.toDouble / (ta.size + tb.size - inter) >= tau && lev(na, nb) <= k
    } {
      val (ra, rb) = (find(ia), find(ib))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    recs.map { case (id, _) => id -> find(id) }.toMap
  }

  private def corpus(n: Int, seed: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val bases = Seq.fill(n / 4)(s"rec${rnd.nextInt(100)}x${rnd.alphanumeric.take(6).mkString}")
    Seq.tabulate(n) { i =>
      val s = bases(rnd.nextInt(bases.size))
      val v = rnd.nextInt(4) match {
        case 0 => s // exact dup
        case 1 => s.updated(rnd.nextInt(s.length), 'q') // 1-substitution
        case 2 => s + "z" // 1-append
        case _ => rnd.alphanumeric.take(10).mkString // unrelated
      }
      (i.toLong, v)
    }
  }

  test("resolve == naive all-pairs resolver, differentially") {
    for (seed <- Seq(1, 2, 3)) {
      val recs = corpus(120, seed)
      val got = EntityResolution.resolve(
          recs.toDF("id", "name").repartition(4), col("id"), col("name"),
          k = 1, tau = 0.9)
        .select("record_id", "entity_id").as[(Long, Long)].collect().toMap
      val want = naive(recs, 1, 0.9)
      assert(got === want, s"seed=$seed")
    }
  }

  test("n_members sums back to the record count and counts each entity") {
    val recs = corpus(80, seed = 9)
    val out = EntityResolution.resolve(recs.toDF("id", "name"),
      col("id"), col("name"), k = 1, tau = 0.9)
    val rows = out.as[(Long, Long, Long)].collect()
    assert(rows.length === 80)
    val byEnt = rows.groupBy(_._2)
    byEnt.foreach { case (ent, members) =>
      assert(members.forall(_._3 == members.length.toLong), s"entity $ent size col wrong")
      assert(members.map(_._1).min === ent, s"entity id $ent is not its component min")
    }
  }

  test("records below trigram length resolve as singletons (stated behavior)") {
    val recs = Seq((1L, "ab"), (2L, "ab"), (3L, "abcd"), (4L, "abcd"))
    val got = EntityResolution.resolve(recs.toDF("id", "name"),
        col("id"), col("name"), k = 1, tau = 0.9)
      .as[(Long, Long, Long)].collect().map { case (r, e, _) => r -> e }.toMap
    assert(got(1L) === 1L && got(2L) === 2L, "sub-trigram records must not merge")
    assert(got(3L) === 3L && got(4L) === 3L, "identical long records must merge")
  }

  test("incremental assignBatch == full re-resolve, differentially incl. bridges") {
    for (seed <- Seq(1, 2, 4)) {
      val recs = corpus(150, seed)
      val (corpusRecs, batchRecs) = recs.partition(_._1 % 5 != 0) // 80/20
      val resolved = EntityResolution.resolve(
        corpusRecs.toDF("id", "name"), col("id"), col("name"), 1, 0.9)
      val standing = resolved
        .join(corpusRecs.toDF("record_id", "name"), Seq("record_id"))
      val got = EntityResolution.assignBatch(
          standing, col("record_id"), col("entity_id"), col("name"),
          batchRecs.toDF("id", "name"), col("id"), col("name"), 1, 0.9)
        .as[(Long, Long)].collect().toMap
      val full = naive(recs, 1, 0.9)
      val want = batchRecs.map { case (id, _) => id -> full(id) }.toMap
      assert(got === want, s"seed=$seed")
    }
  }

  test("a batch record bridging two standing entities merges them") {
    // corpus: entity {1,2} = "X"+base and entity {10,11} = base+"Y"
    // (lev 2 apart, trigram jaccard 15/17 < 0.9 — resolve keeps them
    // separate, asserted below); batch record 5 = base is 1 edit and
    // 15/16 trigram-jaccard from BOTH, so the full re-resolve is one
    // component — the incremental path must emit the GLOBAL min (1),
    // not either standing label.
    val base = "alphabravocharlie"
    val corpusRecs = Seq(
      (1L, "X" + base), (2L, "X" + base),
      (10L, base + "Y"), (11L, base + "Y"))
    val standing = EntityResolution.resolve(
        corpusRecs.toDF("id", "name"), col("id"), col("name"), 1, 0.9)
      .join(corpusRecs.toDF("record_id", "name"), Seq("record_id"))
    val pre = standing.select("record_id", "entity_id")
      .as[(Long, Long)].collect().toMap
    assert(pre === Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L),
      "fixture must start as two standing entities")
    val batch = Seq((5L, base))
    val got = EntityResolution.assignBatch(
        standing, col("record_id"), col("entity_id"), col("name"),
        batch.toDF("id", "name"), col("id"), col("name"), 1, 0.9)
      .as[(Long, Long)].collect().toMap
    val full = naive(corpusRecs ++ batch, 1, 0.9)
    assert(full(5L) === 1L && full(10L) === 1L, "fixture must actually bridge")
    assert(got(5L) === 1L, s"got=$got")
  }

  test("plan: no cartesian product anywhere in the resolve pipeline") {
    val recs = corpus(60, seed = 4)
    val plan = EntityResolution.resolve(recs.toDF("id", "name"),
        col("id"), col("name"), k = 1, tau = 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
