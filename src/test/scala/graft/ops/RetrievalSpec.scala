package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // ---- bm25TopK ------------------------------------------------------------

  test("bm25TopK: hand-computed scores, ranking, and zero-score drop") {
    // 3 docs, query = {x}: N=3, df(x)=2, dl = 4/2/3, avgdl = 3.0
    val docs = Seq(
      (1L, "x y x z"), // tf=2, dl=4
      (2L, "a b"),     // tf=0 -> dropped (score 0)
      (3L, "x q r")    // tf=1, dl=3
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, Seq("x"), k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val k1 = 1.2; val b = 0.75
    val idf = (3.0 - 2.0 + 0.5) / (2.0 + 0.5)
    def s(tf: Double, dl: Double) =
      idf * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / 3.0))))
    // doc1: tf=2 beats doc3: tf=1 (doc1's longer dl does not overcome tf)
    assert(got.toSeq === Seq((1L, 1, s(2, 4)), (3L, 2, s(1, 3))))
  }

  test("bm25TopK: k limits the result and ties break by doc_id") {
    // Identical docs -> identical scores; rank order must be doc_id.
    val docs = (1L to 5L).map(i => (i, "x y z")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, Seq("x"), k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq === Seq((1L, 1), (2L, 2), (3L, 3)))
  }

  test("bm25TopK: plan takes the per-partition top-k path, never a global sort") {
    val docs = (1L to 50L).map(i => (i, s"x y $i")).toDF("doc_id", "text")
    val plan = Retrieval.bm25TopK(docs, Seq("x"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
  }

  // ---- tfidfKeywords -------------------------------------------------------

  test("tfidfKeywords: tf*(N/df) ranking with token tie-break") {
    val docs = Seq(
      (1L, "rare rare common"),
      (2L, "common common other")
    ).toDF("doc_id", "text")
    // N=2; df: rare=1, common=2, other=1
    val got = Retrieval.tfidfKeywords(docs, topN = 2).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // doc1: rare tf=2 df=1 -> 2*(2/1)=4; common tf=1 df=2 -> 1*(2/2)=1
    assert(got((1L, 1)) === (("rare", 2L, 1L, 4.0)))
    assert(got((1L, 2)) === (("common", 1L, 2L, 1.0)))
    // doc2: common tf=2 -> 2; other tf=1 df=1 -> 2 — tie, token asc: common first
    assert(got((2L, 1)) === (("common", 2L, 2L, 2.0)))
    assert(got((2L, 2)) === (("other", 1L, 1L, 2.0)))
  }

  test("tfidfKeywords: rank filter is pushed into the window (WindowGroupLimit)") {
    val docs = (1L to 40L).map(i => (i, "a b c d e f g h")).toDF("doc_id", "text")
    val plan = Retrieval.tfidfKeywords(docs, topN = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }

  // ---- bigramKnownRatio ----------------------------------------------------

  test("bigramKnownRatio: mean-threshold coverage, hand-checked") {
    // Corpus bigrams: "a b" x3 (docs 1,1,2), "b c" x1 (doc 2).
    // grand_total=4, n_distinct=2, mean=2: "a b" known (3*2>=4),
    // "b c" not (1*2<4).
    val docs = Seq(
      (1L, "a b a b"),  // bigrams: "a b","b a","a b" -> wait: a b, b a, a b
      (2L, "a b c")     // bigrams: "a b","b c"
    ).toDF("doc_id", "text")
    // Recompute exactly: doc1 bigrams = [a b, b a, a b]; doc2 = [a b, b c]
    // totals: "a b"=3, "b a"=1, "b c"=1; grand=5, distinct=3, known iff t*3>=5 -> "a b" only
    val got = Retrieval.bigramKnownRatio(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((3L, 2L, 2.0 / 3.0)))
    assert(got(2L) === ((2L, 1L, 1.0 / 2.0)))
  }

  test("bigramKnownRatio: docs with fewer than 2 tokens emit no row") {
    val docs = Seq((1L, "solo"), (2L, "a a a")).toDF("doc_id", "text")
    val got = Retrieval.bigramKnownRatio(docs).collect().map(_.getLong(0)).toSet
    assert(got === Set(2L))
  }

  // ---- pmiBigrams ----------------------------------------------------------

  test("pmiBigrams: hand-computed ratio, totals taken before the count filter") {
    // corpus: "a b a b c" -> bigrams: (a,b) x2, (b,a), (b,c); unigrams a=2 b=2 c=1
    val docs = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val got = Retrieval.pmiBigrams(docs, minCount = 2L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // only (a,b) survives minCount=2; N_bi=4 (pre-filter!), N_uni=5
    // ratio = (2 * 5 * 5) / (4 * 2 * 2) = 50/16 = 3.125
    assert(got.keySet === Set(("a", "b")))
    assert(got(("a", "b")) === ((2L, 2L, 2L, (2.0 * (5.0 * 5.0)) / ((4.0 * 2.0) * 2.0))))
  }

  test("pmiBigrams: single-token docs contribute unigrams but no pairs") {
    val docs = Seq((1L, "x"), (2L, "x y x y")).toDF("doc_id", "text")
    val got = Retrieval.pmiBigrams(docs, minCount = 2L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // bigrams: (x,y) x2, (y,x) x1 -> only (x,y); c_x counts BOTH docs' x (3)
    assert(got.toSeq === Seq(("x", "y", 2L, 3L)))
  }

  // ---- corpusDiff ----------------------------------------------------------

  test("corpusDiff: added / removed / changed / unchanged classification") {
    val old = Seq((1L, "same"), (2L, "before"), (4L, "gone")).toDF("doc_id", "text")
    val nw = Seq((1L, "same"), (2L, "after"), (3L, "new")).toDF("doc_id", "text")
    val got = Snapshot.corpusDiff(old, nw).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "added", 4L -> "removed"))
  }

  test("corpusDiff: shuffle carries hashes, not document bodies") {
    val old = (1L to 20L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val nw = (5L to 25L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    // The join inputs are projected to (doc_id, md5) — neither side of
    // the optimized join may carry the raw text column into the
    // exchange (at 100 TB the shuffle moves hashes, not bodies).
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val joins = Snapshot.corpusDiff(old, nw).queryExecution.optimizedPlan
      .collect { case j: Join => j }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      j.children.foreach { side =>
        assert(!side.output.exists(_.name == "text"),
          s"raw text column leaked into the join input: ${side.output.map(_.name)}")
      }
    }
  }

  test("simulated snapshots line up with the oracle's derivation") {
    val docs = (0L to 99L).map(i => (i, s"body $i")).toDF("doc_id", "text")
    val got = Snapshot.corpusDiff(
      Snapshot.simulatedOld(docs), Snapshot.simulatedNew(docs))
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // %10==7 (10 docs) added; %10==3 (10) removed; %13==0 minus overlaps changed
    val changed = (0L to 99L).count(i => i % 13 == 0 && i % 10 != 7 && i % 10 != 3)
    assert(got("added") === 10L)
    assert(got("removed") === 10L)
    assert(got("changed") === changed.toLong)
    assert(got("unchanged") === (100L - 20L - changed))
  }
}
