package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge induction ([[TextOps.bpeLearnMerges]]): the classic
  * most-frequent-adjacent-pair loop, hand-traced on fixtures small
  * enough to verify every round by eye. */
class BpeMergesSpec extends SparkSpec {
  import spark.implicits._

  private def learn(texts: Seq[String], n: Int) =
    TextOps.bpeLearnMerges(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"), n)
      .collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("n_pair")))

  test("hand-traced rounds: greedy non-overlap, weighted counts, tie-break, early stop") {
    // 3x "aaab": chars [a,a,a,b] -> pairs (a,a)x2 + (a,b), weighted by 3.
    // Round 1: (a,a)=6 wins. GREEDY application: aaa -> [aa, a] (the
    // overlapping middle pair is consumed, never double-merged).
    // Round 2: [aa,a,b] -> (aa,a)=3 ties (a,b)=3 -> lexicographic lhs
    // picks (a,b). Round 3: [aa,ab] -> (aa,ab)=3. Round 4: single
    // symbol per word -> no pairs -> early stop despite nMerges=6.
    val got = learn(Seq("aaab aaab", "aaab"), 6)
    assert(got === Seq((1L, "a", "a", 6L), (2L, "a", "b", 3L), (3L, "aa", "ab", 3L)))
  }

  test("the textbook low/lower/newest/widest corpus learns 'es','est' early") {
    // Sennrich-style example: with 6x newest + 3x widest, (e,s) then
    // (es,t) dominate after the first rounds
    val corpus = Seq.fill(5)("low").mkString(" ") + " " +
      Seq.fill(2)("lower").mkString(" ") + " " +
      Seq.fill(6)("newest").mkString(" ") + " " +
      Seq.fill(3)("widest").mkString(" ")
    val got = learn(Seq(corpus), 4)
    // (e,s)=9 and then (es,t)=9 are the classic first two merges; (l,o)
    // at 7 and (lo,w) at 7 follow
    assert(got(0) === (1L, "e", "s", 9L))
    assert(got(1) === (2L, "es", "t", 9L))
    assert(got(2)._4 === 7L)
    assert(got.map(g => (g._2, g._3)).contains(("l", "o")))
  }

  test("bpeSegment applies learned merges greedily, never across word boundaries") {
    val docs = Seq(
      (1L, "aaab aaab"),   // trained population
      (2L, "abba"),        // merge applies inside an unseen word too
      (3L, "a b"),         // 'a','b' ADJACENT only across a space: no merge
      (4L, "xyz!"))        // untouched text: one piece per char
      .toDF("doc_id", "text")
    val merges = TextOps.bpeLearnMerges(docs.filter(col("doc_id") === 1L), 3)
    // learned on 'aaab' x2: (a,a), (a,b), (aa,ab) — see the first test
    val got = TextOps.bpeSegment(docs, merges).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chars_actual"), r.getAs[Long]("n_bpe_pieces"))).toMap
    // "aaab aaab": each word folds to ONE symbol (aaab), space is its
    // own piece -> 3 pieces of 9 chars
    assert(got(1L) === (9L, 3L))
    // "abba": (a,b) fuses the prefix; 'b','a' has no rule -> [ab, b, a]
    assert(got(2L) === (4L, 3L))
    // "a b": the space symbol sits between 'a' and 'b', so the (a,b)
    // rule CANNOT fire across the boundary -> [a, ' ', b]
    assert(got(3L) === (3L, 3L))
    // no rule touches "xyz!": every char its own piece
    assert(got(4L) === (4L, 4L))
  }

  test("non-ASCII and separator-unsafe words are excluded from training") {
    // the word population is [A-Za-z0-9]+ only: punctuation-bearing and
    // non-ASCII words never contribute symbols (documented restriction:
    // regex engines disagree on astral '.' and '|' is the separator)
    val got = learn(Seq("café café café a|b a|b ok ok ok ok"), 1)
    assert(got === Seq((1L, "o", "k", 4L)))
  }
}
