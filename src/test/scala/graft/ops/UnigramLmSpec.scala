package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-traced pins for [[TextOps.unigramLm]]'s fixed-point DP — the
  * oracle proves Spark == DuckDB, these prove both == the intended
  * semantics (min pieces, then max frequency sum, smallest-t read-out).
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("prefers fewer pieces: a whole-word piece beats two halves") {
    // corpus: "abcd" x3 and "ab" x1, "cd" x1. Seed vocab holds "abcd"
    // (n=3 >= 2) as well as "ab"/"cd" (n=4 each, higher!) — but the DP
    // minimizes PIECE COUNT first, so "abcd" segments as one piece
    // despite the halves' larger frequencies.
    val out = TextOps.unigramLm(docs("abcd abcd abcd ab cd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("abcd") === 3L)
    assert(out("ab") === 1L) // only the standalone word "ab"
    assert(out("cd") === 1L)
  }

  test("tie on piece count resolves by larger frequency sum") {
    // "abcdef" needs >= 2 pieces (max piece len 4). Competing 2-piece
    // splits: ab+cdef, abc+def, abcd+ef... availability and frequency
    // decide. Make "ef" very frequent via standalone words, so
    // abcd+ef's frequency sum wins over abc+def.
    val text = ("abcdef " * 2) + ("ef " * 10) + ("abc " * 3) + ("def " * 3) +
      ("abcd " * 3) + "x"
    val out = TextOps.unigramLm(docs(text.trim))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "abcdef" x2 must have gone to abcd+ef (sum n(abcd)+n(ef) beats
    // abc+def since ef is inflated): abcd usage = 3 standalone + 2,
    // ef usage = 10 standalone + 2
    assert(out("abcd") === 5L, s"got $out")
    assert(out("ef") === 12L, s"got $out")
    assert(out("abc") === 3L)
    assert(out("def") === 3L)
  }

  test("singles survive both rounds at zero usage (coverage invariant)") {
    // "zq" appears once; the piece "zq" (n=1 < minCount 2) never seeds,
    // so the word segments as z+q — both singles must be usable even
    // though nothing else contains them
    val out = TextOps.unigramLm(docs("zq " + ("abcd " * 3)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("z") === 1L)
    assert(out("q") === 1L)
  }

  test("words longer than 16 chars and non-alnum tokens are excluded") {
    val out = TextOps.unigramLm(
      docs("abcdefghijklmnopq abcd-efg " + ("abcd " * 3))) // 17 chars; hyphen
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("abcd" -> 3L))
  }
}
