package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Smoke: every declared query runs on sf0.001 and produces a schema +
  * rows (value-level checking is the DuckDB differential oracle,
  * tools/check.py / the driver). */
class QueriesSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  // pair-producing queries may legitimately return 0 rows at tiny SF
  private val mayBeEmpty =
    Set("dedup_embed_cosine", "dedup_embed_lsh", "dedup_minhash",
      "dedup_ngram_jaccard", "ann_lsh")

  test("oracleSql covers every query except declared rows-only ops") {
    // no 256-bit ints / keccak in DuckDB; sketches are approximate by definition
    val rowsOnly = Set("p8_uint256_math", "p9_keccak", "x1_approx_sketch")
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet -- rowsOnly)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      assert(df.schema.nonEmpty)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
