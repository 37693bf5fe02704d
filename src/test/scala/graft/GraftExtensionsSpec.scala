package graft

import org.apache.spark.sql.SparkSession

/** The extensions entry point — previously untested: a session built
  * `.withExtensions(new GraftExtensions)` must expose the engine's
  * FULL SQL function surface (the shared Exprs.sqlBuilders list — the
  * old hand-copied list had drifted seven functions behind the runtime
  * path). The new session SHARES the suite's SparkContext (never call
  * stop() on it — that would stop the context under every other
  * suite); active/default sessions are restored in finally. */
class GraftExtensionsSpec extends SparkSpec {

  test("withExtensions session exposes the full SQL surface incl. the sketch family") {
    val base = spark // force the shared context into existence first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      assert(ext ne base, "builder must mint a NEW session or the test is vacuous")
      // scalar kernel: the canonical ERC-20 Transfer selector
      assert(ext.sql("SELECT keccak256('Transfer(address,address,uint256)') AS k")
        .head().getString(0).startsWith("ddf252ad"))
      ext.range(0, 1000).createOrReplaceTempView("ids")
      // KLL: build + probe in pure SQL; the median of 0..999 within
      // the sketch's rank-error envelope
      val med = ext.sql(
        """WITH s AS (SELECT kll_sketch(CAST(id AS DOUBLE)) AS sk FROM ids)
          |SELECT kll_quantile(sk, 0.5d) AS med FROM s""".stripMargin)
        .head().getDouble(0)
      assert(med >= 400.0 && med <= 600.0, s"median estimate off: $med")
      // CMS: one-sided error — estimate >= true count (100 per residue)
      val est = ext.sql(
        """WITH s AS (SELECT count_min_sketch(id % 10, 0.001d, 0.99d, 5) AS sk FROM ids)
          |SELECT cms_estimate(sk, CAST(3 AS BIGINT)) AS est FROM s""".stripMargin)
        .head().getLong(0)
      assert(est >= 100L, s"cms_estimate undercounted: $est")
      // Misra-Gries: capacity 3 over 7 uniform residues still returns
      // a bounded candidate array (guarantee, not contents)
      val hh = ext.sql("SELECT mg_sketch(CAST(id % 7 AS STRING), 3) AS hh FROM ids")
        .head().getSeq[Any](0)
      assert(hh.size <= 3, s"mg_sketch exceeded capacity: ${hh.size}")
      // uint256 arithmetic beyond 2^63
      val sum = ext.sql(
        s"SELECT hex_to_dec(hex_add('0x${"f" * 16}', '0x1')) AS s").head().getString(0)
      assert(sum === java.math.BigInteger.valueOf(2).pow(64).toString)
      // the Aggregator-backed udaf rides the same shared list now —
      // extensions sessions were the one surface still missing it
      val us = ext.sql(
        """SELECT uint256_sum(h) AS us FROM (
          |  SELECT lpad('2', 64, '0') AS h UNION ALL SELECT lpad('3', 64, '0'))"""
          .stripMargin).head().getString(0)
      assert(us === "0" * 63 + "5", s"uint256_sum via extensions: $us")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
