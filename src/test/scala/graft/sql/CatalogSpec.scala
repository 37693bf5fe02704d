package graft.sql

import graft.SparkSpec

class CatalogSpec extends SparkSpec {

  test("sql over registered views + custom functions") {
    Catalog.registerAll(spark, "/root/testdata/sf0.001")
    val r = spark.sql("""
      SELECT event_type, count(*) AS n,
             substr(keccak256(event_type), 1, 8) AS selector
      FROM events GROUP BY event_type ORDER BY n DESC
    """).collect()
    assert(r.length === 5)
    assert(r.forall(_.getAs[String]("selector").length === 8))
    val j = spark.sql("""
      SELECT c.c_mktsegment, count(*) AS n
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY 1
    """).count()
    assert(j > 0)
    val abi = spark.sql(
      "SELECT abi_string(concat('0x', lpad('20', 64, '0'), lpad('2', 64, '0'), rpad('6869', 64, '0')), 0) AS s"
    ).head().getString(0)
    assert(abi === "hi")
  }

  test("chain sources are plain SQL tables: CREATE TEMPORARY VIEW ... USING <source>") {
    // the DSv2 providers register by short name, so a SQL-only user can
    // query the chain (or a live node, via the same OPTIONS) without
    // touching the DataFrame API; window pushdown still applies
    spark.sql("""
      CREATE OR REPLACE TEMPORARY VIEW chain_blocks
      USING blocks OPTIONS (start '0', maxBlock '50')""")
    spark.sql("""
      CREATE OR REPLACE TEMPORARY VIEW chain_logs
      USING logs OPTIONS (start '0', maxBlock '50')""")
    val rollup = spark.sql("""
      SELECT miner, sum(gas_used) AS gas, count(*) AS n
      FROM chain_blocks GROUP BY miner""").collect()
    assert(rollup.map(_.getAs[Long]("n")).sum === 50L)
    val transfers = spark.sql("""
      SELECT l.address, count(*) AS n
      FROM chain_logs l
      WHERE l.block_number >= 10 AND l.block_number < 30
      GROUP BY l.address""").collect()
    assert(transfers.map(_.getAs[Long]("n")).sum ===
      (10 until 30).map(_ % 3).sum + (10 until 30).count(n => n % 7 == 3 && n % 3 != 0))
  }

  test("round-3 kernels resolve from SQL") {
    Catalog.registerAll(spark, "/root/testdata/sf0.001")
    val r = spark.sql("""
      SELECT size(shingle_hashes('a b c d')) AS n_sh,
             shingle_hashes('a b') AS too_short,
             element_at(minhash_sigs('a b c d'), 1) AS mh0
      FROM (SELECT 1)
    """).head()
    assert(r.getAs[Int]("n_sh") === 2)
    assert(r.isNullAt(1))
    assert(r.getAs[String]("mh0").length === 8)
  }

  test("round-7 vector kernels resolve from SQL") {
    Catalog.registerAll(spark, "/root/testdata/sf0.001")
    val r = spark.sql("""
      SELECT vector_sum_long(v) AS s,
             max(dot_long(v, v)) AS d
      FROM VALUES (array(1L, 2L)), (array(10L, 20L)) AS t(v)
    """).head()
    assert(r.getSeq[Long](0) === Seq(11L, 22L))
    assert(r.getLong(1) === 500L)
    val q = spark.sql(
      "SELECT dot_long(quantize_embedding(array(CAST(0.5 AS FLOAT))), array(2L)) AS p"
    ).head().getLong(0)
    assert(q === 1000L)
  }

  test("winnow_fps resolves from SQL; non-literal w is the contract error") {
    Catalog.registerAll(spark, "/root/testdata/sf0.001")
    // "a b c d": shingles md5("a b c"), md5("b c d"); w=4 clamps to one
    // window -> exactly 1 fingerprint
    val r = spark.sql(
      "SELECT size(winnow_fps('a b c d', 3, 4)) AS n FROM (SELECT 1)").head()
    assert(r.getInt(0) === 1)
    // a column reference is not foldable -> the contract error, not an
    // obscure internal eval failure
    val e = intercept[Exception] {
      spark.sql("SELECT winnow_fps(text, 3, CAST(doc_id AS INT)) FROM documents LIMIT 1").head()
    }
    assert(e.getMessage.contains("winnow_fps w must be an integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("winnow_fps w must be an integer literal")))
  }

  test("covar_sums_long resolves from SQL with the documented buffer layout") {
    Catalog.registerAll(spark, "/root/testdata/sf0.001")
    // two 2-dim vectors: buf = [n, s1, s2, s11, s12, s22]
    val r = spark.sql("""
      SELECT covar_sums_long(v) AS buf
      FROM VALUES (array(1L, 2L)), (array(3L, -1L)) AS t(v)
    """).head()
    assert(r.getSeq[Long](0) === Seq(2L, 4L, 1L, 10L, -1L, 5L))
  }

  test("round-9 positioned-shingle kernel resolves from SQL; non-literal k is the contract error") {
    Catalog.registerAll(spark, "/root/testdata/sf0.001")
    val r = spark.sql("""
      SELECT size(shingle_pos_hashes('a b a b', 2)) AS n,
             element_at(shingle_pos_hashes('a b a b', 2), 1) ==
             element_at(shingle_pos_hashes('a b a b', 2), 3) AS rep
      FROM (SELECT 1)
    """).head()
    assert(r.getAs[Int]("n") === 3)
    assert(r.getAs[Boolean]("rep"))
    assert(spark.sql("SELECT strip_positions('a b c d', array(2, 3)) AS s")
      .head().getString(0) === "a d")
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_pos_hashes('a b', n) FROM VALUES (2) AS t(n)").collect()
    }
    // the contract message, not an internal Cannot-evaluate error
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("integer literal")), msgs(e).mkString(" | "))
  }

  test("round-2 scalar functions resolve from SQL") {
    Catalog.registerAll(spark, "/root/testdata/sf0.001")
    val r = spark.sql("""
      SELECT digits_int('a1b2c3') AS d,
             hex_to_dec('ff') AS hd,
             hex_sub(lpad('f', 64, '0'), lpad('1', 64, '0')) AS hs,
             uint256_sum(lpad('2', 64, '0')) AS us
      FROM (SELECT 1)
      GROUP BY 1, 2, 3
    """).head()
    assert(r.getAs[Int]("d") === 123)
    assert(r.getAs[String]("hd") === "255")
    assert(BigInt(r.getAs[String]("hs"), 16) === BigInt(14))
    assert(BigInt(r.getAs[String]("us"), 16) === BigInt(2))
  }
}
