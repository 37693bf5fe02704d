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
}
