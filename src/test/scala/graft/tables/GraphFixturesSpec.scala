package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fixture-sharing contract: one build per (session, dir), the
  * SAME staged instance back on every call (consumers share the RDD,
  * not just the derivation), distinct dirs distinct entries, and the
  * derived relations agree with their definitions. Value correctness
  * is the consumers' DuckDB oracles; this pins only the memo. */
class GraphFixturesSpec extends SparkSpec {

  private val dirA = "/root/testdata/sf0.001"

  test("repeated calls return the same staged instance per (session, dir)") {
    val a1 = GraphFixtures.supCounts(spark, dirA)
    val a2 = GraphFixtures.supCounts(spark, dirA)
    assert(a1 eq a2, "memo must hand back the same DataFrame instance")
    val s1 = GraphFixtures.strongPairs(spark, dirA)
    val s2 = GraphFixtures.strongPairs(spark, dirA)
    assert(s1 eq s2)
    assert(!(s1 eq a1.asInstanceOf[AnyRef]), "distinct keys stay distinct")
  }

  test("strongPairs == supCounts filtered at tsup >= 2, and csup <= tsup everywhere") {
    val sup = GraphFixtures.supCounts(spark, dirA)
    val strong = GraphFixtures.strongPairs(spark, dirA)
    assert(strong.count() ===
      sup.filter(col("tsup") >= 2).count(), "strong projection drifted")
    assert(sup.filter(col("csup") > col("tsup")).isEmpty,
      "corpus support exceeded total support")
    assert(strong.join(sup.filter(col("tsup") >= 2).select(col("a"), col("b")),
      Seq("a", "b"), "left_anti").isEmpty, "strong pair not in the filtered stats")
  }
}
