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

  test("at-rest tier: materialize + configured root is READ, not rebuilt, value-identical") {
    val inlineSup = GraphFixtures.supCounts(spark, dirA)
      .collect().map(_.toSeq).toSet
    val inlineCorpus = ErFixtures.resolvedCorpus(spark, dirA)
      .select(col("record_id"), col("entity_id")).collect().map(_.toSeq).toSet
    val root = java.nio.file.Files.createTempDirectory("gfx_rest").toString
    GraphFixtures.materialize(spark, dirA, root)
    ErFixtures.materialize(spark, dirA, root)
    assert(FixtureStore.readMarker(spark, root) === Some(dirA), "source marker missing")
    FixtureStore.release(spark) // cold memo, so the getter consults the root
    spark.conf.set("graft.fixtures.dir", root)
    try {
      val atRest = GraphFixtures.supCounts(spark, dirA)
      assert(atRest.inputFiles.nonEmpty &&
        atRest.inputFiles.forall(_.contains(root)),
        s"at-rest getter did not scan $root: ${atRest.inputFiles.take(2).mkString(",")}")
      assert(atRest.collect().map(_.toSeq).toSet === inlineSup,
        "at-rest relation diverged from the inline build")
      val corpusAtRest = ErFixtures.resolvedCorpus(spark, dirA)
      assert(corpusAtRest.inputFiles.forall(_.contains(root)),
        "ER corpus not read from the at-rest root")
      assert(corpusAtRest.select(col("record_id"), col("entity_id"))
        .collect().map(_.toSeq).toSet === inlineCorpus,
        "at-rest ER corpus diverged from the inline resolve")

      // marker mismatch (fixtures prepared for ANOTHER dir): loud
      // fallback to the inline build — wrong-dir fixtures are never
      // served, and the relation still computes correctly
      val other = "/root/testdata/sf0.01"
      val fallback = GraphFixtures.strongPairs(spark, other)
      assert(fallback.inputFiles.forall(!_.contains(root)),
        "mismatched-marker root was served for the wrong dir")
    } finally {
      spark.conf.unset("graft.fixtures.dir")
      FixtureStore.release(spark) // drop at-rest entries so later suites rebuild inline
    }
  }

  test("re-prepare with fixtures.dir pointing AT the prepare target re-derives, not re-persists") {
    // The r15 hazard: with graft.fixtures.dir == outRoot (the natural
    // production setup), materialize's getters served the existing
    // at-rest parquet and write() then replaced the very path being
    // read — Spark aborts ("Cannot overwrite a path that is also being
    // read from"), and a refreshed dataset at an unchanged dir string
    // silently re-persisted stale fixtures. Now the prepare builds
    // inline (at-rest tier bypassed + memo released) and swaps each
    // key via tmp+rename, so a re-prepare at the same root both
    // succeeds and re-derives from the source tables.
    val root = java.nio.file.Files.createTempDirectory("gfx_reprep").toString
    GraphFixtures.materialize(spark, dirA, root)
    spark.conf.set("graft.fixtures.dir", root)
    try {
      // force an at-rest-backed memo entry into the session first —
      // the exact state the old code corrupted from
      val served = GraphFixtures.supCounts(spark, dirA)
      assert(served.inputFiles.forall(_.contains(root)), "precondition: at-rest serve")
      val servedCount = served.count() // before the swap replaces its files
      GraphFixtures.materialize(spark, dirA, root) // must not throw
      FixtureStore.release(spark)
      val again = GraphFixtures.supCounts(spark, dirA)
      assert(again.inputFiles.nonEmpty && again.inputFiles.forall(_.contains(root)))
      assert(again.count() === servedCount, "re-prepared fixture diverged")
    } finally {
      spark.conf.unset("graft.fixtures.dir")
      FixtureStore.release(spark)
    }
  }
}
