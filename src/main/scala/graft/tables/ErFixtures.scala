package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The entity-resolution fixture relations over the customer table —
  * the [[GraphFixtures]] convention applied to the ER suite: the
  * resolved entity tables are standing tables at rest in production
  * (an er-resolve job rebuilds them per corpus snapshot; queries and
  * incremental placement read them), so within a session they are
  * built once and shared, and [[materialize]] persists them for the
  * read-only regime. Semantics unchanged — each getter is exactly the
  * relation j12/j13 built inline before, so the oracle hashes are
  * identical. Two tiers via [[FixtureStore]]; rule constants (k = 1,
  * tau = 0.9) are the j12/j13 fixture rule. */
object ErFixtures {

  /** Full-customer resolve — j12's entity table
    * (record_id, entity_id, n_members), staged. */
  def resolvedAll(spark: SparkSession, dir: String): DataFrame =
    FixtureStore.memo(spark, dir, "er_resolved_all") {
      graft.ops.EntityResolution.resolve(
        Tables.customer(spark, dir), col("c_custkey"), col("c_name"),
        k = 1, tau = 0.9)
        .localCheckpoint(true)
    }

  /** Resolved 80%-corpus entity table WITH names — j13's standing
    * corpus (assignBatch consumes it three times: variant-index build,
    * trigram verify side, pre-coarsened entity links). Staged eagerly
    * for exactly that reason (the partCoEdges discipline). */
  def resolvedCorpus(spark: SparkSession, dir: String): DataFrame =
    FixtureStore.memo(spark, dir, "er_resolved_corpus") {
      val c = Tables.customer(spark, dir)
      val corpusRecs = c.filter(col("c_custkey") % 10 < 8)
      graft.ops.EntityResolution.resolve(
          corpusRecs, col("c_custkey"), col("c_name"), k = 1, tau = 0.9)
        .join(corpusRecs.select(col("c_custkey").as("record_id"), col("c_name")),
          Seq("record_id"))
        .localCheckpoint(true)
    }

  /** Persist both resolved tables (plus the source marker) under
    * `outRoot` — the er-resolve prepare job. Builds inline with the
    * memo released and the at-rest tier bypassed, via staged swap
    * writes — see [[GraphFixtures.materialize]] for why (re-prepare at
    * an unchanged dir string must re-derive, never re-persist the
    * stale at-rest relations it is replacing). */
  def materialize(spark: SparkSession, dir: String, outRoot: String): Unit =
    FixtureStore.buildingInline {
      FixtureStore.release(spark)
      FixtureStore.writeMarker(spark, outRoot, dir)
      FixtureStore.write(resolvedAll(spark, dir), outRoot, "er_resolved_all")
      FixtureStore.write(resolvedCorpus(spark, dir), outRoot, "er_resolved_corpus")
    }
}
