package graft.ops

import org.apache.spark.sql.DataFrame

/** Stage an iterative op's round-carrier relation: eager local
  * checkpoint, PLUS a guard against Catalyst's size-estimate snowball.
  *
  * `localCheckpoint` truncates LINEAGE but not STATS: the resulting
  * leaf inherits the origin plan's `sizeInBytes`, and a join's
  * estimate is the PRODUCT of its children's. An iterative op that
  * checkpoints each round therefore compounds the estimate
  * geometrically (bits multiply by the number of multiplicative plan
  * sites per round), and an op that RECURSES over checkpointed
  * outputs — multi-level Louvain's contract→move→stage loop — grows
  * it double-exponentially: by level 5 on a 3k-edge graph the driver
  * was grinding MILLION-digit BigInteger products inside
  * SizeInBytesOnlyStatsPlanVisitor, minutes of CPU to plan a
  * 2000-row join (observed; the execution itself takes seconds).
  *
  * The cut: when the inherited estimate no longer fits a Long, the
  * checkpointed rows are re-wrapped as a fresh leaf whose default
  * estimate is `defaultSizeInBytes`. Past 2^63 every planner
  * decision (broadcast threshold, join selection) is identical for
  * any value, so the re-wrap changes NOTHING about the chosen plan —
  * it only stops the numbers from growing. Below 2^63 the inherited
  * estimate is kept verbatim: genuinely small relations stay
  * broadcast-eligible and pay zero conversion.
  */
private[graft] object Staging {

  /** Eager local checkpoint with the size-estimate growth cut. */
  def fresh(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    if (ck.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength <= 62) ck
    else ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** Staged relation PLUS its row count, in ONE driver job (guide
    * §2.6): the local checkpoint is taken lazily and the count() action
    * materializes the blocks — so an iterative loop that needs its
    * round-carrier staged AND a convergence/emptiness signal pays one
    * job per round, not two (eager-checkpoint job + isEmpty/count probe
    * job — at sf0.1 the iterative graph queries are launch-bound, and
    * per round the probe job was pure scheduling overhead). Identical
    * blocks, identical lineage truncation, same stats-snowball cut as
    * [[fresh]]. */
  def freshCounted(df: DataFrame): (DataFrame, Long) = {
    val ck = df.localCheckpoint(false)
    val n = ck.count()
    val out =
      if (ck.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength <= 62) ck
      else ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
    (out, n)
  }
}
