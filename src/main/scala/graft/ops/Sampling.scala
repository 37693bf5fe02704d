package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for a training-data pipeline.
  *
  * Everything here is keyed on a key HASH, never on `rand()`: the
  * sample is stable under re-runs, task retries, backfills and engine
  * changes, so downstream artifacts (shards, eval splits) are
  * reproducible. Pure map-side filters — zero shuffle, scales linearly
  * with splits at any corpus size.
  */
object Sampling {

  /** A uniform bucket in [0, 256): the first two hex digits of
    * md5(key-as-string). `conv` on 2 hex chars is ANSI-safe (fits a
    * long); a DuckDB oracle mirrors it with `position(... IN
    * '0123456789abcdef')` digit arithmetic — same value, so membership
    * is auditable from any engine. */
  def hashBucket256(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 2), 16, 10).cast("long")

  /** Deterministic stratified downsample: keep a row iff its hash
    * bucket falls under its stratum's keep-rate (numerator out of 256 —
    * exact bucket membership, no modulo bias). `rates` maps stratum
    * value -> numerator; unlisted strata use `default`. The common use:
    * downweight an over-represented language/source while keeping all
    * of a rare one. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Int], default: Int): DataFrame = {
    val rate = rates.foldLeft(lit(default)) { case (acc, (k, v)) =>
      when(stratum === lit(k), lit(v)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket256(key)).filter(col("bucket") < rate)
  }

  /** Deterministic mixture quota: keep exactly `quota` rows per stratum
    * (fewer if the stratum is smaller), chosen as the quota smallest
    * md5-of-key values — a uniform, rerun-stable draw. The rank filter
    * stays <= 1000 so it plans as WindowGroupLimit: at most `quota`
    * rows per stratum per input partition ever reach the shuffle. The
    * common use: a balanced cross-source eval slice from a skewed
    * corpus. */
  def mixtureQuota(df: DataFrame, key: Column, stratum: Column, quota: Int): DataFrame = {
    require(quota <= 1000, "rank filters above windowGroupLimitThreshold lose the partial top-k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(md5(key.cast("string")).asc, key.asc)
    df.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= quota)
  }

  /** Deterministic train/val/test assignment: the md5 bucket of the key
    * partitions [0, 256) into contiguous ranges sized by the requested
    * out-of-256 rates (train gets the remainder). Pure map-side — a
    * document's split is a function of its id alone, so it never moves
    * between splits across re-runs, retries, or corpus growth, which is
    * the property an eval split must have to stay uncontaminated. */
  def split(df: DataFrame, key: Column, valRate: Int = 13, testRate: Int = 13): DataFrame = {
    require(valRate >= 0 && testRate >= 0 && valRate + testRate < 256,
      "rates are out-of-256 bucket counts and must leave room for train")
    val b = hashBucket256(key)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(b < valRate, lit("val"))
          .when(b < valRate + testRate, lit("test"))
          .otherwise(lit("train")))
  }

  /** A uniform value in [0, 2^32): the first 8 hex digits of
    * md5(key-as-string). The shard hash — 256 buckets would leave
    * shards beyond 256 permanently empty and skew any non-divisor
    * count; 2^32 keeps mod-`numShards` uniform for any practical shard
    * count. Mirrored digit-by-digit in the DuckDB oracle like
    * [[hashBucket256]]. */
  def hashBucket32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Deterministic global shuffle + shard assignment — the data-ordering
    * step of a training run. A doc's shard is its 32-bit md5 bucket mod
    * `numShards` (map-side, rerun-stable) and its position WITHIN the
    * shard is the rank of md5(salt || key) — so the within-shard order
    * is a reproducible pseudo-random permutation, re-dealable with a new
    * `salt` for each epoch without touching the data. No global sort
    * anywhere: the only shuffle is the hash exchange on shard, and the
    * per-shard ordering sorts shard-local rows.
    *
    * Scale contract: the dense per-shard `pos` requires each shard to
    * pass through ONE window task, so `numShards` IS the
    * write-parallelism/task-size knob — size it so corpus/numShards fits
    * a task (the same sizing exercise as choosing shard-file counts).
    * For corpora where even that is unwanted, drop the dense index and
    * order by the salted md5 key directly: same permutation, no
    * row_number, no per-shard funnel. */
  def shuffleShards(df: DataFrame, key: Column, numShards: Int, salt: String = "e0"): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(md5(concat(lit(salt), key.cast("string"))).asc, key.asc)
    df.withColumn("shard", pmod(hashBucket32(key), lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Token-budget selection: walk each stratum's documents in
    * deterministic md5(key) order (a uniform, rerun-stable permutation)
    * and keep rows while the running token total stays within `budget`
    * — the "fill each mixture cell up to its token quota" step of a
    * training-data mixture, stable under retries and backfills because
    * nothing depends on arrival order.
    *
    * The rule is strict (`cum <= budget`): the document that would
    * overshoot is dropped, as are all after it in hash order.
    *
    * Scale: one shuffle on the stratum key for the window cumsum; each
    * cell is a single window partition, so a corpus whose cells are
    * huge wants a coarse pre-filter (budget / min-doc-tokens rank cap
    * via the same hash order) before the exact cumsum — documented
    * knob, not needed below ~10^8 docs per cell. */
  def tokenBudget(df: DataFrame, key: Column, stratum: Seq[Column],
      nTokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum: _*)
      .orderBy(md5(key.cast("string")).asc, key.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis &
    * Spirakis 2006, A-Res): keep the k rows per stratum with the
    * largest priority u^(1/w) — inclusion probability proportional to
    * `weight`, no replacement, one pass. The uniform u is
    * (md5₅₂(salt‖key)+1)/2⁵², so the draw is rerun-stable and
    * re-dealable by salt (the shuffleShards convention); the priority
    * compares as ln(u)/w (same order, no pow underflow at large w).
    *
    * DETERMINISM BOUNDARY, stated loudly: selection is a function of
    * (key, weight, salt) only — partitioning-invariant and
    * rerun-stable, proven by exact differential in WeightedSampleSpec
    * — but ln() is engine-libm-specific in its last ulp, so unlike
    * the integer-bucket samplers above this op's selection cannot
    * face a CROSS-ENGINE hash oracle (a 1-ulp flip at the k-th
    * boundary is astronomically unlikely, not impossible). The
    * sample_weighted query is rows-only for that reason, shadowed by
    * the spec's JVM differential — the compress-ratio convention.
    *
    * Scale: priorities are map-side expressions; the rank filter stays
    * ≤ 1000 so it plans as WindowGroupLimit — at most k rows per
    * stratum per input partition reach the shuffle (the mixtureQuota
    * shape). Rows with weight ≤ 0 or NULL are dropped (a non-positive
    * weight has no E-S priority), stated behavior. */
  def weightedTopK(df: DataFrame, key: Column, weight: Column,
      stratum: Column, k: Int, salt: String = "w0"): DataFrame = {
    require(k >= 1 && k <= 1000,
      "rank filters above windowGroupLimitThreshold lose the partial top-k")
    val u = (conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 13),
      16, 10).cast("long") + 1L).cast("double") / lit(4503599627370496.0) // 2^52
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(col("es_pri").desc, key.asc)
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("es_pri", log(u) / weight.cast("double"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .drop("es_pri", "rn")
  }

  /** Temperature (α = 0.5) mixture rebalancing: downsample each stratum
    * with keep-rate sqrt(n_min / n_s) — large sources shrink toward the
    * smallest one (which keeps 100%) without the hard cap of a quota.
    * This is the standard "temperature sampling" mixture reweight with
    * the exponent fixed at 1/2 so the whole computation stays IEEE-bit-
    * exact across engines (division and sqrt of exact integers — no
    * pow/ln, whose last-ulp rounding differs between libms).
    *
    * Rows with a NULL stratum are DROPPED (a mixture weight for an
    * unknown source is undefined) and excluded from the counts, so a
    * null group can never set n_min and shrink every real stratum.
    *
    * Scale: one tiny groupBy builds the per-stratum counts; the rates
    * broadcast back onto the corpus and the keep decision is the usual
    * deterministic md5-bucket test — map-side, rerun-stable, no second
    * shuffle of the data. */
  def temperature(df: DataFrame, key: Column, stratum: Column): DataFrame = {
    val counts = df.filter(stratum.isNotNull)
      .groupBy(stratum.as("s")).agg(count(lit(1)).as("n_s"))
    // n_min via an unpartitioned window over the (tiny, stratum-
    // cardinality) counts relation: ONE reference to the aggregate, so
    // the corpus is provably aggregated once — the previous
    // crossJoin(counts.agg(min)) shape referenced `counts` in two plan
    // subtrees and relied on exchange reuse to avoid a second full
    // corpus aggregation.
    val withMin = counts
      .withColumn("n_min",
        min(col("n_s")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("s"), (sqrt(col("n_min").cast("double") / col("n_s").cast("double")) * 256.0)
        .as("rate256"))
    df.join(broadcast(withMin), stratum === col("s"))
      .withColumn("bucket", hashBucket256(key))
      .filter(col("bucket").cast("double") < col("rate256"))
      .drop("s", "rate256")
  }
}
