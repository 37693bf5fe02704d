package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Sink-side infrastructure mirrored from the reference:
  *
  *  - K10 rate limiter (`dynamodb.py:554-616`): token-bucket per second,
  *    applied per partition in `foreachPartition` — N partitions × limit
  *    = the reference's table-level ceiling split across writers.
  *  - K9 parallel batch writer (`dynamodb.py:500-530`): batched iteration
  *    per partition (25-item batches like the DynamoDB limit).
  *  - S9 config/data_version read-and-increment
  *    (`nft/bin/shared.py:153-184`): driver-side scalar on a config
  *    table.
  *  - A5 stats counters (`core/stats.py:13-146`): Spark accumulators —
  *    executor-safe named counters, readable on the driver.
  */
object SinkUtils {

  /** Simple token bucket: `permitsPerSecond` tokens refilled each
    * wall-clock second, `acquire()` blocks across the boundary — the
    * reference's spin-wait (`dynamodb.py:592-616`) without the spin. */
  final class RateLimiter(permitsPerSecond: Long) extends Serializable {
    private var windowStart = 0L
    private var used = 0L
    def acquire(n: Long = 1): Unit = synchronized {
      val now = System.nanoTime()
      if (now - windowStart >= 1000000000L) { windowStart = now; used = 0L }
      if (used + n > permitsPerSecond) {
        val sleepNs = 1000000000L - (now - windowStart)
        if (sleepNs > 0) Thread.sleep(sleepNs / 1000000, (sleepNs % 1000000).toInt)
        windowStart = System.nanoTime(); used = 0L
      }
      used += n
    }
  }

  /** Rate-limited, batched foreachPartition sink. `write` receives one
    * batch of rows; the per-partition limiter bounds batches/sec so the
    * aggregate across `df.rdd.getNumPartitions` partitions respects an
    * external store's ceiling. */
  def rateLimitedForeach(df: DataFrame, batchSize: Int, batchesPerSecondPerPartition: Long)
                        (write: Seq[Row] => Unit): Unit =
    df.foreachPartition { (it: Iterator[Row]) =>
      val limiter = new RateLimiter(batchesPerSecondPerPartition)
      it.grouped(batchSize).foreach { batch =>
        limiter.acquire()
        write(batch)
      }
    }

  /** Shared config-table primitive: REPLACE the blockchain's row with
    * the new value, keeping every other blockchain's row — a plain
    * config put, not an LWW merge (a config write must be able to move
    * a value DOWN: re-seeding the crawl bookmark to an earlier block is
    * a legitimate operation, not a stale write). Staged through a .tmp
    * table because overwrite-in-place would read and clobber the same
    * path in one job. */
  private def putConfig(spark: SparkSession, configPath: String, blockchain: String,
      updated: org.apache.spark.sql.DataFrame): Unit = {
    // existence is checked explicitly, NOT via a blanket
    // AnalysisException catch: a schema mismatch (wrong configPath —
    // e.g. the bookmark write pointed at the data_version table) must
    // fail loudly, not silently replace the whole table with one row
    val merged =
      if (pathExists(spark, configPath)) // plain-overwrite target: see tableExists safety bound
        spark.read.parquet(configPath)
          .filter(col("blockchain") =!= blockchain)
          .unionByName(updated)
      else updated
    // Unique staging suffix per write: a fixed ".tmp" path would let two
    // concurrent puts (seed bookmark + data_version bump, or two jobs)
    // clobber each other's staged output mid-copy. The config table
    // itself still assumes a single writer per put (last overwrite wins,
    // same as the reference's conditional-write granularity) — the
    // unique suffix only removes the staging-path collision.
    val tmp = configPath + ".tmp-" + java.util.UUID.randomUUID().toString
    try {
      merged.write.mode("overwrite").parquet(tmp)
      spark.read.parquet(tmp).write.mode("overwrite").parquet(configPath)
    } finally {
      val p = new org.apache.hadoop.fs.Path(tmp)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  private def readConfig[T](spark: SparkSession, configPath: String, blockchain: String,
      column: String)(get: org.apache.spark.sql.Row => T): Option[T] = {
    // Probe absence explicitly — a blanket AnalysisException catch would
    // also swallow a schema mismatch (wrong configPath, missing column)
    // and report "not created yet" where putConfig fails loudly. PLAIN
    // existence, not tableExists: config tables are plain-overwrite, so
    // a bare directory may be a crash-gutted real table — reading it
    // must fail loudly, never silently reset version/bookmark to zero.
    if (!SinkUtils.pathExists(spark, configPath)) None
    else {
      val row = spark.read.parquet(configPath)
        .filter(col("blockchain") === blockchain)
        .select(max(col(column))).head()
      if (row.isNullAt(0)) None else Some(get(row))
    }
  }

  /** True iff `path` exists AND holds at least one non-hidden entry.
    * The distinction matters for every "first write or existing
    * table?" decision: a bare directory left by a CRASHED first write
    * (only `_temporary`/`_SUCCESS` inside) must classify as "not
    * created yet" so the replay self-heals, while an unreadable REAL
    * table still fails loudly (never a blanket AnalysisException catch,
    * which would also swallow schema errors as absence).
    *
    * SAFETY BOUND: bare-equals-absent is only sound for targets written
    * with DYNAMIC partition overwrite (the view/LWW sinks) — that mode
    * never deletes the directory, so bare really does mean first write.
    * A plain `mode("overwrite")` target (config tables, compact) is
    * deleted before its job commits, so a bare directory there could be
    * a crash-GUTTED real table; those callers must use a plain
    * existence probe and let the read fail loudly instead. */
  def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Spark's own data-file rule: "_"-prefixed names are metadata
    // UNLESS they contain "=" — partition directories like __bucket=7
    // are data. A plain underscore filter would classify every
    // bucket-partitioned table as absent.
    fs.exists(p) && fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      !n.startsWith(".") && !(n.startsWith("_") && !n.contains("="))
    }
  }

  /** Plain existence probe for PLAIN-overwrite targets; see the safety
    * bound on [[tableExists]]. */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** S9: read the per-blockchain data_version from a config table;
    * `increment` returns the bumped version after persisting it back. */
  def readDataVersion(spark: SparkSession, configPath: String, blockchain: String): Int =
    readConfig(spark, configPath, blockchain, "data_version")(_.getInt(0)).getOrElse(0)

  def incrementDataVersion(spark: SparkSession, configPath: String, blockchain: String): Int = {
    import spark.implicits._
    val next = readDataVersion(spark, configPath, blockchain) + 1
    putConfig(spark, configPath, blockchain,
      Seq((blockchain, next)).toDF("blockchain", "data_version"))
    next
  }

  /** The `seed` command (`nft/bin/seed.py:17`): record the crawl
    * bookmark — the last block id a crawl covered — so a later `tail`
    * starts where the crawl ended (`tail.py`'s starting-block lookup).
    * Streams ALSO checkpoint their own offsets; this marker is the
    * cross-JOB bookmark the reference keeps in its config store.
    * `configPath` is this marker's own table (one parquet per config
    * key, like the data_version table). A PUT, not a merge: re-seeding
    * to an earlier block (to re-cover a range) must take effect. */
  def writeLastBlock(spark: SparkSession, configPath: String, blockchain: String,
      lastBlock: Long): Unit = {
    import spark.implicits._
    putConfig(spark, configPath, blockchain,
      Seq((blockchain, lastBlock)).toDF("blockchain", "last_block_id"))
  }

  def readLastBlock(spark: SparkSession, configPath: String, blockchain: String): Option[Long] =
    readConfig(spark, configPath, blockchain, "last_block_id")(_.getLong(0))

  /** A5: named executor-safe counters (the reference's StatsService).
    * Accumulators MUST be registered on the driver: on a deserialized
    * copy inside an executor closure, `spark.sparkContext` is
    * `@transient`-null, and even a locally-created accumulator would
    * never report back. Registering lazily from a task would therefore
    * lose counts silently or NPE — so first-use off-driver fails loudly
    * with the fix spelled out. Pattern: `val c = stats.counter("rows")`
    * on the driver, capture `c` in the closure, `c.add(1)` in tasks. */
  final class Stats(spark: SparkSession) extends Serializable {
    private val counters = scala.collection.concurrent.TrieMap.empty[String, LongAccumulator]
    def counter(name: String): LongAccumulator =
      counters.getOrElse(name, {
        if (org.apache.spark.TaskContext.get() != null)
          throw new IllegalStateException(
            s"Stats.counter($name) first used inside a task: register it on the driver " +
              "and capture the LongAccumulator in the closure")
        counters.getOrElseUpdate(name, spark.sparkContext.longAccumulator(s"graft.$name"))
      })
    def snapshot(): Map[String, Long] =
      counters.map { case (k, a) => k -> a.value.longValue }.toMap
  }

  /** A5's interval report (the reference's `StatsWriter.write_at_interval`,
    * `core/stats.py:105-146`): one formatted line per interval with the
    * running total and the per-interval delta of every counter, emitted
    * from a driver-side daemon thread (accumulator values only exist on
    * the driver). `writeLine()` is callable directly for a final flush
    * or from tests; `stop()` flushes once more. */
  final class StatsReporter(stats: Stats, intervalSeconds: Long = 60,
                            emit: String => Unit = s => System.err.println(s)) {
    private val last = scala.collection.mutable.Map.empty[String, Long]
    def line(): String = synchronized {
      val parts = stats.snapshot().toSeq.sortBy(_._1).map { case (k, v) =>
        val d = v - last.getOrElse(k, 0L)
        last(k) = v
        s"$k=$v(+$d)"
      }
      s"graft stats: ${parts.mkString(" ")}"
    }
    def writeLine(): Unit = emit(line())
    @volatile private var running = false
    private var thread: Thread = null
    def start(): this.type = synchronized {
      running = true
      thread = new Thread(() => {
        try while (running) { Thread.sleep(intervalSeconds * 1000); if (running) writeLine() }
        catch { case _: InterruptedException => () }
      }, "graft-stats-reporter")
      thread.setDaemon(true)
      thread.start()
      this
    }
    def stop(): Unit = synchronized {
      running = false
      if (thread != null) thread.interrupt()
      writeLine()
    }
  }
}
