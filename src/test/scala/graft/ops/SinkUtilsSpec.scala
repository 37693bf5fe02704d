package graft.ops

import java.nio.file.Files

import graft.SparkSpec

class SinkUtilsSpec extends SparkSpec {
  import spark.implicits._

  test("rate-limited batched sink delivers every row in batches") {
    val df = spark.range(0, 100).toDF("id")
    val seen = spark.sparkContext.collectionAccumulator[Long]("seen")
    SinkUtils.rateLimitedForeach(df, batchSize = 25, batchesPerSecondPerPartition = 1000) { batch =>
      assert(batch.size <= 25)
      batch.foreach(r => seen.add(r.getLong(0)))
    }
    assert(seen.value.size === 100)
  }

  test("rate limiter bounds throughput") {
    val rl = new SinkUtils.RateLimiter(2)
    val t0 = System.nanoTime()
    (1 to 5).foreach(_ => rl.acquire()) // 5 permits at 2/s -> >= ~1.5s wall
    assert((System.nanoTime() - t0) / 1e9 >= 1.0)
  }

  test("data_version read + increment round-trips (S9)") {
    val cfg = Files.createTempDirectory("cfg").toString + "/config"
    assert(SinkUtils.incrementDataVersion(spark, cfg, "ethereum") === 1)
    assert(SinkUtils.incrementDataVersion(spark, cfg, "ethereum") === 2)
    assert(SinkUtils.readDataVersion(spark, cfg, "ethereum") === 2)
    assert(SinkUtils.readDataVersion(spark, cfg, "polygon") === 0)
  }

  test("seed bookmark: last-block marker round-trips and LWW-advances") {
    val cfg = Files.createTempDirectory("cfg_seed").toString + "/last_block"
    assert(SinkUtils.readLastBlock(spark, cfg, "ethereum") === None)
    SinkUtils.writeLastBlock(spark, cfg, "ethereum", 17000000L)
    assert(SinkUtils.readLastBlock(spark, cfg, "ethereum") === Some(17000000L))
    SinkUtils.writeLastBlock(spark, cfg, "ethereum", 17000500L)
    SinkUtils.writeLastBlock(spark, cfg, "polygon", 99L)
    assert(SinkUtils.readLastBlock(spark, cfg, "ethereum") === Some(17000500L))
    assert(SinkUtils.readLastBlock(spark, cfg, "polygon") === Some(99L))
    // a seed is a PUT: re-seeding to an EARLIER block (to re-cover a
    // range) must take effect, and must not disturb other blockchains
    SinkUtils.writeLastBlock(spark, cfg, "ethereum", 16999000L)
    assert(SinkUtils.readLastBlock(spark, cfg, "ethereum") === Some(16999000L))
    assert(SinkUtils.readLastBlock(spark, cfg, "polygon") === Some(99L))
  }

  test("stats counters aggregate across executors (A5)") {
    val stats = new SinkUtils.Stats(spark)
    val c = stats.counter("rows")
    spark.range(0, 1000).toDF("id").foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      it.foreach(_ => c.add(1))
    }
    assert(stats.snapshot()("rows") === 1000L)
  }

  test("stats reporter emits interval lines with totals and deltas (A5)") {
    val stats = new SinkUtils.Stats(spark)
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val rep = new SinkUtils.StatsReporter(stats, emit = lines += _)
    stats.counter("blocks").add(10)
    rep.writeLine()
    stats.counter("blocks").add(5)
    stats.counter("errors").add(1)
    rep.writeLine()
    assert(lines(0) === "graft stats: blocks=10(+10)")
    assert(lines(1) === "graft stats: blocks=15(+5) errors=1(+1)")
    // the daemon thread flavor: starts, flushes on stop, dies with the JVM
    val n0 = lines.size
    rep.start().stop()
    assert(lines.size === n0 + 1)
  }
}
