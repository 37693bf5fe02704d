package graft.streaming

import graft.SparkSpec
import graft.ops.Lww
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** VERDICT r6 #6: the physical-upsert seam. A row-level MERGE format
  * must be able to replace bucket-granular overwrite WITHOUT touching
  * callers, and the default format's bucket-sizing contract must hold
  * under a skewed key distribution. */
class MergeSinkSeamSpec extends SparkSpec {
  import spark.implicits._

  /** Stand-in for a MERGE-capable table format (Delta/Iceberg `MERGE
    * INTO`): whole-table read-merge-write with row-level semantics.
    * Deliberately the dumbest correct implementation — the point is the
    * CONTRACT, not the performance. */
  private final class WholesaleMergeFormat extends Tail.LwwMergeFormat {
    override def upsert(target: String, winners: DataFrame, keys: Seq[String],
                        versionCols: Seq[String]): Unit = {
      val spark = winners.sparkSession
      val merged =
        try Lww.upsert(spark.read.parquet(target), winners, keys, versionCols)
        catch { case _: org.apache.spark.sql.AnalysisException => winners }
      merged.localCheckpoint(true).write.mode("overwrite").parquet(target)
    }
  }

  private def epoch(rows: Seq[(String, String, String)]): DataFrame =
    rows.toDF("key", "payload", "version")

  test("a row-level MERGE format swaps in behind the seam; both formats converge identically") {
    val epochs = Seq(
      epoch(Seq(("k1", "a", "01"), ("k2", "b", "01"), ("k1", "a2", "03"))), // intra-batch dup
      epoch(Seq(("k2", "c", "02"), ("k3", "d", "01"))),
      epoch(Seq(("k2", "c", "02"), ("k3", "d", "01"))), // replay of epoch 2
      epoch(Seq(("k1", "STALE", "02"), ("k4", "e", "01")))) // stale version loses

    val viaBuckets = java.nio.file.Files.createTempDirectory("seam_b").toString + "/t"
    val viaMerge = java.nio.file.Files.createTempDirectory("seam_m").toString + "/t"
    epochs.zipWithIndex.foreach { case (b, i) =>
      // the caller's code is IDENTICAL but for the format argument
      Tail.mergeSink(viaBuckets, Seq("key"), Seq("version"),
        new Tail.BucketOverwriteFormat(4))(b, i.toLong)
      Tail.mergeSink(viaMerge, Seq("key"), Seq("version"),
        new WholesaleMergeFormat)(b, i.toLong)
    }
    def state(path: String) = spark.read.parquet(path)
      .select("key", "payload", "version").collect().map(_.toString).sorted.toSeq
    assert(state(viaBuckets) === state(viaMerge))
    // and the converged state is the argmax-by-version per key
    assert(state(viaBuckets) === Seq(
      "[k1,a2,03]", "[k2,c,02]", "[k3,d,01]", "[k4,e,01]"))
  }

  test("log-append format: read-time resolution converges with overwrite; compact folds the log") {
    val epochs = Seq(
      epoch(Seq(("k1", "a", "01"), ("k2", "b", "01"), ("k1", "a2", "03"))),
      epoch(Seq(("k2", "c", "02"), ("k3", "d", "01"))),
      epoch(Seq(("k2", "c", "02"), ("k3", "d", "01"))), // replayed epoch
      epoch(Seq(("k1", "STALE", "02"), ("k4", "e", "01"))))
    val fmt = new Tail.LogAppendFormat(4)
    val target = java.nio.file.Files.createTempDirectory("seam_log").toString + "/t"
    epochs.zipWithIndex.foreach { case (b, i) =>
      Tail.mergeSink(target, Seq("key"), Seq("version"), fmt)(b, i.toLong)
    }
    def resolved = fmt.read(spark, target, Seq("key"), Seq("version"))
      .select("key", "payload", "version").collect().map(_.toString).sorted.toSeq
    val expect = Seq("[k1,a2,03]", "[k2,c,02]", "[k3,d,01]", "[k4,e,01]")
    assert(resolved === expect)
    // the STORED table is the log: every collapsed epoch appended,
    // including the byte-identical replay (2 + 2 + 2 + 2 rows) — the
    // write path never read or rewrote existing state
    assert(spark.read.parquet(target).count() === 8L)
    // compaction folds to one stored row per key without changing reads
    fmt.compact(spark, target, Seq("key"), Seq("version"))
    assert(spark.read.parquet(target).count() === 4L)
    assert(resolved === expect)
    // the bucket layout survives compaction (reads stay prunable)
    assert(spark.read.parquet(target).columns.contains("__bucket"))
    // and the sink keeps accepting epochs afterwards
    Tail.mergeSink(target, Seq("key"), Seq("version"), fmt)(
      epoch(Seq(("k1", "a3", "04"))), 4L)
    assert(fmt.read(spark, target, Seq("key"), Seq("version"))
      .filter($"key" === "k1").select("payload").head().getString(0) === "a3")
  }

  test("log format time-travel: readAsOf resolves historical state; compaction bounds retention") {
    val fmt = new Tail.LogAppendFormat(4)
    val target = java.nio.file.Files.createTempDirectory("seam_tt").toString + "/t"
    val sink = Tail.mergeSink(target, Seq("key"), Seq("version"), fmt) _
    sink(epoch(Seq(("k1", "v1", "01"), ("k2", "w1", "01"))), 0L)
    sink(epoch(Seq(("k1", "v2", "03"))), 1L)
    sink(epoch(Seq(("k1", "v3", "05"), ("k2", "w2", "04"))), 2L)
    def asOf(bound: String) =
      fmt.readAsOf(spark, target, Seq("key"), Seq("version"), $"version" <= bound)
        .select("key", "payload").collect().map(_.toString).sorted.toSeq
    // as of version 03: k1 at its second write, k2 still at its first
    assert(asOf("03") === Seq("[k1,v2]", "[k2,w1]"))
    assert(asOf("01") === Seq("[k1,v1]", "[k2,w1]"))
    assert(asOf("99") === Seq("[k1,v3]", "[k2,w2]"))
    // compaction keeps only current winners: history before the fold is
    // gone (the documented retention trade), the present is unchanged
    fmt.compact(spark, target, Seq("key"), Seq("version"))
    assert(asOf("99") === Seq("[k1,v3]", "[k2,w2]"))
    assert(asOf("03") === Seq.empty)
  }

  test("auto-compaction folds the log every N epochs without changing reads") {
    val fmt = new Tail.LogAppendFormat(4)
    val target = java.nio.file.Files.createTempDirectory("seam_ac").toString + "/t"
    val sink = Tail.mergeSink(target, Seq("key"), Seq("version"), fmt, compactEvery = 3) _
    // 6 epochs of 2 rows each touching the same 2 keys: uncompacted the
    // log would hold 12 rows; compaction fires after epochs 2 and 5.
    (0 until 6).foreach { i =>
      sink(epoch(Seq(("k1", s"a$i", f"$i%02d"), ("k2", s"b$i", f"$i%02d"))), i.toLong)
    }
    // post-epoch-5 compaction: exactly one stored row per key
    assert(spark.read.parquet(target).count() === 2L)
    val resolved = fmt.read(spark, target, Seq("key"), Seq("version"))
      .select("key", "payload").collect().map(_.toString).sorted.toSeq
    assert(resolved === Seq("[k1,a5]", "[k2,b5]"))
    // a replay of the compaction epoch itself converges (append + refold)
    sink(epoch(Seq(("k1", "a5", "05"), ("k2", "b5", "05"))), 5L)
    assert(fmt.read(spark, target, Seq("key"), Seq("version"))
      .select("key", "payload").collect().map(_.toString).sorted.toSeq === resolved)
  }

  test("bucket-sizing contract under skew: bucket sizes follow key cardinality, not event heat") {
    // 50k events, 80% on ONE key, the rest over 5000 distinct keys
    val hot = Seq.tabulate(40000)(i => ("hotkey", s"p$i", f"$i%08d"))
    val cold = Seq.tabulate(10000)(i => (s"k${i % 5000}", s"q$i", f"$i%08d"))
    val target = java.nio.file.Files.createTempDirectory("seam_sz").toString + "/t"
    val numBuckets = 8
    Tail.lwwSink(target, Seq("key"), Seq("version"), numBuckets)(
      spark.createDataset(hot ++ cold).toDF("key", "payload", "version"), 0L)
    // state is one row per key: 5001 rows from 50k events
    val byDir = spark.read.option("basePath", target).parquet(target)
      .groupBy("__bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDir.values.sum === 5001L)
    // the hot key's 40k events collapsed to ONE stored row, so no bucket
    // is event-inflated: max bucket ~= distinctKeys / numBuckets
    val ideal = 5001.0 / numBuckets
    assert(byDir.values.max <= ideal * 1.5,
      s"bucket sizes ${byDir.values.toSeq.sorted} not key-uniform (ideal $ideal)")
    assert(byDir.size <= numBuckets)
  }
}
