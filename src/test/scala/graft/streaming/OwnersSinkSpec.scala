package graft.streaming

import graft.SparkSpec
import graft.expr.HexMath
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming owner-balance view (K6 additive merge + K7 zero
  * tombstones): epoch-by-epoch additive sinking must converge to the
  * batch [[graft.nft.Derive.owners]] over the same transfers, survive
  * replays without double-counting, and keep zero balances out of
  * reads but in storage (the dynamic-overwrite constraint). */
class OwnersSinkSpec extends SparkSpec {

  private def hex(n: Long) = HexMath.fromLong(n)

  private def transfers(rows: Seq[(Long, String, String, String, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("block_id", "collection_id", "from_", "to_", "transaction_type", "q")
      .withColumn("blockchain", lit("ethereum-mainnet"))
      .withColumn("token_id", lit("0x01"))
      .withColumn("quantity", udf((l: Long) => hex(l)).apply(col("q"))).drop("q")
  }

  private def state(target: String) =
    Tail.readOwners(spark, target)
      .select("collection_id", "account", "quantity")
      .collect().map(_.toString).sorted.toSeq

  test("epoch-wise additive merge converges to the batch owners rollup; replays don't double-count") {
    val all = graft.pipelines.Crawl.fromChain(spark, 0, 60)("transfers")
      .localCheckpoint(true)
    val target = java.nio.file.Files.createTempDirectory("owners_sink").toString + "/t"
    val epochs = Seq((0L, 20L), (20L, 40L), (40L, 60L))
    epochs.zipWithIndex.foreach { case ((lo, hi), i) =>
      Tail.ownersSink(target, numBuckets = 4)(
        all.filter(col("block_id") >= lo && col("block_id") < hi), i.toLong)
    }
    def viewState = Tail.readOwners(spark, target)
      .select("blockchain", "collection_id", "token_id", "account", "quantity")
      .collect().map(_.toString).sorted.toSeq
    val batchState = graft.nft.Derive.owners(all)
      .select("blockchain", "collection_id", "token_id", "account", "quantity")
      .collect().map(_.toString).sorted.toSeq
    assert(viewState === batchState)
    assert(viewState.nonEmpty)
    // at-least-once: replay the LAST epoch verbatim — every touched
    // bucket is already stamped at epoch 2, so the merge is a no-op
    Tail.ownersSink(target, numBuckets = 4)(
      all.filter(col("block_id") >= 40 && col("block_id") < 60), 2L)
    assert(viewState === batchState)
    // checkpoint RESET: a new lineage restarts batch ids at 0 while the
    // table keeps its stamps. Re-read blocks must SKIP (the data
    // watermark, not the batch id, conditions the replay)...
    Tail.ownersSink(target, numBuckets = 4)(
      all.filter(col("block_id") >= 40 && col("block_id") < 60), 0L)
    assert(viewState === batchState)
    // ...and genuinely NEW blocks under the reset lineage must APPLY —
    // a batch-id-stamped sink would discard them forever
    val extended = graft.pipelines.Crawl.fromChain(spark, 0, 80)("transfers")
      .localCheckpoint(true)
    Tail.ownersSink(target, numBuckets = 4)(
      extended.filter(col("block_id") >= 60 && col("block_id") < 80), 1L)
    val batchState80 = graft.nft.Derive.owners(extended)
      .select("blockchain", "collection_id", "token_id", "account", "quantity")
      .collect().map(_.toString).sorted.toSeq
    assert(viewState === batchState80)
  }

  test("tokens view: mixed-algebra merge (argmin mint, additive supply, argmax owner) converges") {
    val all = graft.pipelines.Crawl.fromChain(spark, 0, 60)("transfers")
      .localCheckpoint(true)
    val blockTimes = spark.read.format("blocks")
      .option("start", "0").option("maxBlock", "60").load()
      .select(col("number"), col("timestamp")).localCheckpoint(true)
    val target = java.nio.file.Files.createTempDirectory("tokens_sink").toString + "/t"
    Seq((0L, 20L), (20L, 40L), (40L, 60L)).zipWithIndex.foreach { case ((lo, hi), i) =>
      Tail.tokensSink(target, blockTimes, numBuckets = 4)(
        all.filter(col("block_id") >= lo && col("block_id") < hi), i.toLong)
    }
    def s(df: DataFrame) = df.collect().map(_.toString).sorted.toSeq
    val batch = s(graft.nft.Derive.tokens(all, blockTimes))
    assert(s(Tail.readTokens(spark, target)) === batch)
    assert(batch.nonEmpty)
    // replay the middle epoch (at-least-once): state must not move —
    // neither the additive supply components nor the argmin/argmax picks
    Tail.tokensSink(target, blockTimes, numBuckets = 4)(
      all.filter(col("block_id") >= 20 && col("block_id") < 40), 1L)
    assert(s(Tail.readTokens(spark, target)) === batch)
  }

  test("zero balances tombstone in storage, disappear from reads, and stay additive-identity") {
    val target = java.nio.file.Files.createTempDirectory("owners_zero").toString + "/t"
    val c = "0xc"
    // epoch 0: mint 5 to A; epoch 1: A sends all 5 to B
    Tail.ownersSink(target, numBuckets = 2)(
      transfers(Seq((1L, c, "0x0", "0xa", "mint", 5L))), 0L)
    Tail.ownersSink(target, numBuckets = 2)(
      transfers(Seq((2L, c, "0xa", "0xb", "transfer", 5L))), 1L)
    // read: only B holds a balance (K7 delete semantics)
    assert(state(target) === Seq(s"[$c,0xb,${hex(5)}]"))
    // storage: A's zero-NET row remains (components in == out) — dynamic
    // partition overwrite must always write rows into a touched bucket
    val stored = spark.read.parquet(target)
    assert(stored.filter(col("account") === "0xa")
      .select("in_total", "out_total").head() ===
      org.apache.spark.sql.Row(hex(5), hex(5)))
    // the tombstone is additive-identity: A re-acquires in epoch 2
    Tail.ownersSink(target, numBuckets = 2)(
      transfers(Seq((3L, c, "0xb", "0xa", "transfer", 2L))), 2L)
    assert(state(target).toSet ===
      Set(s"[$c,0xa,${hex(2)}]", s"[$c,0xb,${hex(3)}]"))
  }

  test("a view without the block-high-water stamp-scheme marker is refused, not double-counted") {
    val target = java.nio.file.Files.createTempDirectory("owners_scheme").toString + "/t"
    val c = "0xc"
    Tail.ownersSink(target, numBuckets = 2)(
      transfers(Seq((1L, c, "0x0", "0xa", "mint", 5L))), 0L)
    // the sink records its stamp scheme alongside the data
    val marker = new org.apache.hadoop.fs.Path(target, Tail.StampSchemeFile)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(marker))
    // simulate a table written by the pre-upgrade sink (batch-id
    // stamps): same layout, no marker. The sink must refuse — an
    // at-least-once replay straddling the upgrade would re-apply
    // additive deltas against the incomparable old stamps. The cache
    // reset simulates the fresh process such an upgrade implies (a
    // validated marker is otherwise trusted per-JVM, by design).
    fs.delete(marker, false)
    Tail.resetStampSchemeCache()
    val e = intercept[IllegalArgumentException] {
      Tail.ownersSink(target, numBuckets = 2)(
        transfers(Seq((2L, c, "0xa", "0xb", "transfer", 5L))), 1L)
    }
    assert(e.getMessage.contains(Tail.StampSchemeFile))
    assert(e.getMessage.contains("Rebuild"))
    // state untouched by the refused batch
    assert(state(target) === Seq(s"[$c,0xa,${hex(5)}]"))
    // an operator who KNOWS the stamps are block high-waters re-blesses
    // the table by recreating the marker; the stream then resumes
    val out = fs.create(marker, true)
    out.write(Tail.StampScheme.getBytes("UTF-8")); out.close()
    Tail.ownersSink(target, numBuckets = 2)(
      transfers(Seq((2L, c, "0xa", "0xb", "transfer", 5L))), 1L)
    assert(state(target) === Seq(s"[$c,0xb,${hex(5)}]"))
  }

  test("a torn (empty) marker from a crashed first write heals instead of bricking") {
    // crash window: fs.create() succeeded, write/close never ran — the
    // dir holds an EMPTY _stamp_scheme and no data. The next process's
    // first epoch must validate CONTENT (not existence), rewrite the
    // marker, and the restart after that must accept the healthy view.
    val target = java.nio.file.Files.createTempDirectory("owners_torn").toString + "/t"
    val c = "0xd"
    val marker = new org.apache.hadoop.fs.Path(target, Tail.StampSchemeFile)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(target))
    fs.create(marker, true).close() // torn: empty content
    Tail.resetStampSchemeCache()
    Tail.ownersSink(target, numBuckets = 2)(
      transfers(Seq((1L, c, "0x0", "0xa", "mint", 5L))), 0L)
    // marker healed to the real scheme string
    val len = fs.getFileStatus(marker).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(marker)
    try in.readFully(0L, buf) finally in.close()
    assert(new String(buf, "UTF-8").trim === Tail.StampScheme)
    // fresh process over the now-populated view: accepted, applies cleanly
    Tail.resetStampSchemeCache()
    Tail.ownersSink(target, numBuckets = 2)(
      transfers(Seq((2L, c, "0xa", "0xb", "transfer", 5L))), 1L)
    assert(state(target) === Seq(s"[$c,0xb,${hex(5)}]"))
  }
}
