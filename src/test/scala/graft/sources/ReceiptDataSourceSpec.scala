package graft.sources

import graft.SparkSpec
import graft.nft.Derive
import org.apache.spark.sql.functions._

class ReceiptDataSourceSpec extends SparkSpec {

  private def receiptsDf(maxBlock: Long) =
    spark.read.format("receipts")
      .option("start", "0").option("maxBlock", maxBlock.toString)
      .option("numPartitions", "4").load()

  // explode nested logs -> the exact relation shape Derive consumes
  private def logsOf(maxBlock: Long) =
    receiptsDf(maxBlock)
      .select(explode(col("logs")).as("l"))
      .select(col("l.*"))

  test("receipts carry typed logs; block window pushdown holds") {
    val df = receiptsDf(50)
    // sum over [0,50) of n % 3 receipts per block
    assert(df.count() === (0L until 50L).map(_ % 3).sum)
    val pruned = df.filter(col("block_number") >= 10 && col("block_number") < 13)
      .select(col("block_number"), col("transaction_hash"))
    // pruning reaches the scan: only the 2 requested columns are read
    assert(pruned.queryExecution.executedPlan.collectLeaves()
      .head.output.map(_.name).toSet === Set("block_number", "transaction_hash"))
    // blocks 10, 11, 12 -> 1 + 2 + 0 receipts
    assert(pruned.count() === 3)
  }

  test("LIMIT over receipts never under-produces (limit is NOT pushed as blocks)") {
    // block 0 has zero receipts: if LIMIT n were translated to "plan n
    // blocks" (valid only for 1-row-per-block sources), limit(5) would
    // plan blocks [0,5) and return only the 4 receipts they contain
    assert(receiptsDf(1000).limit(5).count() === 5)
    assert(receiptsDf(1000).limit(1).count() === 1)
  }

  test("receipts agree with the blocks fixture on shared transactions") {
    // the natural fixture-free crawl join: same hash -> same participants
    val txs = spark.read.format("blocks")
      .option("start", "0").option("maxBlock", "40").load()
      .select(explode(col("transactions")).as("t"))
      .select(col("t.hash").as("transaction_hash"),
        col("t.from_").as("tx_from"), col("t.to_").as("tx_to"))
    val rec = receiptsDf(40).select(col("transaction_hash"),
      col("from_").as("r_from"), col("to_").as("r_to"))
    val joined = txs.join(rec, Seq("transaction_hash"))
    assert(joined.count() === (0L until 40L).map(_ % 3).sum) // 1:1 on hash
    assert(joined.filter(col("tx_from") =!= col("r_from") ||
      !(col("tx_to") <=> col("r_to"))).count() === 0)
  }

  test("fixture-free crawl: fetched logs -> Derive.transfers -> tokens end-to-end") {
    val transfers = Derive.transfers(logsOf(50))
    val n = (0L until 50L).map(_ % 3).sum
    assert(transfers.count() === n)
    // every 5th block's transfers are mints (from = zero address)
    val mints = transfers.filter(col("transaction_type") === "mint")
    assert(mints.count() === (0L until 50L by 5L).map(_ % 3).sum)
    assert(transfers.filter(col("transaction_type") === "burn").count() === 0)
    // exact row: block 7's single transfer
    val t7 = transfers.filter(col("block_id") === 7).head()
    assert(t7.getAs[String]("collection_id") === f"0x${4000 + 7 % 5}%040x")
    assert(t7.getAs[String]("from_") === f"0x${1000 + 7 % 50}%040x")
    assert(t7.getAs[String]("to_") === f"0x${2000 + 7 % 50}%040x")
    assert(t7.getAs[String]("token_id") === f"${70}%064x")
    assert(t7.getAs[String]("transaction_type") === "transfer")
    // the A1 state fold runs over the same relation: one token per
    // unique (n*10+i) id, each appearing exactly once
    val blockTimes = receiptsDf(50)
      .select(col("block_number").as("number"),
        (lit(1700000000L) + col("block_number") * 12).as("timestamp"))
      .distinct()
    val tokens = Derive.tokens(transfers, blockTimes)
    assert(tokens.count() === n)
    // minted tokens know their mint block + original owner
    val minted = tokens.filter(col("mint_block").isNotNull)
    assert(minted.count() === mints.count())
  }

  test("receipts stream tails with the same offset semantics as blocks") {
    val ckpt = java.nio.file.Files.createTempDirectory("rc_ckpt").toString
    val stream = spark.readStream.format("receipts")
      .option("start", "0").option("maxBlock", "60")
      .option("blocksPerTrigger", "20").option("trailBlocks", "10")
      .load()
      .select(col("block_number"), size(col("logs")).as("n_logs"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("receipts_out")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql(
      "SELECT count(*) n, max(block_number) mx FROM receipts_out").head()
    // head reaches 60; available = 60 - 10 = 50 -> receipts of [0, 50)
    assert(got.getLong(0) === (0L until 50L).map(_ % 3).sum)
    assert(got.getLong(1) === 49L)
  }
}
