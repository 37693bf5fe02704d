package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The EVM logs bloom (`evm/types.py:116` — parsed by the reference,
  * COMPUTED here) and the pre-explode topic-prune it powers. */
class BloomSpec extends SparkSpec {

  test("bitsOf: three 11-bit indexes, deterministic, plan-time cheap") {
    val topic = graft.nft.Derive.Erc721TransferSig
    val bits = Bloom.bitsOf(topic)
    assert(bits.length === 3)
    assert(bits.forall(b => b >= 0 && b < 2048))
    assert(bits === Bloom.bitsOf(topic))
  }

  test("empty logs render the all-zero bloom; one item sets at most 3 bits") {
    assert(Bloom.logsBloom(Nil) === "0x" + "0" * 512)
    val log = EvmLog(removed = false, log_index = 0, transaction_index = 0,
      transaction_hash = "0x7a", block_hash = "0xb1", block_number = 1,
      address = null, data = "0x",
      topics = Seq(graft.nft.Derive.Erc721TransferSig))
    val bloom = Bloom.logsBloom(Seq(log))
    val ones = bloom.drop(2).map(c => Integer.bitCount(Character.digit(c, 16))).sum
    assert(ones >= 1 && ones <= 3, s"one topic set $ones bits")
  }

  test("NO false negatives: every sim receipt passes the filter for every item it carries") {
    val receipts = (0L until 60L).flatMap(
      graft.sources.SimulatedReceiptFetcher.receiptsOf)
    receipts.foreach { r =>
      r.logs.foreach { l =>
        (Option(l.address).toSeq ++ l.topics).foreach { item =>
          val bits = Bloom.bitsOf(item)
          val body = r.logs_bloom.drop(2)
          bits.foreach { pos =>
            val d = Character.digit(body.charAt(511 - pos / 4), 16)
            assert((d & (1 << (pos % 4))) != 0,
              s"bit $pos unset for carried item $item in block ${r.block_number}")
          }
        }
      }
    }
  }

  test("bloomMayContain prunes receipts BEFORE the explode — codegen bit tests, no keccak per row") {
    import spark.implicits._
    val receipts = spark.read.format("receipts")
      .option("start", "0").option("maxBlock", "60")
      .option("numPartitions", "2").load()
    val uriTopic = graft.nft.Derive.Erc1155UriSig
    val pruned = receipts.filter(
      graft.expr.Exprs.bloomMayContain(col("logs_bloom"), uriTopic))
    // soundness end-to-end: the pruned scan finds EXACTLY the URI logs
    // the unpruned explode+filter finds (false positives fall through
    // to the exact filter; false negatives cannot exist)
    def uriLogs(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(col("logs")).as("l")).select(col("l.*"))
      .filter(element_at(col("topics"), 1) === uriTopic)
      .collect().map(_.toString).sorted.toSeq
    val exact = uriLogs(receipts)
    assert(exact.nonEmpty)
    assert(uriLogs(pruned) === exact)
    // pruning power: URI events ride on ~1 tx per 7th block — the bloom
    // must discard the bulk of receipts without touching their log arrays
    val total = receipts.count()
    val kept = pruned.count()
    assert(kept < total / 2, s"bloom kept $kept of $total receipts — no pruning power")
    // an item no sim log carries prunes (essentially) everything
    val absent = "0x" + "e7" * 32
    assert(receipts.filter(
      graft.expr.Exprs.bloomMayContain(col("logs_bloom"), absent)).count() < total / 10)
    // plan shape: the filter is hex-digit arithmetic (conv/substring),
    // never a keccak or UDF per row
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(!planStr.toLowerCase.contains("keccak"))
    assert(!planStr.contains("BatchEvalPython") && !planStr.toLowerCase.contains("udf"))
  }

  test("a NULL bloom passes the filter (unknown cannot prune — legacy rows survive)") {
    import spark.implicits._
    val df = Seq(
      (1L, Bloom.logsBloom(Nil)),    // real all-zero bloom: prunable
      (2L, null.asInstanceOf[String]) // schema-evolved row: must pass
    ).toDF("id", "logs_bloom")
    val kept = df.filter(graft.expr.Exprs.bloomMayContain(col("logs_bloom"),
        graft.nft.Derive.Erc721TransferSig))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L), s"null bloom must pass, zero bloom must prune: $kept")
  }

  test("wire fidelity: v/r/s and logsBloom round-trip the stub JSON-RPC transport") {
    val stub = new graft.rpc.StubRpcServer()
    try {
      val viaRpc = spark.read.format("receipts")
        .option("start", "0").option("maxBlock", "30").option("numPartitions", "2")
        .option("fetcher", classOf[graft.rpc.RpcReceiptDataFetcher].getName)
        .option("endpoints", stub.url).load()
        .select("transaction_hash", "logs_bloom")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val sim = (0L until 30L).flatMap(graft.sources.SimulatedReceiptFetcher.receiptsOf)
      assert(sim.nonEmpty)
      sim.foreach(r => assert(viaRpc(r.transaction_hash) === r.logs_bloom))
      val blocksRpc = spark.read.format("blocks")
        .option("start", "0").option("maxBlock", "30").option("numPartitions", "2")
        .option("fetcher", classOf[graft.rpc.RpcBlockDataFetcher].getName)
        .option("endpoints", stub.url).load()
        .select(explode(col("transactions")).as("t")).select("t.hash", "t.v", "t.r", "t.s")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
      val simTxs = (0L until 30L).map(graft.sources.SimulatedBlockDataFetcher.block)
        .flatMap(_.transactions)
      assert(simTxs.nonEmpty)
      simTxs.foreach(t => assert(blocksRpc(t.hash) === ((t.v, t.r, t.s))))
    } finally stub.stop()
  }
}
