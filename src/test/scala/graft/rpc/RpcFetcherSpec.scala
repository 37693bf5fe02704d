package graft.rpc

import graft.SparkSpec
import graft.model.{EvmBlockWithTxs, EvmTransactionReceipt}
import graft.sources.{SimulatedBlockDataFetcher, SimulatedReceiptFetcher}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** End-to-end proof that the HTTP JSON-RPC fetchers are drop-in
  * production implementations of the fetcher seams: reading through the
  * stub server (public wire format, reversed batch responses, injected
  * throttles/caps/deaths) must reproduce the simulated fetchers' rows
  * EXACTLY — same chain, two transports. */
class RpcFetcherSpec extends SparkSpec with BeforeAndAfterAll {

  private var stub: StubRpcServer = _

  override def beforeAll(): Unit = { stub = new StubRpcServer() }
  override def afterAll(): Unit = { if (stub != null) stub.stop(); super.afterAll() }

  private def rpcBlocks(maxBlock: Long, endpoints: String, opts: Map[String, String] = Map.empty) = {
    val base = spark.read.format("blocks")
      .option("start", "0").option("maxBlock", maxBlock.toString)
      .option("numPartitions", "2")
      .option("fetcher", classOf[RpcBlockDataFetcher].getName)
      .option("endpoints", endpoints)
    opts.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("block fetcher round-trips the wire format exactly (id-correlated batches)") {
    import spark.implicits._
    // the stub REVERSES batch response order — equality here proves the
    // client correlates by request id, not position
    val got = rpcBlocks(60, stub.url).as[EvmBlockWithTxs].collect().sortBy(_.number)
    val expected = (0L until 60L).map(SimulatedBlockDataFetcher.block)
    assert(got.toSeq === expected)
  }

  test("receipt fetcher round-trips blocks->hashes->receipts exactly") {
    import spark.implicits._
    val got = spark.read.format("receipts")
      .option("start", "0").option("maxBlock", "60").option("numPartitions", "2")
      .option("fetcher", classOf[RpcReceiptDataFetcher].getName)
      .option("endpoints", stub.url)
      .load().as[EvmTransactionReceipt].collect()
      .sortBy(r => (r.block_number, r.transaction_index))
    val expected = (0L until 60L).flatMap(SimulatedReceiptFetcher.receiptsOf)
    assert(got.toSeq === expected)
    // creation receipts made it through with their created address
    assert(got.exists(_.contract_address.nonEmpty))
  }

  test("HTTP 429 maps to throttle: bounded backoff completes the read") {
    stub.throttleNext.set(3)
    val df = rpcBlocks(30, stub.url, Map("throttleBaseMs" -> "1", "throttleCapMs" -> "4"))
    assert(df.count() === 30)
    assert(stub.throttleNext.get() === 0)
  }

  test("oversized batch rejection maps to RangeTooLarge: window shrinks ÷10 and completes") {
    val capped = new StubRpcServer(maxBatch = 10)
    try {
      // one partition of 100 blocks -> first batch of 100 is rejected
      // (-32602), the adaptive reader shrinks to 10-block windows
      val df = spark.read.format("blocks")
        .option("start", "0").option("maxBlock", "100").option("numPartitions", "1")
        .option("fetcher", classOf[RpcBlockDataFetcher].getName)
        .option("endpoints", capped.url)
        .load()
      assert(df.count() === 100)
      assert(capped.largestBatch.get() === 100) // the probe that got rejected
      // served requests: 10 accepted windows of 10
      assert(capped.rpcRequests.get() === 0 + 100)
    } finally capped.stop()
  }

  test("rpcBatch bounds the wire batch size regardless of window width") {
    val counting = new StubRpcServer()
    try {
      val df = spark.read.format("blocks")
        .option("start", "0").option("maxBlock", "100").option("numPartitions", "1")
        .option("fetcher", classOf[RpcBlockDataFetcher].getName)
        .option("endpoints", counting.url)
        .option("rpcBatch", "20")
        .load()
      assert(df.count() === 100)
      // a 100-block window went over the wire as 20-entry batches
      assert(counting.largestBatch.get() === 20)
      assert(counting.rpcRequests.get() === 100)
    } finally counting.stop()
  }

  test("connection pool: dead endpoint is evicted, read completes on the live one") {
    val dead = new StubRpcServer()
    try {
      dead.dead.set(true)
      val df = rpcBlocks(40, s"${dead.url},${stub.url}", Map("fetchChunk" -> "10"))
      assert(df.count() === 40)
      // the dead endpoint was tried (then evicted), never served a row
      assert(dead.httpRequests.get() > 0 && dead.rpcRequests.get() === 0)
    } finally dead.stop()
  }

  test("endpoint death MID-WINDOW: unanswered sub-batches replay on the next endpoint — no lost, no duplicated rows") {
    import spark.implicits._
    val dying = new StubRpcServer()
    try {
      // serve two wire batches, then 500 forever: the endpoint dies with
      // most of the window still unanswered — the HTTP analog of the
      // reference's reconnect-with-in-flight-replay (`core/rpc.py:327-353`)
      dying.dieAfterRequests.set(2)
      val df = rpcBlocks(100, s"${dying.url},${stub.url}",
        Map("rpcBatch" -> "10", "numPartitions" -> "1"))
      val nums = df.select("number").as[Long].collect()
      // every block exactly once: the failed sub-batch was re-issued on
      // the live endpoint (nothing lost), and only the unanswered window
      // was replayed (nothing duplicated)
      assert(nums.length === 100)
      assert(nums.sorted.toSeq === (0L until 100L))
      assert(dying.rpcRequests.get() > 0) // it really served part of the window first
    } finally dying.stop()
  }

  test("fully depleted pool fails loudly, not with missing rows") {
    val d1 = new StubRpcServer(); val d2 = new StubRpcServer()
    try {
      d1.dead.set(true); d2.dead.set(true)
      val err = intercept[org.apache.spark.SparkException] {
        rpcBlocks(10, s"${d1.url},${d2.url}", Map("numPartitions" -> "1")).count()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(err).exists(_.contains("depleted")))
    } finally { d1.stop(); d2.stop() }
  }

  test("eth_call transport: probes execute over RPC and pivot into the snapshot dim") {
    import spark.implicits._
    // k=4000: ERC-721 with metadata; k=4001: ERC-1155 (no metadata
    // functions); k=4004: no ERC-165 (every probe reverts)
    val contracts = Seq(4000L, 4001L, 4004L)
      .map(k => f"0x$k%040x").toDF("collection_id")
    val snap = Calls.interfaceSnapshot(
      Calls.execute(spark, graft.nft.Collections.callRequests(contracts),
        CallExecutor.Rpc, Map("endpoints" -> stub.url)))
      .collect().map(r => r.getAs[String]("collection_id") -> r).toMap
    val c721 = snap(f"0x${4000L}%040x")
    assert(c721.getAs[Boolean]("supports_erc721") === true)
    assert(c721.getAs[Boolean]("supports_erc1155") === false)
    assert(c721.getAs[String]("name") === "Collection 4000")
    assert(c721.getAs[String]("symbol") === "C4000")
    assert(c721.getAs[String]("total_supply") === f"${40000L}%064x")
    assert(c721.getAs[String]("owner") === f"0x${9000L}%040x")
    val c1155 = snap(f"0x${4001L}%040x")
    assert(c1155.getAs[Boolean]("supports_erc721") === false)
    assert(c1155.getAs[Boolean]("supports_erc1155") === true)
    assert(c1155.isNullAt(c1155.fieldIndex("name")))
    val none = snap(f"0x${4004L}%040x")
    assert(none.getAs[Boolean]("supports_erc721") === false)
    assert(none.getAs[Boolean]("supports_erc1155") === false)
  }

  test("eth_getLogs fetcher == simulated logs source, with server-side address narrowing") {
    val a4000 = f"0x${4000L}%040x"
    def viaFetcher(fetcher: String, extra: Map[String, String]) = {
      val base = spark.read.format("logs")
        .option("start", "0").option("maxBlock", "50").option("numPartitions", "2")
        .option("fetcher", fetcher)
      extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
        .filter(org.apache.spark.sql.functions.col("address") === a4000)
        .collect().map(_.toString).sorted.toSeq
    }
    val rpc = viaFetcher(classOf[RpcLogsFetcher].getName, Map("endpoints" -> stub.url))
    val sim = viaFetcher(graft.sources.LogsFetcher.Simulated, Map.empty)
    assert(rpc.nonEmpty && rpc === sim)
  }

  test("eth_getLogs 'too many results' rejection shrinks the window ÷10 and completes") {
    val capped = new StubRpcServer(logsRangeCap = 5)
    try {
      val df = spark.read.format("logs")
        .option("start", "0").option("maxBlock", "40").option("numPartitions", "1")
        .option("fetcher", classOf[RpcLogsFetcher].getName)
        .option("endpoints", capped.url)
        .load()
      assert(df.count() ===
        (0 until 40).map(_ % 3).sum + (0 until 40).count(n => n % 7 == 3 && n % 3 != 0))
    } finally capped.stop()
  }

  test("head-aware tail: the stream follows eth_blockNumber, not the simulated advance") {
    val short = new StubRpcServer(chainHeight = 120)
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("head_ckpt").toString
      val q = spark.readStream.format("blocks")
        .option("start", "0").option("maxBlock", "10000") // far beyond the node height
        .option("blocksPerTrigger", "50")
        .option("fetcher", classOf[RpcBlockDataFetcher].getName)
        .option("endpoints", short.url)
        .load()
        .select(org.apache.spark.sql.functions.col("number"))
        .writeStream.outputMode("append")
        .format("memory").queryName("head_aware_out")
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
      // the node reports height 120: had the stream used the simulated
      // +blocksPerTrigger advance it would have planned blocks >= 120
      // and the fetch would have failed loudly on null blocks
      val got = spark.sql("SELECT count(*) n, max(number) mx FROM head_aware_out").head()
      assert((got.getLong(0), got.getLong(1)) === ((120L, 119L)))
    } finally short.stop()
  }

  test("streaming crawl over RPC: receipts tail -> Derive transfers, head-paced") {
    val short = new StubRpcServer(chainHeight = 60)
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("rpc_tail_ckpt").toString
      val logs = spark.readStream.format("receipts")
        .option("start", "0").option("maxBlock", "100000")
        .option("blocksPerTrigger", "25")
        .option("fetcher", classOf[RpcReceiptDataFetcher].getName)
        .option("endpoints", short.url)
        .load()
        .select(explode(col("logs")).as("l")).select(col("l.*"))
      // the same Derive program the batch crawl runs, applied per epoch
      val q = graft.nft.Derive.transfers(logs)
        .writeStream.outputMode("append")
        .format("memory").queryName("rpc_tail_transfers")
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
      val got = spark.sql(
        "SELECT count(*) n, max(block_id) mx FROM rpc_tail_transfers").head()
      // the node's height (60) bounds the tail — one transfer per tx
      assert(got.getLong(0) === (0L until 60L).map(_ % 3).sum)
      assert(got.getLong(1) === 59L)
    } finally short.stop()
  }

  test("fromChain through HTTP fetchers + RPC call transport == simulated seams") {
    val viaRpc = graft.pipelines.Crawl.fromChain(spark, 0, 50,
      blocksFetcher = classOf[RpcBlockDataFetcher].getName,
      receiptsFetcher = classOf[RpcReceiptDataFetcher].getName,
      callExecutor = CallExecutor.Rpc,
      fetcherOptions = Map("endpoints" -> stub.url))
    val viaSim = graft.pipelines.Crawl.fromChain(spark, 0, 50)
    assert(viaRpc.keySet === viaSim.keySet)
    for (name <- viaSim.keySet) {
      val a = viaRpc(name).collect().map(_.toString).sorted.toSeq
      val b = viaSim(name).collect().map(_.toString).sorted.toSeq
      assert(a === b, s"table $name differs between RPC and simulated transports")
    }
    assert(viaRpc("collections").count() > 0)
  }
}
