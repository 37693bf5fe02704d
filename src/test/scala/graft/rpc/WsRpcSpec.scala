package graft.rpc

import graft.SparkSpec
import graft.model.EvmBlockWithTxs
import graft.sources.{SimulatedBlockDataFetcher, ThrottledException}
import org.json4s._
import org.scalatest.BeforeAndAfterAll

/** The websocket transport behind the same [[JsonRpcClient]] seam: a
  * `ws://` endpoint must reproduce the HTTP transport's results exactly
  * — same stub dispatch, reversed batch order, same error taxonomy —
  * and survive the reference's signature failure mode (socket drop
  * mid-window -> reconnect + replay, `core/rpc.py:327-353`). */
class WsRpcSpec extends SparkSpec with BeforeAndAfterAll {

  private var inner: StubRpcServer = _
  private var ws: StubWsRpcServer = _

  override def beforeAll(): Unit = {
    inner = new StubRpcServer()
    ws = new StubWsRpcServer(inner)
  }
  override def afterAll(): Unit = {
    if (ws != null) ws.stop()
    if (inner != null) inner.stop()
    super.afterAll()
  }

  test("JsonRpc.client dispatches ws:// schemes to the websocket transport") {
    JsonRpc.resetCache()
    assert(JsonRpc.client(Seq(ws.url)).isInstanceOf[WsJsonRpcClient])
    assert(JsonRpc.client(Seq(inner.url)).isInstanceOf[HttpJsonRpcClient])
    JsonRpc.resetCache()
  }

  test("batch over one frame: responses id-correlated despite reversed order") {
    val client = new WsJsonRpcClient(ws.url, 10000)
    val calls = (0L until 8L).map(n =>
      RpcCall("eth_getBlockByNumber", List(JString("0x" + n.toHexString), JBool(false))))
    val got = client.batch(calls)
    got.zipWithIndex.foreach { case (r, i) =>
      val num = (r.toOption.get \ "number").asInstanceOf[JString].s
      assert(java.lang.Long.parseLong(num.stripPrefix("0x"), 16) === i.toLong)
    }
  }

  test("socket drop mid-window: reconnect replays only unanswered calls") {
    val inner2 = new StubRpcServer()
    val ws2 = new StubWsRpcServer(inner2)
    try {
      val client = new WsJsonRpcClient(ws2.url, 10000)
      assert(client.call("eth_blockNumber") !== JNothing) // frame 1 served
      ws2.dieAfterFrames.set(1) // every further frame on any connection dies
      val t = intercept[RpcClientException] {
        client.batch(Seq(RpcCall("eth_blockNumber", Nil)))
      }
      assert(t.getMessage.contains("replay budget exhausted"))
      ws2.dieAfterFrames.set(Int.MaxValue)
      // fresh socket, same client: the replay path reconnected cleanly
      val answered = client.call("eth_blockNumber")
      assert(answered.isInstanceOf[JString])
      assert(ws2.handshakes.get() >= 3) // initial + replay attempts reconnected
    } finally { ws2.stop(); inner2.stop() }
  }

  test("ws throttle error maps to ThrottledException (in-flight fail-all)") {
    val client = new WsJsonRpcClient(ws.url, 10000)
    ws.throttleNextFrames.set(1)
    intercept[ThrottledException] { client.call("eth_blockNumber") }
    // next frame is served normally again
    assert(client.call("eth_blockNumber").isInstanceOf[JString])
  }

  test("per-entry server errors stay Left, results stay Right, over ws") {
    val client = new WsJsonRpcClient(ws.url, 10000)
    val got = client.batch(Seq(
      RpcCall("eth_blockNumber", Nil),
      RpcCall("no_such_method", Nil)))
    assert(got(0).isRight)
    got(1) match {
      case Left(e) => assert(e.code === -32601)
      case Right(v) => fail(s"expected method-not-found error, got $v")
    }
  }

  test("oversized batch over ws keeps its server-error type: window shrinks ÷10 and completes") {
    // the id:null batch rejection must surface as RpcServerException
    // (HTTP parity) so the adaptive reader shrinks instead of the pool
    // evicting a healthy endpoint as a transport failure
    val capped = new StubRpcServer(maxBatch = 10)
    val ws2 = new StubWsRpcServer(capped)
    try {
      val df = spark.read.format("blocks")
        .option("start", "0").option("maxBlock", "100").option("numPartitions", "1")
        .option("fetcher", classOf[RpcBlockDataFetcher].getName)
        .option("endpoints", ws2.url)
        .load()
      assert(df.count() === 100)
      assert(capped.largestBatch.get() === 100) // the probe that got rejected
    } finally { ws2.stop(); capped.stop() }
  }

  test("mixed http+ws pool: dead ws endpoint fails over to the http member") {
    // the CLI advertises mixable schemes in --evm-rpc-nodes; the pool
    // must rotate across TRANSPORTS exactly as it does within one
    val deadWs = "ws://127.0.0.1:9" // discard port: connect always fails
    val pool = new PooledJsonRpcClient(Seq(
      new WsJsonRpcClient(deadWs, 500),
      new HttpJsonRpcClient(inner.url, 10000)))
    val got = pool.batch(Seq(RpcCall("eth_blockNumber", Nil)))
    assert(got.head.isRight)
    // and a healthy ws member actually serves once the http one dies
    val frames0 = ws.framesServed.get()
    val dead = new StubRpcServer(); dead.stop() // bound then closed: refused
    val pool2 = new PooledJsonRpcClient(Seq(
      new HttpJsonRpcClient(dead.url, 500),
      new WsJsonRpcClient(ws.url, 10000)))
    assert(pool2.batch(Seq(RpcCall("eth_blockNumber", Nil))).head.isRight)
    assert(ws.framesServed.get() > frames0, "the ws member never served")
  }

  test("block fetcher through wss seam reproduces the simulated chain exactly") {
    import spark.implicits._
    JsonRpc.resetCache()
    val got = spark.read.format("blocks")
      .option("start", "0").option("maxBlock", "60")
      .option("numPartitions", "2")
      .option("fetcher", classOf[RpcBlockDataFetcher].getName)
      .option("endpoints", ws.url)
      .load().as[EvmBlockWithTxs].collect().sortBy(_.number)
    val expected = (0L until 60L).map(SimulatedBlockDataFetcher.block)
    assert(got.toSeq === expected)
    JsonRpc.resetCache()
  }
}
