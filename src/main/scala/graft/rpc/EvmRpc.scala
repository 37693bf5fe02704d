package graft.rpc

import graft.model.{EvmBlockWithTxs, EvmLog, EvmTransaction, EvmTransactionReceipt}
import graft.sources.{BlockDataFetcher, ConfigurableFetcher, HeadAwareFetcher, LogsFetcher,
  RangeTooLargeException, ReceiptDataFetcher}
import org.json4s._

/** EVM JSON-RPC wire-format conversion — the public protocol shapes
  * (`eth_getBlockByNumber` / `eth_getTransactionReceipt` responses),
  * field-by-field per the reference's client (`evm/rpc.py:150-196`
  * blocks, `:198-236` receipts), mapped onto the engine's typed
  * entities and scalar conventions (hex quantities → Long where
  * semantics bound the value; uint256 → zero-padded 64-hex). */
object EvmWire {

  private def strip0x(s: String): String =
    if (s != null && (s.startsWith("0x") || s.startsWith("0X"))) s.substring(2) else s

  def qtyHex(n: Long): String = "0x" + java.lang.Long.toHexString(n)

  /** bare hex quantity result ("0x10") → Long — e.g. eth_blockNumber */
  def qtyLong(j: JValue): Long = j match {
    case JString(s) => java.lang.Long.parseLong(strip0x(s), 16)
    case other => throw new RpcClientException(s"expected hex quantity, got $other")
  }

  private def jString(j: JValue, field: String): String = j \ field match {
    case JString(s) => s
    case JNull | JNothing => null
    case other => throw new RpcClientException(s"field $field: expected string, got $other")
  }

  private def jOptString(j: JValue, field: String): Option[String] = j \ field match {
    case JString(s) => Some(s)
    case _ => None
  }

  private def jBool(j: JValue, field: String): Boolean = j \ field match {
    case JBool(b) => b
    case _ => false
  }

  /** hex quantity ("0x1b4") → Long; for fields semantics bound under
    * 2^63 (block numbers, gas, timestamps, indexes). */
  def hexLong(j: JValue, field: String): Long = {
    val s = jString(j, field)
    if (s == null) throw new RpcClientException(s"field $field: null hex quantity")
    java.lang.Long.parseLong(strip0x(s), 16)
  }

  private def hexLongOpt(j: JValue, field: String): Option[Long] =
    jOptString(j, field).map(s => java.lang.Long.parseLong(strip0x(s), 16))

  /** hex quantity of arbitrary width → canonical zero-padded lowercase
    * 64-hex (the model's uint256 convention, FIXTURES.md §A). A value
    * wider than uint256 is a wire-protocol violation and fails loudly
    * like every other parse path — silent high-digit truncation would
    * corrupt balances. */
  def hex64(j: JValue, field: String): String = {
    val s = jString(j, field)
    // classified like hexLong: a null/absent field is a wire violation
    // that must surface as RpcClientException (pool eviction keys on
    // it), not an unclassified NPE from toLowerCase
    if (s == null) throw new RpcClientException(s"field $field: null hex quantity")
    val raw = strip0x(s).toLowerCase
    // leading zeros are lossless padding, not width — canonicalize them
    // away before judging, so "0x00…0ff" (66 hex chars, value < 2^256)
    // parses while a genuinely over-wide VALUE still fails loudly
    val h = { val t = raw.dropWhile(_ == '0'); if (t.isEmpty && raw.nonEmpty) "0" else t }
    if (h.length > 64) throw new RpcClientException(
      s"field $field: hex quantity exceeds uint256 width (${h.length} significant hex digits)")
    else if (h.length == 64) h
    else ("0" * (64 - h.length)) + h
  }

  // `evm/rpc.py:150-168`. gasPrice deviates from the reference's strict
  // read deliberately: the execution-apis schema marks it OPTIONAL for
  // dynamic-fee (type-2) transactions — a conforming client that omits
  // it must degrade the one field (0), not fail every post-London block
  def parseTx(j: JValue): EvmTransaction = EvmTransaction(
    block_hash = jString(j, "blockHash"),
    block_number = hexLong(j, "blockNumber"),
    from_ = jString(j, "from"),
    to_ = jOptString(j, "to"),
    gas = hexLong(j, "gas"),
    gas_price = hexLongOpt(j, "gasPrice").getOrElse(0L),
    hash = jString(j, "hash"),
    input = jString(j, "input"),
    nonce = hexLong(j, "nonce"),
    transaction_index = hexLong(j, "transactionIndex"),
    value = hex64(j, "value"),
    v = hexLong(j, "v"),
    r = jString(j, "r"),
    s = jString(j, "s"))

  // `evm/rpc.py:173-196`; difficulty kept as the raw hex string (may
  // exceed 2^63 pre-merge)
  def parseBlock(j: JValue): EvmBlockWithTxs = EvmBlockWithTxs(
    number = hexLong(j, "number"),
    hash = jString(j, "hash"),
    parent_hash = jString(j, "parentHash"),
    timestamp = hexLong(j, "timestamp"),
    miner = jString(j, "miner"),
    gas_limit = hexLong(j, "gasLimit"),
    gas_used = hexLong(j, "gasUsed"),
    size = hexLong(j, "size"),
    difficulty = jString(j, "difficulty"),
    transactions = j \ "transactions" match {
      case JArray(txs) => txs.map(parseTx)
      // the reference refuses a block with a null transactions attribute
      // (`core` client guard, `evm/rpc.py:145-147`)
      case _ => throw new RpcClientException("block transactions attribute was null")
    },
    uncles = j \ "uncles" match {
      case JArray(us) => us.collect { case JString(u) => u }
      case _ => Nil
    })

  /** tx-hash list form (full_transactions=False, `evm/rpc.py:170-172`) */
  def parseTxHashes(j: JValue): Seq[String] = j \ "transactions" match {
    case JArray(txs) => txs.collect { case JString(h) => h }
    case _ => throw new RpcClientException("block transactions attribute was null")
  }

  // `evm/rpc.py:206-220`
  def parseLog(j: JValue): EvmLog = EvmLog(
    removed = jBool(j, "removed"),
    log_index = hexLong(j, "logIndex"),
    transaction_index = hexLong(j, "transactionIndex"),
    transaction_hash = jString(j, "transactionHash"),
    block_hash = jString(j, "blockHash"),
    block_number = hexLong(j, "blockNumber"),
    address = jString(j, "address"),
    data = jString(j, "data"),
    topics = j \ "topics" match {
      case JArray(ts) => ts.collect { case JString(t) => t }
      case _ => Nil
    })

  // `evm/rpc.py:221-236`
  def parseReceipt(j: JValue): EvmTransactionReceipt = EvmTransactionReceipt(
    transaction_hash = jString(j, "transactionHash"),
    transaction_index = hexLong(j, "transactionIndex"),
    block_hash = jString(j, "blockHash"),
    block_number = hexLong(j, "blockNumber"),
    from_ = jString(j, "from"),
    to_ = jOptString(j, "to"),
    cumulative_gas_used = hexLong(j, "cumulativeGasUsed"),
    gas_used = hexLong(j, "gasUsed"),
    contract_address = jOptString(j, "contractAddress"),
    status = hexLongOpt(j, "status"),
    logs = j \ "logs" match {
      case JArray(ls) => ls.map(parseLog)
      case _ => Nil
    },
    logs_bloom = jString(j, "logsBloom"))
}

/** Shared wiring for the RPC-backed fetchers: endpoint list, timeouts,
  * and the window→batch call pattern. Configured through reader options
  * ([[ConfigurableFetcher]]):
  *  - `endpoints` (required): comma-separated HTTP JSON-RPC URLs;
  *    >1 endpoint = round-robin pool with dead-endpoint eviction
  *    ([[PooledJsonRpcClient]], `evm/rpc.py:380-422`)
  *  - `rpcTimeoutMs` (default 30000)
  *
  * A batch-level "limit exceeded" server error becomes
  * [[RangeTooLargeException]] so the adaptive reader shrinks the window
  * ÷10 and re-requests — the reference's reaction to providers that cap
  * response size (`evm/rpc.py:366-377`). Throttles propagate as
  * [[graft.sources.ThrottledException]] for the reader's bounded
  * backoff. The JDK HttpClient (and its connection pool) lives for the
  * fetcher's lifetime — one per task — so chunk windows reuse
  * connections. */
trait RpcFetcherBase extends ConfigurableFetcher with HeadAwareFetcher {
  protected var client: JsonRpcClient = _
  protected var rpcBatch: Int = 256

  /** Live chain height via `eth_blockNumber` (`evm/rpc.py:119-126`) —
    * makes every RPC fetcher head-aware, so streams tail the real node
    * height instead of the simulated advance. */
  override def chainHead(): Long =
    EvmWire.qtyLong(requireClient().call("eth_blockNumber"))

  override def configure(options: Map[String, String]): Unit = {
    val eps = options.getOrElse("endpoints",
      throw new IllegalArgumentException(
        "RPC fetcher requires option 'endpoints' (comma-separated JSON-RPC URLs)"))
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    client = JsonRpc.client(eps,
      options.get("rpctimeoutms").map(_.toLong).getOrElse(30000L),
      options.get("rpccooldownms").map(_.toLong).getOrElse(30000L),
      // `rpcRequestsPerSecond`: proactive per-JVM request cap
      // (reference `--rpc-requests-per-second`, `nft/bin/nft.py:48-54`)
      options.get("rpcrequestspersecond").map(_.toInt).getOrElse(0))
    rpcBatch = options.get("rpcbatch").map(_.toInt).getOrElse(256)
  }

  /** Send calls in wire batches of at most `rpcBatch` (option
    * `rpcBatch`, default 256): the chunk WINDOW is the retry/shrink
    * unit, but providers cap the JSON-RPC array size well below a
    * partition's width — a 100k-block partition must not become a
    * 100k-entry batch. Results keep call order across sub-batches.
    *
    * A batch-LEVEL rejection (the single error OBJECT a server returns
    * for an oversized/malformed batch array) maps to
    * [[RangeTooLargeException]] here — it is a statement about the
    * REQUEST's size, which the adaptive reader's ÷10 window shrink
    * fixes. Per-ENTRY errors pass through untouched for [[unwrap]]. */
  protected def batched(calls: Seq[RpcCall]): Seq[Either[RpcServerException, JValue]] = {
    val c = requireClient()
    def send(group: Seq[RpcCall]) =
      try c.batch(group)
      catch {
        case e: RpcServerException if JsonRpc.isRangeTooLarge(e.code) =>
          throw new RangeTooLargeException(e.getMessage)
      }
    if (calls.lengthCompare(rpcBatch) <= 0) send(calls)
    else calls.grouped(rpcBatch).flatMap(send).toVector
  }

  protected def requireClient(): JsonRpcClient = {
    if (client == null) throw new IllegalStateException(
      "fetcher not configured: instantiate through forName(class, options) with 'endpoints' set")
    client
  }

  /** Unwrap one batch entry. A PER-ENTRY server error surfaces with its
    * original code and message — the reference applies the ÷10-shrink
    * reaction only to get_logs (`evm/rpc.py:366-377`); a generic -32000
    * on eth_getBlockByNumber (e.g. "header not found") is a real server
    * error, and misclassifying it as range-too-large would burn
    * shrink-retry round trips and hide the cause. */
  protected def unwrap(e: Either[RpcServerException, JValue]): JValue = e match {
    case Right(v) => v
    case Left(err) => throw err
  }

  /** Map a range-ish server error on a SINGLE ranged call to the shrink
    * signal — the logs fetcher's "more than X results" rejection
    * (`evm/rpc.py:366-377`). Only the get_logs path wraps itself in
    * this (matching the reference, which shrink-reacts ONLY there): a
    * -32000 from a per-block or per-receipt call is a genuine server
    * error and must surface with its own code and message. */
  protected def guarded[T](body: => T): T =
    try body
    catch {
      case e: RpcServerException if JsonRpc.isRangeTooLarge(e.code) =>
        throw new RangeTooLargeException(e.getMessage)
    }
}

/** `eth_getBlockByNumber(n, full_transactions=True)` over a block
  * window — one JSON-RPC batch per window, id-correlated; the
  * production implementation of the [[BlockDataFetcher]] seam
  * (`evm/rpc.py:128-196`). */
final class RpcBlockDataFetcher extends BlockDataFetcher with RpcFetcherBase {
  override def fetchBlocks(lo: Long, hi: Long): Iterator[EvmBlockWithTxs] = {
    if (hi <= lo) return Iterator.empty
    val calls = (lo until hi).map(n =>
      RpcCall("eth_getBlockByNumber", List(JString(EvmWire.qtyHex(n)), JBool(true))))
    batched(calls).map(unwrap).map {
      // the node answered null = no such block — refuse, like the
      // reference (`evm/rpc.py:142-143`); a shorter chain should
      // surface as an error, not silent missing rows
      case JNull | JNothing => throw new RpcClientException(
        "Error retrieving block: no block returned")
      case j => EvmWire.parseBlock(j)
    }.iterator
  }
}

/** Receipts of every transaction in the window: batch
  * `eth_getBlockByNumber(n, false)` for the hash lists, then one batch
  * of `eth_getTransactionReceipt` per window — the production
  * implementation of the [[ReceiptDataFetcher]] seam
  * (`evm/rpc.py:198-236`). */
/** Ranged log query over `eth_getLogs` — ONE call per window carrying
  * the server-side narrowing (fromBlock/toBlock inclusive, address,
  * topic0 alternatives), the reference's get_logs request shape
  * (`evm/rpc.py:341-350`). The provider's "more than X results"
  * rejection surfaces as [[RangeTooLargeException]], so the adaptive
  * reader reproduces the reference's ÷10 shrink loop
  * (`evm/rpc.py:366-377`) without hand-rolled iteration. */
final class RpcLogsFetcher extends LogsFetcher with RpcFetcherBase {
  private var address: Option[String] = None
  private var topics: Seq[String] = Nil

  override def configure(options: Map[String, String]): Unit = {
    super.configure(options)
    val (a, t) = LogsFetcher.narrowing(options)
    address = a; topics = t
  }

  override def fetchLogs(lo: Long, hi: Long): Iterator[EvmLog] = {
    if (hi <= lo) return Iterator.empty
    val c = requireClient()
    guarded {
      val filter = JObject(List(
        Some("fromBlock" -> (JString(EvmWire.qtyHex(lo)): JValue)),
        Some("toBlock" -> (JString(EvmWire.qtyHex(hi - 1)): JValue)), // inclusive on the wire
        address.map(a => "address" -> (JString(a): JValue)),
        topics match {
          case Nil => None
          case Seq(one) => Some("topics" -> (JArray(List(JString(one))): JValue))
          case many => // position 0 with OR-alternatives, the wire's nested form
            Some("topics" -> (JArray(List(JArray(many.map(JString(_): JValue).toList))): JValue))
        }).flatten)
      c.call("eth_getLogs", filter) match {
        case JArray(ls) => ls.map(EvmWire.parseLog).iterator
        case JNull | JNothing => Iterator.empty
        case other => throw new RpcClientException(s"eth_getLogs returned non-array: $other")
      }
    }
  }
}

final class RpcReceiptDataFetcher extends ReceiptDataFetcher with RpcFetcherBase {
  override def fetchReceipts(lo: Long, hi: Long): Iterator[EvmTransactionReceipt] = {
    if (hi <= lo) return Iterator.empty
    val blockCalls = (lo until hi).map(n =>
      RpcCall("eth_getBlockByNumber", List(JString(EvmWire.qtyHex(n)), JBool(false))))
    val hashes = batched(blockCalls).map(unwrap).flatMap {
      case JNull | JNothing => throw new RpcClientException(
        "Error retrieving block: no block returned")
      case j => EvmWire.parseTxHashes(j)
    }
    if (hashes.isEmpty) Iterator.empty
    else {
      val receiptCalls = hashes.map(h =>
        RpcCall("eth_getTransactionReceipt", List(JString(h))))
      batched(receiptCalls).map(unwrap).map {
        case JNull | JNothing => throw new RpcClientException(
          s"Error retrieving receipt: no receipt returned")
        case j => EvmWire.parseReceipt(j)
      }.iterator
    }
  }
}
