package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSourceV2 block-ID source: the reference's `BlockIDProducer` +
  * `tail` polling loop (`evm/producers.py:9-28`, `nft/bin/tail.py:90-204`)
  * as a native Spark connector.
  *
  *  - batch read: the crawl driver range [start, maxBlock)
  *  - micro-batch stream: each `latestOffset` poll advances the
  *    simulated chain head by `blocksPerTrigger`, minus `trailBlocks`
  *    of reorg lag (the reference's `--trail-blocks` watermark,
  *    `tail.py:163-164`) — one poll cycle == one micro-batch epoch,
  *    exactly the `async with data_bus` chunk barrier semantics.
  *  - `numPartitions` range splits per batch: on a cluster each
  *    executor fetches its own block sub-range (the RPC fan-out the
  *    reference does with a connection pool, `evm/rpc.py:380-422`).
  *  - each partition reads through a pluggable [[BlockFetcher]]
  *    (option `fetcher` = class name) in `fetchChunk`-sized windows,
  *    shrinking the window ÷10 and retrying when the fetcher signals
  *    the range is too large — the reference's adaptive re-request
  *    loop against providers that reject wide queries
  *    (`evm/rpc.py:366-377`).
  *
  * Options: start, maxBlock, blocksPerTrigger, trailBlocks,
  * numPartitions, fetcher, fetchChunk.
  * Usage: spark.readStream.format("blockrange").option(...).load()
  */
class BlockRangeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "blockrange"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlockRangeSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new BlockRangeTable(new CaseInsensitiveStringMap(properties))
}

object BlockRangeSource {
  val Schema: StructType = StructType(Seq(StructField("block_number", LongType, nullable = false)))
}

/** The seam where a real chain client plugs into the source: one call
  * fetches the rows of the block window [lo, hi). Implementations must
  * be serializable-by-name — the reader instantiates the class on the
  * executor (no closure shipping), the way a JSON-RPC client would be
  * constructed next to its connection pool. A fetcher signals an
  * over-wide window (provider response-size cap, the reference's
  * "query returned more than X results" error) by throwing
  * [[RangeTooLargeException]]; the reader reacts by shrinking its
  * window ÷10 and retrying. */
trait BlockFetcher {
  def fetch(lo: Long, hi: Long): Iterator[Long]
}

/** Optional mixin for any fetcher seam: after the no-arg executor-side
  * instantiation, the reader hands the implementation the source's full
  * option map (keys lower-cased by Spark's CaseInsensitiveStringMap).
  * This is how an RPC-backed fetcher learns its endpoints — the
  * reference passes provider URLs to its client constructors
  * (`evm/rpc.py:380-398`); a DSv2 fetcher instantiated by class name
  * gets the same wiring declaratively through reader options. */
trait ConfigurableFetcher {
  def configure(options: Map[String, String]): Unit
}

object ConfigurableFetcher {
  /** Configure `f` if it is configurable, with keys lower-cased first:
    * the reader path lower-cases through CaseInsensitiveStringMap, but
    * forName is also called with raw user maps (Calls.execute,
    * Crawl.fromChain fetcherOptions) where a documented camelCase key
    * like `callBatch` must not silently miss its lowercase lookup. */
  def apply[T](f: T, options: Map[String, String]): T = {
    f match {
      case c: ConfigurableFetcher =>
        // Locale.ROOT like CaseInsensitiveStringMap — a tr_TR default
        // locale would dotless-i a key like maxInFlight and silently
        // miss the lookup this helper exists to make reliable
        c.configure(options.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v })
      case _ => ()
    }
    f
  }
}

/** Optional mixin: a fetcher that can report the live chain head —
  * `eth_blockNumber` (`evm/rpc.py:119-126`). When a stream's fetcher
  * implements this, the micro-batch head is driven by the NODE's height
  * (rate-limited to `blocksPerTrigger` per poll, lagged by
  * `trailBlocks`) instead of the simulated fixed advance — the
  * reference tail's poll loop (`nft/bin/tail.py:90-204`). */
trait HeadAwareFetcher {
  def chainHead(): Long
}

/** Driver-side head probe: instantiate the fetcher class once and keep
  * a poll thunk if (and only if) it is head-aware. Simulated fetchers
  * are not — their streams keep the fixed per-poll advance. */
object ChainHead {
  def provider(fetcherClass: String, options: Map[String, String]): Option[() => Long] =
    if (fetcherClass == null || fetcherClass.isEmpty) None
    else Class.forName(fetcherClass).getDeclaredConstructor().newInstance() match {
      // configure ONCE at provider creation (the seam's contract);
      // the poll thunk only reads the head
      case h: HeadAwareFetcher =>
        val configured = ConfigurableFetcher(h, options)
        Some(() => configured.chainHead())
      case _ => None
    }

  /** Long-poll head probe (option `headWaitMs` > 0): re-probe the node
    * every `probeMs` until its tip reaches `atLeast` (= a new block
    * exists past the current offset) or the wait budget is spent,
    * returning the freshest height. `waitMs` <= 0 degenerates to one
    * probe — the polling default.
    *
    * This is what lets tail latency drop BELOW the stream's trigger
    * interval: with the default (back-to-back) trigger, the micro-batch
    * planner blocks briefly inside offset discovery and fires the
    * moment a block appears — instead of either spinning empty no-data
    * batches at full speed or waiting out a reference-style 10 s poll
    * interval (`tail.py --process-interval`). An interrupt (query
    * stop) ends the wait immediately. */
  def await(probe: () => Long, atLeast: Long, waitMs: Long, probeMs: Long): Long = {
    var h = probe()
    if (waitMs <= 0L || h >= atLeast) return h
    val deadline = System.nanoTime() + waitMs * 1000000L
    var interrupted = false
    while (h < atLeast && System.nanoTime() < deadline && !interrupted) {
      try Thread.sleep(math.max(1L, probeMs))
      catch { case _: InterruptedException => Thread.currentThread().interrupt(); interrupted = true }
      if (!interrupted) h = probe()
    }
    h
  }
}

final class RangeTooLargeException(msg: String) extends RuntimeException(msg)

/** Retryable throttle signal — the provider said "slow down" (HTTP 429
  * TooManyRequests in the reference, which backs off and replays the
  * in-flight request, `core/rpc.py:305-310,327-353`). Distinct from
  * [[RangeTooLargeException]]: a throttle means retry the SAME window
  * later, not a narrower one. */
final class ThrottledException(msg: String) extends RuntimeException(msg)

/** Default fetcher — the simulated chain (block ids generated locally). */
final class SimulatedFetcher extends BlockFetcher {
  override def fetch(lo: Long, hi: Long): Iterator[Long] = Iterator.range(lo, hi)
}

object BlockFetcher {
  val Simulated: String = classOf[SimulatedFetcher].getName
  def forName(className: String, options: Map[String, String] = Map.empty): BlockFetcher =
    ConfigurableFetcher(
      Class.forName(className).getDeclaredConstructor().newInstance().asInstanceOf[BlockFetcher],
      options)
}

final class BlockRangeTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "blockrange"
  override def schema(): StructType = BlockRangeSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ caseInsensitiveOptions.asScala).asJava)
    new BlockRangeScanBuilder(merged)
  }
}

/** Filter pushdown for the batch path: `block_number` range predicates
  * narrow the planned block window itself, so a query for blocks
  * [900, 950) of a billion-block chain plans (and FETCHES) exactly
  * that window — partition pruning at the source, the reference's
  * ranged `get_logs` semantics (`evm/rpc.py:289-377`). The narrowed
  * predicates are consumed exactly (the window is the predicate), so
  * Spark does not re-evaluate them post-scan; anything else stays a
  * residual filter. */
final class BlockRangeScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit {
  import org.apache.spark.sql.sources._
  private var lo = options.getLong("start", 0L)
  private var hi = options.getLong("maxBlock", 1000L)
  private var pushed: Array[Filter] = Array.empty

  // LIMIT n over a dense block range is exactly "the first n blocks of
  // the (filter-narrowed) window" — plan only those. Filters push
  // before limits in V2ScanRelationPushDown, so `lo` is final here.
  // isPartiallyPushed stays at its default (true): Spark keeps its own
  // limit operator, which costs nothing and stays safe if a future
  // fetcher returns sparse ranges.
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, math.max(lo, BlockWindow.satAdd(lo, limit.toLong)))
    true
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val n = BlockWindow.narrow(lo, hi, filters, "block_number")
    lo = n.lo; hi = n.hi; pushed = n.supported
    n.residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new BlockRangeScan(options, lo, hi)
}

/** Shared pushdown math for the block-keyed sources: range predicates on
  * the block column narrow the planned window itself. The narrowed
  * predicates are consumed exactly (the window IS the predicate), so
  * Spark does not re-evaluate them post-scan; anything else stays a
  * residual filter. */
object BlockWindow {
  import org.apache.spark.sql.sources._

  final case class Narrowed(lo: Long, hi: Long,
      supported: Array[Filter], residual: Array[Filter])

  // Pushed bounds are trusted (never re-evaluated post-scan), so boundary
  // values like `block_number <= Long.MaxValue` must saturate rather than
  // wrap to Long.MinValue and silently plan an empty window. Non-negative
  // deltas only: for d < 0 the guard itself would overflow and return a
  // silently saturated bound from what is really a subtraction.
  def satAdd(x: Long, d: Long): Long = {
    require(d >= 0, s"satAdd expects a non-negative delta, got $d")
    if (x > Long.MaxValue - d) Long.MaxValue else x + d
  }

  private def asLong(v: Any): Option[Long] = v match {
    case x: Long => Some(x)
    case x: Int => Some(x.toLong)
    case x: Short => Some(x.toLong)
    case x: Byte => Some(x.toLong)
    case _ => None
  }

  def narrow(lo0: Long, hi0: Long, filters: Array[Filter], column: String): Narrowed = {
    var lo = lo0
    var hi = hi0
    val (supported, residual) = filters.partition {
      case EqualTo(`column`, v) => asLong(v).isDefined
      case GreaterThan(`column`, v) => asLong(v).isDefined
      case GreaterThanOrEqual(`column`, v) => asLong(v).isDefined
      case LessThan(`column`, v) => asLong(v).isDefined
      case LessThanOrEqual(`column`, v) => asLong(v).isDefined
      case _ => false
    }
    supported.foreach {
      case EqualTo(_, v) =>
        val x = asLong(v).get; lo = math.max(lo, x); hi = math.min(hi, satAdd(x, 1L))
      case GreaterThan(_, v) => lo = math.max(lo, satAdd(asLong(v).get, 1L))
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, asLong(v).get)
      case LessThan(_, v) => hi = math.min(hi, asLong(v).get)
      case LessThanOrEqual(_, v) => hi = math.min(hi, satAdd(asLong(v).get, 1L))
      case _ => ()
    }
    Narrowed(lo, hi, supported, residual)
  }
}

final class BlockRangeScan(options: CaseInsensitiveStringMap,
    batchLo: Long, batchHi: Long) extends Scan {
  def this(options: CaseInsensitiveStringMap) =
    this(options, options.getLong("start", 0L), options.getLong("maxBlock", 1000L))
  private val blocksPerTrigger = options.getLong("blocksPerTrigger", 100L)
  private val trailBlocks = options.getLong("trailBlocks", 0L)
  private val numPartitions = options.getInt("numPartitions", 4)
  private val fetcherClass = options.getOrDefault("fetcher", BlockFetcher.Simulated)
  private val fetchChunk = options.getLong("fetchChunk", Long.MaxValue)
  private val fetcherOptions = options.asScala.toMap
  private val backoff = BackoffPolicy(
    options.getLong("throttleBaseMs", 50L),
    options.getLong("throttleCapMs", 5000L),
    options.getInt("throttleMaxRetries", 8))

  override def readSchema(): StructType = BlockRangeSource.Schema

  override def toBatch: Batch = new Batch {
    // [batchLo, batchHi) is the pushdown-narrowed window (equal to
    // [start, maxBlock) when no block_number predicates were pushed)
    override def planInputPartitions(): Array[InputPartition] =
      BlockRangePartitioning.split(batchLo, batchHi, numPartitions)
    override def createReaderFactory(): PartitionReaderFactory =
      BlockRangeReaderFactory(fetcherClass, fetchChunk, backoff, fetcherOptions)
  }

  // The narrowed window applies to the STREAM too: the builder consumed
  // the block_number predicates, so if the stream ignored [batchLo,
  // batchHi) a pushed filter would silently stop filtering. Honoring it
  // here keeps both paths' semantics identical to the un-pushed plan.
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BlockRangeMicroBatchStream(batchLo, batchHi, blocksPerTrigger, trailBlocks,
      numPartitions, fetcherClass, fetchChunk, backoff, fetcherOptions)
}

final case class BlockOffset(block: Long) extends Offset {
  override def json(): String = block.toString
}

/** Micro-batch tail over a block range: head height advances by
  * `blocksPerTrigger` per poll (a head-aware fetcher caps the advance at
  * the NODE's live height); the available offset is head − trail (never
  * below start). The offset arithmetic here (exclusive tip+1 bound,
  * trail floor, checkpoint fast-forward) is subtle and exists ONCE:
  * typed sources reuse this class with their own `readerFactory`
  * instead of copying the state machine. */
final class BlockRangeMicroBatchStream(start: Long, maxBlock: Long, blocksPerTrigger: Long,
                                       trailBlocks: Long, numPartitions: Int,
                                       fetcherClass: String = BlockFetcher.Simulated,
                                       fetchChunk: Long = Long.MaxValue,
                                       backoff: BackoffPolicy = BackoffPolicy(),
                                       fetcherOptions: Map[String, String] = Map.empty,
                                       readerFactory: Option[PartitionReaderFactory] = None)
    extends MicroBatchStream {
  private var head: Long = start
  // live chain-head polling when the fetcher supports it (RPC fetchers
  // do); the head still advances at most blocksPerTrigger per poll —
  // maxOffsetsPerTrigger-style admission control over a real node
  private lazy val headFn: Option[() => Long] = ChainHead.provider(fetcherClass, fetcherOptions)
  // long-poll opt-in (`headWaitMs`): see [[ChainHead.await]]
  private val headWaitMs = fetcherOptions.get("headwaitms").map(_.toLong).getOrElse(0L)
  private val headProbeMs = fetcherOptions.get("headprobems").map(_.toLong).getOrElse(200L)

  override def initialOffset(): Offset = BlockOffset(start)

  override def latestOffset(): Offset = {
    // eth_blockNumber reports the latest block NUMBER (inclusive tip);
    // offsets here are EXCLUSIVE upper bounds, so the reachable target
    // is head-number + 1 — without it the tip block is never fetched
    val target = headFn match {
      case Some(f) =>
        // long-poll only while the stream is caught up AND unbounded
        // ahead: a new block exists once tip-number >= head (exclusive)
        val wait = if (head >= maxBlock) 0L else headWaitMs
        math.min(maxBlock, BlockWindow.satAdd(
          ChainHead.await(f, atLeast = head, wait, headProbeMs), 1L))
      case None => maxBlock
    }
    // monotone even if a node briefly reports a lower height (reorg,
    // lagging replica): offsets never move backward
    head = math.max(head, math.min(target, BlockWindow.satAdd(head, math.max(0L, blocksPerTrigger))))
    BlockOffset(math.max(start, head - trailBlocks))
  }

  // Restart recovery: `head` is in-memory state, so a fresh instance
  // would reset it to `start` and plan empty batches until it re-advanced
  // past the committed offset — a stall of committed/blocksPerTrigger
  // polls. Offsets only reach deserializeOffset from the checkpoint log,
  // so fast-forward head past the restored position (+trail, since the
  // available offset lags head by trailBlocks); max() keeps this
  // monotone during normal processing.
  override def deserializeOffset(json: String): Offset = {
    val o = json.toLong
    head = math.max(head, math.min(maxBlock, BlockWindow.satAdd(o, math.max(0L, trailBlocks))))
    BlockOffset(o)
  }

  override def planInputPartitions(startOff: Offset, endOff: Offset): Array[InputPartition] =
    BlockRangePartitioning.split(
      startOff.asInstanceOf[BlockOffset].block,
      endOff.asInstanceOf[BlockOffset].block, numPartitions)

  override def createReaderFactory(): PartitionReaderFactory =
    readerFactory.getOrElse(
      BlockRangeReaderFactory(fetcherClass, fetchChunk, backoff, fetcherOptions))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Bounded exponential backoff for retryable throttles: sleep
  * `baseMs * 2^attempt` capped at `capMs`, give up (and rethrow, so the
  * task fails loudly and Spark's task retry takes over) after
  * `maxRetries` consecutive throttles. A successful fetch resets the
  * attempt counter — steady-state throttling re-probes at the base
  * delay, the reference's limiter behavior (`core/rpc.py:365-397`). */
final case class BackoffPolicy(baseMs: Long = 50L, capMs: Long = 5000L, maxRetries: Int = 8) {
  def delayMs(attempt: Int): Long =
    // the shift overflows Long well before 62 for any real baseMs —
    // saturate at capMs instead of handing Thread.sleep a negative
    if (baseMs <= 0) 0L
    else if (attempt >= 62 || baseMs >= (capMs >> math.min(attempt, 61))) capMs
    else math.min(capMs, baseMs << attempt)
}

final case class BlockRangePartition(lo: Long, hi: Long) extends InputPartition

object BlockRangePartitioning {
  /** split [lo, hi) into at most n contiguous ranges. Ceiling-division
    * without the `(total + n - 1)` addition: a window near
    * Long.MaxValue (the natural "unbounded" sentinel) would overflow it
    * negative, collapse `per` to 1, and try to plan one partition per
    * block — the same saturation discipline as satAdd elsewhere here. */
  def split(lo: Long, hi: Long, n: Int): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    val total = hi - lo
    val per = math.max(1L, total / n + (if (total % n == 0) 0L else 1L))
    // hi - a never overflows (0 <= a < hi); a + per can, near MaxValue
    (lo until hi by per)
      .map(a => BlockRangePartition(a, if (hi - a <= per) hi else a + per): InputPartition)
      .toArray
  }
}

/** Per-partition reader: drives the fetcher over [lo, hi) in
  * `initialChunk`-sized windows. A RangeTooLargeException shrinks the
  * window ÷10 (floor 1 block) and re-requests — the reference's
  * adaptive narrowing when a provider caps response size
  * (`evm/rpc.py:366-377`). The shrunk size sticks for the rest of the
  * partition: a provider that rejected a window once will reject its
  * siblings, so re-probing wide every chunk just burns a round-trip.
  * A ThrottledException replays the SAME window after a bounded
  * exponential backoff ([[BackoffPolicy]]) — the reference's 429
  * handling (`core/rpc.py:305-310,327-353`); `maxRetries` consecutive
  * throttles rethrow, failing the task loudly. */
final case class BlockRangeReaderFactory(fetcherClass: String, initialChunk: Long,
    backoff: BackoffPolicy = BackoffPolicy(),
    fetcherOptions: Map[String, String] = Map.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BlockRangePartition]
    val fetcher = BlockFetcher.forName(fetcherClass, fetcherOptions)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    new AdaptiveRangeReader[Long](p, fetcher.fetch, initialChunk, backoff,
      v => { row.update(0, v); row })
  }
}

/** The adaptive fetch loop shared by every block-keyed reader: drive a
  * window-fetch function over [p.lo, p.hi) in `initialChunk`-sized
  * windows, shrink ÷10 (floor 1) on RangeTooLarge — the shrunk size
  * sticks for the rest of the partition, since a provider that rejected
  * a window once will reject its siblings — and replay the SAME window
  * after bounded exponential backoff on Throttled, failing the task
  * loudly past `maxRetries` consecutive throttles. `toRow` converts one
  * fetched item; it may reuse a mutable row (the contract of
  * PartitionReader.get). */
final class AdaptiveRangeReader[T](p: BlockRangePartition,
    fetch: (Long, Long) => Iterator[T], initialChunk: Long,
    backoff: BackoffPolicy, toRow: T => InternalRow)
    extends PartitionReader[InternalRow] {
  private var chunk = math.max(1L, math.min(initialChunk, p.hi - p.lo))
  private var cur = p.lo
  private var it: Iterator[T] = Iterator.empty
  private var value: InternalRow = _
  private var throttles = 0
  override def next(): Boolean = {
    while (!it.hasNext && cur < p.hi) {
      val windowHi = math.min(cur + chunk, p.hi)
      try { it = fetch(cur, windowHi); cur = windowHi; throttles = 0 }
      catch {
        case _: RangeTooLargeException if chunk > 1 =>
          chunk = math.max(1L, chunk / 10)
        case t: ThrottledException =>
          if (throttles >= backoff.maxRetries) throw t
          Thread.sleep(backoff.delayMs(throttles))
          throttles += 1
      }
    }
    if (it.hasNext) { value = toRow(it.next()); true } else false
  }
  override def get(): InternalRow = value
  override def close(): Unit = ()
}
