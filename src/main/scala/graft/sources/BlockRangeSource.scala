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
  *
  * Options: start, maxBlock, blocksPerTrigger, trailBlocks, numPartitions.
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

final class BlockRangeTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "blockrange"
  override def schema(): StructType = BlockRangeSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ caseInsensitiveOptions.asScala).asJava)
    () => new BlockRangeScan(merged)
  }
}

final class BlockRangeScan(options: CaseInsensitiveStringMap) extends Scan {
  private val start = options.getLong("start", 0L)
  private val maxBlock = options.getLong("maxBlock", 1000L)
  private val blocksPerTrigger = options.getLong("blocksPerTrigger", 100L)
  private val trailBlocks = options.getLong("trailBlocks", 0L)
  private val numPartitions = options.getInt("numPartitions", 4)

  override def readSchema(): StructType = BlockRangeSource.Schema

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      BlockRangePartitioning.split(start, maxBlock, numPartitions)
    override def createReaderFactory(): PartitionReaderFactory = BlockRangeReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BlockRangeMicroBatchStream(start, maxBlock, blocksPerTrigger, trailBlocks, numPartitions)
}

final case class BlockOffset(block: Long) extends Offset {
  override def json(): String = block.toString
}

/** Simulated chain: head height advances by `blocksPerTrigger` per poll;
  * the available offset is head − trail (never below start). */
final class BlockRangeMicroBatchStream(start: Long, maxBlock: Long, blocksPerTrigger: Long,
                                       trailBlocks: Long, numPartitions: Int)
    extends MicroBatchStream {
  private var head: Long = start

  override def initialOffset(): Offset = BlockOffset(start)

  override def latestOffset(): Offset = {
    head = math.min(head + blocksPerTrigger, maxBlock)
    BlockOffset(math.max(start, head - trailBlocks))
  }

  override def deserializeOffset(json: String): Offset = BlockOffset(json.toLong)

  override def planInputPartitions(startOff: Offset, endOff: Offset): Array[InputPartition] =
    BlockRangePartitioning.split(
      startOff.asInstanceOf[BlockOffset].block,
      endOff.asInstanceOf[BlockOffset].block, numPartitions)

  override def createReaderFactory(): PartitionReaderFactory = BlockRangeReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class BlockRangePartition(lo: Long, hi: Long) extends InputPartition

object BlockRangePartitioning {
  /** split [lo, hi) into at most n contiguous ranges */
  def split(lo: Long, hi: Long, n: Int): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    val total = hi - lo
    val per = math.max(1L, (total + n - 1) / n)
    (lo until hi by per).map(a => BlockRangePartition(a, math.min(a + per, hi)): InputPartition).toArray
  }
}

object BlockRangeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BlockRangePartition]
    new PartitionReader[InternalRow] {
      private var cur = p.lo - 1
      private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      override def next(): Boolean = { cur += 1; cur < p.hi }
      override def get(): InternalRow = { row.update(0, cur); row }
      override def close(): Unit = ()
    }
  }
}
