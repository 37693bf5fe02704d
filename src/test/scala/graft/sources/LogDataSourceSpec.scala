package graft.sources

import java.util.concurrent.atomic.AtomicReference

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Wraps the simulated logs endpoint and records the options the reader
  * handed the fetcher — proof of WHAT was pushed into the fetch. */
class RecordingLogsFetcher extends LogsFetcher with ConfigurableFetcher {
  private val inner = new SimulatedLogsFetcher
  override def configure(options: Map[String, String]): Unit = {
    RecordingLogsFetcher.last.set(options)
    inner.configure(options)
  }
  override def fetchLogs(lo: Long, hi: Long): Iterator[graft.model.EvmLog] =
    inner.fetchLogs(lo, hi)
}
object RecordingLogsFetcher {
  val last = new AtomicReference[Map[String, String]](Map.empty)
}

class LogDataSourceSpec extends SparkSpec {

  private def logsDf(maxBlock: Long, opts: Map[String, String] = Map.empty) = {
    val base = spark.read.format("logs")
      .option("start", "0").option("maxBlock", maxBlock.toString)
      .option("numPartitions", "2")
    opts.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  // one transfer log per simulated transaction, plus one URI event on
  // the first tx of every 7th block (n % 7 == 3, needs a tx to exist)
  private def nLogs(r: Range) = r.map(_ % 3).sum + nUriLogs(r)
  private def nUriLogs(r: Iterable[Int]) = r.count(n => n % 7 == 3 && n % 3 != 0)

  test("ranged logs read: the window's logs with the EvmLog schema") {
    val df = logsDf(60)
    assert(df.count() === nLogs(0 until 60))
    assert(df.schema.fieldNames.toSeq === Seq("removed", "log_index", "transaction_index",
      "transaction_hash", "block_hash", "block_number", "address", "data", "topics"))
    // block_number window pushdown narrows the fetch like every other
    // block-keyed source
    assert(df.filter(col("block_number") >= 20 && col("block_number") < 30).count() ===
      nLogs(20 until 30))
  }

  test("address equality filter pushes INTO the fetch (server-side narrowing)") {
    RecordingLogsFetcher.last.set(Map.empty)
    val a4000 = f"0x${4000L}%040x" // collection(n) for n % 5 == 0
    val df = logsDf(60, Map("fetcher" -> classOf[RecordingLogsFetcher].getName))
      .filter(col("address") === a4000)
    // blocks 0,5,10,...,55 carry that collection: txCounts 0,2,1
    // repeating, plus that collection's URI events
    assert(df.count() === (0 until 60 by 5).map(_ % 3).sum + nUriLogs(0 until 60 by 5))
    // the fetcher received the predicate — the node filters, not Spark
    assert(RecordingLogsFetcher.last.get().get("pushed.address") === Some(a4000))
  }

  test("pushed address predicate is fully consumed: zero residual Filter in the plan") {
    val a4000 = f"0x${4000L}%040x"
    val df = logsDf(40).filter(col("address") === a4000)
    // equality AND its derived IsNotNull push into the fetch, so the
    // physical plan is scan-only — no post-scan re-evaluation
    val residual = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(residual.isEmpty, s"residual filters: ${residual.mkString("; ")}")
    assert(df.count() === (0 until 40 by 5).map(_ % 3).sum + nUriLogs(0 until 40 by 5))
  }

  test("mixed-case address literal is NOT consumed: residual filter keeps strict equality") {
    // eth_getLogs nodes match addresses case-insensitively and return
    // lowercase rows; consuming a checksummed literal would return rows
    // the literal does not equal. It stays a residual filter instead.
    val checksummed = "0x" + "0" * 36 + "0FA0" // mixed case
    val df = logsDf(40).filter(col("address") === checksummed)
    val residual = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(residual.nonEmpty, "mixed-case equality must stay a residual filter")
    assert(df.count() === 0) // chain addresses are lowercase: strict equality finds none
  }

  test("conflicting address equalities (unsatisfiable conjunction) return empty, not last-wins") {
    val a = f"0x${4000L}%040x"
    val b = f"0x${4001L}%040x"
    val df = logsDf(40).filter(col("address") === a).filter(col("address") === b)
    assert(df.count() === 0)
  }

  test("topic0 narrowing via option matches the wire API semantics") {
    val sig = graft.nft.Derive.Erc721TransferSig
    // the topic filter keeps only the transfer logs — URI events drop
    assert(logsDf(40, Map("topic0" -> sig)).count() === (0 until 40).map(_ % 3).sum)
    assert(logsDf(40, Map("topic0" -> ("0x" + "ee" * 32))).count() === 0)
  }

  test("logs source streams: micro-batch tail of a contract's logs") {
    val a4000 = f"0x${4000L}%040x"
    val ckpt = java.nio.file.Files.createTempDirectory("logs_ckpt").toString
    val q = spark.readStream.format("logs")
      .option("start", "0").option("maxBlock", "60")
      .option("blocksPerTrigger", "20")
      .option("address", a4000)
      .load()
      .select(col("block_number"), col("address"))
      .writeStream.outputMode("append")
      .format("memory").queryName("logs_tail_out")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql(
      "SELECT count(*) n, count(DISTINCT address) a FROM logs_tail_out").head()
    assert(got.getLong(0) === (0 until 60 by 5).map(_ % 3).sum + nUriLogs(0 until 60 by 5))
    assert(got.getLong(1) === 1L)
  }
}
