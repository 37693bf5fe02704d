package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.ops.Lww

/** The crawl-shaped flagship pipeline (SURVEY.md §3.1 re-expressed as one
  * declarative DAG): scan -> topic filter (P2) -> payload decode (P3) ->
  * transfer classification (P4) -> synthetic version key (P5) ->
  * idempotent dedup (K8) -> replayed LWW merge (A4) -> per-key rollup
  * (A1). One shared scan, branch-free until the single aggregation
  * shuffle — the 15-stage asyncio bus collapses into a plan Catalyst can
  * pipeline in one codegen stage before the shuffle.
  */
object Crawl {

  def transfers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_type").isin("purchase", "click", "error"))
      .withColumn("k", graft.expr.Exprs.digitsInt(col("props"))) // native kernel, no regex/row
      .withColumn("from_u", col("user_id"))
      .withColumn("to_u", col("k") % 15)
      .withColumn("transaction_type",
        when(col("to_u") === 0, lit("burn"))
          .when(col("from_u") === 0, lit("mint"))
          .otherwise(lit("transfer")))
      .withColumn("attribute_version",
        col("event_id") * lit(1000000000L) + col("user_id") * lit(10000L) + col("k"))
      .dropDuplicates("attribute_version")
  }

  /** The reference crawl (`nft/bin/crawl.py:151-209`) FIXTURE-FREE: the
    * typed `blocks` source supplies the block-time dimension, the
    * `receipts` source's exploded logs feed the NFT derivation, and the
    * four entity tables come out of `Derive` — point the fetcher options
    * at an RPC-backed [[graft.sources.BlockDataFetcher]] /
    * [[graft.sources.ReceiptDataFetcher]] and this IS the production
    * crawl over a block range. Window pushdown applies to both sources,
    * so crawling blocks [startBlock, maxBlock) of a long chain fetches
    * exactly that range.
    *
    * Scale note: `Derive.tokens` broadcasts the block-time dim, which is
    * right for a crawl WINDOW (rows = blocks in range); a whole-chain
    * backfill at full height should stage blockTimes to a bucketed table
    * and let the join degrade to a co-located SMJ instead.
    *
    * `stageDir`: the four returned tables share the logs/transfers
    * lineage, so materializing all of them against a LIVE fetcher would
    * re-fetch the receipt window once per table (4x RPC cost, 4x
    * throttling exposure). Pass a staging directory and the fetched
    * logs + derived transfers are written to parquet ONCE, with every
    * table derived from the staged relations — the Load pattern. Leave
    * it None only when a single table will be consumed (or the fetcher
    * is local/simulated). */
  def fromChain(spark: SparkSession, startBlock: Long, maxBlock: Long,
      blocksFetcher: String = graft.sources.BlockDataFetcher.Simulated,
      receiptsFetcher: String = graft.sources.ReceiptDataFetcher.Simulated,
      numPartitions: Int = 4,
      stageDir: Option[String] = None): Map[String, DataFrame] = {
    def src(fmt: String, fetcher: String) = spark.read.format(fmt)
      .option("start", startBlock.toString).option("maxBlock", maxBlock.toString)
      .option("numPartitions", numPartitions.toString)
      .option("fetcher", fetcher).load()
    def staged(df: DataFrame, name: String): DataFrame = stageDir match {
      case Some(d) =>
        df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$d/$name")
        spark.read.parquet(s"$d/$name")
      case None => df
    }
    val blocks = src("blocks", blocksFetcher)
    val logs = staged(src("receipts", receiptsFetcher)
      .select(explode(col("logs")).as("l")).select(col("l.*")), "logs")
    val blockTimes = blocks.select(col("number"), col("timestamp"))
    val transfers = staged(graft.nft.Derive.transfers(logs), "transfers")
    Map(
      "transfers" -> transfers,
      "tokens" -> graft.nft.Derive.tokens(transfers, blockTimes),
      "owners" -> graft.nft.Derive.owners(transfers),
      "uris" -> graft.nft.Derive.uriUpdates(logs))
  }

  /** Replay the same range twice at two data versions, LWW-merge, then
    * roll up per-owner state — the reference's crawl+reprocess semantics
    * as one job. */
  def run(spark: SparkSession, dir: String): DataFrame = {
    val t = transfers(spark, dir)
    val v1 = t.withColumn("data_version", lit(1))
    val v2 = t.withColumn("data_version", lit(2))
    val merged = Lww.merge(v1.unionByName(v2),
      Seq("attribute_version"), Seq("data_version"))
    merged.groupBy(col("to_u").as("owner"))
      .agg(
        count(lit(1)).as("n_transfers"),
        sum(when(col("transaction_type") === "burn",
            -col("value").cast("decimal(18,2)"))
          .otherwise(col("value").cast("decimal(18,2)"))).cast("double").as("net_value"),
        max_by(col("transaction_type"), col("attribute_version")).as("last_type"),
        max(col("attribute_version")).as("last_version"))
  }
}
