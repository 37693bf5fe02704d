package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Reconcile

/** The reference's `verify` command (its largest file,
  * `nft/bin/verify.py`, 1137 lines of per-item probe loops) as one
  * declarative reconciliation job:
  *
  *  - transfers: chain logs vs DB facts — full-outer equi-join on the
  *    (block, tx, log) identity; both anti sides and per-field
  *    mismatches reported from the null/compare pattern (J2)
  *  - owners: each chain-derived owner must match exactly one DB row
  *    with the same quantity (J3)
  *  - counts: per-collection token counts vs the chain's totalSupply
  *    snapshot (A6)
  *
  * Each section returns a report DataFrame with a `check` tag; `run`
  * unions them so one action materializes the whole audit. At scale the
  * three joins shuffle on disjoint keys and run as independent stages.
  */
object VerifyPipeline {

  def transfersReport(chain: DataFrame, db: DataFrame): DataFrame =
    Reconcile.fullOuter(
        chain.select(col("collection_id"), col("token_id"), col("attribute_version"),
          col("from_"), col("to_"), col("quantity")),
        db.select(col("collection_id"), col("token_id"), col("attribute_version"),
          col("from_"), col("to_"), col("quantity")),
        keys = Seq("collection_id", "token_id", "attribute_version"),
        compareCols = Seq("from_", "to_", "quantity"))
      .filter(col("status") =!= "match")
      .select(lit("transfers").as("check"), col("collection_id"), col("token_id"),
        // mismatch rows name the differing fields — `mismatch:from_,to_`
        // — the reference verify's per-field granularity
        // (`nft/bin/verify.py:852-934`).
        concat(col("status"),
          when(size(col("mismatch_cols")) > 0,
            concat(lit(":"), array_join(col("mismatch_cols"), ","))).otherwise(lit("")))
          .as("detail"))

  def ownersReport(chainOwners: DataFrame, dbOwners: DataFrame): DataFrame = {
    val keys = Seq("collection_id", "token_id", "account")
    Reconcile.fullOuter(
        chainOwners.select((keys :+ "quantity").map(col): _*),
        dbOwners.select((keys :+ "quantity").map(col): _*),
        keys, Seq("quantity"))
      .filter(col("status") =!= "match")
      .select(lit("owners").as("check"), col("collection_id"), col("token_id"),
        col("status").as("detail"))
  }

  def countsReport(dbTokens: DataFrame, supplySnapshot: DataFrame): DataFrame = {
    // The natural snapshot source (Calls.interfaceSnapshot) keeps
    // total_supply as canonical 64-hex; comparing that against a bigint
    // via implicit coercion parses the hex DIGITS as decimal (16 reads
    // as 10) and nulls anything containing a-f — a silently wrong
    // audit. Convert by the column's actual type with the EXACT hex
    // kernel (builtin conv wraps at 2^64) and compare canonical decimal
    // renderings, which is overflow-free at any uint256 magnitude.
    val supplyDec = supplySnapshot.schema("total_supply").dataType match {
      case org.apache.spark.sql.types.StringType =>
        supplySnapshot.withColumn("total_supply",
          graft.expr.Exprs.hexToDec(col("total_supply")))
      case _ =>
        supplySnapshot.withColumn("total_supply", col("total_supply").cast("string"))
    }
    dbTokens.groupBy(col("collection_id")).agg(count(lit(1)).as("n_tokens"))
      .join(broadcast(supplyDec), Seq("collection_id"), "full_outer")
      .filter(!(col("n_tokens").cast("string") <=> col("total_supply")))
      .select(lit("counts").as("check"), col("collection_id"),
        lit(null).cast("string").as("token_id"),
        concat_ws("!=", col("n_tokens").cast("string"),
          col("total_supply")).as("detail"))
  }

  def run(chainTransfers: DataFrame, dbTransfers: DataFrame,
          chainOwners: DataFrame, dbOwners: DataFrame,
          dbTokens: DataFrame, supplySnapshot: DataFrame): DataFrame =
    transfersReport(chainTransfers, dbTransfers)
      .unionByName(ownersReport(chainOwners, dbOwners))
      .unionByName(countsReport(dbTokens, supplySnapshot))

  /** Per-token CURRENT-OWNER probe — the reference verify's
    * `get_current_owner` flow (`nft/bin/verify.py`: eth_call
    * `ownerOf(token_id)` per ERC-721 token, compared against the stored
    * owner). Requests build columnar off the db tokens table (ERC-1155
    * rows carry null current_owner and are skipped — 1155 has no
    * ownerOf), the [[graft.rpc.CallExecutor]] seam runs them (simulated
    * or JSON-RPC), and only disagreeing rows come back, in the shared
    * report shape:
    *  - `mismatch:db=…,chain=…` — the chain answers a different address
    *  - `unanswered` — the call reverted (token gone, or the contract
    *    is not the 721 the db claims)
    * Distribution: probes execute per partition through `mapPartitions`
    * (the one non-declarative hop, same as the S6 snapshot flow); the
    * compare is a key-join — a billion-token audit shuffles once.
    *
    * `erc721Collections` gates which tokens are probed — the reference
    * checks `contract_supports_erc721` BEFORE per-token ownerOf (a
    * non-721 contract legitimately reverts ownerOf, which must not read
    * as corruption). Pass the collections dim filtered to ERC-721. */
  def tokenOwnersReport(spark: SparkSession, dbTokens: DataFrame,
      erc721Collections: DataFrame,
      callExecutor: String = graft.rpc.CallExecutor.Simulated,
      options: Map[String, String] = Map.empty): DataFrame = {
    val sel = graft.expr.Keccak.functionSelector("ownerOf(uint256)")
    val owned = dbTokens.filter(col("current_owner").isNotNull)
      .join(broadcast(erc721Collections.select(col("collection_id")).distinct()),
        Seq("collection_id"), "left_semi")
      .select(col("collection_id"), col("token_id"), lower(col("current_owner")).as("db_owner"))
    val requests = owned.select(
      col("collection_id").as("to"),
      col("token_id").as("probe"), // the token id IS the correlation key
      concat(lit(sel), col("token_id")).as("data"))
    val answers = graft.rpc.Calls.execute(spark, requests, callExecutor, options)
      .select(col("to").as("collection_id"), col("probe").as("token_id"),
        // return payload is one 32-byte word; the address is its low 20
        when(col("result").isNotNull,
          lower(concat(lit("0x"), substring(col("result"), -40, 40)))).as("chain_owner"))
    owned.join(answers, Seq("collection_id", "token_id"), "left")
      .filter(col("chain_owner").isNull || col("chain_owner") =!= col("db_owner"))
      .select(lit("token_owner").as("check"), col("collection_id"), col("token_id"),
        when(col("chain_owner").isNull, lit("unanswered"))
          .otherwise(concat(lit("mismatch:db="), col("db_owner"),
            lit(",chain="), col("chain_owner"))).as("detail"))
  }

  /** Per-token METADATA-URL probe — the reference verify's tokenURI
    * check (`nft/bin/verify.py:188-202,686-690`: call
    * `tokenURI(token_id)` at the verify height per ERC-721 token and
    * compare against the stored metadata_url). Same columnar shape as
    * [[tokenOwnersReport]]; the chain answer is decoded and
    * `{id}`-canonicalized with the SAME rule the crawl applies
    * ([[graft.nft.TokenUris.fromMints]]) — the reference compares the
    * raw probe value, but our db stores the canonicalized form, so the
    * compare must too or every templated URI would read as corruption.
    * Disagreement rows (null-safe: null==null is clean):
    *  - `mismatch:db=…,chain=…` — including a null side rendered `-`
    * `blockHeight`: the verify command's ending block (the reference's
    * `self.__block_height`); None probes at the head. Tokens tables
    * without a metadata_url column (older DBs, tail token views) verify
    * as all-null db URLs rather than failing. */
  def tokenUrisReport(spark: SparkSession, dbTokens: DataFrame,
      erc721Collections: DataFrame,
      blockHeight: Option[Long] = None,
      callExecutor: String = graft.rpc.CallExecutor.Simulated,
      options: Map[String, String] = Map.empty): DataFrame = {
    val sel = graft.expr.Keccak.functionSelector("tokenURI(uint256)")
    val withUrl =
      if (dbTokens.columns.contains("metadata_url")) dbTokens
      else dbTokens.withColumn("metadata_url", lit(null).cast("string"))
    // probe a token iff the db CLAIMS a URL or its mint is in-window
    // (mint_block set) — the tokenOwnersReport precedent
    // (current_owner-null rows are skipped there): a transfer-only
    // token whose mint precedes the crawl window legitimately has no
    // stored URL, and flagging it would make every windowed verify
    // noisy rather than catching corruption
    val mintCol =
      if (withUrl.columns.contains("mint_block")) col("mint_block")
      else lit(null).cast("long")
    val tokens = withUrl
      .filter(col("metadata_url").isNotNull || mintCol.isNotNull)
      .join(broadcast(erc721Collections.select(col("collection_id")).distinct()),
        Seq("collection_id"), "left_semi")
      .select(col("collection_id"), col("token_id"), col("metadata_url").as("db_url"))
    val requests = tokens.select(
      col("collection_id").as("to"),
      col("token_id").as("probe"),
      concat(lit(sel), col("token_id")).as("data"),
      blockHeight.map(h => lit(h)).getOrElse(lit(null).cast("long")).as("block"))
    val answers = graft.rpc.Calls.execute(spark, requests, callExecutor, options)
      .select(col("to").as("collection_id"), col("probe").as("token_id"),
        when(col("result").isNotNull,
          graft.expr.Abi.decodeStringUdf(col("result"), lit(0))).as("chain_url"))
    tokens.join(answers, Seq("collection_id", "token_id"), "left")
      .withColumn("chain_url",
        regexp_replace(col("chain_url"), lit("\\{id\\}"), col("token_id")))
      // P10 cap mirrored from the crawl (`TokenUris.fromMints`,
      // `dynamodb.py:160-167`): the crawl REFUSED to store a URL over
      // 2048 chars, so a long chain answer must compare as null here —
      // otherwise every legitimately-uncapped-on-chain URL reads as
      // `mismatch:db=-` corruption forever
      .withColumn("chain_url",
        when(length(col("chain_url")) <= 2048, col("chain_url")))
      .filter(!(col("chain_url") <=> col("db_url")))
      .select(lit("token_uri").as("check"), col("collection_id"), col("token_id"),
        concat(lit("mismatch:db="), coalesce(col("db_url"), lit("-")),
          lit(",chain="), coalesce(col("chain_url"), lit("-"))).as("detail"))
  }

  /** The verify command FIXTURE-FREE: chain truth is re-derived through
    * the ranged-logs source — the reference verify's own access path
    * (`get_transfer_logs` = `get_logs(transfer topics, address=
    * collection)`, `nft/bin/verify.py:239-262`) — folded by `Derive`,
    * then reconciled against the database entity tables. `collectionId`
    * narrows the audit to one contract and PUSHES that predicate into
    * the RPC request itself (the logs source's address pushdown), so
    * verifying one collection against a billion-block chain fetches
    * only that collection's logs. Point `fetcherOptions` at endpoints
    * with [[graft.rpc.RpcLogsFetcher]] for a live chain. */
  def fromChain(spark: SparkSession, startBlock: Long, maxBlock: Long,
      dbTransfers: DataFrame, dbOwners: DataFrame,
      dbTokens: DataFrame, supplySnapshot: DataFrame,
      collectionId: Option[String] = None,
      logsFetcher: String = graft.sources.LogsFetcher.Simulated,
      numPartitions: Int = 4,
      fetcherOptions: Map[String, String] = Map.empty,
      dbUris: Option[DataFrame] = None,
      callExecutor: String = graft.rpc.CallExecutor.Simulated): DataFrame = {
    val base = spark.read.format("logs")
      .option("start", startBlock.toString).option("maxBlock", maxBlock.toString)
      .option("numPartitions", numPartitions.toString)
      .option("fetcher", logsFetcher)
    val logs0 = fetcherOptions.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
    val logs = collectionId.fold(logs0)(c => logs0.filter(col("address") === c))
    // Materialize the derived transfers ONCE: the transfers report and
    // the owners rollup both consume them, and without the checkpoint
    // each branch of the unioned report re-runs the live ranged-getLogs
    // sweep over the wire — double RPC cost and throttle exposure
    // (Crawl.fromChain stages its receipts for exactly this reason).
    // With a uris reconcile the RAW LOGS gain a second consumer
    // (uriUpdates) — checkpoint them too so the window is fetched once.
    val logsM = if (dbUris.isDefined) logs.localCheckpoint(true) else logs
    val chainTransfers = graft.nft.Derive.transfers(logsM).localCheckpoint(true)
    val chainOwners = graft.nft.Derive.owners(chainTransfers)
    val baseReport =
      run(chainTransfers, dbTransfers, chainOwners, dbOwners, dbTokens, supplySnapshot)
    dbUris.fold(baseReport) { du =>
      // chain truth for metadata = BOTH sources the crawl writes: URI
      // events from the window's logs and the per-mint tokenURI probes
      // (same derivations, same executor seam — verify re-walks the
      // crawl's own access paths, the reference verify's structure)
      val chainUris = graft.nft.Derive.uriUpdates(logsM)
        .unionByName(graft.nft.TokenUris.fromMints(spark, chainTransfers,
          callExecutor, fetcherOptions))
      baseReport.unionByName(urisReport(du, chainUris))
    }
  }

  /** Reconcile the URIS entity table against recomputed chain truth —
    * the reference verify's metadata checks at table grain
    * (`nft/bin/verify.py:706-727`: the stored metadata_url must match
    * the latest URI event, falling back to the contract probe). Both
    * sides LWW-collapse to the latest URL per (collection, token) on
    * metadata_url_version, then a J2-style full-outer with both anti
    * sides reported:
    *  - `missing:chain=…` — the chain emitted/answers a URL the db lost
    *  - `extra:db=…` — the db holds a URL chain truth never produced
    *  - `mismatch:db=…,chain=…` — both present, different (e.g. a stale
    *    LWW loser persisted) */
  def urisReport(dbUris: DataFrame, chainUris: DataFrame): DataFrame = {
    val keys = Seq("collection_id", "token_id")
    def latest(df: DataFrame, as: String) =
      graft.ops.Lww.merge(
        df.select(col("collection_id"), col("token_id"),
          col("metadata_url"), col("metadata_url_version")),
        keys, Seq("metadata_url_version"))
        .select(col("collection_id"), col("token_id"), col("metadata_url").as(as))
    latest(dbUris, "db_url").join(latest(chainUris, "chain_url"), keys, "full_outer")
      .filter(!(col("db_url") <=> col("chain_url")))
      .select(lit("uri").as("check"), col("collection_id"), col("token_id"),
        when(col("db_url").isNull, concat(lit("missing:chain="), col("chain_url")))
          .when(col("chain_url").isNull, concat(lit("extra:db="), col("db_url")))
          .otherwise(concat(lit("mismatch:db="), col("db_url"),
            lit(",chain="), col("chain_url"))).as("detail"))
  }
}
