package graft.nft

import graft.SparkSpec
import graft.rpc.{CallExecutor, StubRpcServer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** J5 live per-token `tokenURI` enrichment
  * (`nft/evm/consumers.py:328-374`, `nft/evm/transformers.py:379-431`):
  * mint-block probes through the CallExecutor seam, sim == RPC parity,
  * revert -> no row, `{id}` canonicalization, and the crawl wiring that
  * fills `metadata_url` for tokens on contracts that never emit URI
  * events — the reference behavior previously pinned only as a
  * snapshot-dim approximation. */
class TokenUrisSpec extends SparkSpec with BeforeAndAfterAll {

  private var stub: StubRpcServer = _
  override def beforeAll(): Unit = { stub = new StubRpcServer() }
  override def afterAll(): Unit = { if (stub != null) stub.stop(); super.afterAll() }

  private def hex64(n: Long): String = f"$n%064x"
  private def addr(n: Long): String = f"0x$n%040x"

  test("tokenURI(uint256) calldata uses the PUBLISHED selector 0xc87b56dd") {
    assert(graft.expr.Keccak.functionSelector("tokenURI(uint256)") === "0xc87b56dd")
  }

  /** Blocks [5, 7): block 5 is a mint block (5 %% 5 == 0, coll 4000,
    * tokens 50/51), block 6 transfers existing tokens — and NEITHER
    * block emits a URI event (n %% 7 == 3 misses both), so any
    * metadata_url here can only come from the live probe. */
  private def crawlWindow(stageless: Boolean = true): Map[String, DataFrame] =
    graft.pipelines.Crawl.fromChain(spark, 5, 7)

  test("crawl tokens get probed metadata_url on a URI-event-free window") {
    val tokens = crawlWindow()("tokens").collect()
    val byId = tokens.map(r => r.getAs[String]("token_id") -> r).toMap
    // token 50: plain URI (50 % 3 != 0)
    assert(byId(hex64(50)).getAs[String]("metadata_url") === "ipfs://sim/4000/50.json")
    // token 51: {id} template (51 % 3 == 0), canonicalized to the
    // 64-hex token id — the uriUpdates convention
    assert(byId(hex64(51)).getAs[String]("metadata_url") ===
      s"ipfs://sim/4000/${hex64(51)}.json")
  }

  test("crawl uris stream carries the probe rows versioned by the mint transfer") {
    val uris = crawlWindow()("uris").collect()
    assert(uris.nonEmpty)
    val t50 = uris.filter(_.getAs[String]("token_id") === hex64(50))
    assert(t50.length === 1)
    assert(t50.head.getAs[String]("metadata_url") === "ipfs://sim/4000/50.json")
    // version = the mint transfer's attribute_version (block 5, tx 0,
    // log 0 for token 50) — the same packed key Derive.attributeVersion
    // builds, so LWW against later URI events resolves correctly
    val mintVersion = crawlWindow()("transfers")
      .filter(col("token_id") === hex64(50) && col("transaction_type") === "mint")
      .head().getAs[String]("attribute_version")
    assert(t50.head.getAs[String]("metadata_url_version") === mintVersion)
  }

  test("sim == RPC parity: identical URI rows through the stub JSON-RPC transport") {
    val transfers = crawlWindow()("transfers")
    val sim = TokenUris.fromMints(spark, transfers).collect()
      .map(_.toString).sorted.toSeq
    stub.callBlockTags.clear()
    val rpc = TokenUris.fromMints(spark, transfers, CallExecutor.Rpc,
      Map("endpoints" -> stub.url)).collect().map(_.toString).sorted.toSeq
    assert(sim.nonEmpty && rpc === sim)
    // the wire carries the MINT BLOCK as the call's state height, not
    // "latest" (`consumers.py:338`: block=token.mint_block)
    val sel = graft.expr.Keccak.functionSelector("tokenURI(uint256)")
    val tags = stub.callBlockTags.toArray.toSeq
      .collect { case (s: String, t: String) if s == sel => t }
    assert(tags.nonEmpty && tags.forall(_ === "0x5"), s"tags=$tags")
  }

  test("reverting contracts (non-721 / unknown token) produce NO row, not a null row") {
    import spark.implicits._
    // 4001 = ERC-1155 per the sim (never probed: wrong collection_type);
    // 4004 = no ERC-165 (probe reverts); 4000 with a token whose block
    // doesn't map to it (probe reverts server-side)
    val transfers = Seq(
      (addr(4001), hex64(999), "ERC-1155", "mint", 5L, hex64(1)),
      (addr(4004), hex64(998), "ERC-721", "mint", 5L, hex64(2)),
      (addr(4000), hex64(11), "ERC-721", "mint", 1L, hex64(3))) // block 1 -> coll 4001
      .toDF("collection_id", "token_id", "collection_type", "transaction_type",
        "block_id", "attribute_version")
    assert(TokenUris.fromMints(spark, transfers).count() === 0)
    // and the enrich keeps such tokens with a null metadata_url
    val tokens = Seq((addr(4004), hex64(998))).toDF("collection_id", "token_id")
    val enriched = TokenUris.enrichTokens(tokens,
      TokenUris.fromMints(spark, transfers)).collect()
    assert(enriched.length === 1 && enriched.head.isNullAt(2))
  }

  test("verify tokenURI report: clean crawl db is silent, corruption and missing URLs flag") {
    import spark.implicits._
    val tables = graft.pipelines.Crawl.fromChain(spark, 0, 40)
    val erc721 = tables("collections")
      .filter(col("specification") === "ERC-721")
    val dbTokens = tables("tokens")
    // clean: every minted 721 token's stored URL matches the probe
    assert(graft.pipelines.VerifyPipeline.tokenUrisReport(spark, dbTokens, erc721,
      blockHeight = Some(40L)).count() === 0)
    // corrupt one stored URL -> exactly that token flags with both sides
    val victim = dbTokens.filter(col("metadata_url").isNotNull)
      .select("collection_id", "token_id").head()
    val corrupted = dbTokens.withColumn("metadata_url",
      when(col("collection_id") === victim.getString(0) &&
        col("token_id") === victim.getString(1), lit("ipfs://wrong"))
        .otherwise(col("metadata_url")))
    val rows = graft.pipelines.VerifyPipeline.tokenUrisReport(spark, corrupted, erc721,
      blockHeight = Some(40L)).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("check") === "token_uri")
    assert(rows.head.getAs[String]("token_id") === victim.getString(1))
    assert(rows.head.getAs[String]("detail").startsWith("mismatch:db=ipfs://wrong,chain="))
    // a MINTED token whose URL was lost flags too (db should have it)...
    val lost = dbTokens.withColumn("metadata_url",
      when(col("collection_id") === victim.getString(0) &&
        col("token_id") === victim.getString(1), lit(null).cast("string"))
        .otherwise(col("metadata_url")))
    assert(graft.pipelines.VerifyPipeline.tokenUrisReport(spark, lost, erc721,
      blockHeight = Some(40L)).count() === 1)
    // ...while transfer-only tokens (mint outside the window, null URL)
    // are skipped — the windowed-verify noise rule
    assert(dbTokens.filter(col("mint_block").isNull).count() > 0)
    // a tokens table WITHOUT the metadata_url column verifies as
    // all-null claims (older DBs / tail token views) instead of failing
    val bare = dbTokens.drop("metadata_url")
    val bareRows = graft.pipelines.VerifyPipeline.tokenUrisReport(spark, bare, erc721,
      blockHeight = Some(40L))
    // every minted 721 token now reads as db=- vs a chain answer
    assert(bareRows.count() ===
      dbTokens.filter(col("mint_block").isNotNull).join(
        erc721.select("collection_id"), Seq("collection_id"), "left_semi").count())
  }

  test("tokensWithLatestUrls: the reference's fully-updated token row reconstituted") {
    import spark.implicits._
    // window [5, 12): block 5 mints tokens 50/51 (probe-only URIs);
    // block 10 mints token 100 which gets BOTH a mint-probe URI and, at
    // n=10 (n%7==3), a URI EVENT — the event must win on the token it
    // touches, probe values must survive on the others
    val tables = graft.pipelines.Crawl.fromChain(spark, 5, 12)
    val view = TokenUris.tokensWithLatestUrls(tables("tokens"), tables("uris"))
      .collect().map(r => r.getAs[String]("token_id") -> r.getAs[String]("metadata_url")).toMap
    // token 100: URI event (version block10/tx0/log>0) > mint probe
    // (version block10/tx0/log0) -> the event URL wins
    assert(view(hex64(100)) === s"ipfs://sim/${hex64(100)}.json", view(hex64(100)))
    // tokens 50/51: no event — the probed URLs stand (51 exercises the
    // canonicalized {id} template)
    assert(view(hex64(50)) === "ipfs://sim/4000/50.json")
    assert(view(hex64(51)) === s"ipfs://sim/4000/${hex64(51)}.json")
    // column order identical to the tokens table (a drop-in reader)
    assert(TokenUris.tokensWithLatestUrls(tables("tokens"), tables("uris")).columns.toSeq
      === tables("tokens").columns.toSeq)
    // tokens tables WITHOUT metadata_url (tail token views) work too
    val bare = TokenUris.tokensWithLatestUrls(
      tables("tokens").drop("metadata_url"), tables("uris"))
    assert(bare.columns.contains("metadata_url"))
    assert(bare.collect().map(r => r.getAs[String]("token_id") -> r.getAs[String]("metadata_url"))
      .toMap.apply(hex64(100)) === s"ipfs://sim/${hex64(100)}.json")
  }

  test("urisReport: full-outer reconcile of the uris table (missing / extra / mismatch)") {
    import spark.implicits._
    val tables = crawlWindow()
    val dbUris = tables("uris")
    val chain = tables("uris") // recomputed truth == the same derivation here
    // clean: identical sides collapse to silence (multi-row histories
    // LWW-resolve before comparing)
    assert(graft.pipelines.VerifyPipeline.urisReport(dbUris, chain).count() === 0)
    val victim = dbUris.select("collection_id", "token_id").head()
    def forVictim(detailPrefix: String, mutated: org.apache.spark.sql.DataFrame): Unit = {
      val rows = graft.pipelines.VerifyPipeline.urisReport(mutated, chain).collect()
      assert(rows.length === 1, s"$detailPrefix: got ${rows.length} rows")
      assert(rows.head.getAs[String]("check") === "uri")
      assert(rows.head.getAs[String]("detail").startsWith(detailPrefix),
        rows.head.getAs[String]("detail"))
    }
    // mismatch: the db persisted a different URL for one token
    forVictim("mismatch:db=ipfs://stale", dbUris.withColumn("metadata_url",
      when(col("collection_id") === victim.getString(0) &&
        col("token_id") === victim.getString(1), lit("ipfs://stale"))
        .otherwise(col("metadata_url"))))
    // missing: the db lost the token's rows entirely
    forVictim("missing:chain=", dbUris.filter(
      !(col("collection_id") === victim.getString(0) &&
        col("token_id") === victim.getString(1))))
    // extra: the db holds a URL chain truth never produced
    forVictim("extra:db=ipfs://phantom", dbUris.unionByName(
      Seq((victim.getString(0), f"${999999L}%064x", "ipfs://phantom", f"${1L}%040x"))
        .toDF("collection_id", "token_id", "metadata_url", "metadata_url_version")))
  }

  test("re-minted token probes ONCE at the FIRST mint (min attribute_version)") {
    import spark.implicits._
    // same token minted twice (burn+remint replay): one probe, at the
    // first mint's block, versioned by the first mint — Derive.tokens'
    // mint_info convention
    val transfers = Seq(
      (addr(4000), hex64(50), "ERC-721", "mint", 10L, hex64(20)),
      (addr(4000), hex64(50), "ERC-721", "mint", 5L, hex64(10)))
      .toDF("collection_id", "token_id", "collection_type", "transaction_type",
        "block_id", "attribute_version")
    val rows = TokenUris.fromMints(spark, transfers).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("metadata_url_version") === hex64(10))
  }
}
