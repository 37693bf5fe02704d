package graft.cli

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Every operator subcommand driven end-to-end on the fixture chain —
  * the CLI is a thin veneer over the pipeline objects, so each test
  * pins (a) the argument/option mapping and (b) equality with the
  * library call it wraps. */
class MainCliSpec extends SparkSpec {

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toString).sorted.toSeq

  test("crawl: writes the five entity tables; --increment-data-version bumps through the config store") {
    val out = tmp("cli_crawl"); val cfg = tmp("cli_cfg")
    assert(Main.run(spark, Seq("crawl", "0", "40", "--out", out,
      "--increment-data-version", "--config", cfg)) === 0)
    Seq("collections", "transfers", "tokens", "owners", "uris").foreach { t =>
      assert(new java.io.File(s"$out/$t").exists(), s"missing table $t")
    }
    assert(spark.read.parquet(s"$out/collections")
      .select("data_version").head().getInt(0) === 1)
    // the CLI wraps Crawl.fromChain exactly
    val lib = graft.pipelines.Crawl.fromChain(spark, 0, 40, dataVersion = 1)
    assert(rows(spark.read.parquet(s"$out/transfers")) === rows(lib("transfers")))
    // a re-crawl with the flag lands the bumped version
    assert(Main.run(spark, Seq("crawl", "0", "40", "--out", out,
      "--increment-data-version", "--config", cfg)) === 0)
    assert(spark.read.parquet(s"$out/collections")
      .select("data_version").head().getInt(0) === 2)
  }

  test("crawl over RPC endpoints stages the fetched window once (no per-table re-fetch)") {
    val out = tmp("cli_rpc_crawl")
    val stub = new graft.rpc.StubRpcServer()
    try {
      assert(Main.run(spark, Seq("crawl", "0", "30", "--out", out,
        "--evm-rpc-nodes", stub.url)) === 0)
      // the auto-chosen stage under --out is an implementation detail:
      // it must be gone once the real tables land (a user-supplied
      // --stage-dir is kept; covered by the assertion below that the
      // staged lineage really fed the tables before cleanup)
      assert(!new java.io.File(s"$out/.stage").exists(),
        "defaulted stage directory survived the crawl")
      // wire cost stayed linear (blocks + hash lists + receipts +
      // probes); materializing five tables off one live lineage would
      // have multiplied it several-fold
      val totalTx = (0L until 30L).map(graft.sources.SimulatedReceiptFetcher.receiptsOf(_).size).sum
      assert(stub.rpcRequests.get() <= 30 + 30 + totalTx + 6 * 30 + 10,
        s"${stub.rpcRequests.get()} wire entries — the crawl re-fetched its window")
      assert(spark.read.parquet(s"$out/transfers").count() === (0L until 30L).map(_ % 3).sum)
    } finally stub.stop()
  }

  test("crawl over a ws:// endpoint == crawl over http (the reference's native form)") {
    // the reference documents websocket endpoints as THE deployment mode
    // (`core/rpc.py:108`); a user pasting a wss URL into --evm-rpc-nodes
    // must get the identical crawl, transport swapped under the seam
    val outWs = tmp("cli_ws_crawl"); val outHttp = tmp("cli_http_crawl")
    val inner = new graft.rpc.StubRpcServer()
    val ws = new graft.rpc.StubWsRpcServer(inner)
    try {
      // no cache reset needed: each stub binds a fresh port, so the
      // per-JVM client cache key (endpoint list) is unique per run
      assert(Main.run(spark, Seq("crawl", "0", "30", "--out", outWs,
        "--evm-rpc-nodes", ws.url)) === 0)
      assert(Main.run(spark, Seq("crawl", "0", "30", "--out", outHttp,
        "--evm-rpc-nodes", inner.url)) === 0)
      for (table <- Seq("transfers", "tokens", "owners"))
        assert(rows(spark.read.parquet(s"$outWs/$table")) ===
          rows(spark.read.parquet(s"$outHttp/$table")), s"$table differs across transports")
      assert(ws.handshakes.get() >= 1, "the ws transport was never used")
    } finally { ws.stop(); inner.stop() }
  }

  test("seed then tail --once: the stream starts at the bookmark and lands in the LWW sink") {
    val out = tmp("cli_tail"); val cfg = tmp("cli_cfg2"); val ckpt = tmp("cli_ckpt")
    // hex accepted like the reference's HexIntParamType
    assert(Main.run(spark, Seq("seed", "0x13", "--config", cfg)) === 0)
    assert(graft.ops.SinkUtils.readLastBlock(spark, s"$cfg/last_block", "ethereum-mainnet")
      === Some(19L))
    assert(Main.run(spark, Seq("tail", "--once", "--out", out, "--config", cfg,
      "--checkpoint", ckpt, "--max-block", "60", "--blocks-per-trigger", "25")) === 0)
    // bookmark 19 -> stream starts at 20; bounded at 60
    val got = spark.read.parquet(s"$out/transfers")
    val expect = graft.pipelines.Crawl.fromChain(spark, 20, 60)("transfers")
    assert(got.count() === expect.count())
    assert(got.agg(min(col("block_id")), max(col("block_id"))).head() ===
      org.apache.spark.sql.Row(20L, 59L))
    // tail without a bookmark or --start refuses loudly
    val emptyCfg = tmp("cli_cfg3")
    assert(Main.run(spark, Seq("tail", "--once", "--out", out, "--config", emptyCfg,
      "--checkpoint", tmp("cli_ckpt2"), "--max-block", "30")) === 2)
    // --start must short-circuit the bookmark lookup: the same
    // bookmarkless config with an explicit start runs fine
    val out2 = tmp("cli_tail_start")
    assert(Main.run(spark, Seq("tail", "--once", "--out", out2, "--config", emptyCfg,
      "--checkpoint", tmp("cli_ckpt3"), "--start", "20", "--max-block", "30")) === 0)
    assert(spark.read.parquet(s"$out2/transfers")
      .agg(min(col("block_id")), max(col("block_id"))).head() ===
      org.apache.spark.sql.Row(20L, 29L))
  }

  test("tail --merge-format log + compact: converges with the bucket sink") {
    val outB = tmp("cli_mf_b"); val outL = tmp("cli_mf_l"); val cfg = tmp("cli_mf_cfg")
    assert(Main.run(spark, Seq("seed", "19", "--config", cfg)) === 0)
    def tailInto(out: String, extra: String*) =
      Main.run(spark, Seq("tail", "--once", "--out", out, "--config", cfg,
        "--checkpoint", tmp("cli_mf_ck"), "--max-block", "50") ++ extra)
    assert(tailInto(outB) === 0)
    assert(tailInto(outL, "--merge-format", "log") === 0)
    // invalid format refuses loudly
    assert(tailInto(tmp("cli_mf_x"), "--merge-format", "delta") === 2)
    // --compact-every without the log format refuses loudly
    assert(tailInto(tmp("cli_mf_y"), "--compact-every", "2") === 2)
    // auto-compaction inside the stream: multi-epoch tail whose final
    // epoch count is a multiple of --compact-every ends fully folded —
    // the stored table equals the bucket sink's state WITHOUT a manual
    // compact step (5 triggers of 4 blocks => epochs 0..4, folds at 1,3
    // and a tail fold at 4... epochs are 0-indexed: folds after 1 and 3;
    // epoch 4 appends, so one epoch of log may remain on top of the fold)
    val outA = tmp("cli_mf_a")
    assert(tailInto(outA, "--merge-format", "log", "--compact-every", "2",
      "--blocks-per-trigger", "4") === 0)
    assert(Main.run(spark, Seq("compact", "--out", outA)) === 0)
    assert(Main.run(spark, Seq("compact", "--out", outL)) === 0)
    // after compaction the log table holds one stored row per fact and
    // reads equal the bucket sink's state, column for column
    def state(out: String) = spark.read.parquet(s"$out/transfers")
      .drop("__bucket").collect().map(_.toString).sorted.toSeq
    assert(state(outL) === state(outB))
    assert(state(outL).nonEmpty)
    // the auto-compacted multi-epoch tail converged to the same state
    assert(state(outA) === state(outB))
  }

  test("tail --owners-view: the owner-balance view converges with the batch rollup") {
    val out = tmp("cli_ov"); val cfg = tmp("cli_ov_cfg")
    assert(Main.run(spark, Seq("seed", "19", "--config", cfg)) === 0)
    // 10-block triggers -> four epochs of additive merge
    assert(Main.run(spark, Seq("tail", "--once", "--owners-view", "--out", out,
      "--config", cfg, "--checkpoint", tmp("cli_ov_ck"), "--max-block", "60",
      "--blocks-per-trigger", "10")) === 0)
    def s(df: org.apache.spark.sql.DataFrame) = df
      .select("blockchain", "collection_id", "token_id", "account", "quantity")
      .collect().map(_.toString).sorted.toSeq
    val view = s(graft.streaming.Tail.readOwners(spark, s"$out/owners"))
    val batch = s(graft.nft.Derive.owners(
      graft.pipelines.Crawl.fromChain(spark, 20, 60)("transfers")))
    assert(view === batch)
    assert(view.nonEmpty)
    // the facts sink ran too
    assert(spark.read.parquet(s"$out/transfers").count() > 0)
  }

  test("tail --tokens-view: the token-state view converges with the batch rollup") {
    val out = tmp("cli_tv"); val cfg = tmp("cli_tv_cfg")
    val blockTimes = spark.read.format("blocks")
      .option("start", "0").option("maxBlock", "60").load()
      .select(col("number"), col("timestamp"))
    val csv = tmp("cli_tv_csv") + "/cache"
    blockTimes.coalesce(1).write.option("header", "true").csv(csv)
    assert(Main.run(spark, Seq("seed", "19", "--config", cfg)) === 0)
    // without the dim the flag refuses loudly
    assert(Main.run(spark, Seq("tail", "--once", "--tokens-view", "--out", out,
      "--config", cfg, "--checkpoint", tmp("cli_tv_ck0"), "--max-block", "60")) === 2)
    assert(Main.run(spark, Seq("tail", "--once", "--tokens-view", "--out", out,
      "--config", cfg, "--checkpoint", tmp("cli_tv_ck"), "--max-block", "60",
      "--blocks-per-trigger", "10", "--block-time-cache", csv)) === 0)
    def s(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).sorted.toSeq
    val view = s(graft.streaming.Tail.readTokens(spark, s"$out/tokens"))
    val batch = s(graft.nft.Derive.tokens(
      graft.pipelines.Crawl.fromChain(spark, 20, 60)("transfers"), blockTimes))
    assert(view === batch)
    assert(view.nonEmpty)
  }

  test("tail --uris-view: latest-metadata-URL view is the LWW collapse of the uri updates") {
    val out = tmp("cli_uv"); val cfg = tmp("cli_uv_cfg")
    assert(Main.run(spark, Seq("seed", "19", "--config", cfg)) === 0)
    assert(Main.run(spark, Seq("tail", "--once", "--uris-view", "--out", out,
      "--config", cfg, "--checkpoint", tmp("cli_uv_ck"), "--max-block", "60",
      "--blocks-per-trigger", "10")) === 0)
    val view = spark.read.parquet(s"$out/uris").drop("__bucket")
      .collect().map(_.toString).sorted.toSeq
    // expected: the crawl's uri-update FACTS collapsed to the latest per
    // (collection, token) — K3 semantics
    val facts = graft.pipelines.Crawl.fromChain(spark, 20, 60)("uris")
    val expect = facts.groupBy(col("collection_id"), col("token_id"))
      .agg(max_by(struct(facts.columns.map(col).toIndexedSeq: _*),
        col("metadata_url_version")).as("r"))
      .select(col("r.*")).collect().map(_.toString).sorted.toSeq
    assert(view === expect)
    assert(view.nonEmpty)
  }

  test("tail --collections-view: probed collections converge with the batch crawl") {
    val out = tmp("cli_cv"); val cfg = tmp("cli_cv_cfg")
    val csv = tmp("cli_cv_csv") + "/cache"
    spark.read.format("blocks").option("start", "0").option("maxBlock", "60").load()
      .select(col("number"), col("timestamp"))
      .coalesce(1).write.option("header", "true").csv(csv)
    assert(Main.run(spark, Seq("seed", "19", "--config", cfg)) === 0)
    assert(Main.run(spark, Seq("tail", "--once", "--collections-view", "--out", out,
      "--config", cfg, "--checkpoint", tmp("cli_cv_ck"), "--max-block", "60",
      "--blocks-per-trigger", "10", "--block-time-cache", csv)) === 0)
    def s(df: org.apache.spark.sql.DataFrame) = df.drop("__bucket")
      .collect().map(_.toString).sorted.toSeq
    val view = s(spark.read.parquet(s"$out/collections"))
    val batch = s(graft.pipelines.Crawl.fromChain(spark, 20, 60)("collections"))
    assert(view === batch)
    assert(view.nonEmpty)
  }

  test("tail with ALL views over RPC: wire cost is the plain tail plus probe calls only") {
    val out = tmp("cli_av"); val cfg = tmp("cli_av_cfg")
    val csv = tmp("cli_av_csv") + "/cache"
    spark.read.format("blocks").option("start", "0").option("maxBlock", "50").load()
      .select(col("number"), col("timestamp"))
      .coalesce(1).write.option("header", "true").csv(csv)
    assert(Main.run(spark, Seq("seed", "19", "--config", cfg)) === 0)
    val stub = new graft.rpc.StubRpcServer()
    try {
      assert(Main.run(spark, Seq("tail", "--once", "--owners-view", "--tokens-view",
        "--uris-view", "--collections-view", "--out", out, "--config", cfg,
        "--checkpoint", tmp("cli_av_ck"), "--max-block", "50", "--blocks-per-trigger", "10",
        "--block-time-cache", csv, "--evm-rpc-nodes", stub.url)) === 0)
      // every view derives from the ONE receipts fetch per window: the
      // views must add ZERO extra block/receipt wire calls...
      val totalTx = (20L until 50L).map(graft.sources.SimulatedReceiptFetcher.receiptsOf(_).size).sum
      assert(stub.countOf("eth_getTransactionReceipt") === totalTx,
        s"receipts re-fetched: ${stub.countOf("eth_getTransactionReceipt")} vs $totalTx tx")
      assert(stub.countOf("eth_getBlockByNumber") <= 30 + 10,
        "hash-list fetches exceed the window (a view re-scanned blocks)")
      // ...except the collection probes (6 calls per created contract)
      // and ONE tokenURI probe per minted token (the uris view's J5
      // mint-block enrichment — eager-checkpointed, so the isEmpty gate
      // and the sink write share a single probe round per epoch)
      val creations = (20L until 50L).flatMap(graft.sources.SimulatedReceiptFetcher.receiptsOf)
        .count(_.contract_address.isDefined)
      val mintTokens = (20L until 50L).filter(_ % 5 == 0)
        .map(graft.sources.SimulatedReceiptFetcher.receiptsOf(_).size).sum
      assert(stub.countOf("eth_call") === 6 * creations + mintTokens,
        s"eth_call=${stub.countOf("eth_call")} creations=$creations mints=$mintTokens")
      // and all five tables materialized
      Seq("transfers", "owners", "tokens", "uris", "collections").foreach { t =>
        assert(spark.read.parquet(s"$out/$t").count() > 0, s"empty view $t")
      }
    } finally stub.stop()
  }

  test("force: single-contract backfill equals the library forceLoad") {
    val out = tmp("cli_force")
    val coll = f"0x${4000L}%040x" // fixture contract created at block 35
    assert(Main.run(spark, Seq("force", coll, "35", "50", "--out", out)) === 0)
    val collections = spark.read.parquet(s"$out/collections").collect()
    assert(collections.length === 1)
    assert(collections.head.getAs[String]("collection_id") === coll)
    assert(collections.head.getAs[String]("specification") === "ERC-721")
    val blockTimes = spark.read.format("blocks")
      .option("start", "35").option("maxBlock", "50").load()
      .select(col("number"), col("timestamp"))
    val lib = graft.pipelines.Crawl.forceLoad(spark, coll, 35, 50, blockTimes)
    assert(rows(spark.read.parquet(s"$out/transfers")) === rows(lib("transfers")))
  }

  test("verify: clean db reconciles transfers/owners; a dropped fact is flagged") {
    val db = tmp("cli_db")
    assert(Main.run(spark, Seq("crawl", "0", "40", "--out", db)) === 0)
    val rpt1 = tmp("cli_rpt") + "/clean"
    Main.run(spark, Seq("verify", "0", "40", "--db", db, "--out", rpt1))
    val clean = spark.read.parquet(rpt1)
    // transfers and owners reconcile exactly; the counts section audits
    // db token counts against the chain's totalSupply PROBE (the
    // reference's check) — fixture supplies intentionally disagree
    assert(clean.filter(col("check").isin("transfers", "owners")).count() === 0)
    // corrupt: drop one transfer fact
    val all = spark.read.parquet(s"$db/transfers")
    val dropped = all.orderBy(col("attribute_version")).limit(1)
      .collect().head.getAs[String]("attribute_version")
    all.filter(col("attribute_version") =!= dropped).localCheckpoint(true)
      .write.mode("overwrite").parquet(s"$db/transfers")
    val rpt2 = tmp("cli_rpt2") + "/corrupt"
    val code = Main.run(spark, Seq("verify", "0", "40", "--db", db, "--out", rpt2))
    assert(code === 1) // discrepancies -> non-zero, scriptable
    val flagged = spark.read.parquet(rpt2).filter(col("check") === "transfers").collect()
    assert(flagged.length === 1 && flagged.head.getAs[String]("detail") === "left_only")
  }

  test("verify resolves a log-format transfers table: replayed epochs are not discrepancies") {
    val db = tmp("cli_db_log")
    assert(Main.run(spark, Seq("crawl", "0", "40", "--out", db)) === 0)
    val facts = spark.read.parquet(s"$db/transfers").localCheckpoint(true)
    // rewrite the same facts as an epoch LOG with a replayed epoch
    val p = new org.apache.hadoop.fs.Path(s"$db/transfers")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val keys = Seq("collection_id", "token_id", "attribute_version")
    val fmt = new graft.streaming.Tail.LogAppendFormat(4)
    val e1 = facts.filter(col("block_id") < 20)
    val e2 = facts.filter(col("block_id") >= 20)
    Seq(e1, e2, e2).zipWithIndex.foreach { case (e, i) =>
      graft.streaming.Tail.mergeSink(s"$db/transfers", keys,
        Seq("attribute_version"), fmt)(e, i.toLong)
    }
    assert(spark.read.parquet(s"$db/transfers").count() > facts.count()) // really a log
    val rpt = tmp("cli_rpt_log") + "/r"
    Main.run(spark, Seq("verify", "0", "40", "--db", db, "--out", rpt))
    assert(spark.read.parquet(rpt)
      .filter(col("check").isin("transfers", "owners")).count() === 0)
  }

  test("load: bulk backfill writes the three rollup tables") {
    val out = tmp("cli_load")
    assert(Main.run(spark, Seq("load", "/root/testdata/sf0.001", "--out", out)) === 0)
    Seq("transfers", "tokens", "owners").foreach { t =>
      assert(spark.read.parquet(s"$out/$t").count() > 0, s"empty table $t")
    }
  }

  test("validation: the reference's param-type errors map to exit 2") {
    val out = tmp("cli_bad")
    // not an integer
    assert(Main.run(spark, Seq("crawl", "ten", "20", "--out", out)) === 2)
    // negative block
    assert(Main.run(spark, Seq("seed", "-5", "--config", out)) === 2)
    // empty range
    assert(Main.run(spark, Seq("crawl", "20", "20", "--out", out)) === 2)
    // malformed address
    assert(Main.run(spark, Seq("force", "0x1234", "35", "50", "--out", out)) === 2)
    // missing required option
    assert(Main.run(spark, Seq("crawl", "0", "10")) === 2)
    // wrong arity
    assert(Main.run(spark, Seq("crawl", "0")) === 2)
    // unknown option is loud, not ignored
    assert(Main.run(spark, Seq("crawl", "0", "10", "--out", out, "--chunk", "5")) === 2)
    // unknown command
    assert(Main.run(spark, Seq("reseed")) === 2)
    // option without value
    assert(Main.run(spark, Seq("crawl", "0", "10", "--out")) === 2)
    // missing db tables -> clean exit, not a stack trace
    assert(Main.run(spark, Seq("verify", "0", "10", "--db", tmp("cli_nodb"))) === 2)
  }

  test("digest: eth_call selector, --log-topic full hash (reference function_digest)") {
    def captured(args: Seq[String]): String = {
      val bos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bos)) {
        assert(Main.run(spark, args) === 0)
      }
      bos.toString.trim
    }
    // the reference docstring's own example (evm/bin.py:25-31)
    assert(captured(Seq("digest", "supportsInterface(bytes4)")) === "0x01ffc9a7")
    // the canonical ERC-20/721 Transfer topic
    assert(captured(Seq("digest", "Transfer(address,address,uint256)", "--log-topic")) ===
      "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
    // wrong arity is loud
    assert(Main.run(spark, Seq("digest")) === 2)
  }

  test("block-number: prints the node head over RPC; no-node is a validation error") {
    // reference evm/bin.py:38-52: eth_blockNumber against the archive
    // node; ARCHIVE_NODE is required, so the simulated wiring (which
    // has no moving head) maps to the same exit-2 validation error
    val stub = new graft.rpc.StubRpcServer(chainHeight = 1234L)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bos)) {
        assert(Main.run(spark, Seq("block-number", "--evm-rpc-nodes", stub.url)) === 0)
      }
      assert(bos.toString.trim === "1233") // latest block NUMBER = height-1
    } finally stub.stop()
    assert(Main.run(spark, Seq("block-number")) === 2)
  }

  test("reset: removes the entity tables and config store, leaves unrelated data") {
    import spark.implicits._
    val out = tmp("cli_reset_out")
    val cfg = tmp("cli_reset_cfg")
    for (t <- Seq("collections", "transfers", "tokens", "owners", "uris"))
      Seq((1L, "x")).toDF("id", "v").write.parquet(s"$out/$t")
    Seq((1L, "keep")).toDF("id", "v").write.parquet(s"$out/unrelated")
    assert(Main.run(spark, Seq("seed", "42", "--config", cfg)) === 0)
    assert(Main.run(spark, Seq("reset", "--out", out, "--config", cfg)) === 0)
    def exists(p: String) = java.nio.file.Files.exists(java.nio.file.Paths.get(p))
    for (t <- Seq("collections", "transfers", "tokens", "owners", "uris"))
      assert(!exists(s"$out/$t"), s"$t must be deleted")
    assert(!exists(s"$cfg/last_block"), "config bookmark must be deleted")
    // reset is scoped to the known table names — never the whole tree
    assert(exists(s"$out/unrelated"))
    // a fresh seed works after reset (the store recreates cleanly)
    assert(Main.run(spark, Seq("seed", "7", "--config", cfg)) === 0)
    // reset of an already-empty dir is a no-op success, not an error
    assert(Main.run(spark, Seq("reset", "--out", tmp("cli_reset_empty"))) === 0)
  }

  test("ingest: two --once runs share the standing index; --cdc builds the chunk index") {
    import spark.implicits._
    val drop = tmp("cli_ing_drop")
    val out = tmp("cli_ing_out")
    val ckpt = tmp("cli_ing_ckpt")
    def write(rows: Seq[(Long, String, String, Long)]): Unit =
      rows.toDF("doc_id", "text", "source", "n_chars")
        .coalesce(1).write.mode("append").parquet(drop)
    write(Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "s1", 43L),
      (2L, "completely different words appear here entirely now", "s1", 51L)))
    assert(Main.run(spark, Seq("ingest", drop, "--out", out,
      "--checkpoint", ckpt, "--cdc", "--once")) === 0)
    assert(spark.read.parquet(s"$out/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    // second invocation, SAME checkpoint: only the new files process;
    // the exact dup of doc 1 is dropped by the STANDING band index
    // persisted by the first run, the new doc survives
    write(Seq(
      (10L, "the quick brown fox jumps over the lazy dog", "s2", 43L),
      (11L, "yet another brand new unique document text", "s2", 42L)))
    assert(Main.run(spark, Seq("ingest", drop, "--out", out,
      "--checkpoint", ckpt, "--cdc", "--once")) === 0)
    assert(spark.read.parquet(s"$out/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 11L))
    // --cdc maintained the standing chunk index for the survivors
    assert(spark.read.parquet(s"$out/chunk_index").select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 11L))
  }

  test("prepare: end-to-end LLM pipeline with classifier + bench gates, funnel persisted") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = tmp("cli_prep")
    // classifier weights: harshly negative on a token some fixture docs
    // contain, so the classifier stage provably gates; bench set = a
    // fixture doc verbatim, so decontamination provably gates too
    val docs = graft.tables.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
    val someTok = docs.map(_.getString(1).split(" ")).filter(_.length > 5)
      .head.apply(2)
    val clfCsv = tmp("cli_prep_clf") + "/weights.csv"
    Seq(("token", "weight"), (someTok, "-900000")).toDF("token", "weight")
      .coalesce(1).write.option("header", "false").csv(clfCsv)
    val benchDir = tmp("cli_prep_bench") + "/bench"
    graft.tables.Tables.documents(spark, dir).limit(3).select("doc_id", "text")
      .write.parquet(benchDir)
    assert(Main.run(spark, Seq("prepare", dir, "--out", out,
      "--quality-frac", "0.5", "--shards", "2", "--seq-len", "128",
      "--classifier", clfCsv, "--classifier-threshold", "0.0",
      "--bench", benchDir)) === 0)
    // outputs: sharded corpus, sequence packing, persisted funnel
    assert(new java.io.File(s"$out/corpus").exists())
    assert(new java.io.File(s"$out/packing").exists())
    val funnel = spark.read.parquet(s"$out/funnel").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(funnel("input") > 0)
    assert(funnel("quality_gated") < funnel("input"))
    // both optional gates engaged (strictly decreasing at each)
    assert(funnel("classifier_gated") < funnel("quality_gated"),
      "classifier gate was idle — the fixture token did not gate")
    assert(funnel("decontaminated") <= funnel("classifier_gated"))
    assert(funnel("packed_chunks") > 0)
    // the written corpus equals the funnel's sampled count
    assert(spark.read.parquet(s"$out/corpus").count() === funnel("sampled_written"))
  }

  test("index-build + index-search: stored ANN index answers == one-shot library path") {
    val dir = "/root/testdata/sf0.001"
    val embPath = s"$dir/embeddings.parquet"
    val out = tmp("cli_ann")
    assert(Main.run(spark, Seq("index-build", embPath, "--out", out)) === 0)
    // all four artifacts exist; codes carry (cell, 8 codes, rnrm), one
    // row per corpus vector — the index is 8 bytes/vector, not vectors
    val emb = spark.read.parquet(embPath)
    val codes = spark.read.parquet(s"$out/codes")
    assert(codes.count() === emb.count())
    assert(codes.columns.toSet ===
      (Set("vec_id", "cell", "rnrm") ++ (0 until 8).map(t => s"code_$t")))
    assert(spark.read.parquet(s"$out/meta").head().getAs[Int]("codes") === 16)
    // search from the STORED index (no retraining) must reproduce the
    // one-shot library composition exactly
    assert(Main.run(spark, Seq("index-search", embPath, "--index", out,
      "--ids", "0,20", "--k", "3")) === 0)
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id").isin(0L, 20L))
    val stored = graft.ops.Pq.searchIndex(codes, emb, queries, k = 3,
        books = graft.ops.Pq.booksFromDf(spark.read.parquet(s"$out/codebooks")),
        centroids = Some(spark.read.parquet(s"$out/centroids")))
      .collect().map(_.toString).sorted.toSeq
    val books = graft.ops.Pq.trainCodebooks(emb)
    val cents = graft.ops.Similarity.kmeansCentroids(emb)
    val oneShot = graft.ops.Pq.ivfAdcRerankTopK(emb, queries, k = 3, books, cents)
      .collect().map(_.toString).sorted.toSeq
    assert(stored === oneShot)
    // missing --ids/--queries is the click-style validation error, exit 2
    assert(Main.run(spark, Seq("index-search", embPath, "--index", out)) === 2)
    // EXTERNAL query set (--queries): vectors never indexed, fresh ids
    val extDir = tmp("cli_ann_q") + "/q"
    import org.apache.spark.sql.functions.{col => c, transform => tf, lit => l}
    emb.filter(c("vec_id") === 0L)
      .select((c("vec_id") + 1000000L).as("vec_id"),
        tf(c("embedding"), v => v * l(1.01f)).as("embedding"))
      .write.parquet(extDir)
    assert(Main.run(spark, Seq("index-search", embPath, "--index", out,
      "--queries", extDir, "--k", "1")) === 0)
    val extTop = graft.ops.Pq.searchIndex(codes, emb, spark.read.parquet(extDir),
        k = 1, books = graft.ops.Pq.booksFromDf(spark.read.parquet(s"$out/codebooks")),
        centroids = Some(spark.read.parquet(s"$out/centroids"))).head()
    // a 1.01-scaled copy of corpus vector 0 must come home to vector 0
    assert(extTop.getAs[Long]("q_id") === 1000000L)
    assert(extTop.getAs[Long]("c_id") === 0L)
  }

  test("fuzzy-index-build + fuzzy-search answer from the persisted index") {
    import spark.implicits._
    val base = tmp("cli_fuzzy")
    val srcDir = base + "/src"
    val out = base + "/idx"
    Seq((1L, "kitten"), (2L, "mitten"), (3L, "sitting"), (4L, "apple"))
      .toDF("id", "str").write.parquet(srcDir)
    assert(Main.run(spark, Seq("fuzzy-index-build", srcDir,
      "--out", out, "--k", "1")) === 0)
    // meta pins k; variants persisted
    assert(spark.read.parquet(s"$out/meta").head().getAs[Int]("k") === 1)
    assert(spark.read.parquet(s"$out/variants").count() > 0)
    // ad hoc probe: "mitten" matches kitten+mitten at ed<=1, not sitting
    assert(Main.run(spark, Seq("fuzzy-search", "--index", out,
      "--strings", "mitten,banana")) === 0)
    val got = graft.ops.FuzzyJoin.probeDeletes(
        Seq((0L, "mitten")).toDF("id", "str"),
        org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("str"),
        spark.read.parquet(s"$out/variants"), 1)
      .select("match_id").as[Long].collect().toSet
    assert(got === Set(1L, 2L))
    // missing probes is the click-style validation error, exit 2
    assert(Main.run(spark, Seq("fuzzy-search", "--index", out)) === 2)
  }

  test("er-resolve + er-assign place a batch against the persisted entity table") {
    import spark.implicits._
    val base = tmp("cli_er")
    val srcDir = base + "/src"
    val out = base + "/entities"
    // two dirty duplicates + one unrelated record (names long enough
    // to clear the 0.9 trigram bar at 1 edit)
    val b = "alphabravocharlie"
    Seq((1L, "X" + b), (2L, "X" + b), (9L, "zuluyankeewhiskey"))
      .toDF("id", "name").write.parquet(srcDir)
    assert(Main.run(spark, Seq("er-resolve", srcDir, "--out", out)) === 0)
    val ents = spark.read.parquet(out)
      .select("record_id", "entity_id").as[(Long, Long)].collect().toMap
    assert(ents === Map(1L -> 1L, 2L -> 1L, 9L -> 9L))
    assert(spark.read.parquet(out + ".meta").head().getAs[Int]("k") === 1)
    // batch: a bridge-free near-dup of entity 1 plus a fresh singleton
    val batchDir = base + "/batch"
    val assignedDir = base + "/assigned"
    Seq((5L, "X" + b + "z"), (6L, "somethingelse99"))
      .toDF("id", "name").write.parquet(batchDir)
    assert(Main.run(spark, Seq("er-assign", batchDir,
      "--corpus", out, "--out", assignedDir)) === 0)
    val got = spark.read.parquet(assignedDir)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(5L -> 1L, 6L -> 6L))
    // missing --corpus is the click-style validation error, exit 2
    assert(Main.run(spark, Seq("er-assign", batchDir)) === 2)
  }
}
