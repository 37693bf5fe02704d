package graft.nft

import graft.SparkSpec
import graft.pipelines.VerifyPipeline
import org.apache.spark.sql.functions._

class CollectionsVerifySpec extends SparkSpec {
  import spark.implicits._

  test("receipts -> collections with ERC-165 classification and name_lower") {
    val receipts = Seq(
      // successful 721 creation
      ("0xc1", "0xdeployer1", 100L, Some(1L), Some("0xc1addr")),
      // successful 1155 creation
      ("0xc2", "0xdeployer2", 101L, Some(1L), Some("0xc2addr")),
      // failed creation -> excluded
      ("0xc3", "0xdeployer3", 102L, Some(0L), Some("0xc3addr")),
      // plain tx, no contract -> excluded
      ("0xc4", "0xsender", 103L, Some(1L), None)
    ).toDF("transaction_hash", "from_", "block_number", "status", "contract_address")
    val iface = Seq(
      ("0xc1addr", true, false, "Bored Things", "BT", "10000"),
      ("0xc2addr", false, true, "", null, null),
      ("0xc3addr", true, false, "x", "x", "1")
    ).toDF("collection_id", "supports_erc721", "supports_erc1155", "name", "symbol", "total_supply")
    val times = Seq((100L, 1000L), (101L, 1010L)).toDF("number", "timestamp")

    val got = Collections.fromReceipts(receipts, iface, times, dataVersion = 3)
      .collect().map(r => r.getAs[String]("collection_id") -> r).toMap
    assert(got.keySet === Set("0xc1addr", "0xc2addr"))
    val c1 = got("0xc1addr")
    assert(c1.getAs[String]("specification") === "ERC-721")
    assert(c1.getAs[String]("name_lower") === "bored things")
    assert(c1.getAs[Long]("date_created") === 1000L)
    assert(c1.getAs[Int]("data_version") === 3)
    val c2 = got("0xc2addr")
    assert(c2.getAs[String]("specification") === "ERC-1155")
    assert(c2.isNullAt(c2.fieldIndex("name_lower"))) // empty name -> null
  }

  test("verify pipeline reports transfer/owner/count discrepancies only") {
    def t(c: String, tok: String, v: String, from: String, to: String, q: String) =
      (c, tok, v, from, to, q)
    val chainT = Seq(
      t("c1", "t1", "v1", "a", "b", "1"),
      t("c1", "t2", "v2", "b", "c", "1"), // missing in db
      t("c1", "t3", "v3", "c", "d", "1")  // quantity differs
    ).toDF("collection_id", "token_id", "attribute_version", "from_", "to_", "quantity")
    val dbT = Seq(
      t("c1", "t1", "v1", "a", "b", "1"),
      t("c1", "t3", "v3", "c", "d", "2"),
      t("c1", "t4", "v4", "d", "e", "1")  // extra in db
    ).toDF("collection_id", "token_id", "attribute_version", "from_", "to_", "quantity")
    val chainO = Seq(("c1", "t1", "b", 1L)).toDF("collection_id", "token_id", "account", "quantity")
    val dbO = Seq(("c1", "t1", "b", 1L)).toDF("collection_id", "token_id", "account", "quantity")
    val dbTok = Seq(("c1", "t1"), ("c1", "t3")).toDF("collection_id", "token_id")
    val supply = Seq(("c1", 3L)).toDF("collection_id", "total_supply")

    val report = VerifyPipeline.run(chainT, dbT, chainO, dbO, dbTok, supply).collect()
    val byCheck = report.groupBy(_.getAs[String]("check")).view.mapValues(_.length).toMap
    assert(byCheck("transfers") === 3) // left_only t2, mismatch t3, right_only t4
    assert(byCheck.getOrElse("owners", 0) === 0) // all owners match
    assert(byCheck("counts") === 1) // 2 tokens != supply 3
    val details = report.filter(_.getAs[String]("check") == "transfers")
      .map(r => r.getAs[String]("token_id") -> r.getAs[String]("detail")).toMap
    assert(details("t2") === "left_only")
    assert(details("t3") === "mismatch:quantity") // names the differing field
    assert(details("t4") === "right_only")
  }

  test("fromChain emits the collections entity table, fully enriched") {
    // every reference entity table comes out of the fixture-free crawl;
    // collections carry the full probe enrichment (name/symbol/supply/
    // owner) for ERC-721s and the null-metadata shape for ERC-1155s
    val out = graft.pipelines.Crawl.fromChain(spark, 0, 50, dataVersion = 7)
    assert(out.keySet === Set("collections", "transfers", "tokens", "owners", "uris"))
    val colls = out("collections").collect()
      .map(r => r.getAs[String]("collection_id") -> r).toMap
    val c721 = colls(f"0x${4002L}%040x")
    assert(c721.getAs[String]("specification") === "ERC-721")
    assert(c721.getAs[String]("name") === "Collection 4002")
    assert(c721.getAs[String]("name_lower") === "collection 4002")
    assert(c721.getAs[String]("symbol") === "C4002")
    assert(c721.getAs[String]("total_supply") === f"${40020L}%064x")
    assert(c721.getAs[String]("owner") === f"0x${9002L}%040x")
    assert(c721.getAs[Int]("data_version") === 7)
    val c1155 = colls(f"0x${4003L}%040x")
    assert(c1155.getAs[String]("specification") === "ERC-1155")
    assert(c1155.isNullAt(c1155.fieldIndex("name")))
    assert(c1155.isNullAt(c1155.fieldIndex("total_supply")))
    // the no-ERC-165 contract never becomes a collection
    assert(!colls.contains(f"0x${4004L}%040x"))
  }

  test("fixture-free verify: chain logs vs DB tables, corruption flagged exactly") {
    // the DB state = what a clean crawl of the same window produced
    val crawled = graft.pipelines.Crawl.fromChain(spark, 0, 40)
    val dbTransfers = crawled("transfers").cache()
    val dbOwners = crawled("owners").cache()
    val dbTokens = crawled("tokens").select(col("collection_id"), col("token_id")).cache()
    val supply = dbTokens.groupBy(col("collection_id"))
      .agg(count(lit(1)).as("total_supply"))

    // a clean database reconciles to an EMPTY report
    val clean = graft.pipelines.VerifyPipeline.fromChain(spark, 0, 40,
      dbTransfers, dbOwners, dbTokens, supply)
    assert(clean.count() === 0)

    // corrupt it: drop one transfer, inflate one owner's balance
    val dropped = dbTransfers.orderBy(col("attribute_version")).limit(1).collect().head
    val droppedKey = dropped.getAs[String]("attribute_version")
    val t2 = dbTransfers.filter(col("attribute_version") =!= droppedKey)
    val o2 = dbOwners.withColumn("quantity",
      when(col("account") === dbOwners.orderBy(col("account")).limit(1)
        .collect().head.getAs[String]("account"),
        graft.expr.HexMath.pad64("63")).otherwise(col("quantity")))
    val report = graft.pipelines.VerifyPipeline.fromChain(spark, 0, 40,
      t2, o2, dbTokens, supply).collect()
    val byCheck = report.groupBy(_.getAs[String]("check")).view.mapValues(_.length).toMap
    assert(byCheck("transfers") === 1) // the dropped fact: chain-only
    assert(report.filter(_.getAs[String]("check") == "transfers")
      .head.getAs[String]("detail") === "left_only")
    assert(byCheck("owners") >= 1) // every inflated balance mismatches
    assert(byCheck.getOrElse("counts", 0) === 0)

    // the full-field compare (reference verify_transfer,
    // verify.py:852-934): a corrupted transaction_type is flagged BY
    // NAME even when from/to/quantity still agree
    val typeVictim = dbTransfers.orderBy(col("attribute_version").desc)
      .limit(1).collect().head.getAs[String]("attribute_version")
    val t3 = dbTransfers.withColumn("transaction_type",
      when(col("attribute_version") === typeVictim, lit("burn"))
        .otherwise(col("transaction_type")))
    val typeRows = graft.pipelines.VerifyPipeline.fromChain(spark, 0, 40,
      t3, dbOwners, dbTokens, supply).collect()
    assert(typeRows.length === 1)
    assert(typeRows.head.getAs[String]("detail") === "mismatch:transaction_type")

    // narrowing to one collection audits only its rows — and pushes the
    // address predicate into the fetch (db side narrowed to match)
    val oneColl = dropped.getAs[String]("collection_id")
    def only(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("collection_id") === oneColl)
    val narrowed = graft.pipelines.VerifyPipeline.fromChain(spark, 0, 40,
      only(t2), only(dbOwners), only(dbTokens), only(supply),
      collectionId = Some(oneColl))
    val nr = narrowed.collect()
    assert(nr.length === 1 && nr.head.getAs[String]("check") === "transfers" &&
      nr.head.getAs[String]("collection_id") === oneColl)
  }

  test("per-token ownerOf probes: clean db verifies, a corrupted owner is flagged") {
    val crawled = graft.pipelines.Crawl.fromChain(spark, 0, 40)
    val tokens = crawled("tokens").cache()
    // the reference gates ownerOf probes on contract_supports_erc721
    val erc721 = crawled("collections")
      .filter(col("specification") === "ERC-721").cache()
    val probed = tokens.filter(col("current_owner").isNotNull)
      .join(erc721.select("collection_id"), Seq("collection_id"), "left_semi")
    assert(probed.count() > 0)
    // a clean crawl's current_owner agrees with the chain probe per token
    val clean = VerifyPipeline.tokenOwnersReport(spark, tokens, erc721)
    assert(clean.count() === 0)
    // … and identically through the live RPC call transport
    val stub = new graft.rpc.StubRpcServer()
    try {
      val viaRpc = VerifyPipeline.tokenOwnersReport(spark, tokens, erc721,
        graft.rpc.CallExecutor.Rpc, Map("endpoints" -> stub.url))
      assert(viaRpc.count() === 0)
    } finally stub.stop()
    // corrupt ONE stored owner: exactly that token is flagged, with the
    // per-field detail the reference verify reports
    val victim = probed.orderBy(col("token_id")).limit(1).collect().head
    val corrupted = tokens.withColumn("current_owner",
      when(col("token_id") === victim.getAs[String]("token_id"),
        lit("0x" + "dead" * 10)).otherwise(col("current_owner")))
    val flagged = VerifyPipeline.tokenOwnersReport(spark, corrupted, erc721).collect()
    assert(flagged.length === 1)
    assert(flagged.head.getAs[String]("token_id") === victim.getAs[String]("token_id"))
    assert(flagged.head.getAs[String]("check") === "token_owner")
    assert(flagged.head.getAs[String]("detail").startsWith("mismatch:db=0xdead"))
  }

  test("ERC-1155 uri() verify: clean crawl verifies clean; corruption and divergence flagged") {
    val crawled = graft.pipelines.Crawl.fromChain(spark, 0, 50)
    // db side = the fully-updated token view (URI-event updates applied),
    // narrowed to the 1155 collections — the CLI verify's composition
    val erc1155 = crawled("collections")
      .filter(col("specification") === "ERC-1155").select("collection_id")
    val tokens1155 = TokenUris.tokensWithLatestUrls(crawled("tokens"), crawled("uris"))
      .join(erc1155, Seq("collection_id"), "left_semi").cache()
    assert(tokens1155.filter(col("metadata_url").isNotNull).count() > 0)
    // chain truth events re-derived through the verify flow's own path
    val uriEvents = Derive.uriUpdates(
      spark.read.format("logs")
        .option("start", "0").option("maxBlock", "50").load()).cache()
    val clean = VerifyPipeline.erc1155UrisReport(spark, tokens1155, uriEvents,
      blockHeight = Some(50))
    assert(clean.count() === 0)
    // … and identically through the live RPC transport (support gate +
    // uri() probes over the wire)
    val stub = new graft.rpc.StubRpcServer()
    try {
      val viaRpc = VerifyPipeline.erc1155UrisReport(spark, tokens1155, uriEvents,
        blockHeight = Some(50), callExecutor = graft.rpc.CallExecutor.Rpc,
        options = Map("endpoints" -> stub.url))
      assert(viaRpc.count() === 0)
    } finally stub.stop()

    // corrupt one stored URL -> exactly that token flagged as mismatch
    val victim = tokens1155.filter(col("metadata_url").isNotNull)
      .orderBy(col("token_id")).limit(1).collect().head
    val vTok = victim.getAs[String]("token_id")
    val corrupted = tokens1155.withColumn("metadata_url",
      when(col("token_id") === vTok, lit("ipfs://wrong")).otherwise(col("metadata_url")))
    val flagged = VerifyPipeline.erc1155UrisReport(spark, corrupted, uriEvents,
      blockHeight = Some(50)).collect()
    assert(flagged.length === 1)
    assert(flagged.head.getAs[String]("check") === "token_uri_1155")
    assert(flagged.head.getAs[String]("token_id") === vTok)
    assert(flagged.head.getAs[String]("detail").startsWith("mismatch:db=ipfs://wrong,chain="))

    // a LOST stored URL (null) is also a mismatch, rendered db=-
    val lost = tokens1155.withColumn("metadata_url",
      when(col("token_id") === vTok, lit(null).cast("string"))
        .otherwise(col("metadata_url")))
    val lostRows = VerifyPipeline.erc1155UrisReport(spark, lost, uriEvents,
      blockHeight = Some(50)).collect()
    assert(lostRows.length === 1 &&
      lostRows.head.getAs[String]("detail").startsWith("mismatch:db=-,chain="))

    // contract-vs-event divergence: rewrite the event stream so the last
    // event disagrees with the contract's uri() answer — the reference
    // emits a WARNING for the contract discrepancy (verify.py:710-715)
    // AND an error, because event truth now disagrees with the db too.
    // Only the metadata-uri-supporting collection (k%10!=3) can warn —
    // pick its event token so the uri() probe actually answers.
    val supTok = tokens1155.filter(col("metadata_url").isNotNull)
      .withColumn("k", col("collection_id").substr(lit(39), lit(4)))
      .filter(col("k") === "0fa1") // 4001 = 0x0fa1: supports uri()
      .limit(1).collect().head.getAs[String]("token_id")
    val divergent = uriEvents.withColumn("metadata_url",
      when(col("token_id") === supTok, concat(col("metadata_url"), lit("?v=2")))
        .otherwise(col("metadata_url")))
    val dRows = VerifyPipeline.erc1155UrisReport(spark, tokens1155, divergent,
      blockHeight = Some(50)).collect()
    val dByDetail = dRows.map(_.getAs[String]("detail")).sorted
    assert(dRows.length === 2 && dRows.forall(_.getAs[String]("token_id") === supTok))
    assert(dByDetail.exists(_.startsWith("warning:event=")))
    assert(dByDetail.exists(_.startsWith("mismatch:db=")))
  }

  test("ERC-721 enumerable: chain enumeration reconciles; lost/extra db tokens flagged") {
    val crawled = graft.pipelines.Crawl.fromChain(spark, 0, 40)
    val dbTokens = crawled("tokens").select("collection_id", "token_id").cache()
    val erc721 = crawled("collections")
      .filter(col("specification") === "ERC-721").cache()
    // fixture contracts: 4000 (0x…0fa0) is enumerable, 4002 (0x…0fa2)
    // is not (k%10==2) -> one not-enumerable warning, nothing else
    val clean = VerifyPipeline.enumerationReport(spark, dbTokens, erc721,
      blockHeight = Some(40)).collect()
    assert(clean.length === 1)
    assert(clean.head.getAs[String]("check") === "enumeration")
    assert(clean.head.getAs[String]("collection_id") === f"0x${4002L}%040x")
    assert(clean.head.getAs[String]("detail") === "warning:not-enumerable")
    // … and through the live RPC transport (height-pinned tokenByIndex)
    val stub = new graft.rpc.StubRpcServer()
    try {
      val viaRpc = VerifyPipeline.enumerationReport(spark, dbTokens, erc721,
        blockHeight = Some(40), callExecutor = graft.rpc.CallExecutor.Rpc,
        options = Map("endpoints" -> stub.url)).collect()
      assert(viaRpc.length === 1 &&
        viaRpc.head.getAs[String]("detail") === "warning:not-enumerable")
    } finally stub.stop()

    val enumColl = f"0x${4000L}%040x"
    val victim = dbTokens.filter(col("collection_id") === enumColl)
      .orderBy(col("token_id")).limit(1).collect().head.getAs[String]("token_id")
    // drop a token the chain enumerates -> missing:chain=1 for exactly it
    val lost = dbTokens.filter(
      !(col("collection_id") === enumColl && col("token_id") === victim))
    val lostRows = VerifyPipeline.enumerationReport(spark, lost, erc721,
      blockHeight = Some(40)).filter(col("detail") =!= "warning:not-enumerable").collect()
    assert(lostRows.length === 1)
    assert(lostRows.head.getAs[String]("token_id") === victim)
    assert(lostRows.head.getAs[String]("detail") === "missing:chain=1")
    // add an id the contract never enumerated -> extra:db=1
    val fake = f"${999999L}%064x"
    val extra = dbTokens.unionByName(
      Seq((enumColl, fake)).toDF("collection_id", "token_id"))
    val extraRows = VerifyPipeline.enumerationReport(spark, extra, erc721,
      blockHeight = Some(40)).filter(col("detail") =!= "warning:not-enumerable").collect()
    assert(extraRows.length === 1)
    assert(extraRows.head.getAs[String]("token_id") === fake)
    assert(extraRows.head.getAs[String]("detail") === "extra:db=1")
    // the enumeration is height-pinned: at height 30 the chain stops at
    // block 29, so db tokens minted later read as extra (and vice versa
    // a too-early height must not invent missing rows)
    val at30 = VerifyPipeline.enumerationReport(spark, dbTokens, erc721,
      blockHeight = Some(30)).filter(col("detail") === "extra:db=1").collect()
    assert(at30.map(_.getAs[String]("token_id")).toSet ===
      Set(f"${350L}%064x", f"${351L}%064x")) // block 35's mints
  }

  test("token shape checks: 721 quantity==1 on in-window mints, 1155 owner fields null") {
    val crawled = graft.pipelines.Crawl.fromChain(spark, 0, 40)
    val tokens = crawled("tokens").cache()
    def spec(s: String) = crawled("collections").filter(col("specification") === s)
    val erc721 = spec("ERC-721").cache()
    val erc1155 = spec("ERC-1155").cache()
    val report = VerifyPipeline.tokenShapeReport(tokens, erc721, erc1155).cache()
    // clean crawl: every in-window 721 mint folds to quantity 1, and
    // transfer-only tokens (mint precedes the window — all of 4002's)
    // are skipped by the windowed-noise rule rather than flagged
    assert(report.filter(col("detail").startsWith("quantity:")).count() === 0)
    // the sim's 1155 contracts emit 721-shaped Transfer logs, so their
    // token items carry current_owner — EXACTLY the crawl/contract
    // inconsistency the reference flags (verify.py:699-703)
    val n1155 = tokens.join(erc1155.select("collection_id"),
      Seq("collection_id"), "left_semi").count()
    assert(n1155 > 0)
    assert(report.filter(col("detail") === "current-owner-set-on-1155").count() === n1155)

    // corrupt ONE minted 721 token's quantity -> exactly it flags, with
    // the reference's expected-1 message shape
    val victim = tokens.filter(col("mint_block").isNotNull)
      .join(erc721.select("collection_id"), Seq("collection_id"), "left_semi")
      .orderBy(col("collection_id"), col("token_id")).limit(1).collect().head
    val vTok = victim.getAs[String]("token_id")
    val five = graft.expr.HexMath.pad64("5")
    val one = graft.expr.HexMath.pad64("1")
    val corrupted = tokens.withColumn("quantity",
      when(col("token_id") === vTok, lit(five)).otherwise(col("quantity")))
    val qRows = VerifyPipeline.tokenShapeReport(corrupted, erc721, erc1155)
      .filter(col("detail").startsWith("quantity:")).collect()
    assert(qRows.length === 1)
    assert(qRows.head.getAs[String]("token_id") === vTok)
    assert(qRows.head.getAs[String]("detail") === s"quantity:db=$five,expected=$one")

    // a corrupted ORIGINAL owner on an 1155 token reports both set
    // fields in one row
    val v1155 = tokens.join(erc1155.select("collection_id"),
        Seq("collection_id"), "left_semi")
      .orderBy(col("collection_id"), col("token_id")).limit(1).collect().head
    val both = tokens.withColumn("original_owner",
      when(col("token_id") === v1155.getAs[String]("token_id") &&
        col("collection_id") === v1155.getAs[String]("collection_id"),
        lit("0x" + "aa" * 20)).otherwise(col("original_owner")))
    val bRows = VerifyPipeline.tokenShapeReport(both, erc721, erc1155)
      .filter(col("detail").contains("original-owner-set-on-1155")).collect()
    assert(bRows.length === 1)
    assert(bRows.head.getAs[String]("detail") ===
      "original-owner-set-on-1155,current-owner-set-on-1155")
  }

  test("collections-table verify: clean crawl clean; metadata/creation corruption flagged per field") {
    val crawled = graft.pipelines.Crawl.fromChain(spark, 0, 50)
    val dbColls = crawled("collections").cache()
    assert(dbColls.count() >= 3)
    val blockTimes = spark.read.format("blocks")
      .option("start", "0").option("maxBlock", "50").load()
      .select(col("number"), col("timestamp"))
    val receipts = spark.read.format("receipts")
      .option("start", "0").option("maxBlock", "50").load()
    def report(db: org.apache.spark.sql.DataFrame) =
      VerifyPipeline.collectionsReport(spark, db,
        blockTimes = Some(blockTimes), creationReceipts = Some(receipts))
    // a clean crawl re-verifies clean on every field including the
    // creation re-check
    assert(report(dbColls).count() === 0)
    // … and identically over the live RPC transport
    val stub = new graft.rpc.StubRpcServer()
    try {
      val viaRpc = VerifyPipeline.collectionsReport(spark, dbColls,
        blockTimes = Some(blockTimes), creationReceipts = Some(receipts),
        callExecutor = graft.rpc.CallExecutor.Rpc,
        options = Map("endpoints" -> stub.url))
      assert(viaRpc.count() === 0)
    } finally stub.stop()

    val victim = f"0x${4002L}%040x" // an ERC-721 with full metadata
    def corrupt(c: String, v: org.apache.spark.sql.Column) =
      dbColls.withColumn(c, when(col("collection_id") === victim, v).otherwise(col(c)))
    // every probed field flags individually with db-vs-chain content
    val nameRows = report(corrupt("name", lit("Evil"))).collect()
    assert(nameRows.length === 1 &&
      nameRows.head.getAs[String]("detail") === "name:db=Evil,chain=Collection 4002")
    assert(report(corrupt("symbol", lit("EV"))).count() === 1)
    assert(report(corrupt("owner", lit("0x" + "99" * 20))).count() === 1)
    assert(report(corrupt("total_supply", lit("f" * 64))).count() === 1)
    val specRows = report(corrupt("specification", lit("ERC-1155"))).collect()
    assert(specRows.length === 1 && specRows.head.getAs[String]("detail")
      === "specification:db=ERC-1155,chain=ERC-721")
    // name_lower has its own derivation rule (lower + 1024-char cap)
    assert(report(corrupt("name_lower", lit("WRONG"))).count() === 1)
    // date_created re-checks against the block's timestamp
    val dateRows = report(corrupt("date_created", lit(123456789L)))
      .filter(col("detail").startsWith("date_created:")).collect()
    assert(dateRows.length === 1)
    // a wrong creator is flagged; a block_created pointing at a block
    // with NO creation of this contract is the reference's
    // cannot-find-creation error
    assert(report(corrupt("creator", lit("0x" + "77" * 20)))
      .filter(col("detail").startsWith("creator:")).count() === 1)
    val moved = report(corrupt("block_created", lit(1L)))
    assert(moved.filter(col("detail") === "creation-not-found").count() === 1)
    // out-of-coverage creations are skipped, not flagged: same moved
    // row, but the receipts dim declared as not covering block 1
    val skipped = VerifyPipeline.collectionsReport(spark,
      corrupt("block_created", lit(1L)),
      blockTimes = Some(blockTimes), creationReceipts = Some(receipts),
      receiptsCover = col("block_created") =!= 1L)
    assert(skipped.filter(col("detail") === "creation-not-found").count() === 0)
    // a db row for a no-ERC-165 contract re-classifies as UNKNOWN
    val ghost = dbColls.limit(1)
      .withColumn("collection_id", lit(f"0x${4004L}%040x"))
      .localCheckpoint(true)
    val ghostRows = report(dbColls.unionByName(ghost))
      .filter(col("collection_id") === f"0x${4004L}%040x")
      .collect().map(_.getAs[String]("detail"))
    assert(ghostRows.exists(_.startsWith("specification:")),
      s"UNKNOWN reclassification missing in ${ghostRows.mkString(";")}")
  }

  test("callRequests: per-contract eth_call calldata built columnar (encode half of J6/J5)") {
    val contracts = Seq("0x" + "ab" * 20, "0x" + "cd" * 20).toDF("collection_id")
    val reqs = Collections.callRequests(contracts).collect()
    assert(reqs.length === 2 * 6)
    val byProbe = reqs.groupBy(_.getAs[String]("probe"))
    // published selectors: supportsInterface=0x01ffc9a7, name=0x06fdde03,
    // symbol=0x95d89b41, totalSupply=0x18160ddd, owner=0x8da5cb5b;
    // ERC-721/1155 interface ids 80ac58cd / d9b67a26
    assert(byProbe("supports_erc721").forall(_.getAs[String]("data") ===
      "0x01ffc9a7" + "80ac58cd" + "0" * 56))
    assert(byProbe("supports_erc1155").forall(_.getAs[String]("data") ===
      "0x01ffc9a7" + "d9b67a26" + "0" * 56))
    assert(byProbe("name").forall(_.getAs[String]("data") === "0x06fdde03"))
    assert(byProbe("symbol").forall(_.getAs[String]("data") === "0x95d89b41"))
    assert(byProbe("total_supply").forall(_.getAs[String]("data") === "0x18160ddd"))
    assert(byProbe("owner").forall(_.getAs[String]("data") === "0x8da5cb5b"))
    // column form agrees with the Scala-side encoder on a real arg
    val viaCol = Seq(7L).toDF("token_id")
      .select(graft.expr.Abi.encodeCallCol("ownerOf(uint256)",
        graft.expr.Abi.uintWord(org.apache.spark.sql.functions.col("token_id"))).as("d"))
      .head().getString(0)
    assert(viaCol === graft.expr.Abi.encodeCall("ownerOf(uint256)",
      Seq(graft.expr.Abi.AbiUint(java.math.BigInteger.valueOf(7)))))
  }
}
