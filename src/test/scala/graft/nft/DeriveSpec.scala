package graft.nft

import graft.SparkSpec
import graft.expr.HexMath
import graft.model.{Addresses, EvmLog}
import graft.ops.Lww
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixture matrix per FIXTURES.md §A / the reference transformer tests
  * (`test/blockcrawler/nft/test_evm_transformers.py`): happy paths for
  * ERC-721 / 1155 single / 1155 batch / URI, the ERC-20 negative case,
  * mint/burn classification, and the replay-idempotence invariant. */
class DeriveSpec extends SparkSpec {
  import spark.implicits._

  private val contract = "0xc0ffee0000000000000000000000000000000001"
  private val alice = "0xaaaa000000000000000000000000000000000001"
  private val bob = "0xbbbb000000000000000000000000000000000002"

  private def pad32Addr(a: String): String =
    "0x" + "0" * 24 + a.stripPrefix("0x")
  private def word(v: Long): String = HexMath.pad64(java.lang.Long.toHexString(v))

  private def log(block: Long, txIdx: Long, logIdx: Long, topics: Seq[String],
                  data: String = "0x", address: String = contract): EvmLog =
    EvmLog(removed = false, log_index = logIdx, transaction_index = txIdx,
      transaction_hash = "0x" + "ab" * 32, block_hash = "0x" + "cd" * 32,
      block_number = block, address = address, data = data, topics = topics)

  private lazy val fixtureLogs: DataFrame = Seq(
    // mint: 721 Transfer from zero -> alice, token 7
    log(100, 0, 0, Seq(Derive.Erc721TransferSig, pad32Addr(Addresses.Zero),
      pad32Addr(alice), "0x" + word(7))),
    // transfer: alice -> bob
    log(101, 1, 2, Seq(Derive.Erc721TransferSig, pad32Addr(alice),
      pad32Addr(bob), "0x" + word(7))),
    // burn: bob -> zero
    log(102, 0, 1, Seq(Derive.Erc721TransferSig, pad32Addr(bob),
      pad32Addr(Addresses.Zero), "0x" + word(7))),
    // ERC-20 Transfer: same sig, 3 topics -> MUST be excluded
    log(103, 0, 0, Seq(Derive.Erc721TransferSig, pad32Addr(alice), pad32Addr(bob))),
    // 1155 single mint: id=9 value=5
    log(104, 0, 0, Seq(Derive.Erc1155TransferSingleSig, pad32Addr(alice),
      pad32Addr(Addresses.Zero), pad32Addr(alice)),
      data = "0x" + word(9) + word(5)),
    // 1155 batch: ids=[11,12] values=[2,3] alice -> bob
    log(105, 0, 0, Seq(Derive.Erc1155TransferBatchSig, pad32Addr(alice),
      pad32Addr(alice), pad32Addr(bob)),
      data = "0x" + word(0x40) + word(0xa0) + word(2) + word(11) + word(12) +
        word(2) + word(2) + word(3)),
    // URI event for token 9 with {id} substitution
    log(106, 0, 0, Seq(Derive.Erc1155UriSig, "0x" + word(9)),
      data = uriData("ipfs://m/{id}.json"))
  ).toDF()

  private def uriData(s: String): String = {
    val b = s.getBytes("UTF-8")
    val hex = b.map(x => f"${x & 0xff}%02x").mkString
    "0x" + word(0x20) + word(b.length.toLong) + hex + "0" * ((64 - hex.length % 64) % 64)
  }

  test("erc721 transfers decode + classify + exclude ERC-20") {
    val t = Derive.erc721Transfers(fixtureLogs).collect()
    assert(t.length === 3) // ERC-20 row excluded by the 4-topic guard
    val byBlock = t.map(r => r.getAs[Long]("block_id") -> r).toMap
    assert(byBlock(100L).getAs[String]("transaction_type") === "mint")
    assert(byBlock(100L).getAs[String]("to_") === alice)
    assert(byBlock(101L).getAs[String]("transaction_type") === "transfer")
    assert(byBlock(102L).getAs[String]("transaction_type") === "burn")
    assert(byBlock(100L).getAs[String]("token_id") === word(7))
    assert(byBlock(100L).getAs[String]("attribute_version") ===
      HexMath.pad64(java.lang.Long.toHexString(100L * 1000000000L)).takeRight(40))
  }

  test("erc1155 single + batch decode") {
    val s = Derive.erc1155SingleTransfers(fixtureLogs).collect()
    assert(s.length === 1)
    assert(s(0).getAs[String]("token_id") === word(9))
    assert(s(0).getAs[String]("quantity") === word(5))
    assert(s(0).getAs[String]("transaction_type") === "mint") // from topic = zero address
    val b = Derive.erc1155BatchTransfers(fixtureLogs).orderBy(col("token_id")).collect()
    assert(b.length === 2)
    assert(b.map(_.getAs[String]("token_id")).toSeq === Seq(word(11), word(12)))
    assert(b.map(_.getAs[String]("quantity")).toSeq === Seq(word(2), word(3)))
  }

  test("uri updates decode dynamic string and substitute {id}") {
    val u = Derive.uriUpdates(fixtureLogs).collect()
    assert(u.length === 1)
    assert(u(0).getAs[String]("metadata_url") === s"ipfs://m/${word(9)}.json")
  }

  test("tokens rollup: first-mint wins, quantity fold, owner argmax, burn end-state") {
    val blockTimes = Seq((100L, 1000L), (101L, 1010L), (102L, 1020L),
      (104L, 1040L), (105L, 1050L)).toDF("number", "timestamp")
    val transfers = Derive.transfers(fixtureLogs)
    val tokens = Derive.tokens(transfers, blockTimes).collect()
      .map(r => r.getAs[String]("token_id") -> r).toMap
    val t7 = tokens(word(7))
    assert(t7.getAs[Long]("mint_block") === 100L)
    assert(t7.getAs[Long]("mint_date") === 1000L)
    assert(t7.getAs[String]("original_owner") === alice)
    assert(t7.getAs[String]("quantity") === word(0)) // mint +1, burn -1
    assert(t7.getAs[String]("current_owner") === Addresses.Zero) // last transfer was the burn
    val t9 = tokens(word(9))
    assert(t9.getAs[String]("quantity") === word(5)) // single mint of 5
    assert(t9.getAs[Long]("mint_block") === 104L)
    assert(t9.isNullAt(t9.fieldIndex("current_owner"))) // ERC-1155 forces null
  }

  test("tokens enrich join degrades from broadcast to shuffled past the window limit") {
    val blockTimes = Seq((100L, 1000L), (101L, 1010L), (102L, 1020L),
      (104L, 1040L), (105L, 1050L)).toDF("number", "timestamp")
    val transfers = Derive.transfers(fixtureLogs)
    // a 5-row dim auto-broadcasts under the 10MB threshold, masking the
    // hint difference; disable auto-broadcast so the plan shows only
    // what the API chose (at real whole-chain size the estimate exceeds
    // the threshold and Catalyst lands here anyway)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val viaBroadcast = Derive.tokens(transfers, blockTimes)
      val viaShuffle = Derive.tokens(transfers, blockTimes, broadcastTimes = false)
      // plan shapes: window path broadcasts by hint, whole-chain path
      // must NOT ship the dim to every task
      assert(viaBroadcast.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      val shufflePlan = viaShuffle.queryExecution.executedPlan.toString
      assert(!shufflePlan.contains("BroadcastHashJoin"), s"dim still broadcast:\n$shufflePlan")
      assert(shufflePlan.contains("SortMergeJoin") || shufflePlan.contains("ShuffledHashJoin"))
      // identical results either way
      assert(viaShuffle.collect().map(_.toString).sorted.toSeq ===
        viaBroadcast.collect().map(_.toString).sorted.toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    // and the pipelines pick the join by window width
    assert(graft.pipelines.Crawl.BroadcastWindowLimit === 4000000L)
  }

  test("owners balances: deltas sum, zeros dropped") {
    val owners = Derive.owners(Derive.transfers(fixtureLogs))
      .collect().map(r => (r.getAs[String]("token_id"), r.getAs[String]("account")) -> r.getAs[String]("quantity")).toMap
    // token 7: alice +1 (mint) -1 (out) = 0 dropped; bob +1 -1 (burn out) = 0 dropped
    assert(!owners.keys.exists(_._1 == word(7)))
    // token 11: alice -2, bob +2
    assert(owners((word(11), bob)) === word(2))
    assert(owners((word(11), alice)) === "-" + word(2))
    assert(owners((word(12), bob)) === word(3))
  }

  test("quantity above 2^63 folds exactly (uint256, no long overflow)") {
    // 1155 mint of 2^70 to alice, then burn of 1: net 2^70 - 1. The
    // earlier long-typed sum overflowed/nulled here (SURVEY §1.3).
    val big = "4" + "0" * 17 // 2^70 = 0x4 << 68
    val logs = Seq(
      log(200, 0, 0, Seq(Derive.Erc1155TransferSingleSig, pad32Addr(alice),
        pad32Addr(Addresses.Zero), pad32Addr(alice)),
        data = "0x" + word(21) + HexMath.pad64(big)),
      log(201, 0, 0, Seq(Derive.Erc1155TransferSingleSig, pad32Addr(alice),
        pad32Addr(alice), pad32Addr(Addresses.Zero)),
        data = "0x" + word(21) + word(1))
    ).toDF()
    val expected = HexMath.sub(big, "1") // pad64(2^70 - 1)
    val t = Derive.tokens(Derive.transfers(logs),
      Seq((200L, 1L), (201L, 2L)).toDF("number", "timestamp")).collect()
    assert(t.length === 1)
    assert(t.head.getAs[String]("quantity") === expected)
    assert(BigInt(expected, 16) === (BigInt(1) << 70) - 1)
    val o = Derive.owners(Derive.transfers(logs)).collect()
    assert(o.length === 1 && o.head.getAs[String]("account") === alice)
    assert(o.head.getAs[String]("quantity") === expected)
  }

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("single-pass transfers equals the union of the per-standard derivations") {
    // full-row distinct, not the 3-key dedup: a repeated token id within
    // one TransferBatch is two legitimate rows in both formulations
    val unioned = Derive.erc721Transfers(fixtureLogs)
      .unionByName(Derive.erc1155SingleTransfers(fixtureLogs))
      .unionByName(Derive.erc1155BatchTransfers(fixtureLogs))
      .distinct()
    assert(rowsOf(Derive.transfers(fixtureLogs)) === rowsOf(unioned))
  }

  test("TransferBatch repeating one token id merges to ONE row with the summed quantity") {
    // ids=[13,13], values=[1,2]: the items share one attribute_version
    // and that triple is the storage identity every sink keys on, so
    // the repeat must collapse with its TOTAL value (3) preserved —
    // dropping either quantity would corrupt the balance folds, and
    // emitting two rows would make the LWW sinks nondeterministically
    // discard one downstream
    val dup = Seq(log(107, 0, 0, Seq(Derive.Erc1155TransferBatchSig, pad32Addr(alice),
        pad32Addr(alice), pad32Addr(bob)),
      data = "0x" + word(0x40) + word(0xa0) + word(2) + word(13) + word(13) +
        word(2) + word(1) + word(2))).toDF()
    val once = Derive.transfers(dup)
    assert(once.count() === 1)
    assert(new java.math.BigInteger(
      once.head.getAs[String]("quantity"), 16).longValue() === 3L)
    // both formulations agree on the merge
    assert(rowsOf(Derive.erc1155BatchTransfers(dup)) === rowsOf(once))
    // replayed log: K8 idempotence unchanged
    assert(rowsOf(Derive.transfers(dup.unionByName(dup))) === rowsOf(once))
  }

  test("replay idempotence: deriving from duplicated logs equals single run") {
    val once = Derive.transfers(fixtureLogs)
    val twice = Derive.transfers(fixtureLogs.unionByName(fixtureLogs))
    assert(rowsOf(once) === rowsOf(twice))
  }

  test("LWW upsert replay converges (A4)") {
    val t = Derive.transfers(fixtureLogs).withColumn("data_version", lit(1))
    val t2 = t.withColumn("data_version", lit(2))
    val keys = Seq("collection_id", "token_id", "attribute_version")
    val merged1 = Lww.upsert(t, t2, keys, Seq("data_version"))
    val merged2 = Lww.upsert(merged1, t2, keys, Seq("data_version"))
    assert(rowsOf(merged1) === rowsOf(merged2))
    assert(merged1.agg(min(col("data_version"))).head().getInt(0) === 2)
  }
}
