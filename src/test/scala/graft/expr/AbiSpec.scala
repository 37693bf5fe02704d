package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ABI decode vectors built per the public ABI spec's head/tail
  * encoding (the same cases the reference's transformer tests exercise,
  * `test/blockcrawler/nft/test_evm_transformers.py`). */
class AbiSpec extends SparkSpec {

  private def word(v: Long): String = HexMath.pad64(java.lang.Long.toHexString(v))

  test("decodeUintArray: (uint256[] ids, uint256[] values) head/tail") {
    // head: offset(ids)=0x40, offset(values)=0xa0; ids=[7,9], values=[100,200]
    val data = "0x" + word(0x40) + word(0xa0) +
      word(2) + word(7) + word(9) +
      word(2) + word(100) + word(200)
    assert(Abi.decodeUintArray(data, 0).toSeq === Seq(word(7), word(9)))
    assert(Abi.decodeUintArray(data, 1).toSeq === Seq(word(100), word(200)))
  }

  test("decodeString: dynamic utf-8 with offset") {
    val s = "ipfs://meta/{id}.json"
    val bytes = s.getBytes("UTF-8")
    val hexBytes = bytes.map(b => f"${b & 0xff}%02x").mkString
    val padded = hexBytes + "0" * (64 - hexBytes.length % 64)
    val data = "0x" + word(0x20) + word(bytes.length.toLong) + padded
    assert(Abi.decodeString(data, 0) === s)
  }

  test("empty data decodes to empty/null") {
    assert(Abi.decodeUintArray("0x", 0).isEmpty)
    assert(Abi.decodeString("0x", 0) === null)
  }

  test("encodeCall: published ERC-20/721 selectors come out exactly") {
    import Abi._
    // canonical public vectors: transfer(address,uint256) = 0xa9059cbb,
    // balanceOf(address) = 0x70a08231, ownerOf(uint256) = 0x6352211e
    assert(encodeCall("transfer(address,uint256)", Seq.empty).startsWith("0xa9059cbb"))
    assert(encodeCall("balanceOf(address)", Seq.empty) === "0x70a08231")
    assert(encodeCall("ownerOf(uint256)",
      Seq(AbiUint(java.math.BigInteger.valueOf(7)))) === "0x6352211e" + word(7))
  }

  test("encode/decode round-trip: static args land in their slots") {
    import Abi._
    val addr = "0xa16081f360e3847006db660bae1c6d1b2e17ec2a"
    val big = new java.math.BigInteger("2").pow(255).subtract(java.math.BigInteger.ONE)
    val payload = "0x" + encodeArgs(Seq(
      AbiAddress(addr), AbiUint(big), AbiBool(true), AbiUint(java.math.BigInteger.ZERO)))
    val slot1 = payload.drop(2).slice(0, 64)
    assert(slot1.takeRight(40) === addr.drop(2))
    assert(payload.drop(2).slice(64, 128) === HexMath.pad64(big.toString(16)))
    assert(payload.drop(2).slice(128, 192) === word(1)) // bool true
    assert(payload.drop(2).slice(192, 256) === word(0))
  }

  test("encode/decode round-trip: dynamic string and uint[] through the real decoders") {
    import Abi._
    val cases = Seq(
      (Seq.empty[java.math.BigInteger], ""),
      (Seq(java.math.BigInteger.valueOf(7), java.math.BigInteger.valueOf(9)), "ipfs://meta/{id}.json"),
      (Seq(new java.math.BigInteger("2").pow(200)), "unicode é中文 tail"),
      ((1L to 40L).map(java.math.BigInteger.valueOf).toSeq, "x" * 95))
    cases.foreach { case (arr, s) =>
      // mixed head: static, dynamic, static, dynamic — offsets must skip
      // the whole head and earlier tails
      val payload = "0x" + encodeArgs(Seq(
        AbiUint(java.math.BigInteger.valueOf(42)),
        AbiUintArray(arr),
        AbiBool(false),
        AbiString(s)))
      assert(Abi.decodeUintArray(payload, 1).toSeq === arr.map(v => HexMath.pad64(v.toString(16))))
      assert(Abi.decodeString(payload, 3) === (if (s.isEmpty) s else s))
      assert(payload.drop(2).slice(0, 64) === word(42))
    }
  }

  test("encode/decode round-trip property: 300 seeded random mixed-arg payloads") {
    import Abi._
    val rnd = new scala.util.Random(42) // fixed seed: failures reproduce
    def randUint() = new java.math.BigInteger(rnd.nextInt(257), rnd.self)
    def randArg(): AbiArg = rnd.nextInt(5) match {
      case 0 => AbiUint(randUint())
      case 1 => AbiAddress("0x" + Seq.fill(40)("0123456789abcdef"(rnd.nextInt(16))).mkString)
      case 2 => AbiBool(rnd.nextBoolean())
      // surrogate-safe alphabet (arbitrary UTF-16 can emit unpaired
      // surrogates, which legitimately don't round-trip UTF-8); BMP
      // chars only — a supplementary char is two UTF-16 units and
      // charAt would split it
      case 3 => AbiString(Seq.fill(rnd.nextInt(120))(
        "aZ9 é中{}/:#\n".charAt(rnd.nextInt(12))).mkString)
      case _ => AbiUintArray(Seq.fill(rnd.nextInt(20))(randUint()))
    }
    (1 to 300).foreach { _ =>
      val args = Seq.fill(1 + rnd.nextInt(6))(randArg())
      val payload = "0x" + encodeArgs(args)
      args.zipWithIndex.foreach {
        case (AbiUint(v), slot) =>
          assert(Abi.dataWord(org.apache.spark.sql.functions.lit(payload), slot + 1) != null)
          assert(payload.drop(2).slice(slot * 64, slot * 64 + 64) ===
            HexMath.pad64(v.toString(16)))
        case (AbiAddress(a), slot) =>
          assert(payload.drop(2).slice(slot * 64, slot * 64 + 64).takeRight(40) === a.drop(2))
        case (AbiBool(b), slot) =>
          assert(payload.drop(2).slice(slot * 64, slot * 64 + 64) ===
            HexMath.pad64(if (b) "1" else "0"))
        case (AbiString(s), slot) =>
          assert(Abi.decodeString(payload, slot) === s)
        case (AbiUintArray(vs), slot) =>
          assert(Abi.decodeUintArray(payload, slot).toSeq ===
            vs.map(v => HexMath.pad64(v.toString(16))))
      }
    }
  }

  test("static slices + custom expressions inside a plan") {
    import spark.implicits._
    Exprs.register(spark)
    val topic = "0x000000000000000000000000a16081f360e3847006db660bae1c6d1b2e17ec2a"
    val df = Seq((topic, word(5), word(7))).toDF("topic", "qa", "qb")
      .select(
        Abi.topicAddress($"topic").as("addr"),
        Abi.wordToLong($"qa").as("num"),
        Exprs.hexAdd($"qa", $"qb").as("sum"),
        Exprs.hexCmp($"qa", $"qb").as("cmp"),
        Exprs.keccak256(lit("Transfer(address,address,uint256)")).as("sig"))
    val r = df.head()
    assert(r.getAs[String]("addr") === "0xa16081f360e3847006db660bae1c6d1b2e17ec2a")
    assert(r.getAs[String]("sum") === word(12))
    assert(r.getAs[Int]("cmp") === -1)
    assert("0x" + r.getAs[String]("sig") === graft.nft.Derive.Erc721TransferSig)
    // SQL surface
    val viaSql = spark.sql("SELECT hex_add('0x01', 'ff') AS s").head().getString(0)
    assert(viaSql === word(0x100))
  }
}
