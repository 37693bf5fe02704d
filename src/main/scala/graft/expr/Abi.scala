package graft.expr

import java.math.BigInteger
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** ABI decoding (SURVEY.md P3, `nft/evm/transformers.py:271-336`,
  * `nft/evm/consumers.py:541-634`).
  *
  * Static types (address, uint256 in a fixed slot) are pure column
  * slices — codegen'd builtins, no UDF. Dynamic types (string,
  * uint256[] with head/tail offset encoding) use small Scala UDFs over
  * the hex payload; they sit at the decode edge of the plan (applied
  * after the topic filter prunes 99% of rows), so the non-codegen cost
  * is on the smallest possible input.
  */
object Abi {

  /** topic/word (0x + 64 hex) -> 20-byte address ("0x" + last 40 hex). */
  def topicAddress(c: Column): Column =
    concat(lit("0x"), substring(c, 27, 40))

  /** word at 1-based `slot` of the 0x-prefixed data payload, as 64-hex. */
  def dataWord(data: Column, slot: Int): Column =
    lower(substring(data, 3 + (slot - 1) * 64, 64))

  /** 64-hex word -> long (for values known to fit; full-range callers
    * keep the hex form per FIXTURES.md conventions). */
  def wordToLong(c: Column): Column = conv(c, 16, 10).cast("long")

  /** topic (0x + 64 hex) -> canonical lowercase 64-hex uint256. */
  def topicUint(c: Column): Column = lower(substring(c, 3, 64))

  // ---- dynamic types ----

  private def strip0x(s: String): String =
    if (s != null && (s.startsWith("0x") || s.startsWith("0X"))) s.substring(2) else s

  private def wordAt(hex: String, byteOffset: Int): String =
    hex.substring(byteOffset * 2, byteOffset * 2 + 64)

  private def uintAt(hex: String, byteOffset: Int): BigInteger =
    new BigInteger(wordAt(hex, byteOffset), 16)

  /** Decode `uint256[]` in head/tail form: `slot` is the 0-based head
    * position holding the tail offset. Returns 64-hex elements. */
  def decodeUintArray(data: String, slot: Int): Array[String] = {
    val hex = strip0x(data)
    if (hex == null || hex.isEmpty) return Array.empty
    val offset = uintAt(hex, slot * 32).intValueExact()
    val len = uintAt(hex, offset).intValueExact()
    Array.tabulate(len)(i => wordAt(hex, offset + 32 + i * 32).toLowerCase)
  }

  /** Decode a dynamic `string` at head `slot` (UTF-8). */
  def decodeString(data: String, slot: Int): String = {
    val hex = strip0x(data)
    if (hex == null || hex.isEmpty) return null
    val offset = uintAt(hex, slot * 32).intValueExact()
    val len = uintAt(hex, offset).intValueExact()
    val bytes = new Array[Byte](len)
    var i = 0
    while (i < len) {
      bytes(i) = Integer.parseInt(hex.substring((offset + 32 + i) * 2, (offset + 32 + i) * 2 + 2), 16).toByte
      i += 1
    }
    new String(bytes, StandardCharsets.UTF_8)
  }

  val decodeUintArrayUdf =
    udf((data: String, slot: Int) => decodeUintArray(data, slot))
  val decodeStringUdf =
    udf((data: String, slot: Int) => decodeString(data, slot))

  def register(spark: SparkSession): Unit = {
    spark.udf.register("abi_uint_array", decodeUintArrayUdf)
    spark.udf.register("abi_string", decodeStringUdf)
  }
}
