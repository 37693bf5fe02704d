package graft.model

/** EVM logs bloom — the yellow paper's M(O) 2048-bit filter
  * (`evm/types.py:116` stores it; geth computes it per receipt/header):
  * every log contributes its address and each topic; an item sets the
  * three bits indexed by the low 11 bits of the keccak digest's byte
  * pairs (h[0..1], h[2..3], h[4..5]). The bloom renders as a 2048-bit
  * BIG-ENDIAN integer in 0x + 512 lowercase hex (bit 0 = the least
  * significant bit of the last hex digit) — the wire form
  * `eth_getTransactionReceipt.logsBloom` carries.
  *
  * Why the engine computes it rather than just parsing it: the filter
  * has NO false negatives by construction, so a topic-filtered crawl
  * can discard receipts BEFORE exploding their log arrays — a plan-time
  * literal's three bit positions compile into three codegen'd hex-digit
  * tests ([[graft.expr.Exprs.bloomMayContain]]), no per-row keccak.
  */
object Bloom {

  private def hexToBytes(h: String): Array[Byte] = {
    val s = if (h.startsWith("0x") || h.startsWith("0X")) h.drop(2) else h
    require(s.length % 2 == 0, s"odd-length hex item: $h")
    Array.tabulate(s.length / 2)(i =>
      Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  /** The three 11-bit bloom indexes of one item (an address or topic,
    * 0x-hex). Pure function of the item — callable at PLAN time so a
    * filter on a literal topic never hashes per row. */
  def bitsOf(itemHex: String): Seq[Int] = {
    val h = graft.expr.Keccak.hash(hexToBytes(itemHex))
    (0 until 3).map(i => (((h(2 * i) & 0xff) << 8) | (h(2 * i + 1) & 0xff)) & 2047)
  }

  /** The receipt-level bloom over its logs (geth `types.CreateBloom`
    * semantics: address + every topic of every log). Empty logs →
    * all-zero bloom. */
  def logsBloom(logs: Seq[EvmLog]): String = {
    val bits = new java.util.BitSet(2048)
    logs.foreach { l =>
      (Option(l.address).toSeq ++ l.topics)
        .foreach(item => bitsOf(item).foreach(bits.set))
    }
    render(bits)
  }

  private def render(bits: java.util.BitSet): String = {
    val digits = new Array[Int](512)
    var b = bits.nextSetBit(0)
    while (b >= 0) {
      digits(511 - b / 4) |= 1 << (b % 4)
      b = bits.nextSetBit(b + 1)
    }
    val sb = new StringBuilder(514)
    sb.append("0x")
    var i = 0
    while (i < 512) { sb.append(Character.forDigit(digits(i), 16)); i += 1 }
    sb.toString
  }
}
