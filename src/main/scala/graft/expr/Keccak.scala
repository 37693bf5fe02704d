package graft.expr

/** Pure-Scala Keccak-256 (the pre-FIPS Keccak the reference relies on for
  * event signatures / function selectors, `evm/bin.py:18-35` — note
  * Ethereum uses original Keccak padding 0x01, NOT SHA3's 0x06).
  *
  * Implemented from the public Keccak specification (Bertoni, Daemen,
  * Peeters, Van Assche — keccak.team; FIPS 202 appendix for the
  * permutation): Keccak-f[1600], rate 1088 bits, 24 rounds of
  * theta/rho/pi/chi/iota. Rho offsets are derived from the spec's
  * coordinate recurrence instead of a copied table.
  */
object Keccak {

  private val RoundConstants: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL, 0x8000000080008000L,
    0x000000000000808bL, 0x0000000080000001L, 0x8000000080008081L, 0x8000000000008009L,
    0x000000000000008aL, 0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L, 0x8000000000008003L,
    0x8000000000008002L, 0x8000000000000080L, 0x000000000000800aL, 0x800000008000000aL,
    0x8000000080008081L, 0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  /** rotation offsets r[x][y], derived per spec: (x,y) starts at (1,0),
    * steps (x,y) <- (y, (2x+3y) mod 5), offset(t) = (t+1)(t+2)/2 mod 64. */
  private val RotOffsets: Array[Array[Int]] = {
    val r = Array.fill(5, 5)(0)
    var x = 1; var y = 0
    for (t <- 0 until 24) {
      r(x)(y) = ((t + 1) * (t + 2) / 2) % 64
      val nx = y; val ny = (2 * x + 3 * y) % 5
      x = nx; y = ny
    }
    r
  }

  private def rotl(v: Long, n: Int): Long =
    if (n == 0) v else (v << n) | (v >>> (64 - n))

  private def keccakF(a: Array[Long]): Unit = {
    val b = new Array[Long](25)
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    var round = 0
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ rotl(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= d(x); y += 1 }
        x += 1
      }
      // rho + pi: b[y][(2x+3y)%5] = rot(a[x][y], r[x][y])  (index = x + 5*y)
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) = rotl(a(x + 5 * y), RotOffsets(x)(y))
          y += 1
        }
        x += 1
      }
      // chi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^ (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      // iota
      a(0) ^= RoundConstants(round)
      round += 1
    }
  }

  private val Rate = 136 // bytes (1088-bit rate for 256-bit output)

  /** Keccak-256 digest of `msg`. */
  def hash(msg: Array[Byte]): Array[Byte] = {
    val state = new Array[Long](25)
    // absorb full blocks
    var off = 0
    while (msg.length - off >= Rate) {
      absorb(state, msg, off, Rate)
      keccakF(state)
      off += Rate
    }
    // last (partial) block with multi-rate padding 0x01 .. 0x80
    val last = new Array[Byte](Rate)
    System.arraycopy(msg, off, last, 0, msg.length - off)
    last(msg.length - off) = 0x01.toByte
    last(Rate - 1) = (last(Rate - 1) ^ 0x80.toByte).toByte
    absorb(state, last, 0, Rate)
    keccakF(state)
    // squeeze 32 bytes (little-endian lanes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 32) {
      out(i) = (state(i / 8) >>> (8 * (i % 8))).toByte
      i += 1
    }
    out
  }

  private def absorb(state: Array[Long], block: Array[Byte], off: Int, len: Int): Unit = {
    var i = 0
    while (i < len) {
      state(i / 8) ^= (block(off + i).toLong & 0xffL) << (8 * (i % 8))
      i += 1
    }
  }

  def hashHexOfUtf8(s: String): String =
    toHex(hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  def toHex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** keccak-256 of a text signature -> "0x"-prefixed 32-byte topic hex
    * (the reference's `function_digest`, `evm/bin.py:18-35`). */
  def eventTopic(signature: String): String = "0x" + hashHexOfUtf8(signature)

  /** 4-byte function selector. */
  def functionSelector(signature: String): String =
    "0x" + hashHexOfUtf8(signature).substring(0, 8)
}
