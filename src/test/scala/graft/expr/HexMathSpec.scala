package graft.expr

import java.math.BigInteger
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Property tests (seeded-random): HexMath ≅ BigInteger, and padded-hex
  * lexicographic order ≅ numeric order (SURVEY §7 hard part: uint256
  * fidelity). */
class HexMathSpec extends AnyFunSuite {

  private val rnd = new Random(42)
  private def uint256(): BigInteger = new BigInteger(256, rnd.self)
  private val N = 500

  test("pad64 round-trips and is 64 chars") {
    (1 to N).foreach { _ =>
      val v = uint256()
      val p = HexMath.pad64(v.toString(16))
      assert(p.length === 64)
      assert(new BigInteger(p, 16) === v)
    }
  }

  test("add matches BigInteger") {
    (1 to N).foreach { _ =>
      val (a, b) = (uint256(), uint256())
      val got = HexMath.add("0x" + a.toString(16), b.toString(16))
      assert(new BigInteger(got, 16) === a.add(b))
    }
  }

  test("compare matches BigInteger and pad64 lexicographic order") {
    (1 to N).foreach { _ =>
      val (a, b) = (uint256(), uint256())
      val cmp = HexMath.compare(a.toString(16), b.toString(16))
      assert(Integer.signum(cmp) === Integer.signum(a.compareTo(b)))
      val lex = HexMath.pad64(a.toString(16)).compareTo(HexMath.pad64(b.toString(16)))
      assert(Integer.signum(lex) === Integer.signum(a.compareTo(b)))
    }
  }

  test("sub matches BigInteger on ordered pairs") {
    (1 to N).foreach { _ =>
      val (x, y) = (uint256(), uint256())
      val (hi, lo) = if (x.compareTo(y) >= 0) (x, y) else (y, x)
      val got = HexMath.sub(hi.toString(16), lo.toString(16))
      assert(new BigInteger(got, 16) === hi.subtract(lo))
    }
  }

  test("sub renders negative differences as '-' + pad64(|diff|)") {
    (1 to N).foreach { _ =>
      val (x, y) = (uint256(), uint256())
      val (hi, lo) = if (x.compareTo(y) >= 0) (x, y) else (y, x)
      val got = HexMath.sub(lo.toString(16), hi.toString(16))
      if (hi == lo) assert(got === HexMath.pad64("0"))
      else {
        assert(got.startsWith("-") && got.length === 65)
        assert(new BigInteger(got.substring(1), 16) === hi.subtract(lo))
      }
    }
  }

  test("boundary values") {
    assert(HexMath.pad64("0") === "0" * 64)
    val max = new BigInteger("f" * 64, 16)
    assert(new BigInteger(HexMath.pad64(max.toString(16)), 16) === max)
    assert(HexMath.compare("0x0", "0") === 0)
    assert(HexMath.add("0", "0") === "0" * 64)
  }

  test("add is closed over the canonical signed form (sub results feed back in)") {
    // sub can yield "-" + pad64; add must parse that AND render its own
    // negative results the same way — the old pad64-of-"-5" rendering
    // embedded the sign mid-string, which no consumer could parse
    val neg3 = HexMath.sub("2", "5")
    assert(neg3 === "-" + HexMath.pad64("3"))
    assert(HexMath.add(neg3, "5") === HexMath.pad64("2"))   // -3 + 5
    assert(HexMath.add(neg3, "1") === "-" + HexMath.pad64("2")) // -3 + 1
    assert(HexMath.add(neg3, "3") === HexMath.pad64("0"))
    assert(HexMath.sub(HexMath.add(neg3, neg3), neg3) === neg3) // -6 - -3
  }
}
