package graft.expr

import java.security.MessageDigest
import scala.util.Random

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (seeded-random, no Spark session): the native array
  * kernels ≅ naive reference implementations over random token
  * streams. These are the hot loops every dedup/decontamination
  * operator rides on — a silent divergence here would break oracle
  * parity everywhere downstream. */
class ArrayKernelsSpec extends AnyFunSuite {

  private val rnd = new Random(1234)
  private val N = 200

  // Local copy of SparkSpec.md5hex: this suite is deliberately
  // session-free (plain AnyFunSuite) and cannot mix in the Spark base.
  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def randomText(): String = {
    val n = rnd.nextInt(12) // 0..11 tokens, covers the < 3 edge
    Seq.fill(n)("w" + rnd.nextInt(6)).mkString(" ")
  }

  test("tokenCount == split(' ', -1).length on adversarial strings") {
    val cases = Seq("", " ", "  ", "a", "a b", " a", "a ", "a  b ",
      "héllo wörld", "日本 語 テスト", "a\tb", "\n \n") ++
      Seq.fill(N) {
        Seq.fill(rnd.nextInt(8))(
          Seq("", "w" + rnd.nextInt(5), "é", "日本", " ")(rnd.nextInt(5))
        ).mkString(" ")
      }
    cases.foreach { s =>
      assert(TokenKernels.tokenCount(UTF8String.fromString(s)) ===
        s.split(" ", -1).length, s"for ${s.replace(" ", "_")}")
    }
  }

  private def refShingles(text: String): Seq[String] = {
    val t = text.split(" ", -1)
    (0 until math.max(0, t.length - 2))
      .map(i => md5hex(s"${t(i)} ${t(i + 1)} ${t(i + 2)}")).distinct
  }

  test("shingleHashes matches a naive distinct-md5 reference") {
    (1 to N).foreach { _ =>
      val text = randomText()
      val got = ArrayKernels.shingleHashes(UTF8String.fromString(text))
      val want = refShingles(text)
      if (text.split(" ", -1).length < 3) assert(got === null, text)
      else assert(got.toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq === want, text)
    }
  }

  test("shinglePosHashes matches a naive positioned (non-distinct) reference") {
    (1 to N).foreach { _ =>
      val text = randomText()
      (2 to 5).foreach { k =>
        val t = text.split(" ", -1)
        val got = ArrayKernels.shinglePosHashes(UTF8String.fromString(text), k)
        if (t.length < k) assert(got === null, s"k=$k text=$text")
        else {
          val want = (0 to t.length - k).map(i => md5hex(t.slice(i, i + k).mkString(" ")))
          assert(got.toArray[UTF8String](org.apache.spark.sql.types.StringType)
            .map(_.toString).toSeq === want, s"k=$k text=$text")
        }
      }
    }
    // repeats are KEPT (positioned, not distinct) — the property the
    // span detector depends on
    val rep = ArrayKernels.shinglePosHashes(UTF8String.fromString("a b a b"), 2)
      .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString)
    assert(rep.length === 3)
    assert(rep(0) === rep(2)) // "a b" at pos 0 and pos 2
  }

  test("winnowFingerprints == naive window-min reference on random inputs") {
    (1 to N).foreach { _ =>
      val text = randomText()
      for (k <- 2 to 4; w <- 1 to 5) {
        val t = text.split(" ", -1)
        val got = ArrayKernels.winnowFingerprints(UTF8String.fromString(text), k, w)
        if (t.length < k) assert(got === null, s"k=$k w=$w text=$text")
        else {
          val sh = (0 to t.length - k).map(i => md5hex(t.slice(i, i + k).mkString(" ")))
          val want =
            if (sh.length <= w) Set(sh.min)
            else (0 to sh.length - w).map(j => sh.slice(j, j + w).min).toSet
          assert(got.toArray[UTF8String](org.apache.spark.sql.types.StringType)
            .map(_.toString).toSet === want, s"k=$k w=$w text=$text")
        }
      }
    }
  }

  test("stripPositions == filter-by-set reference on random inputs") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    (1 to N).foreach { _ =>
      val toks = Seq.fill(rnd.nextInt(15))("w" + rnd.nextInt(9))
      val text = toks.mkString(" ")
      val all = text.split(" ", -1)
      val cov = (1 to all.length).filter(_ => rnd.nextBoolean()).toArray
      val got = ArrayKernels.stripPositions(
        UTF8String.fromString(text), new GenericArrayData(cov)).toString
      val want = all.zipWithIndex.collect {
        case (w, i) if !cov.contains(i + 1) => w
      }.mkString(" ")
      assert(got === want, s"text=$text cov=${cov.mkString(",")}")
    }
    // out-of-range positions are ignored
    val g = ArrayKernels.stripPositions(
      UTF8String.fromString("a b c"), new GenericArrayData(Array(2, 7))).toString
    assert(g === "a c")
  }

  test("minhashSigs matches per-slice minima of the full shingle set") {
    (1 to N).foreach { _ =>
      val text = randomText()
      val toks = text.split(" ", -1)
      val all = (0 until math.max(0, toks.length - 2))
        .map(i => md5hex(s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}"))
      val got = ArrayKernels.minhashSigs(UTF8String.fromString(text), 4)
      if (toks.length < 3) assert(got === null, text)
      else {
        val sigs = got.toArray[UTF8String](org.apache.spark.sql.types.StringType)
          .map(_.toString)
        (0 until 4).foreach { s =>
          assert(sigs(s) === all.map(_.substring(8 * s, 8 * s + 8)).min, s"$text slice $s")
        }
      }
    }
  }

  test("dotLong and quantize compose to the exact integer dot product") {
    (1 to N).foreach { _ =>
      val dim = 1 + rnd.nextInt(8)
      val a = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
      def q(x: Float): Long = java.math.BigDecimal.valueOf(x.toDouble * 1000d)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      val want = (0 until dim).map(i => q(a(i)) * q(b(i))).sum
      val qa = ArrayKernels.quantize(new org.apache.spark.sql.catalyst.util.GenericArrayData(
        a.map(java.lang.Float.valueOf)))
      val qb = ArrayKernels.quantize(new org.apache.spark.sql.catalyst.util.GenericArrayData(
        b.map(java.lang.Float.valueOf)))
      assert(ArrayKernels.dotLong(qa, qb) === want)
    }
  }

  test("subLong == element-wise subtraction, truncating to the shorter input") {
    (1 to N).foreach { _ =>
      val n = 1 + rnd.nextInt(8)
      val m = 1 + rnd.nextInt(8)
      val a = Array.fill(n)(rnd.nextLong() % 100000L)
      val b = Array.fill(m)(rnd.nextLong() % 100000L)
      val got = ArrayKernels.subLong(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(a),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(b))
      val want = a.zip(b).map { case (x, y) => x - y }
      assert(got.numElements() === math.min(n, m))
      (0 until got.numElements()).foreach(i => assert(got.getLong(i) === want(i)))
    }
  }

  test("quantizeDouble on unsafe 8-byte-slot arrays == quantize on the float values") {
    // UnsafeArrayData packs doubles in 8-byte slots; reading them with
    // getFloat would return garbage halves. This pins that the double
    // kernel + plan-time dispatch produce the same milli-units as the
    // float path for representable values (a driver drift of the
    // embedding column float->double must not corrupt signatures).
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    (1 to N).foreach { _ =>
      val dim = 1 + rnd.nextInt(8)
      val f = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
      val qf = ArrayKernels.quantize(UnsafeArrayData.fromPrimitiveArray(f))
      val qd = ArrayKernels.quantizeDouble(
        UnsafeArrayData.fromPrimitiveArray(f.map(_.toDouble)))
      assert(qd.toLongArray().toSeq === qf.toLongArray().toSeq)
    }
  }

  test("linearScore == naive HashMap-free reference on random inputs") {
    val vocab = Seq("w0" -> 150L, "w1" -> -220L, "w3" -> 17L, "é" -> 5L, "" -> -3L)
    val hm = new java.util.HashMap[String, java.lang.Long]()
    vocab.foreach { case (t, w) => hm.put(t, w) }
    val cases = Seq("", " ", "w0", "w0 w1 w0", "unknown only here") ++
      Seq.fill(N)(randomText())
    cases.foreach { s =>
      val got = LinearScoreKernel.score(UTF8String.fromString(s), hm, 42L)
        .toLongArray().toSeq
      val toks = s.split(" ", -1)
      val ref = 42L + toks.map(t => vocab.toMap.getOrElse(t, 0L)).sum
      assert(got === Seq(ref, toks.length.toLong), s"for '$s'")
    }
  }
}
