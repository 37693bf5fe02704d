package graft.expr

import java.math.BigInteger
import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property tests for the round-2 scalar expressions: digits_int ≅ the
  * regexp_replace+cast reference, hex_to_dec ≅ BigInteger, both through
  * the full codegen'd plan (not just the kernels). */
class ScalarExprsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(7)

  test("TokenCountRule rewrites size(split(s, ' ')) and preserves results") {
    spark.experimental.extraOptimizations = Seq(graft.plans.TokenCountRule)
    // non-foldable input (constant folding would collapse a literal to
    // a LocalRelation before the plan can be inspected)
    val df = spark.range(3)
      .select(size(split(concat(lit("x  y "), col("id").cast("string")), " ")).as("n"))
    assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("tokencount"),
      df.queryExecution.optimizedPlan.toString)
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(4, 4, 4)) // "x  y 0" etc.
    // full value sweep through the rewritten path
    val vals = Seq("", " ", "a b  c ", "héllo wörld x").toDF("text")
      .select(col("text"), size(split(col("text"), " ")).as("n"))
    vals.collect().foreach(r =>
      assert(r.getInt(1) === r.getString(0).split(" ", -1).length))
    // null propagates as null
    assert(spark.sql("SELECT size(split(CAST(NULL AS STRING), ' ')) AS n")
      .head().isNullAt(0))
    // a non-space separator is untouched
    val other = spark.range(1)
      .select(size(split(concat(lit("a,b,"), col("id").cast("string")), ",")).as("n"))
    assert(!other.queryExecution.optimizedPlan.toString.toLowerCase.contains("tokencount"))
    assert(other.head().getInt(0) === 3)
  }

  test("digits_int matches regexp_replace + cast on random noisy strings") {
    val noise = "abc{}:,. \"xyz".toCharArray
    val rows = (1 to 300).map { _ =>
      val sb = new StringBuilder
      val nDigits = rnd.nextInt(8)
      val digits = if (nDigits == 0) "" else (1 to nDigits).map(_ => rnd.nextInt(10)).mkString
      var di = 0
      (0 until 10 + rnd.nextInt(10)).foreach { _ =>
        if (di < digits.length && rnd.nextBoolean()) { sb += digits(di); di += 1 }
        else sb += noise(rnd.nextInt(noise.length))
      }
      sb ++= digits.substring(di)
      sb.toString
    } :+ "" :+ "no digits here" :+ "007"
    val df = rows.toDF("s")
    val got = df.select(Exprs.digitsInt(col("s")).as("a"),
      expr("try_cast(regexp_replace(s, '[^0-9]', '') AS INT)").as("b")).collect()
    got.foreach { r =>
      val a = if (r.isNullAt(0)) null else r.getInt(0)
      val b = if (r.isNullAt(1)) null else r.getInt(1)
      assert(a === b)
    }
  }

  test("digits_int nulls on no digits and on int overflow") {
    val got = Seq("xyz", "99999999999", "2147483647", "2147483648")
      .toDF("s").select(Exprs.digitsInt(col("s"))).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).isNullAt(0))           // > Int.MaxValue -> null
    assert(got(2).getInt(0) === Int.MaxValue)
    assert(got(3).isNullAt(0))
  }

  test("hex_to_dec yields NULL on malformed input instead of failing the query") {
    spark.sql("SELECT 1").collect() // ensure session alive
    Exprs.register(spark)
    val got = spark.sql(
      "SELECT hex_to_dec(s) FROM VALUES ('ff'), ('not hex'), (''), ('0x10') t(s)")
      .collect()
    assert(got(0).getString(0) === "255")
    assert(got(1).isNullAt(0))
    assert(got(2).getString(0) === "0") // normalize('') = '0' by contract
    assert(got(3).getString(0) === "16")
  }

  test("hex_to_dec matches BigInteger across the uint256 range") {
    val vals = (1 to 200).map(_ => new BigInteger(1 + rnd.nextInt(256), rnd.self)) :+
      BigInteger.ZERO :+ BigInteger.ONE
    val df = vals.map(v => HexMath.pad64(v.toString(16))).toDF("h")
    val got = df.select(Exprs.hexToDec(col("h"))).collect().map(_.getString(0))
    got.zip(vals).foreach { case (g, v) => assert(g === v.toString) }
  }

  test("fixed-width kernels reject drifted input types at ANALYSIS, never run on them") {
    // The failure mode under test: a column drifts (int, array<int>,
    // array<double>) and a kernel that assumes string/array<long> reads
    // it through the wrong accessor — getLong garbage, or toString on
    // an int silently parsed as hex digits. Every kernel must fail
    // analysis instead.
    val df = Seq((Array(1, 2), Array(1.5, 2.5), 7L, "0a"))
      .toDF("ai", "ad", "n", "h")
    def rejected(c: org.apache.spark.sql.Column): Unit = {
      val e = intercept[Exception] { df.select(c).collect() }
      assert(e.isInstanceOf[org.apache.spark.sql.AnalysisException],
        s"expected analysis failure, got $e")
    }
    rejected(ArrayExprs.dotLong(col("ai"), col("ai")))      // array<int>
    rejected(ArrayExprs.dotLong(quantize(col("ad")), col("ai"))) // right side too
    rejected(VectorSum.vectorSumLong(col("ad")))            // array<double>
    rejected(ArrayExprs.minhashSigs(col("n")))              // bigint
    rejected(ArrayExprs.shingleHashes(col("n")))
    rejected(Exprs.hexAdd(col("n"), col("h")))              // int-as-hex trap
    rejected(Exprs.hexSub(col("h"), col("n")))
    rejected(Exprs.hexCmp(col("n"), col("n")))
    rejected(Exprs.hexToDec(col("n")))
    rejected(Exprs.keccak256(col("n")))
    rejected(Exprs.digitsInt(col("n")))
    // quantize on array<float|double> stays accepted; array<int> rejected
    rejected(quantize(col("ai")))
    assert(df.select(ArrayExprs.dotLong(quantize(col("ad")), quantize(col("ad"))))
      .head().getLong(0) === (1500L * 1500 + 2500L * 2500))
  }

  private def quantize(c: org.apache.spark.sql.Column) = ArrayExprs.quantize(c)
}
