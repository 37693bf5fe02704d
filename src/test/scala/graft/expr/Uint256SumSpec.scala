package graft.expr

import java.math.BigInteger
import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Uint256SumSpec extends SparkSpec {
  import spark.implicits._

  test("uint256_sum matches BigInteger over values beyond 2^63 and decimal(38)") {
    val rnd = new Random(7)
    val values = (1 to 200).map(_ => new BigInteger(256, rnd.self))
    val expected = values.reduce(_ add _)
    val df = values.map(v => HexMath.pad64(v.toString(16))).toDF("q")
    // DataFrame surface
    val got = df.agg(udaf(Uint256Sum).apply(col("q"))).head().getString(0)
    assert(new BigInteger(got, 16) === expected)
    // SQL surface + grouped partial/final merge across partitions
    Exprs.register(spark)
    df.repartition(7).createOrReplaceTempView("qs")
    val got2 = spark.sql("SELECT uint256_sum(q) FROM qs").head().getString(0)
    assert(new BigInteger(got2, 16) === expected)
    // hex_sub round-trip: sum - v0 == sum of tail
    val tail = values.tail.reduce(_ add _)
    val sub = spark.sql(
      s"SELECT hex_sub('${HexMath.pad64(expected.toString(16))}', '${HexMath.pad64(values.head.toString(16))}') s"
    ).head().getString(0)
    assert(new BigInteger(sub, 16) === tail)
  }

  test("wrong arity from SQL fails with the registry's clear message") {
    Exprs.register(spark)
    Seq(HexMath.pad64("1")).toDF("q").createOrReplaceTempView("qa")
    val e = intercept[Exception](
      spark.sql("SELECT uint256_sum(q, q) FROM qa").collect())
    assert(e.getMessage.contains("uint256_sum expects (hex_value)"),
      s"expected the arity guard message, got: ${e.getMessage}")
  }

  test("negative sums render the canonical '-' + pad64 form, like hex_sub") {
    // signed inputs legitimately arise when hex_sub results feed back
    // into arithmetic; the sign must lead the string, never sit inside
    // the zero padding where every hex consumer chokes on it
    val df = Seq("-" + HexMath.pad64("a"), HexMath.pad64("3")).toDF("q")
    val got = df.agg(udaf(Uint256Sum).apply(col("q"))).head().getString(0)
    assert(got === "-" + HexMath.pad64("7"))
    assert(HexMath.compare(got, HexMath.pad64("0")) < 0) // parseable downstream
  }
}
