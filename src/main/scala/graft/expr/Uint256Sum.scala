package graft.expr

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Exact uint256 sum over 64-char-hex columns (SURVEY §2.9: the one
  * custom aggregate the reference's semantics can need — quantities are
  * uint256 and overflow DecimalType(38)). Buffer is a byte-serialized
  * BigInt; output is the canonical padded hex so ordering stays
  * lexicographic == numeric. Partial+final merge comes from the
  * Aggregator contract (map-side combine like any algebraic agg).
  */
object Uint256Sum extends Aggregator[String, Array[Byte], String] {

  override def zero: Array[Byte] = BigInt(0).toByteArray

  override def reduce(buf: Array[Byte], hex: String): Array[Byte] =
    if (hex == null) buf
    else (BigInt(buf) + BigInt(HexMath.normalize(hex), 16)).toByteArray

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    (BigInt(a) + BigInt(b)).toByteArray

  override def finish(buf: Array[Byte]): String = {
    val v = BigInt(buf)
    // canonical sign placement like HexMath.sub: signed inputs (hex_sub
    // results feeding back in) can drive the sum negative, and padding
    // the raw "-5f" rendering would bury the sign mid-string ("00…0-5f"),
    // unparseable by every hex consumer. Sums can exceed 64 hex chars;
    // pad64 keeps >=64 intact.
    if (v.signum < 0) "-" + HexMath.pad64((-v).toString(16))
    else HexMath.pad64(v.toString(16))
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[String] = Encoders.STRING

  /** SQL/DataFrame registration: `uint256_sum(hexCol)`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("uint256_sum", org.apache.spark.sql.functions.udaf(this))

  /** Registry builder for the shared [[Exprs.sqlBuilders]] list — the
    * same ScalaAggregator the `udf.register` path constructs, built
    * directly so sessions registered EITHER way (runtime registerAll
    * or withExtensions injectFunction) expose `uint256_sum`: this was
    * the one function the two surfaces had drifted on after the list
    * unification. The encoders resolve in analysis via Spark's
    * standard ResolveEncodersInScalaAgg rule. */
  private[graft] def sqlBuilder(
      children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoder, ExpressionEncoder}
    new org.apache.spark.sql.execution.aggregate.ScalaAggregator(
      children, this,
      ExpressionEncoder(Encoders.STRING.asInstanceOf[AgnosticEncoder[String]]),
      ExpressionEncoder(bufferEncoder.asInstanceOf[AgnosticEncoder[Array[Byte]]]),
      true, true, 0, 0, Some("uint256_sum"))
  }
}
