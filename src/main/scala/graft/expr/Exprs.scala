package graft.expr

import java.math.BigInteger

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst scalar expressions for the three gaps Spark's builtin
  * functions can't cover (SURVEY.md §2.9 / §4): keccak-256 (P9) and
  * uint256 hex arithmetic/compare beyond 2^63 (P8). Each generates
  * inline code (a static call — stays inside whole-stage codegen, no
  * Scala-closure UDF serialization on the hot path).
  */
object HexMath {
  def normalize(hex: String): String = {
    val h = if (hex.startsWith("0x") || hex.startsWith("0X")) hex.substring(2) else hex
    if (h.isEmpty) "0" else h
  }

  /** zero-padded 64-char lowercase hex — `HexInt.padded_hex`
    * (`core/types.py:113-122`); lexicographic order == numeric order. */
  def pad64(hex: String): String = {
    val h = normalize(hex).toLowerCase
    if (h.length >= 64) h else ("0" * (64 - h.length)) + h
  }

  def add(a: String, b: String): String = {
    val d = new BigInteger(normalize(a), 16).add(new BigInteger(normalize(b), 16))
    // same canonical signed form as [[sub]]: pad64 of a negative
    // rendering would embed the sign mid-string ("000…0-5"), unparseable
    // by every consumer — signed inputs arise once subtraction results
    // (e.g. net balances) feed back into addition
    if (d.signum() < 0) "-" + pad64(d.negate().toString(16)) else pad64(d.toString(16))
  }

  /** Difference with a canonical signed form: non-negative results are
    * plain pad64 hex (lexicographic == numeric); negative results are
    * `-` + pad64(|diff|). Earlier versions padded the raw negative
    * BigInteger rendering ("000…0-5"), which was unparseable. */
  def sub(a: String, b: String): String = {
    val d = new BigInteger(normalize(a), 16).subtract(new BigInteger(normalize(b), 16))
    if (d.signum() < 0) "-" + pad64(d.negate().toString(16)) else pad64(d.toString(16))
  }

  def compare(a: String, b: String): Int =
    new BigInteger(normalize(a), 16).compareTo(new BigInteger(normalize(b), 16))

  /** Decimal rendering that yields null (not an exception) on a
    * malformed hex string — hex_to_dec is on the SQL surface where
    * users pass arbitrary strings. */
  def toDecOrNull(s: String): UTF8String =
    try UTF8String.fromString(new BigInteger(normalize(s), 16).toString)
    catch { case _: NumberFormatException => null }

  def fromLong(v: Long): String = pad64(java.lang.Long.toHexString(v))
}

object DigitKernels {
  /** All digits of `s` in order, parsed as an int — same result as
    * `CAST(regexp_replace(s, '[^0-9]', '') AS INT)` without the regex
    * engine on the hot path. Returns Int.MinValue as a "null" sentinel
    * when `s` has no digits or the value overflows an int (the caller
    * expression translates the sentinel to SQL NULL). */
  def digitsToInt(s: UTF8String): Int = {
    val bytes = s.getBytes
    var acc = 0L
    var any = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= '0' && b <= '9') {
        any = true
        acc = acc * 10 + (b - '0')
        if (acc > Int.MaxValue) return Int.MinValue
      }
      i += 1
    }
    if (any) acc.toInt else Int.MinValue
  }
}

/** digits_int(string) -> int: digit-subsequence parse (P3 ABI payload
  * extraction without a regex per row). */
case class DigitsIntExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.string("digits_int", child.dataType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val r = DigitKernels.digitsToInt(v.asInstanceOf[UTF8String])
    if (r == Int.MinValue) null else Integer.valueOf(r)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.DigitKernels.digitsToInt($c);
         |${ev.isNull} = (${ev.value} == Integer.MIN_VALUE);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): DigitsIntExpr = copy(c)
}

object TokenKernels {
  /** Exactly `size(split(s, " "))` without materializing the array:
    * separator count + 1 in one byte scan. A 0x20 byte never occurs
    * inside a multi-byte UTF-8 sequence (continuation bytes are
    * >= 0x80), so counting space BYTES counts space CHARS. Matches
    * Spark's split(limit = -1) semantics bit-for-bit: leading /
    * trailing / consecutive separators all produce empty tokens, and
    * the empty string has one token. */
  def tokenCount(s: UTF8String): Int = {
    // getByte indexing, not getBytes: an UnsafeRow-backed string would
    // copy its bytes out per row — the allocation this kernel exists
    // to avoid.
    val len = s.numBytes
    var n = 1
    var i = 0
    while (i < len) {
      if (s.getByte(i) == ' ') n += 1
      i += 1
    }
    n
  }
}

/** token_count(string) = size(split(s, ' ')) with no per-row array
  * allocation — substituted automatically by
  * [[graft.plans.TokenCountRule]] wherever the split-size idiom
  * appears, so every token-counting query (packing, token stats,
  * quality gates) pays one byte scan instead of building and
  * discarding a token array per row. */
case class TokenCountExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.string("token_count", child.dataType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    Integer.valueOf(TokenKernels.tokenCount(v.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TokenKernels.tokenCount($c)")
  override protected def withNewChildInternal(c: Expression): TokenCountExpr = copy(c)
}

/** keccak256(string) -> 64-char lowercase hex string. */
case class Keccak256Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.string("keccak256", child.dataType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Keccak.hashHexOfUtf8(v.toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.expr.Keccak.hashHexOfUtf8($c.toString()))")
  override protected def withNewChildInternal(c: Expression): Keccak256Expr = copy(c)
}

/** hex_add(hexstr, hexstr) -> padded 64-char hex of the uint256 sum. */
case class HexAddExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.strings("hex_add", left.dataType, right.dataType)
  override def dataType: DataType = StringType
  override def nullSafeEval(a: Any, b: Any): Any =
    UTF8String.fromString(HexMath.add(a.toString, b.toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.expr.HexMath.add($a.toString(), $b.toString()))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HexAddExpr =
    copy(l, r)
}

/** hex_sub(hexstr, hexstr) -> padded 64-char hex of the difference. */
case class HexSubExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.strings("hex_sub", left.dataType, right.dataType)
  override def dataType: DataType = StringType
  override def nullSafeEval(a: Any, b: Any): Any =
    UTF8String.fromString(HexMath.sub(a.toString, b.toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.expr.HexMath.sub($a.toString(), $b.toString()))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HexSubExpr =
    copy(l, r)
}

/** hex_to_dec(hexstr) -> decimal string of the uint256 value (for
  * engines whose widest integer can hold it, e.g. a 128-bit HUGEINT,
  * this makes the custom uint256 aggregate differentially checkable).
  * Malformed input yields NULL — this function is registered on the
  * SQL surface, so a bad string must not fail the whole query. */
case class HexToDecExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.string("hex_to_dec", child.dataType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    HexMath.toDecOrNull(v.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.HexMath.toDecOrNull($c.toString());
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): HexToDecExpr = copy(c)
}

/** hex_cmp(hexstr, hexstr) -> -1/0/1 uint256 comparison. */
case class HexCmpExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.strings("hex_cmp", left.dataType, right.dataType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    Integer.valueOf(HexMath.compare(a.toString, b.toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expr.HexMath.compare($a.toString(), $b.toString())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HexCmpExpr =
    copy(l, r)
}

object Exprs {
  def keccak256(c: Column): Column = GraftColumnShim.column(Keccak256Expr(GraftColumnShim.expression(c)))
  def digitsInt(c: Column): Column = GraftColumnShim.column(DigitsIntExpr(GraftColumnShim.expression(c)))
  def hexAdd(a: Column, b: Column): Column =
    GraftColumnShim.column(HexAddExpr(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
  def hexCmp(a: Column, b: Column): Column =
    GraftColumnShim.column(HexCmpExpr(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
  def hexSub(a: Column, b: Column): Column =
    GraftColumnShim.column(HexSubExpr(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
  def hexToDec(c: Column): Column = GraftColumnShim.column(HexToDecExpr(GraftColumnShim.expression(c)))

  /** Pre-explode receipt pruning on the logs bloom: may `bloom` (the
    * 0x + 512-hex `logs_bloom` column) contain `itemHex` (a topic or
    * address LITERAL)? The item's three 11-bit positions are computed
    * at PLAN time ([[graft.model.Bloom.bitsOf]]) — the filter compiles
    * to three codegen'd hex-digit bit tests, no per-row keccak, no UDF.
    * No false negatives by the yellow-paper construction: a receipt
    * whose logs carry the item ALWAYS passes; false positives just fall
    * through to the exact topic filter after the explode. At 100 TB
    * this turns a topic-filtered crawl's explode+filter over every
    * receipt into a scan that discards ~all irrelevant receipts while
    * still column-pruned at the source. */
  def bloomMayContain(bloom: Column, itemHex: String): Column = {
    import org.apache.spark.sql.functions.{coalesce, conv, lit, substring}
    val test = graft.model.Bloom.bitsOf(itemHex).map { pos =>
      // hex digit pos/4 counted from the RIGHT of the 512-char body;
      // substring is 1-based and skips the 0x prefix
      val charPos = 2 + 512 - pos / 4
      conv(substring(bloom, charPos, 1), 16, 10).cast("int")
        .bitwiseAND(lit(1 << (pos % 4))) =!= 0
    }.reduce(_ && _)
    // a NULL bloom (schema-evolved rows predating the column) must PASS
    // — an unknown filter cannot prune, and a three-valued null here
    // would silently drop the receipt inside a Filter: the one way this
    // "no false negatives" contract could break
    coalesce(test, lit(true))
  }

  /** Integer-literal argument guard shared by the parameterized
    * kernels: k/w/capacity are evaluated ONCE at resolution, so the
    * kernel's width is a plan-time constant like the Scala-side
    * API's. Arity and foldability are checked first — es(1) on a
    * 1-arg call or eval() on a column reference throws an obscure
    * internal error, not the contract message. Math.toIntExact, not
    * .toInt: silent truncation would let 4294967300 alias to 4 and
    * sail through a bounds check. */
  private def litInt(e: Expression, fn: String, name: String): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn $name must be an integer literal, got non-literal ${e.sql}")
    e.eval() match {
      case i: Int  => i
      case l: Long =>
        try Math.toIntExact(l) catch {
          case _: ArithmeticException => throw new IllegalArgumentException(
            s"$fn $name must be an integer literal in Int range, got $l")
        }
      case other   => throw new IllegalArgumentException(
        s"$fn $name must be an integer literal, got $other")
    }
  }

  /** The engine's SQL function surface — ONE list consumed by BOTH
    * registration paths (runtime [[register]] for a plain session and
    * [[graft.GraftExtensions]]'s injectFunction for sessions built
    * withExtensions), so the two surfaces cannot drift. Aggregates
    * register as bare AggregateFunctions — the analyzer wraps them in
    * AggregateExpression. */
  private[graft] val sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "keccak256" -> (es => Keccak256Expr(es.head)),
    "digits_int" -> (es => DigitsIntExpr(es.head)),
    "hex_add" -> (es => HexAddExpr(es(0), es(1))),
    "hex_sub" -> (es => HexSubExpr(es(0), es(1))),
    "hex_cmp" -> (es => HexCmpExpr(es(0), es(1))),
    "hex_to_dec" -> (es => HexToDecExpr(es.head)),
    "minhash_sigs" -> (es => MinHashSigsExpr(es.head)),
    "shingle_hashes" -> (es => ShingleHashesExpr(es.head)),
    "shingle_pos_hashes" -> (es => {
      if (es.length != 2) throw new IllegalArgumentException(
        s"shingle_pos_hashes expects (text, k literal), got ${es.length} argument(s)")
      ShinglePosHashesExpr(es(0), litInt(es(1), "shingle_pos_hashes", "k"))
    }),
    "strip_positions" -> (es => StripPositionsExpr(es(0), es(1))),
    "winnow_fps" -> (es => {
      if (es.length != 3) throw new IllegalArgumentException(
        s"winnow_fps expects (text, k literal, w literal), got ${es.length} argument(s)")
      WinnowFpsExpr(es(0), litInt(es(1), "winnow_fps", "k"),
        litInt(es(2), "winnow_fps", "w"))
    }),
    "quantize_embedding" -> (es => QuantizeExpr(es.head)),
    "dot_long" -> (es => DotLongExpr(es(0), es(1))),
    "vector_sum_long" -> (es => VectorSumLongAgg(es.head)),
    "covar_sums_long" -> (es => CovarSumsLongAgg(es.head)),
    // the sketch family, SQL-complete: build/merge/probe the at-rest
    // rollup idiom (x3/x4/x5) without touching the Column API
    "kll_sketch" -> (es => KllSketchAgg(es.head)),
    "kll_merge" -> (es => KllMergeAgg(es.head)),
    "kll_quantile" -> (es => KllQuantileExpr(es(0), es(1))),
    "cms_estimate" -> (es => CmsEstimateExpr(es(0), es(1))),
    "mg_sketch" -> (es => {
      if (es.length != 2) throw new IllegalArgumentException(
        s"mg_sketch expects (item, capacity literal), got ${es.length} argument(s)")
      MisraGriesAgg(es(0), litInt(es(1), "mg_sketch", "capacity"))
    }),
    // the one Aggregator-backed entry: a ScalaAggregator built exactly
    // as udf.register would, so it rides the SAME shared list instead
    // of a second registration path (which had drifted once already)
    "uint256_sum" -> (es => {
      if (es.length != 1) throw new IllegalArgumentException(
        s"uint256_sum expects (hex_value), got ${es.length} argument(s)")
      Uint256Sum.sqlBuilder(es)
    })
  )

  /** SQL-surface registration for a plain session (Catalog.registerAll
    * path); sessions built withExtensions get the same list via
    * [[graft.GraftExtensions]]. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlBuilders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
