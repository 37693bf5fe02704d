package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hot-path array kernels as native expressions.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`)
  * evaluate their lambda *interpreted, per element* — measured ~20us per
  * shingle on the minhash path, 10x slower than the equivalent tight
  * JVM loop. These expressions run one fast per-row loop instead; the
  * call itself is codegen'd (a static-shaped method call), so plans stay
  * inside whole-stage codegen.
  */
object ArrayKernels {

  private val md5tl = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))
  private val HexChars = "0123456789abcdef".toCharArray

  private def md5hex(s: String): String = {
    val md = md5tl.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** k MinHash signatures of word 3-gram shingles: md5 per shingle, the
    * s-th signature is the min over shingles of hex digits
    * [8s, 8s+8). Identical to the SQL formulation in
    * PipelineQueries.dedup_minhash — kept in lockstep for the oracle. */
  def minhashSigs(text: UTF8String, numHashes: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < 3) return null
    val mins = new Array[String](numHashes)
    var i = 0
    while (i + 2 < toks.length) {
      val h = md5hex(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      var s = 0
      while (s < numHashes) {
        val slice = h.substring(8 * s, 8 * s + 8)
        if (mins(s) == null || slice.compareTo(mins(s)) < 0) mins(s) = slice
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_)))
  }

  /** Distinct md5 hashes of word 3-gram shingles, one tight loop per
    * row (the interpreted transform-lambda formulation costs ~20us per
    * shingle — 10x this loop). Insertion-ordered dedup matches
    * `array_distinct`/`list_distinct` first-occurrence semantics, so
    * the SQL oracle mirrors it verbatim. Null when < 3 tokens. */
  def shingleHashes(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < 3) return null
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < toks.length) {
      seen.add(md5hex(toks(i) + " " + toks(i + 1) + " " + toks(i + 2)))
      i += 1
    }
    val out = new Array[UTF8String](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Positioned (non-distinct) md5 hashes of word k-gram shingles: one
    * hash per start position, in order — the seed relation for exact
    * duplicated-span detection (element i anchors the k words starting
    * at token i). Null when the doc has fewer than k tokens. Same
    * tokenization (`split(' ', -1)`) and hash string (words joined by a
    * single space) as the other shingle kernels so the DuckDB oracle
    * mirrors it verbatim. */
  def shinglePosHashes(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < k) return null
    val n = toks.length - k + 1
    val out = new Array[UTF8String](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(md5hex(sb.toString))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Rebuild a document with the words at the given 1-based positions
    * removed: one linear two-pointer merge over (words, sorted distinct
    * positions). The HOF formulation (`filter` + `array_contains` per
    * word) is O(words x positions) interpreted — a 500k-word mostly-
    * duplicated doc would spend ~1e11 comparisons in one task; this
    * walk is O(words + positions) in a tight JVM loop. Positions out of
    * range are ignored; the input MUST be sorted ascending (the caller
    * sorts once per doc). */
  def stripPositions(text: UTF8String, positions: ArrayData): UTF8String = {
    val toks = text.toString.split(" ", -1)
    val m = positions.numElements()
    val sb = new java.lang.StringBuilder
    var i = 0
    var j = 0
    var first = true
    while (i < toks.length) {
      val p = i + 1
      while (j < m && positions.getInt(j) < p) j += 1
      val drop = j < m && positions.getInt(j) == p
      if (!drop) {
        if (!first) sb.append(' ')
        sb.append(toks(i))
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** float embedding -> exact integer milli-units: round(x * 1000)
    * computed in double space (float->double is exact, double mult +
    * half-away-from-zero round match the DuckDB oracle bit-for-bit). */
  def quantize(e: ArrayData): ArrayData = {
    val n = e.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      // BigDecimal HALF_UP == Spark's round() == DuckDB's round():
      // half away from zero (math.round would round half toward +inf)
      out(i) = java.math.BigDecimal.valueOf(e.getFloat(i).toDouble * 1000d)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  /** double-element variant of [[quantize]] — an `array<double>`-backed
    * ArrayData read with getFloat would return 4 bytes of each 8-byte
    * slot (silent garbage), so the element width MUST be dispatched at
    * plan time, never assumed. */
  def quantizeDouble(e: ArrayData): ArrayData = {
    val n = e.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = java.math.BigDecimal.valueOf(e.getDouble(i) * 1000d)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Exact integer dot product of two long arrays (quantized
    * embeddings); order-independent, overflow-checked by construction
    * (|q| <= ~1000 per element, dim <= 4096). */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** Element-wise a − b over long arrays (the PQ residual: vector minus
    * its coarse centroid) — one tight loop instead of an interpreted
    * zip_with lambda, same rationale as dotLong. Truncates to the
    * shorter input like dotLong. */
  def subLong(a: ArrayData, b: ArrayData): ArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = a.getLong(i) - b.getLong(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Flattened m×codes PQ dot table (the ADC query-side precompute):
    * entry t·codes + (j-1) = ⟨qv[t·dsub .. +dsub), cv(t,j)⟩, 0 where the
    * codebook has no (t,j) entry; `cvs` is the flattened codebook with
    * nulls in the gaps. One tight loop replaces the previous 128-element
    * array-of-slice-dots COLUMN expression, whose generated projection
    * ran to thousands of Janino lines compiled for ~dozens of query
    * rows — compile time was 3-4 s of every cold PQ query while the
    * eval itself is microseconds. Truncation semantics match the old
    * slice+dotLong composition: a qv shorter than (t+1)·dsub contributes
    * only its available elements. */
  def pqDotTable(qv: ArrayData, cvs: Array[Array[Long]], codes: Int,
      dsub: Int): ArrayData = {
    val out = new Array[Long](cvs.length)
    val qn = qv.numElements()
    var idx = 0
    while (idx < cvs.length) {
      val cv = cvs(idx)
      if (cv != null) {
        val off = (idx / codes) * dsub
        val n = math.min(cv.length, math.min(dsub, math.max(0, qn - off)))
        var acc = 0L
        var i = 0
        while (i < n) { acc += qv.getLong(off + i) * cv(i); i += 1 }
        out(idx) = acc
      }
      idx += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprints (Schleimer et al.): the DISTINCT sliding-
    * window (width w) minima over the positioned k-gram hashes, in ONE
    * linear pass with a monotonic deque — the composable formulation
    * (transform + slice + array_min per window) pays O(shingles x w)
    * interpreted string compares through the HOF lambda (measured
    * 5.0 s at sf0.1 where this kernel runs in well under 1 s). Null
    * when the doc has fewer than k tokens; fewer than w shingles clamp
    * to one overall-min window. First-occurrence order (the consumer
    * explodes to rows, so order is not part of the contract). */
  def winnowFingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val hs = shinglePosHashes(text, k)
    if (hs == null) return null
    val n = hs.numElements()
    val arr = new Array[UTF8String](n)
    var i = 0
    while (i < n) { arr(i) = hs.getUTF8String(i); i += 1 }
    val out = new java.util.LinkedHashSet[AnyRef]
    if (n <= w) {
      var m = arr(0)
      i = 1
      while (i < n) { if (arr(i).compareTo(m) < 0) m = arr(i); i += 1 }
      out.add(m)
    } else {
      val deque = new java.util.ArrayDeque[Int]
      i = 0
      while (i < n) {
        while (!deque.isEmpty && arr(deque.peekLast).compareTo(arr(i)) >= 0) deque.pollLast()
        deque.addLast(i)
        if (deque.peekFirst <= i - w) deque.pollFirst()
        if (i >= w - 1) out.add(arr(deque.peekFirst))
        i += 1
      }
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  private val deflaterTl =
    ThreadLocal.withInitial[java.util.zip.Deflater](() =>
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION))

  /** DEFLATE-compressed byte length of the UTF-8 text — the
    * compression-ratio quality signal (Gopher/CCNet-style: boilerplate
    * and repetition compress far below natural prose). One ThreadLocal
    * Deflater per executor thread, reset per row — no per-row
    * allocation beyond the fixed scratch buffer. Deterministic for a
    * fixed JVM (zlib level/strategy pinned), which is why the query
    * layer declares it rows-only: DuckDB has no DEFLATE to replay. */
  def deflateLen(text: UTF8String): Long = {
    val bytes = text.getBytes
    val d = deflaterTl.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** minhash_sigs(text) -> array<string> of numHashes signature slices;
  * null when the doc has fewer than 3 tokens (mirrors the `len >= 3`
  * guard in the SQL oracle). */
case class MinHashSigsExpr(child: Expression, numHashes: Int = 4) extends UnaryExpression {
  // md5 yields 32 hex chars = 4 disjoint 8-char slices; bound enforced
  // at PLAN build here in the expression (once), not per-row in the
  // kernel and not in just one of the callers
  require(numHashes >= 1 && numHashes <= 4,
    s"numHashes must be in [1,4] (md5 has 4 disjoint 8-hex slices), got $numHashes")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.string("minhash_sigs", child.dataType)
  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    ArrayKernels.minhashSigs(v.asInstanceOf[UTF8String], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.ArrayKernels.minhashSigs($c, $numHashes);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): MinHashSigsExpr =
    copy(child = c)
}

/** shingle_hashes(text) -> array<string> of distinct word-3-gram md5s;
  * null when the doc has fewer than 3 tokens. */
case class ShingleHashesExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.string("shingle_hashes", child.dataType)
  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    ArrayKernels.shingleHashes(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.ArrayKernels.shingleHashes($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr =
    copy(child = c)
}

/** shingle_pos_hashes(text, k) -> array<string> of positioned word
  * k-gram md5s (element i = hash of words [i, i+k)); null when the doc
  * has fewer than k tokens. k is a plan-time literal — bounds enforced
  * once at expression build, not per row. */
case class ShinglePosHashesExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 2 && k <= 64, s"shingle width k must be in [2,64], got $k")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.string("shingle_pos_hashes", child.dataType)
  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    ArrayKernels.shinglePosHashes(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.ArrayKernels.shinglePosHashes($c, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): ShinglePosHashesExpr =
    copy(child = c)
}

/** winnow_fps(text, k, w) -> array<string> of distinct window-min
  * k-gram hashes (see ArrayKernels.winnowFingerprints); null when the
  * doc has fewer than k tokens. k and w are plan-time literals. */
case class WinnowFpsExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 2 && k <= 64, s"shingle width k must be in [2,64], got $k")
  require(w >= 1 && w <= 4096, s"winnow window w must be in [1,4096], got $w")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.string("winnow_fps", child.dataType)
  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    ArrayKernels.winnowFingerprints(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.ArrayKernels.winnowFingerprints($c, $k, $w);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): WinnowFpsExpr =
    copy(child = c)
}

/** strip_positions(text, sorted_positions) -> text with those 1-based
  * word positions removed (linear merge; see ArrayKernels). */
case class StripPositionsExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"strip_positions expects (string, array<int>), got (${l.simpleString}, ${r.simpleString})")
    }
  override def nullSafeEval(t: Any, p: Any): Any =
    ArrayKernels.stripPositions(t.asInstanceOf[UTF8String], p.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) => s"graft.expr.ArrayKernels.stripPositions($t, $p)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StripPositionsExpr =
    copy(l, r)
}

/** quantize_embedding(array<float|double>) -> array<long> milli-units.
  * Element width is dispatched at PLAN time from the child's type: the
  * driver testdata's `embedding` column is float today, but a drift to
  * double must select the getDouble kernel — reading a double-backed
  * ArrayData with getFloat yields silent garbage, not an error. Any
  * other element type is rejected at analysis. */
case class QuantizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_embedding expects array<float> or array<double>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    if (isDouble) ArrayKernels.quantizeDouble(v.asInstanceOf[ArrayData])
    else ArrayKernels.quantize(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isDouble) "quantizeDouble" else "quantize"
    defineCodeGen(ctx, ev, c => s"graft.expr.ArrayKernels.$m($c)")
  }
  override protected def withNewChildInternal(c: Expression): QuantizeExpr = copy(c)
}

/** Shared analysis-time input checks for the fixed-width kernels.
  * Every kernel that reads ArrayData with `getLong` (or casts to
  * UTF8String) MUST reject other input types at analysis: a drifted
  * column (array<int>, array<double>) read through the wrong accessor
  * returns silent garbage, not an error — the QuantizeExpr lesson,
  * enforced for the whole kernel family. */
private[expr] object ExprTypeChecks {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  def longArray(fn: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn expects array<bigint> (quantize_embedding output), got ${other.simpleString}")
  }
  def string(fn: String, dt: DataType): TypeCheckResult = dt match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn expects string, got ${other.simpleString}")
  }
  def strings(fn: String, l: DataType, r: DataType): TypeCheckResult = {
    val first = string(fn, l)
    if (first != TypeCheckResult.TypeCheckSuccess) first else string(fn, r)
  }
  def longArrays(fn: String, l: DataType, r: DataType): TypeCheckResult = {
    val first = longArray(fn, l)
    if (first != TypeCheckResult.TypeCheckSuccess) first else longArray(fn, r)
  }
}

/** dot_long(array<long>, array<long>) -> long. */
case class DotLongExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.longArrays("dot_long", left.dataType, right.dataType)
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(ArrayKernels.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ArrayKernels.dotLong($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotLongExpr =
    copy(l, r)
}

/** sub_long(a, b) -> element-wise a − b (see ArrayKernels.subLong). */
case class SubLongExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.longArrays("sub_long", left.dataType, right.dataType)
  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.subLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ArrayKernels.subLong($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SubLongExpr =
    copy(l, r)
}

/** pq_dot_table(qv) -> array<long> of m·codes ADC dots (see
  * ArrayKernels.pqDotTable). The codebook rides as a reference object —
  * plan-time constant, never a literal subtree — so the generated code
  * is ONE static call regardless of m×codes. */
case class PqDotTableExpr(child: Expression, cvs: Array[Array[Long]],
    codes: Int, dsub: Int) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.longArray("pq_dot_table", child.dataType)
  override def dataType: DataType = ArrayType(LongType)
  override def nullSafeEval(v: Any): Any =
    ArrayKernels.pqDotTable(v.asInstanceOf[ArrayData], cvs, codes, dsub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCvs", cvs, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.ArrayKernels.pqDotTable($c, $ref, $codes, $dsub)")
  }
  override protected def withNewChildInternal(c: Expression): PqDotTableExpr =
    copy(child = c)
}

/** deflate_len(text) -> compressed byte count (see ArrayKernels.deflateLen). */
case class DeflateLenExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.string("deflate_len", child.dataType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(ArrayKernels.deflateLen(v.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ArrayKernels.deflateLen($c)")
  override protected def withNewChildInternal(c: Expression): DeflateLenExpr =
    copy(child = c)
}

object ArrayExprs {
  def deflateLen(c: Column): Column =
    GraftColumnShim.column(DeflateLenExpr(GraftColumnShim.expression(c)))
  def minhashSigs(c: Column, numHashes: Int = 4): Column =
    GraftColumnShim.column(MinHashSigsExpr(GraftColumnShim.expression(c), numHashes))
  def shingleHashes(c: Column): Column =
    GraftColumnShim.column(ShingleHashesExpr(GraftColumnShim.expression(c)))
  def shinglePosHashes(c: Column, k: Int): Column =
    GraftColumnShim.column(ShinglePosHashesExpr(GraftColumnShim.expression(c), k))
  def winnowFps(c: Column, k: Int, w: Int): Column =
    GraftColumnShim.column(WinnowFpsExpr(GraftColumnShim.expression(c), k, w))
  def stripPositions(text: Column, positions: Column): Column =
    GraftColumnShim.column(StripPositionsExpr(
      GraftColumnShim.expression(text), GraftColumnShim.expression(positions)))
  def quantize(c: Column): Column =
    GraftColumnShim.column(QuantizeExpr(GraftColumnShim.expression(c)))
  def dotLong(a: Column, b: Column): Column =
    GraftColumnShim.column(DotLongExpr(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
  def subLong(a: Column, b: Column): Column =
    GraftColumnShim.column(SubLongExpr(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
  def pqDotTable(qv: Column, cvs: Array[Array[Long]], codes: Int, dsub: Int): Column =
    GraftColumnShim.column(PqDotTableExpr(GraftColumnShim.expression(qv), cvs, codes, dsub))
}
