package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `vector_sum_long(array<long>)` — element-wise sum of long arrays as a
  * single algebraic aggregate (reference analog: the per-dimension
  * accumulations a centroid/stats rollup needs, cf. block-crawler's
  * per-key counter merges in `nft/data_services`).
  *
  * Why native: the composable formulation (posexplode → groupBy(key,
  * dim) → sum → collect_list) turns every N×d corpus into N·d shuffle
  * rows — at 100 TB that is the difference between shuffling a 64-long
  * buffer per key per partition (partial aggregation, this class) and
  * shuffling sixty-four billion (key, dim, v) rows. The buffer is a
  * primitive long array: update is one fused loop per row, merge is one
  * loop per partial, serialization is 8·d bytes.
  *
  * Semantics: null inputs are ignored (like builtin `sum`); arrays of
  * differing lengths sum position-wise over the longest (missing tail
  * elements contribute 0); an all-null / empty group returns null.
  * Overflow wraps like builtin long arithmetic — callers quantizing
  * embeddings to milli-units (|v| ≤ ~10^6, d ≤ 4096) stay exact for
  * groups up to ~10^12 rows.
  */
case class VectorSumLongAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  // update() reads the child ArrayData with getLong; any other element
  // width (a drifted array<int>/array<double> input) must fail at
  // analysis, not sum reinterpreted bytes.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.longArray("vector_sum_long", child.dataType)

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      val out = if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) out(i) += a.getLong(i)
        i += 1
      }
      out
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    val (big, small) = if (b1.length >= b2.length) (b1, b2) else (b2, b1)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumLongAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumLongAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): VectorSumLongAgg =
    copy(child = c)
  override def prettyName: String = "vector_sum_long"
}

object VectorSum {
  /** Element-wise sum of an `array<long>` column (see [[VectorSumLongAgg]]). */
  def vectorSumLong(c: Column): Column =
    GraftColumnShim.column(
      VectorSumLongAgg(GraftColumnShim.expression(c)).toAggregateExpression())
}
