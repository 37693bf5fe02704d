package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Nearest-centroid kernels for the IVF coarse quantizer.
  *
  * The composable formulation (`least()` over nlist
  * `struct(distance, cell)` trees with the centroid vectors embedded
  * as array LITERALS) regenerates O(nlist × dims) of codegen source
  * per Lloyd iteration — every round's new centroids are new literals,
  * so Janino recompiles a huge expression each time, and compile time
  * rivals the scan it guards at bench scale. These kernels hold the
  * centroids as a plain driver-side reference (`addReferenceObj`): the
  * generated call site is one line whose text never changes, and the
  * distance loop is a tight JVM nested loop.
  *
  * Ranking contract (shared with the DuckDB oracle and the former
  * literal formulation): cells ordered by
  * `(||x||² − 2·x·cv + ||cv||², cell)` ascending. The `||x||²` term is
  * constant per row, so ranking — including exact ties — is computed
  * without it: `cnrm − 2·x·cv` preserves order and equality.
  */
object CellKernels {

  /** Index of the best (first by `(d, cell)`) centroid. `cells` must
    * be ascending (the caller sorts once at build time), so visiting in
    * order with a strict `<` yields the smallest cell id on ties. */
  def nearestCell(qv: ArrayData, cvs: Array[Array[Long]],
      cnrms: Array[Long], cells: Array[Long]): Long = {
    var best = -1
    var bestD = 0L
    var c = 0
    while (c < cvs.length) {
      val cv = cvs(c)
      val n = math.min(qv.numElements(), cv.length)
      var acc = 0L
      var i = 0
      while (i < n) { acc += qv.getLong(i) * cv(i); i += 1 }
      val d = cnrms(c) - 2L * acc
      if (best < 0 || d < bestD) { best = c; bestD = d }
      c += 1
    }
    cells(best)
  }

  /** The `k` nearest cells by `(d, cell)` ascending, as an array —
    * the probe-expansion list. k is tiny (nprobe), so k passes of
    * selection beat sorting all nlist distances. */
  def nearestCells(qv: ArrayData, cvs: Array[Array[Long]],
      cnrms: Array[Long], cells: Array[Long], k: Int): ArrayData = {
    val kk = math.min(k, cells.length)
    val out = new Array[Long](kk)
    val taken = new Array[Boolean](cells.length)
    // re-scoring per pass is O(k·nlist·dims) with k=nprobe≈2 — cheaper
    // in practice than materializing + sorting, and allocation-free
    val ds = new Array[Long](cells.length)
    var c = 0
    while (c < cells.length) {
      val cv = cvs(c)
      val n = math.min(qv.numElements(), cv.length)
      var acc = 0L
      var i = 0
      while (i < n) { acc += qv.getLong(i) * cv(i); i += 1 }
      ds(c) = cnrms(c) - 2L * acc
      c += 1
    }
    var j = 0
    while (j < kk) {
      var best = -1
      c = 0
      while (c < cells.length) {
        if (!taken(c) && (best < 0 || ds(c) < ds(best))) best = c
        c += 1
      }
      taken(best) = true
      out(j) = cells(best)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `nearest_cell(qv)` → cell id of the closest centroid. */
case class NearestCellExpr(child: Expression, cvs: Array[Array[Long]],
    cnrms: Array[Long], cells: Array[Long]) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.longArray("nearest_cell", child.dataType)
  override def nullSafeEval(v: Any): Any =
    CellKernels.nearestCell(v.asInstanceOf[ArrayData], cvs, cnrms, cells)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rCvs = ctx.addReferenceObj("cvs", cvs, "long[][]")
    val rNrm = ctx.addReferenceObj("cnrms", cnrms, "long[]")
    val rCel = ctx.addReferenceObj("cells", cells, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.CellKernels.nearestCell($c, $rCvs, $rNrm, $rCel)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCellExpr =
    copy(child = c)
  override def prettyName: String = "nearest_cell"
}

/** `nearest_cells(qv)` → the nprobe closest cell ids, best first. */
case class NearestCellsExpr(child: Expression, cvs: Array[Array[Long]],
    cnrms: Array[Long], cells: Array[Long], k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.longArray("nearest_cells", child.dataType)
  override def nullSafeEval(v: Any): Any =
    CellKernels.nearestCells(v.asInstanceOf[ArrayData], cvs, cnrms, cells, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rCvs = ctx.addReferenceObj("cvs", cvs, "long[][]")
    val rNrm = ctx.addReferenceObj("cnrms", cnrms, "long[]")
    val rCel = ctx.addReferenceObj("cells", cells, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.CellKernels.nearestCells($c, $rCvs, $rNrm, $rCel, $k)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCellsExpr =
    copy(child = c)
  override def prettyName: String = "nearest_cells"
}

object CellExprs {
  def nearestCell(qv: Column, cvs: Array[Array[Long]], cnrms: Array[Long],
      cells: Array[Long]): Column =
    GraftColumnShim.column(
      NearestCellExpr(GraftColumnShim.expression(qv), cvs, cnrms, cells))
  def nearestCells(qv: Column, cvs: Array[Array[Long]], cnrms: Array[Long],
      cells: Array[Long], k: Int): Column =
    GraftColumnShim.column(
      NearestCellsExpr(GraftColumnShim.expression(qv), cvs, cnrms, cells, k))
}
