package graft.expr

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CellExprsSpec extends SparkSpec {
  import spark.implicits._

  // duplicate centroid (cells 2 and 4 identical) forces distance ties
  private val cvs: Array[Array[Long]] = Array(
    Array(10L, 0L, 0L), Array(0L, 10L, 0L), Array(0L, 0L, 10L), Array(0L, 10L, 0L))
  private val cnrms: Array[Long] = cvs.map(v => v.map(x => x * x).sum)
  private val cells: Array[Long] = Array(1L, 2L, 3L, 4L)

  private def vecs = (0L until 200L)
    .map(i => (i, Seq(i * 7 % 19 - 9, i * 11 % 23 - 11, i * 13 % 17 - 8)))
    .toDF("id", "qv")
    .withColumn("nrm", ArrayExprs.dotLong($"qv", $"qv"))

  /** The former literal formulation — kept here as the differential
    * reference for the kernel's ranking contract. */
  private def literalAssign = least(
    cells.indices.map { c =>
      struct(($"nrm" - lit(2L) * ArrayExprs.dotLong($"qv", typedlit(cvs(c).toSeq))
        + lit(cnrms(c))).as("d"), lit(cells(c)).as("cell"))
    }: _*).getField("cell")

  test("nearestCell matches the least(struct) formulation, ties to the smaller cell") {
    val df = vecs.withColumn("kernel", CellExprs.nearestCell($"qv", cvs, cnrms, cells))
      .withColumn("literal", literalAssign)
    assert(df.filter($"kernel" =!= $"literal").count() === 0)
    // the duplicated centroid can only ever win as cell 2, never 4
    assert(df.filter($"kernel" === 4L).count() === 0)
    assert(df.filter($"kernel" === 2L).count() > 0)
  }

  test("nearestCells matches array_sort(struct)+slice for every k") {
    val sortedArr = array_sort(array(cells.indices.map { c =>
      struct(($"nrm" - lit(2L) * ArrayExprs.dotLong($"qv", typedlit(cvs(c).toSeq))
        + lit(cnrms(c))).as("d"), lit(cells(c)).as("cell"))
    }: _*))
    (1 to 4).foreach { k =>
      val cmp = vecs.withColumn("srt", sortedArr)
        .withColumn("kernel", CellExprs.nearestCells($"qv", cvs, cnrms, cells, k))
        .withColumn("literal", expr(s"transform(slice(srt, 1, $k), x -> x.cell)"))
      assert(cmp.filter(not($"kernel" <=> $"literal")).count() === 0, s"k=$k")
    }
  }
}
