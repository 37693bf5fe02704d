package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for stats-based
  * file pruning.
  *
  * At 100 TB the scan is won or lost before execution: a parquet lake
  * prunes files (and row groups) by min/max footer stats, and stats
  * only help when the layout CLUSTERS the predicate columns. A table
  * sorted by `x` answers `x BETWEEN ...` from a handful of files but
  * reads everything for `y BETWEEN ...`; interleaving the bits of both
  * columns (a Z-order / Morton curve) gives every file a small bounding
  * BOX in (x, y) space, so ANY conjunction of range predicates prunes —
  * the trade is a modestly weaker single-column prune for a usable
  * prune on every clustered dimension (`LayoutSpec` pins both sides of
  * that trade with real footer stats).
  *
  * The z-value is plain integer bit arithmetic (shift/and/or), so it
  * whole-stage-codegens and the identical formula runs in any SQL
  * engine — the oracle twin (`e2_zorder_locality`) is generated from
  * the same (column, bit) enumeration.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of each column
    * (col j's bit i lands at position i·n + j). Inputs are masked to
    * `bits` (two's-complement semantics for negatives, identical in
    * Java and ANSI SQL); callers range-normalize first when the
    * domain's spread exceeds 2^bits. `n·bits` must fit a signed long. */
  /** The one (bit, column, target-position) enumeration both [[zValue]]
    * and [[zValueSql]] map over — a SINGLE source of truth (including
    * the validity requires), so the Spark and oracle mirrors cannot
    * drift: same positions, same rejection of un-interleavable shapes. */
  private def interleavePositions(n: Int, bits: Int): Seq[(Int, Int, Int)] = {
    require(n >= 2, "z-ordering needs at least two dimensions")
    require(n * bits <= 63, s"$n cols x $bits bits exceeds a signed long")
    for { i <- 0 until bits; j <- 0 until n } yield (i, j, i * n + j)
  }

  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    val mask = (1L << bits) - 1
    val masked = cols.map(_.cast("long").bitwiseAND(lit(mask)))
    interleavePositions(cols.size, bits).map { case (i, j, pos) =>
      shiftleft(shiftright(masked(j), i).bitwiseAND(lit(1L)), pos)
    }.reduce(_.bitwiseOR(_))
  }

  /** The DuckDB/ANSI mirror of [[zValue]] — generated from the same
    * [[interleavePositions]] enumeration (and the same requires) so the
    * two cannot drift. `xs` are SQL expressions for the dimension
    * columns. */
  def zValueSql(xs: Seq[String], bits: Int = 16): String = {
    val mask = (1L << bits) - 1
    val masked = xs.map(x => s"(($x) & $mask)")
    interleavePositions(xs.size, bits).map { case (i, j, pos) =>
      s"(((${masked(j)} >> $i) & 1) << $pos)"
    }.mkString(" | ")
  }

  /** Rewrite `df` into `numFiles` z-clustered output partitions: range
    * partition on the z-value (files own contiguous z ranges = small
    * (x, y) boxes), sort within each so row groups inherit the same
    * locality. Write the result with the caller's sink of choice —
    * min/max stats then prune on every clustered column. One shuffle,
    * same as any repartition-for-layout write. */
  def zorderBy(df: DataFrame, cols: Seq[Column], numFiles: Int,
      bits: Int = 16): DataFrame = {
    val z = zValue(cols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Per-file integer min/max footer stats for `columns` of a local
    * parquet directory: (file, column, min, max) — the prune
    * inspection a layout decision is made against (LayoutSpec grades
    * [[zorderBy]] with exactly this view). File-level stats are the
    * union over row groups, the granularity a scan planner skips at.
    * Driver-side by design: footers are metadata (KBs/file) and the
    * tool targets a layout sample, not a lake walk. */
  def fileStats(dir: String, columns: Seq[String]): Seq[(String, String, Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = new org.apache.hadoop.conf.Configuration()
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    files.flatMap { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try {
        val blocks = reader.getFooter.getBlocks
        columns.flatMap { name =>
          val perGroup = for {
            b <- 0 until blocks.size()
            cols = blocks.get(b).getColumns
            c <- 0 until cols.size()
            cc = cols.get(c) if cc.getPath.toDotString == name
            // hasNonNullValue, not !isEmpty: a chunk whose column is
            // entirely null has numNulls set (so !isEmpty) but NO
            // min/max — genericGetMin would return the uninitialized
            // default (0 for longs, null/NPE for binary) and corrupt
            // the prune bounds with a phantom 0.
            st = cc.getStatistics if st != null && st.hasNonNullValue
          } yield (st.genericGetMin.asInstanceOf[Number].longValue(),
            st.genericGetMax.asInstanceOf[Number].longValue())
          if (perGroup.isEmpty) None
          else Some((f.getName, name, perGroup.map(_._1).min, perGroup.map(_._2).max))
        }
      } finally reader.close()
    }.toSeq
  }
}
