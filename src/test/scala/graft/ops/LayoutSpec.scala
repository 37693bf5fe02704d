package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (col 0 at even positions)") {
    val df = Seq((3L, 1L), (0L, 0L), (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
      .select(Layout.zValue(Seq($"x", $"y")).as("z"))
    val z = df.collect().map(_.getLong(0))
    // x=0b11,y=0b01 -> bits: x0@0, y0@1, x1@2 -> 0b0111 = 7
    assert(z(0) === 7L)
    assert(z(1) === 0L)
    // all-x: even bit positions 0,2,..,30
    assert(z(2) === (0 until 16).map(i => 1L << (2 * i)).sum)
    // all-y: odd positions
    assert(z(3) === (0 until 16).map(i => 1L << (2 * i + 1)).sum)
  }

  test("zValue masks inputs beyond `bits` and accepts negatives consistently") {
    val df = Seq((65536L + 5L, -1L)).toDF("x", "y")
      .select(Layout.zValue(Seq($"x", $"y")).as("z"))
    // x masks to 5; y masks to 0xFFFF (two's complement low bits)
    val expected = (0 until 16).map { i =>
      (((5L >> i) & 1L) << (2 * i)) | (1L << (2 * i + 1))
    }.reduce(_ | _)
    assert(df.collect().head.getLong(0) === expected)
  }

  test("zValueSql mirrors zValue over the engine's own SQL dialect") {
    // Spark SQL shares the >>/&/| operators the DuckDB oracle uses, so
    // evaluating the generated text here pins the two formulations.
    val df = (0L until 512L).map(i => (i * 37 % 256, i * 91 % 256)).toDF("x", "y")
    val viaCols = df.select(Layout.zValue(Seq($"x", $"y"), bits = 8).as("z"))
    val viaSql = df.selectExpr(s"(${Layout.zValueSql(Seq("x", "y"), bits = 8)}) AS z")
    assert(viaCols.collect().map(_.getLong(0)).toSeq ===
      viaSql.collect().map(_.getLong(0)).toSeq)
  }

  test("zValue and zValueSql reject un-interleavable shapes identically") {
    // Shared enumeration = shared requires: the SQL mirror must refuse
    // exactly where the Column twin throws, or the oracle silently
    // emits a >63-bit shift whose semantics diverge per engine.
    intercept[IllegalArgumentException](Layout.zValue(Seq($"a", $"b", $"c", $"d", $"e")))
    intercept[IllegalArgumentException](Layout.zValueSql(Seq("a", "b", "c", "d", "e")))
    intercept[IllegalArgumentException](Layout.zValue(Seq($"a")))
    intercept[IllegalArgumentException](Layout.zValueSql(Seq("a")))
  }

  test("fileStats skips all-null column chunks instead of reporting phantom zeros") {
    // A chunk whose column is entirely null has numNulls set but no
    // min/max; parquet's Statistics.genericGetMin then returns the
    // uninitialized default (0 for longs) — which would corrupt the
    // prune bounds with a phantom [0, 0] file.
    val dir = java.nio.file.Files.createTempDirectory("stats_nulls").toString
    val df = (0L until 100L).map { i =>
      val bucket = if (i < 50) 0L else 1L
      val x: java.lang.Long = if (bucket == 0L) null else 100L + i
      (bucket, x)
    }.toDF("bucket", "x")
    df.repartitionByRange(2, $"bucket").write.parquet(s"$dir/t")
    val stats = Layout.fileStats(s"$dir/t", Seq("x"))
    assert(stats.nonEmpty)
    // every reported range comes from REAL values (>= 150); the
    // all-null file contributes no row at all
    stats.foreach { case (f, _, mn, mx) =>
      assert(mn >= 150L && mx <= 199L, s"phantom stats from $f: [$mn, $mx]")
    }
  }

  /** Files whose [min, max] stats intersect every predicate range, via
    * the library's own footer-stats tool. */
  private def overlappingFiles(dir: String, preds: Map[String, (Long, Long)]): (Int, Int) = {
    val stats = Layout.fileStats(dir, preds.keys.toSeq)
    val byFile = stats.groupBy(_._1)
    val hits = byFile.values.count { cols =>
      preds.forall { case (name, (lo, hi)) =>
        cols.exists { case (_, n, mn, mx) => n == name && mx >= lo && mn <= hi }
      }
    }
    (hits, byFile.size)
  }

  test("z-ordered layout prunes files on BOTH dimensions; x-sorted only on x") {
    // 256x256 grid of (x, y) points, 64 output files each way.
    val grid = for { x <- 0L until 256L; y <- 0L until 256L } yield (x, y)
    val df = grid.toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val zDir = s"$base/z"
    val xDir = s"$base/x"
    Layout.zorderBy(df, Seq($"x", $"y"), numFiles = 64, bits = 8)
      .write.mode("overwrite").parquet(zDir)
    df.repartitionByRange(64, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(xDir)

    // y-only strip: the case a single-column sort cannot prune.
    val yStrip = Map("y" -> (64L, 79L))
    val (zy, zn) = overlappingFiles(zDir, yStrip)
    val (xy, xn) = overlappingFiles(xDir, yStrip)
    assert(xy === xn, "x-sorted layout must read every file for a y predicate")
    assert(zy <= zn / 4, s"z-order should prune most files for a y strip, read $zy of $zn")

    // x-only strip: the z-layout must still prune usefully (the trade).
    val xStrip = Map("x" -> (64L, 79L))
    val (zx, _) = overlappingFiles(zDir, xStrip)
    val (xx, _) = overlappingFiles(xDir, xStrip)
    assert(xx <= xn / 8, "x-sorted layout prunes its own column hard")
    assert(zx <= zn / 2, s"z-order keeps a usable x prune, read $zx of $zn")

    // 2-d box: z-order never loses to the single-column layout, and the
    // box stays within a handful of quadrant-straddling files. (Exact
    // counts wobble by a file or two: range-partition boundaries come
    // from sampling whose seed varies with RDD ids in a shared session.)
    val box = Map("x" -> (64L, 79L), "y" -> (64L, 79L))
    val (zb, _) = overlappingFiles(zDir, box)
    val (xb, _) = overlappingFiles(xDir, box)
    assert(zb <= xb, s"z-order box prune ($zb files) lost to x-sort ($xb files)")
    assert(zb <= 6, s"z-order box prune read $zb of $zn files")

    // and the layout rewrite loses no rows
    assert(spark.read.parquet(zDir).count() === df.count())
  }
}
