package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level embedding moment statistics: the (n, Σx_i, Σx_i·x_j)
  * sufficient-statistic table every covariance / correlation / PCA /
  * whitening step derives from, computed in ONE pass over the corpus
  * with a single d²-bounded aggregate buffer
  * (`expr/CovarSums.covarSumsLong`) — never a d²× row-multiplying
  * explode, never a second scan. Embeddings are quantized to integer
  * milli-units first (the engine-wide ANN convention,
  * `Similarity.quantize`) so every emitted sum is exact integer
  * arithmetic and the DuckDB oracle compares bit-for-bit.
  *
  * Deriving the real statistics is driver-side d x d arithmetic on the
  * emitted rows (the MLlib pattern — mean = s_i/n; POPULATION
  * covariance cov_ij = (s_ij - s_i·s_j/n) / (n·10^6), the convention
  * [[Moments.pcaTopComponent]] uses — callers wanting the unbiased
  * SAMPLE estimate scale by n/(n-1); eigen via any dense solver); none
  * of it touches the corpus again. The 10^6 divisor undoes the
  * milli-unit quantization (10^3 per factor); eigenVECTORS are
  * identical under either convention, eigenvalues differ by n/(n-1).
  */
object Moments {

  /** Upper-triangle second-moment table of the quantized embedding
    * column: one row per (i, j), i <= j, 1-based dims, with the group
    * count and the exact integer sums. */
  def covarianceStats(embeddings: DataFrame, dims: Int): DataFrame = {
    require(dims >= 1 && dims <= 4096, "covarianceStats: 1..4096 dims")
    val expectedLen = 1 + dims + dims * (dims + 1) / 2
    val one = embeddings
      .select(graft.expr.ArrayExprs.quantize(col("embedding")).as("qv"))
      .agg(graft.expr.CovarSums.covarSumsLong(col("qv")).as("buf"))
      // An empty / all-null corpus aggregates to a null buffer: emit ZERO
      // rows (matching the oracle's cross join over an empty relation),
      // never a triangle of nulls.
      .filter(col("buf").isNotNull)
      // The buffer stride is DATA-derived (the actual vector length seen
      // by the aggregate) while the unpack indices below are CALLER-
      // derived: a dims mismatch would silently read first-moment cells
      // as cross-products. Tie them together loudly.
      .select(when(size(col("buf")) === expectedLen, col("buf"))
        .otherwise(raise_error(concat(
          lit(s"covarianceStats: dims=$dims expects a buffer of $expectedLen, got "),
          size(col("buf")).cast("string"),
          lit(" — the corpus vectors have a different length")))).as("buf"))
    // (i, j) pairs unfold from the single buffer row — dims² work on ONE
    // row, not a per-input-row generator.
    val pairs = explode(flatten(transform(sequence(lit(1), lit(dims)), i =>
      transform(sequence(i, lit(dims)), j => struct(i.as("i"), j.as("j"))))))
    val iC = col("p.i")
    val jC = col("p.j")
    // Triangular flat index (1-based within the triangle block):
    // rows above i contribute (i-1)(d+1) - i(i-1)/2 entries; within the
    // row, j sits at (j - i + 1). i(i-1) is even, so the /2 is exact.
    val triIdx = (iC - 1) * lit(dims + 1) - ((iC * (iC - 1)) / lit(2)).cast("int") +
      (jC - iC + 1)
    one.select(col("buf"), pairs.as("p"))
      .select(
        iC.as("i"), jC.as("j"),
        element_at(col("buf"), 1).as("n"),
        element_at(col("buf"), iC + 1).as("s_i"),
        element_at(col("buf"), jC + 1).as("s_j"),
        element_at(col("buf"), lit(1 + dims) + triIdx).as("s_ij"))
  }

  /** Mean-centered embeddings — the first step of whitening/PCA
    * projection. The per-dim sums come from ONE `vector_sum_long` pass
    * (the O(d) first-moment kernel — the full d² covariance buffer is
    * not needed for centering), broadcast as a single row, and the
    * subtraction is map-side. Output is the exploded
    * (vec_id, dim, q, centered) verification surface (array outputs
    * don't compare portably); the mean is the only division, a fixed
    * two-cast double tree mirrored in [[centeredSql]]. Quantized
    * milli-unit space throughout. */
  def centered(embeddings: DataFrame, dims: Int): DataFrame = {
    require(dims >= 1 && dims <= 4096, "centered: 1..4096 dims")
    val q = embeddings
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), graft.expr.ArrayExprs.quantize(col("embedding")).as("qv"))
      // Tie every row's length to the caller's dims, loudly (the
      // covarianceStats contract): vector_sum_long pads ragged rows
      // with zeros while n counts them fully, so a drifted row would
      // silently deflate the mean AND desync from the oracle's
      // generate_series(1, dims) row count.
      .select(col("vec_id"),
        when(size(col("qv")) === dims, col("qv"))
          .otherwise(raise_error(concat(
            lit(s"centered: dims=$dims but corpus vector has "),
            size(col("qv")).cast("string"), lit(" elements")))).as("qv"))
    val stats = q.agg(count(lit(1)).as("n"),
        graft.expr.VectorSum.vectorSumLong(col("qv")).as("sums"))
      .filter(col("sums").isNotNull)
    q.crossJoin(broadcast(stats))
      .select(col("vec_id"), posexplode(col("qv")).as(Seq("d0", "q")), col("n"), col("sums"))
      .select(col("vec_id"), (col("d0") + 1).as("dim"), col("q"),
        (col("q").cast("double") -
          element_at(col("sums"), col("d0") + 1).cast("double") / col("n").cast("double"))
          .as("centered"))
  }

  def centeredSql(dims: Int): String =
    s"""WITH q AS (SELECT vec_id, list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |e AS (SELECT vec_id, CAST(u.i AS INTEGER) AS dim, qv[u.i] AS q
       |  FROM q, unnest(generate_series(1, $dims)) AS u(i)),
       |m AS (SELECT dim, CAST(sum(q) AS BIGINT) AS s_i FROM e GROUP BY dim),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q)
       |SELECT e.vec_id AS vec_id, e.dim AS dim, e.q AS q,
       |  CAST(e.q AS DOUBLE) - CAST(m.s_i AS DOUBLE) / CAST(n.n AS DOUBLE) AS centered
       |FROM e JOIN m ON e.dim = m.dim, n""".stripMargin

  /** Top principal component via power iteration on the d x d
    * population covariance assembled DRIVER-SIDE from the
    * [[covarianceStats]] rows — d² doubles on the driver (the MLlib
    * pattern: distributed one-pass moments, tiny dense eigen locally;
    * the corpus is never touched again). Deterministic: the start
    * vector is fixed (uniform), iteration count is fixed, and the sign
    * convention makes the first non-zero component positive.
    *
    * Returns (eigenvalue, eigenvector) in quantized milli-unit space;
    * callers projecting raw float embeddings divide the eigenvalue by
    * 10^6 and keep the (unit) eigenvector as-is.
    */
  def pcaTopComponent(embeddings: DataFrame, dims: Int, iters: Int = 100): (Double, Array[Double]) = {
    val rows = covarianceStats(embeddings, dims).collect()
    require(rows.nonEmpty, "pcaTopComponent: empty corpus (no non-null vectors)")
    val n = rows.head.getLong(2).toDouble
    require(n >= 2, "pcaTopComponent: need at least 2 vectors")
    val cov = Array.ofDim[Double](dims, dims)
    rows.foreach { r =>
      val i = r.getInt(0) - 1; val j = r.getInt(1) - 1
      val c = (r.getLong(5).toDouble - r.getLong(3).toDouble * r.getLong(4).toDouble / n) / n
      cov(i)(j) = c; cov(j)(i) = c
    }
    var v = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    var k = 0
    while (k < iters) {
      val w = Array.tabulate(dims)(i => {
        var s = 0.0; var j = 0
        while (j < dims) { s += cov(i)(j) * v(j); j += 1 }
        s
      })
      val nrm = math.sqrt(w.map(x => x * x).sum)
      require(nrm > 0, "pcaTopComponent: zero covariance matrix")
      v = w.map(_ / nrm)
      k += 1
    }
    val lambda = {
      var s = 0.0
      for (i <- 0 until dims; j <- 0 until dims) s += v(i) * cov(i)(j) * v(j)
      s
    }
    val firstNz = v.indexWhere(math.abs(_) > 1e-12)
    val signed = if (firstNz >= 0 && v(firstNz) < 0) v.map(-_) else v
    (lambda, signed)
  }

  /** DuckDB oracle for [[covarianceStats]] — the naive i<=j cross-join
    * formulation; the RESULT contract is identical, the Spark plan is
    * the one-buffer aggregate. */
  def covarianceSql(dims: Int): String =
    s"""WITH q AS (SELECT list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |p AS (SELECT CAST(a.i AS INTEGER) AS i, CAST(b.j AS INTEGER) AS j
       |  FROM generate_series(1, $dims) a(i), generate_series(1, $dims) b(j)
       |  WHERE a.i <= b.j)
       |SELECT i, j, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(qv[i]) AS BIGINT) AS s_i,
       |  CAST(sum(qv[j]) AS BIGINT) AS s_j,
       |  CAST(sum(qv[i] * qv[j]) AS BIGINT) AS s_ij
       |FROM q, p GROUP BY i, j""".stripMargin

  // ---- PCA projection apply ------------------------------------------------

  /** Integer-lattice power iteration: the top-component direction as a
    * milli-unit INTEGER vector, derived from the [[covarianceStats]]
    * sufficient statistics with a renormalize-to-integer step each
    * round — v' = round(w·1000 / |w|) where w = M·v and
    * M_ij = n·s_ij − s_i·s_j (the n²-scaled population covariance;
    * positive scaling never changes eigenvectors). Why integers: every
    * engine reproduces the EXACT same lattice vector after any number of
    * rounds (the mat-vec is exact 64-bit arithmetic; the one double
    * renormalize is a fixed IEEE tree), so a DuckDB recursive CTE
    * replays the identical trajectory and the downstream projection
    * hash-matches bit-for-bit — convergence quality affects PCA quality,
    * never cross-engine equality. Convergence: ~1e-3 direction
    * resolution (milli-units), plenty for a projection/whitening gate;
    * callers needing research-grade eigenvectors use
    * [[pcaTopComponent]]'s double path.
    *
    * Arithmetic is `multiplyExact`/`addExact` throughout: n²-scaled
    * moments overflow Long near n ≈ 2M docs at milli-unit scale, and
    * the failure must be LOUD (the oracle's HUGEINT would keep going —
    * a silent wrap here would desync the engines). At that corpus scale
    * the right move is sub-sampling the stats pass, not wider integers —
    * implemented as [[statsSample]] / [[pcaProjectSampled]] /
    * [[pcaWhitenSampled]] (spec-proven at n = 2.2M).
    *
    * Sign convention: first non-zero component positive. */
  def pcaDirectionInt(embeddings: DataFrame, dims: Int, iters: Int = 30): Array[Long] =
    pcaDirFromStats(covarianceStats(embeddings, dims).collect(), dims, iters)

  private def pcaDirFromStats(rows: Array[org.apache.spark.sql.Row], dims: Int,
      iters: Int): Array[Long] = {
    require(rows.nonEmpty, "pcaDirectionInt: empty corpus (no non-null vectors)")
    val n = rows.head.getLong(2)
    require(n >= 2, "pcaDirectionInt: need at least 2 vectors")
    val m = Array.ofDim[Long](dims, dims)
    rows.foreach { r =>
      val i = r.getInt(0) - 1; val j = r.getInt(1) - 1
      val v = Math.subtractExact(Math.multiplyExact(n, r.getLong(5)),
        Math.multiplyExact(r.getLong(3), r.getLong(4)))
      m(i)(j) = v; m(j)(i) = v
    }
    var v = Array.fill(dims)(1000L)
    var k = 0
    while (k < iters) {
      val w = Array.tabulate(dims) { i =>
        var s = 0L; var j = 0
        while (j < dims) { s = Math.addExact(s, Math.multiplyExact(m(i)(j), v(j))); j += 1 }
        s
      }
      // norm in doubles, LEFT-TO-RIGHT — the order DuckDB's list_sum
      // walks the list; both engines see the same exact Long inputs
      var nw = 0.0
      var i = 0
      while (i < dims) { nw += w(i).toDouble * w(i).toDouble; i += 1 }
      require(nw > 0, "pcaDirectionInt: zero covariance matrix")
      val nrm = math.sqrt(nw)
      // HALF_UP on the double's exact value = away-from-zero at ties,
      // matching DuckDB round(DOUBLE); Math.round would differ at
      // negative .5 boundaries
      v = w.map(x => new java.math.BigDecimal(x.toDouble * 1000.0 / nrm)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
      k += 1
    }
    val fnz = v.find(_ != 0L).getOrElse(0L)
    if (fnz < 0L) v.map(x => -x) else v
  }

  /** Projection of every embedding onto the integer top component —
    * closes the loop [[covarianceStats]] opened: `proj` is the raw
    * dot with the direction, `proj_centered` subtracts the corpus-mean
    * projection (the centered coordinate whitening/feature pipelines
    * feed downstream). Two linear corpus scans total: the stats pass
    * (one d²-bounded aggregate) and a MAP-SIDE projection pass (the
    * direction and the mean ride as literals — no join, no shuffle);
    * the corpus is never rescanned per-dimension or per-iteration
    * (iteration happens on the driver-held d² matrix, the MLlib
    * pattern). Everything is exact integer arithmetic up to ONE double
    * division per output column, mirrored verbatim in
    * [[pcaProjectSql]]. */
  /** Shared prelude of the projection-apply ops: ONE stats pass (the
    * collected d² triangle — driver-held, metadata-scale — feeds the
    * direction, n, the per-dim sums AND Σp²), the quantized corpus
    * frame, and the map-side dot/centered expressions. One place, so
    * [[pcaProject]] and [[pcaWhiten]] (and their oracles) can never
    * desync on the fold or filter details. */
  // ---- sub-sampled stats tier (the documented n ≈ 2M remedy) ----

  /** Corpus bound under which the n²-scaled integer lattice provably
    * fits in Long at milli-unit quantization (the overflow the
    * [[pcaDirectionInt]] scaladoc flags sits near n ≈ 2M; 1.5M leaves
    * binomial-fluctuation headroom for the sampler below). */
  val SafeStatsN: Long = 1500000L

  /** The documented loud-overflow remedy, implemented: when the corpus
    * exceeds `maxStatsN` non-null vectors, the STATS pass runs on a
    * DETERMINISTIC md5-bucket sub-sample — keep a vector iff its
    * 32-bit hash ([[Sampling.hashBucket32]], the engine-wide sampling
    * convention) falls under `floor(maxStatsN·2³² / n)` — while the
    * projection pass still covers the FULL corpus. Membership is a pure
    * function of vec_id (rerun/partitioning-stable, oracle-replayable);
    * a corpus already within bound passes through untouched, so the
    * sampled entry points are EXACTLY the exact ones below the
    * threshold. One extra metadata-scale pass (the count). */
  def statsSample(embeddings: DataFrame, maxStatsN: Long = SafeStatsN): DataFrame = {
    require(maxStatsN >= 2, "statsSample: need at least 2 vectors")
    val nonNull = embeddings.filter(col("embedding").isNotNull)
    val n = nonNull.count()
    if (n <= maxStatsN) embeddings
    else {
      val thr = ((BigInt(maxStatsN) << 32) / BigInt(n)).toLong.max(1L)
      nonNull.filter(Sampling.hashBucket32(col("vec_id")) < thr)
    }
  }

  /** [[pcaProject]] with the stats pass bounded by [[statsSample]] —
    * direction and mean estimated on the sample, every vector still
    * projected. Identical to [[pcaProject]] when n <= maxStatsN. */
  def pcaProjectSampled(embeddings: DataFrame, dims: Int, iters: Int = 30,
      maxStatsN: Long = SafeStatsN): DataFrame = {
    val b = pcaBaseFrom(statsSample(embeddings, maxStatsN), embeddings, dims, iters)
    b.q.select(col("vec_id"),
      (b.dot.cast("double") / lit(1000000.0)).as("proj"),
      b.projCentered.as("proj_centered"))
  }

  /** [[pcaWhiten]] with the sample-bounded stats pass: the whitening
    * scale is the SAMPLE projection variance (the standard estimator);
    * identical to the exact op below the threshold. */
  def pcaWhitenSampled(embeddings: DataFrame, dims: Int, iters: Int = 30,
      maxStatsN: Long = SafeStatsN): DataFrame =
    pcaWhitenFrom(statsSample(embeddings, maxStatsN), embeddings, dims, iters)

  private case class PcaBase(rows: Array[org.apache.spark.sql.Row],
      dir: Array[Long], n: Long, sv: Long, q: DataFrame,
      dot: Column, projCentered: Column)

  private def pcaBase(embeddings: DataFrame, dims: Int, iters: Int): PcaBase =
    pcaBaseFrom(embeddings, embeddings, dims, iters)

  /** statsInput drives the collected triangle (direction, n, sums);
    * projectInput is the frame every map-side projection runs over —
    * the seam the sampled tier plugs into. */
  private def pcaBaseFrom(statsInput: DataFrame, projectInput: DataFrame,
      dims: Int, iters: Int): PcaBase = {
    val embeddings = projectInput
    val rows = covarianceStats(statsInput, dims).collect()
    val dir = pcaDirFromStats(rows, dims, iters)
    val n = rows.head.getLong(2)
    val sRows = rows.filter(r => r.getInt(0) == r.getInt(1))
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    val sv = (1 to dims).foldLeft(0L) { (acc, i) =>
      Math.addExact(acc, Math.multiplyExact(sRows(i), dir(i - 1)))
    }
    val q = embeddings.filter(col("embedding").isNotNull)
      .select(col("vec_id"), graft.expr.ArrayExprs.quantize(col("embedding")).as("qv"))
      // centered's loud-length contract: a ragged vector would silently
      // dot over min(length) terms in dotLong while the oracle's qv[i]
      // yields NULL — raise instead of desyncing.
      .select(col("vec_id"),
        when(size(col("qv")) === dims, col("qv"))
          .otherwise(raise_error(concat(
            lit(s"pcaBase: dims=$dims but corpus vector has "),
            size(col("qv")).cast("string"), lit(" elements")))).as("qv"))
    val dot = graft.expr.ArrayExprs.dotLong(col("qv"), typedLit(dir.toSeq))
    // Assembled in DOUBLES, not Long columns: n·dot − sv exceeds 64 bits
    // well before the stats pass itself overflows, and non-ANSI Long
    // column arithmetic would WRAP silently while the oracle's BIGINT
    // errors loudly — a cross-engine desync. The double tree
    // (toDouble each operand, multiply, subtract) is the same fixed
    // IEEE sequence in both engines, so hash equality is preserved.
    val projCentered = (lit(n.toDouble) * dot.cast("double") - lit(sv.toDouble)) /
      (lit(n.toDouble) * lit(1000000.0))
    PcaBase(rows, dir, n, sv, q, dot, projCentered)
  }

  def pcaProject(embeddings: DataFrame, dims: Int, iters: Int = 30): DataFrame = {
    val b = pcaBase(embeddings, dims, iters)
    b.q.select(col("vec_id"),
      (b.dot.cast("double") / lit(1000000.0)).as("proj"),
      b.projCentered.as("proj_centered"))
  }

  /** Shared recursive-CTE chain (quantize → moments → matrix → integer
    * power iteration → sign fix → mean projection) ending in
    * `q`/`nn`/`s1`/`s2`/`vf`/`sv` — the prefix [[pcaProjectSql]] and
    * [[pcaWhitenSql]] both build on. */
  private def pcaCtes(dims: Int, iters: Int, maxStatsN: Option[Long] = None): String = {
    // qs = the STATS relation: the full corpus, or the deterministic
    // md5-bucket sample statsSample keeps (hashBucket32 digit
    // arithmetic, same floor(maxN·2^32 / n) threshold) when the corpus
    // exceeds the bound — the projection CTEs still read the full `q`
    val sampleCte = maxStatsN match {
      case None => "qs AS (SELECT * FROM q)"
      case Some(m) =>
        val digits32 = (1 to 8).map { i =>
          val w = 1L << (4 * (8 - i))
          s"(position(substr(md5(CAST(vec_id AS VARCHAR)), $i, 1) IN '0123456789abcdef') - 1) * $w"
        }.mkString(" + ")
        s"""nall AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
           |qs AS (SELECT q.* FROM q, nall
           |  WHERE nall.n <= $m
           |     OR CAST($digits32 AS BIGINT) < greatest((CAST($m AS BIGINT) << 32) // nall.n, 1))""".stripMargin
    }
    s"""q AS (SELECT vec_id, list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |$sampleCte,
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qs),
       |e AS (SELECT vec_id, CAST(u.i AS INTEGER) AS i, qv[u.i] AS x
       |  FROM qs, unnest(generate_series(1, $dims)) u(i)),
       |s1 AS (SELECT i, CAST(sum(x) AS BIGINT) AS s FROM e GROUP BY i),
       |s2 AS (SELECT a.i AS i, b.i AS j, CAST(sum(a.x*b.x) AS BIGINT) AS sij
       |  FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY a.i, b.i),
       |mrow AS (SELECT s2.i AS i, list(nn.n*s2.sij - sa.s*sb.s ORDER BY s2.j) AS row
       |  FROM s2, nn, s1 sa, s1 sb WHERE sa.i = s2.i AND sb.i = s2.j GROUP BY s2.i),
       |mat AS (SELECT list(row ORDER BY i) AS m FROM mrow),
       |it(k, v) AS (
       |  SELECT 0, list_transform(generate_series(1,$dims), i -> CAST(1000 AS BIGINT))
       |  UNION ALL
       |  SELECT k+1, list_transform(w, x -> CAST(round(CAST(x AS DOUBLE)*1000.0/sqrt(nw)) AS BIGINT))
       |  FROM (
       |    SELECT k, w, list_sum(list_transform(w, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) AS nw
       |    FROM (
       |      SELECT it.k AS k, list_transform(generate_series(1,$dims), i ->
       |        CAST(list_sum(list_transform(generate_series(1,$dims), j -> m[i][j]*v[j])) AS BIGINT)) AS w
       |      FROM it, mat WHERE it.k < $iters))
       |),
       |vf0 AS (SELECT v FROM it WHERE k = $iters),
       |vf AS (SELECT CASE WHEN list_filter(v, x -> x <> 0)[1] < 0
       |  THEN list_transform(v, x -> -x) ELSE v END AS v FROM vf0),
       |sv AS (SELECT CAST(sum(s1.s * v[s1.i]) AS BIGINT) AS sv FROM s1, vf)""".stripMargin
  }

  /** DuckDB oracle for [[pcaProject]]: replays the IDENTICAL integer
    * power-iteration trajectory in a recursive CTE (exact BIGINT
    * mat-vec, the same fixed IEEE renormalize tree), then the same
    * projection arithmetic — bit-for-bit equal by construction, proven
    * empirically at sf0.001/0.01/0.1. `maxStatsN` mirrors
    * [[pcaProjectSampled]]'s stats-pass sub-sample. */
  def pcaProjectSql(dims: Int, iters: Int = 30,
      maxStatsN: Option[Long] = None): String =
    s"""WITH RECURSIVE
       |${pcaCtes(dims, iters, maxStatsN)}
       |SELECT q.vec_id AS vec_id,
       |  CAST(CAST(list_sum(list_transform(generate_series(1,$dims), i -> q.qv[i]*v[i])) AS BIGINT) AS DOUBLE)/1000000.0 AS proj,
       |  (CAST(nn.n AS DOUBLE)*CAST(CAST(list_sum(list_transform(generate_series(1,$dims), i -> q.qv[i]*v[i])) AS BIGINT) AS DOUBLE) - CAST(sv.sv AS DOUBLE))
       |    / (CAST(nn.n AS DOUBLE)*1000000.0) AS proj_centered
       |FROM q, vf, nn, sv""".stripMargin

  /** Whitened coordinate on the top component: the centered projection
    * scaled to unit variance. With p = q·v (exact int per row) and
    * D = n·Σp² − (Σp)², the whitened coordinate simplifies to
    * `(n·p − Σp) / sqrt(D)` — every input exact integer, the whole
    * scale factor one fixed IEEE tree (D assembled in doubles because
    * n·Σp² exceeds 64 bits; deterministic in both engines since the
    * operand ints are identical). Σp = sv and Σp² = vᵀ·(Σqqᵀ)·v both
    * derive from the SAME collected stats triangle — whitening adds
    * ZERO corpus passes on top of [[pcaProject]]'s two.
    *
    * Bounds: Σp² caps at ~8·10^18 on the fixture corpus — addExact
    * throws loudly on overflow (the oracle's CAST(HUGEINT AS BIGINT)
    * errors the same way); at a corpus where that triggers, sub-sample
    * the stats pass (the [[pcaDirectionInt]] note). */
  def pcaWhiten(embeddings: DataFrame, dims: Int, iters: Int = 30): DataFrame =
    pcaWhitenFrom(embeddings, embeddings, dims, iters)

  private def pcaWhitenFrom(statsInput: DataFrame, projectInput: DataFrame,
      dims: Int, iters: Int): DataFrame = {
    val b = pcaBaseFrom(statsInput, projectInput, dims, iters)
    // Σp² = Σ_{i,j} v_i·v_j·s_ij over the full symmetric matrix (the
    // triangle contributes off-diagonal cells twice)
    val sump2 = b.rows.foldLeft(0L) { (acc, r) =>
      val i = r.getInt(0); val j = r.getInt(1)
      val term = Math.multiplyExact(Math.multiplyExact(b.dir(i - 1), b.dir(j - 1)),
        r.getLong(5))
      Math.addExact(acc, if (i == j) term else Math.multiplyExact(2L, term))
    }
    val d = b.n.toDouble * sump2.toDouble - b.sv.toDouble * b.sv.toDouble
    require(d > 0, "pcaWhiten: zero projection variance (degenerate corpus)")
    b.q.select(col("vec_id"),
      b.projCentered.as("proj_centered"),
      // same double-assembled numerator as projCentered (wrap-safe)
      ((lit(b.n.toDouble) * b.dot.cast("double") - lit(b.sv.toDouble)) /
        lit(math.sqrt(d))).as("proj_white"))
  }

  /** DuckDB oracle for [[pcaWhiten]] — the shared CTE chain plus Σp²
    * from the full s2 matrix and the identical whitening tree. */
  def pcaWhitenSql(dims: Int, iters: Int = 30): String =
    s"""WITH RECURSIVE
       |${pcaCtes(dims, iters)},
       |p2 AS (SELECT CAST(sum(s2.sij * v[s2.i] * v[s2.j]) AS BIGINT) AS sump2 FROM s2, vf)
       |SELECT q.vec_id AS vec_id,
       |  (CAST(nn.n AS DOUBLE)*CAST(CAST(list_sum(list_transform(generate_series(1,$dims), i -> q.qv[i]*v[i])) AS BIGINT) AS DOUBLE) - CAST(sv.sv AS DOUBLE))
       |    / (CAST(nn.n AS DOUBLE)*1000000.0) AS proj_centered,
       |  (CAST(nn.n AS DOUBLE)*CAST(CAST(list_sum(list_transform(generate_series(1,$dims), i -> q.qv[i]*v[i])) AS BIGINT) AS DOUBLE) - CAST(sv.sv AS DOUBLE))
       |    / sqrt(CAST(nn.n AS DOUBLE)*CAST(p2.sump2 AS DOUBLE) - CAST(sv.sv AS DOUBLE)*CAST(sv.sv AS DOUBLE)) AS proj_white
       |FROM q, vf, nn, sv, p2""".stripMargin
}
