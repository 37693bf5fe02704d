package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Determinism: embeddings are quantized to integer milli-units first, so
  * dot products and norms are exact integer arithmetic in any engine and
  * any summation order; only the final `dot / (|a||b|)` runs in IEEE
  * doubles (deterministic given identical inputs). That makes results
  * reproducible across engines AND across partitionings — ranking never
  * depends on float summation order, which matters when the same query
  * must return the same neighbors on 4 cores and on 1000 executors.
  *
  * Scale design: brute-force is the correctness baseline (broadcast the
  * query set, map-side score, per-query top-k via partial aggregation).
  * The scale path is IVF-style cluster pruning: score only candidates in
  * the same coarse partition (here the `label` column stands in for a
  * k-means assignment), turning O(Q x N) into O(Q x N / nlist) with a
  * shuffle on the cluster id.
  */
object Similarity {

  /** Quantize float embedding -> exact integer vector (milli-units);
    * native kernel (see ArrayExprs) — same semantics as
    * `transform(e, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))`. */
  def quantize(e: Column): Column = graft.expr.ArrayExprs.quantize(e)

  /** Exact integer norms/dots via the native DotLongExpr kernel — the
    * `aggregate(zip_with(...))` builtin formulation evaluates its lambda
    * interpreted per element (measured seconds over ~10M elements). */
  def sqNorm(q: Column): Column = graft.expr.ArrayExprs.dotLong(q, q)

  def dot(a: Column, b: Column): Column = graft.expr.ArrayExprs.dotLong(a, b)

  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b).cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** The quantized search relation every index consumes:
    * (vec_id[, label], qv, nrm). IDEMPOTENT — a relation already
    * carrying `qv` passes through untouched — so a caller running
    * SEVERAL indexes over one corpus (the `ann_recall` harness, an
    * index-comparison notebook) can compute + persist this ONCE and
    * thread it through brute/IVF/LSH/multi/probe instead of re-reading
    * parquet and re-running the quantize kernel per method. At 100 TB
    * the prep pass is the dominant scan; sharing it is the difference
    * between one corpus read and five. */
  def prep(embeddings: DataFrame): DataFrame =
    if (embeddings.columns.contains("qv")) embeddings
    else {
      val keep = col("vec_id") +:
        (if (embeddings.columns.contains("label")) Seq(col("label")) else Nil)
      embeddings.select(keep :+ quantize(col("embedding")).as("qv"): _*)
        .withColumn("nrm", sqNorm(col("qv")))
    }

  private def prepared(embeddings: DataFrame): DataFrame = prep(embeddings)

  private[ops] def topK(scored: DataFrame, k: Int): DataFrame = {
    // row_number + filter plans as WindowGroupLimit: partial top-k runs
    // below the exchange, so only k rows per query per input partition
    // shuffle — the property that keeps top-k viable at cluster scale.
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("rank"), col("score"))
  }

  /** Brute-force cosine top-k of `queries` (vec_id, embedding[, label])
    * against all candidates. The query set must be broadcast-sized —
    * that is the contract of brute force; a query set that scales with
    * the corpus belongs on `ivfTopK` where cluster pruning bounds the
    * scored pairs. */
  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = prepared(queries)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"), col("nrm").as("q_nrm"))
    val c = prepared(embeddings)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("nrm").as("c_nrm"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("score", cosine(col("q_qv"), col("c_qv"), col("q_nrm"), col("c_nrm")))
    topK(scored, k)
  }

  /** IVF-style: candidates limited to the query's coarse cluster
    * (`label` stands in for a k-means assignment), joined on the
    * cluster id — O(Q x N / nlist) scored pairs, shuffled on cluster. */
  def ivfTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = prepared(queries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("qv").as("q_qv"), col("nrm").as("q_nrm"))
    val c = prepared(embeddings)
      .select(col("vec_id").as("c_id"), col("label").as("c_label"),
        col("qv").as("c_qv"), col("nrm").as("c_nrm"))
    val scored = c.join(broadcast(q),
        col("q_label") === col("c_label") && col("q_id") =!= col("c_id"))
      .withColumn("score", cosine(col("q_qv"), col("c_qv"), col("q_nrm"), col("c_nrm")))
    topK(scored, k)
  }

  /** Deterministic integer k-means coarse quantizer (Lloyd's with a
    * FIXED iteration count): hash-seeded init (the `nlist` vectors with
    * the smallest md5(vec_id) — rerun-stable, no RNG), then `iters`
    * rounds of assign + recompute. Centroids are ROUNDED-INTEGER-MEAN
    * vectors, so the assignment metric
    * `||x||² - 2·x·m + ||m||²` is pure integer arithmetic end to end —
    * every train/assign/probe decision (argmin with centroid-id
    * tie-break) is bit-reproducible on any engine, which is what lets
    * the trained index hash-match a SQL oracle.
    *
    * Scale: each iteration is a map-side per-row argmin against
    * DRIVER-HELD centroid literals (the MLlib pattern — centroids are
    * metadata-scale) + one (cell, dim)-keyed mean shuffle of N×dims
    * skinny rows; no N×nlist row blow-up exists anywhere. Seeding is a
    * distributed top-nlist over one md5 pass. Returns (cell, cv, cnrm). */
  def kmeansCentroids(embeddings: DataFrame, nlist: Int = 8, iters: Int = 2): DataFrame = {
    val sp = embeddings.sparkSession
    import sp.implicits._
    trainCents(embeddings, nlist, iters).map(c => (c.cell, c.cv, c.cnrm)).toSeq
      .toDF("cell", "cv", "cnrm")
  }

  /** Driver-held centroid: nlist rows of 64 longs — metadata scale,
    * like a partition list, NOT a data collect. Holding them driver-
    * side is what makes assignment a map-side expression. */
  private case class Cent(cell: Long, cv: Seq[Long], cnrm: Long)

  private def trainCents(embeddings: DataFrame, nlist: Int, iters: Int): Array[Cent] = {
    val vecs = prepared(embeddings).select(col("vec_id"), col("qv"), col("nrm"))
    // Training drives 1 + iters actions over the quantized corpus (seed
    // scan + one assign/mean pass per Lloyd round). Persist it for the
    // duration so the parquet read + quantize kernel run ONCE, not per
    // round — the MLlib iterative pattern; MEMORY_AND_DISK so a corpus
    // bigger than executor memory spills instead of thrashing.
    vecs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // orderBy + limit plans as TakeOrderedAndProject (per-partition
      // partial top-nlist, merged at the driver) — NOT a single-task
      // global window sort, which is what an unpartitioned row_number
      // over the corpus would be.
      var cents = vecs.withColumn("seed_r", md5(col("vec_id").cast("string")))
        .orderBy(col("seed_r"), col("vec_id")).limit(nlist)
        .collect().sortBy(r => (r.getAs[String]("seed_r"), r.getAs[Long]("vec_id")))
        .zipWithIndex
        .map { case (r, i) =>
          val cv = r.getAs[scala.collection.Seq[Long]]("qv").toVector
          Cent(i + 1L, cv, r.getAs[Long]("nrm"))
        }
      var i = 0
      while (i < iters) {
        val assigned = vecs.withColumn("cell",
          assignExpr(cents, col("qv"), col("nrm")))
        cents = roundedMeans(assigned).collect()
          .map(r => Cent(r.getAs[Long]("cell"),
            r.getAs[scala.collection.Seq[Long]]("cv").toVector,
            r.getAs[Long]("cnrm")))
          .sortBy(_.cell)
        i += 1
      }
      cents
    } finally vecs.unpersist(blocking = false)
  }

  /** Map-side nearest-centroid argmin via the native CellKernels
    * expression: zero shuffle, no N x nlist row blow-up, and the
    * centroids ride as a driver-held REFERENCE rather than array
    * literals — the generated call site's text is one stable line, so
    * Janino compiles it once instead of recompiling an O(nlist·dims)
    * `least(struct(...))` tree every Lloyd round (each round's new
    * centroid literals forced a fresh compile of the former
    * formulation). Ranking: (||x||²−2·x·cv+||cv||², cell) ascending —
    * the ||x||² term is row-constant, so the kernel ranks without it;
    * ties break to the smaller cell id (`cents` arrive cell-sorted). */
  private def assignExpr(cents: Array[Cent], qv: Column, nrm: Column): Column = {
    require(cents.nonEmpty, "k-means requires a non-empty corpus to seed from")
    val (cvs, cnrms, cells) = centArrays(cents)
    graft.expr.CellExprs.nearestCell(qv, cvs, cnrms, cells)
  }

  private def centArrays(cents: Array[Cent]): (Array[Array[Long]], Array[Long], Array[Long]) = {
    // ascending cell ids are the kernel's tie-break contract (first
    // minimum wins = smallest cell); every producer sorts, this guards it
    require((1 until cents.length).forall(i => cents(i - 1).cell < cents(i).cell),
      "centroids must be cell-sorted")
    (cents.map(_.cv.toArray), cents.map(_.cnrm), cents.map(_.cell))
  }

  /** Element-wise rounded-integer mean per cell via the native
    * vector_sum_long aggregate: ONE partial+final HashAggregate whose
    * buffer is a d-long primitive array, then one exact double division
    * + round per dimension. The previous posexplode formulation
    * shuffled N×d (cell, dim, v) rows and needed a second aggregate to
    * reassemble arrays — at corpus scale that is d× the shuffle volume
    * and two exchanges instead of one (a differential spec pins the two
    * formulations equal). Cells that lose all members simply vanish
    * (standard k-means collapse). */
  private def roundedMeans(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("cell"))
      .agg(graft.expr.VectorSum.vectorSumLong(col("qv")).as("sv"),
        count(lit(1)).as("c"))
      .select(col("cell"),
        transform(col("sv"),
          v => round(v.cast("double") / col("c").cast("double")).cast("long")).as("cv"))
      .withColumn("cnrm", sqNorm(col("cv")))

  /** One-shot convenience: train the quantizer, then search — the
    * shape a notebook exploration wants. A production index is built
    * ONCE ([[kmeansCentroids]]) and searched many times
    * ([[ivfSearch]]); this method exists so the two stay glued by
    * construction (it IS build→search, spec-enforced equal). */
  def ivfTrainedTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 8, iters: Int = 2, nprobe: Int = 2): DataFrame =
    searchWithCents(trainCents(embeddings, nlist, iters), embeddings, queries, k, nprobe)

  /** IVF search over a PRE-TRAINED quantizer relation — the
    * build-once/search-many path. `centroids` is the (cell, cv, cnrm)
    * relation produced by [[kmeansCentroids]]: nlist metadata-scale
    * rows, collected driver-side so assignment and probe expansion stay
    * map-side expressions (the same reason MLlib holds k-means
    * centroids on the driver). Retraining never happens here — an index
    * rebuilt per query isn't an index. */
  def ivfSearch(centroids: DataFrame, embeddings: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int = 2): DataFrame =
    searchWithCents(collectCents(centroids), embeddings, queries, k, nprobe)

  /** Search core shared by the one-shot and pre-trained paths: assign
    * candidates to their final cell once, probe each query's `nprobe`
    * nearest cells, score cosine only inside probed cells —
    * O(Q·N·nprobe/nlist) scored pairs instead of O(Q·N), the classic
    * recall/cost dial. Queries share brute force's broadcast-sized
    * contract. */
  private def searchWithCents(cents: Array[Cent], embeddings: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val cand = prepared(embeddings)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("nrm").as("c_nrm"))
      .withColumn("cell", assignExpr(cents, col("c_qv"), col("c_nrm")))
    // probe expansion is map-side too: per query, the kernel returns
    // the nprobe nearest cells by (distance, cell) — no window, no
    // per-centroid row blow-up, same stable-codegen property as assign
    val (cvs, cnrms, cells) = centArrays(cents)
    val probes = prepared(queries)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"), col("nrm").as("q_nrm"))
      .withColumn("cell",
        explode(graft.expr.CellExprs.nearestCells(col("q_qv"), cvs, cnrms, cells, nprobe)))
      .select(col("q_id"), col("q_qv"), col("q_nrm"), col("cell"))
    val scored = cand.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("score", cosine(col("q_qv"), col("c_qv"), col("q_nrm"), col("c_nrm")))
    topK(scored, k)
  }

  /** Fixture wrapper matching the other ANN variants' query stride. */
  def ivfTrainedTopK(embeddings: DataFrame, k: Int, queryStride: Int): DataFrame =
    ivfTrainedTopK(embeddings, embeddings.filter(col("vec_id") % queryStride === 0), k)

  private def collectCents(centroids: DataFrame): Array[Cent] =
    centroids.select(col("cell"), col("cv"), col("cnrm")).collect()
      .map(r => Cent(r.getAs[Long]("cell"),
        r.getAs[scala.collection.Seq[Long]]("cv").toVector, r.getAs[Long]("cnrm")))
      .sortBy(_.cell)

  /** Public composition seams for indexes that layer on the coarse
    * quantizer (IVFADC: [[graft.ops.Pq]] prunes candidates by `cell`
    * before compressed-domain scoring). Both are map-side expressions
    * against driver-held centroid references — zero shuffle. */
  def assignCells(prepped: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = collectCents(centroids)
    prepped.withColumn("cell", assignExpr(cents, col("qv"), col("nrm")))
  }

  /** Per-query probe expansion: one row per (query, probed cell), the
    * `nprobe` nearest coarse cells by (distance, cell). */
  def probeCells(prepped: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    val cents = collectCents(centroids)
    val (cvs, cnrms, cells) = centArrays(cents)
    prepped.withColumn("cell",
      explode(graft.expr.CellExprs.nearestCells(col("qv"), cvs, cnrms, cells, nprobe)))
  }

  /** Sign-pattern LSH bucket (coordinate signs of the first `bits`
    * dims as the hyperplane set — deterministic and engine-agnostic).
    * Default 8 bits = 256 buckets: dense enough that near-neighbors
    * collide at the test SFs (16 bits left both LSH gate queries
    * vacuously empty at sf0.01/sf0.1); at corpus scale widen `bits`
    * (or band multiple 8-bit tables) to re-balance bucket occupancy
    * against recall. try_element_at: a vector shorter than `bits` dims
    * contributes 0 for the missing positions (ANSI element_at would
    * throw), the same NULL-case semantics as the DuckDB mirror's
    * `qv[i]`. */
  def signBucket(qv: Column, bits: Int = 8, offset: Int = 0): Column =
    (0 until bits).map { i =>
      when(try_element_at(qv, lit(offset + i + 1)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Sign-bucket LSH top-k: candidates pruned to the query's sign-
    * pattern bucket ([[signBucket]]) before any scoring. The bucket id
    * is a shuffle key, so at scale this is one hash shuffle + per-bucket
    * scoring — the recall/cost trade the `ann_recall` harness
    * quantifies against brute force. Queries share the broadcast-sized
    * contract of [[bruteForceTopK]]. */
  def lshTopK(embeddings: DataFrame, queries: DataFrame, k: Int, bits: Int): DataFrame = {
    def bucketed(df: DataFrame): DataFrame =
      prep(df).withColumn("bucket", signBucket(col("qv"), bits))
    val q = bucketed(queries).select(col("vec_id").as("q_id"), col("bucket").as("q_bucket"),
      col("qv").as("q_qv"), col("nrm").as("q_nrm"))
    val c = bucketed(embeddings).select(col("vec_id").as("c_id"), col("bucket").as("c_bucket"),
      col("qv").as("c_qv"), col("nrm").as("c_nrm"))
    val scored = c.join(broadcast(q),
        col("q_bucket") === col("c_bucket") && col("q_id") =!= col("c_id"))
      .withColumn("score", cosine(col("q_qv"), col("c_qv"), col("q_nrm"), col("c_nrm")))
    topK(scored, k)
  }

  def lshTopK(embeddings: DataFrame, k: Int = 3, queryStride: Int = 100,
      bits: Int = 8): DataFrame =
    lshTopK(embeddings, embeddings.filter(col("vec_id") % queryStride === 0), k, bits)

  /** MULTI-PROBE single-table sign-LSH top-k (the published multi-probe
    * LSH idea — probe the neighboring buckets instead of building more
    * tables): each query probes its own bucket PLUS every bucket at
    * sign-Hamming distance 1 (flip each of the `bits` sign bits) —
    * recovering exactly the neighbors a rigid single bucket loses when
    * one leading-dim sign straddles zero, the failure mode the recall
    * harness measures at ~0.0 for the plain table. Cost shape: the fan
    * out is QUERY-side only (bits+1 skinny probe rows per query, still
    * broadcast-sized); the corpus buckets ONCE and shuffles once — the
    * same plan as [[lshTopK]] with a wider build side. A (q, c) pair
    * can match at most one probe (flips are distinct), so no dedup
    * pass is needed before scoring. */
  /** All XOR masks of sign-Hamming weight <= probeDist over `bits`
    * bits — the probe fan-out, computed at PLAN time (37 masks for
    * 8 bits / dist 2). */
  def probeMasks(bits: Int, probeDist: Int): Seq[Long] = {
    require(probeDist >= 0 && probeDist <= bits, "probeDist in [0, bits]")
    (0 to probeDist).flatMap(w =>
      (0 until bits).combinations(w).map(_.foldLeft(0L)((m, b) => m | (1L << b))))
  }

  def lshTopKProbe(embeddings: DataFrame, queries: DataFrame, k: Int,
      bits: Int, probeDist: Int): DataFrame = {
    def bucketed(df: DataFrame): DataFrame =
      prep(df).withColumn("bucket", signBucket(col("qv"), bits))
    val flips = array(probeMasks(bits, probeDist).map(lit): _*)
    val q = bucketed(queries)
      .select(col("vec_id").as("q_id"), col("bucket"),
        col("qv").as("q_qv"), col("nrm").as("q_nrm"))
      .withColumn("flip", explode(flips))
      .select(col("q_id"), col("bucket").bitwiseXOR(col("flip")).as("q_bucket"),
        col("q_qv"), col("q_nrm"))
    val c = bucketed(embeddings).select(col("vec_id").as("c_id"), col("bucket").as("c_bucket"),
      col("qv").as("c_qv"), col("nrm").as("c_nrm"))
    val scored = c.join(broadcast(q),
        col("q_bucket") === col("c_bucket") && col("q_id") =!= col("c_id"))
      .withColumn("score", cosine(col("q_qv"), col("c_qv"), col("q_nrm"), col("c_nrm")))
    topK(scored, k)
  }

  def lshTopKProbe(embeddings: DataFrame, k: Int = 3, queryStride: Int = 100,
      bits: Int = 8, probeDist: Int = 2): DataFrame =
    lshTopKProbe(embeddings, embeddings.filter(col("vec_id") % queryStride === 0),
      k, bits, probeDist)

  /** Multi-table sign-LSH top-k — OR-amplification, the production
    * recall knob: table t buckets on the signs of dims
    * [t·bits, t·bits+bits); a pair is a candidate if it collides in ANY
    * table (measured on the fixture corpus: 1 table × 8 bits ≈ 0.0
    * recall@3, 12 tables × 5 bits ≈ 0.6–0.7 while scoring ~30% of the
    * corpus per query — `ann_recall` reports the dial).
    *
    * Scale shape: the band relation is `tables`× the corpus in skinny
    * (tab, bucket, id) rows — one hash shuffle on (tab, bucket), same
    * as dedup_minhash's band join; candidate dedup is one (q, c)
    * shuffle of the COLLIDED pairs only; scoring + top-k as
    * [[lshTopK]]. Tables × bits ≤ dims. */
  def lshTopKMulti(embeddings: DataFrame, queries: DataFrame, k: Int,
      bits: Int, tables: Int): DataFrame = {
    require(bits >= 1 && tables >= 1, "lshTopKMulti: bits and tables must be >= 1")
    def checked(df: DataFrame): DataFrame =
      prep(df)
        // tables × bits ≤ dims is enforced PER ROW, loudly: a table
        // past the vector's end sees only nulls, hashes every vector
        // to bucket 0, and silently degenerates the index into a
        // full cross join — the worst quiet failure an index can have
        .select(col("vec_id"),
          when(size(col("qv")) >= tables * bits, col("qv"))
            .otherwise(raise_error(concat(
              lit(s"lshTopKMulti: tables*bits = ${tables * bits} exceeds vector length "),
              size(col("qv")).cast("string")))).as("qv"),
          col("nrm"))
    def bands(df: DataFrame): DataFrame =
      df.select(col("vec_id"), col("qv"), col("nrm"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tab"),
            signBucket(col("qv"), bits, t * bits).as("bucket"))): _*)).as("tb"))
        .select(col("vec_id"), col("qv"), col("nrm"),
          col("tb.tab").as("tab"), col("tb.bucket").as("bucket"))
    val q = bands(checked(queries)).select(col("vec_id").as("q_id"), col("tab"),
      col("bucket"), col("qv").as("q_qv"), col("nrm").as("q_nrm"))
    val c = bands(checked(embeddings)).select(col("vec_id").as("c_id"), col("tab"),
      col("bucket"), col("qv").as("c_qv"), col("nrm").as("c_nrm"))
    // a pair colliding in several tables must be scored ONCE
    val cand = c.join(broadcast(q), Seq("tab", "bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .dropDuplicates("q_id", "c_id")
    val scored = cand.withColumn("score",
      cosine(col("q_qv"), col("c_qv"), col("q_nrm"), col("c_nrm")))
    topK(scored, k)
  }

  def lshTopKMulti(embeddings: DataFrame, k: Int = 3, queryStride: Int = 100,
      bits: Int = 5, tables: Int = 12): DataFrame =
    lshTopKMulti(embeddings, embeddings.filter(col("vec_id") % queryStride === 0),
      k, bits, tables)

  /** Fixture wrappers: every `queryStride`-th vector as the query set. */
  def bruteForceTopK(embeddings: DataFrame, k: Int = 3, queryStride: Int = 100): DataFrame =
    bruteForceTopK(embeddings, embeddings.filter(col("vec_id") % queryStride === 0), k)
  def ivfTopK(embeddings: DataFrame, k: Int = 3, queryStride: Int = 100): DataFrame =
    ivfTopK(embeddings, embeddings.filter(col("vec_id") % queryStride === 0), k)

  /** Embedding near-dup pairs sub-bucketed by sign-bit LSH inside the
    * label block: candidates must agree on (label, sign pattern —
    * [[signBucket]], 8 bits here). This is the scale path for a hot
    * label — its members spread over up to 2^bits sub-buckets, so the
    * per-block self-join
    * drops from O(m^2) to the sum of squared sub-bucket sizes — at a
    * recall cost only for near-dups whose leading-dim signs differ
    * (cosine >= threshold pairs almost always agree). Use
    * [[nearDupPairs]] when blocks are known-bounded and full in-block
    * recall matters. */
  def nearDupPairsLsh(embeddings: DataFrame, threshold: Double = 0.3): DataFrame = {
    val p = prepared(embeddings).withColumn("bucket", signBucket(col("qv")))
    // same-plan self-join (renames above): sides share one shuffle via
    // ReusedExchange when the join runs as SMJ — see nearDupPairs
    val a = p.alias("a")
    val b = p.alias("b")
    a.join(b, col("a.label") === col("b.label") && col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        col("a.label").as("label"),
        cosine(col("a.qv"), col("b.qv"), col("a.nrm"), col("b.nrm")).as("score"))
      .filter(col("score") >= threshold)
  }

  /** Embedding-cosine near-dup pairs, cluster-blocked on `label`.
    *
    * `maxBlock` bounds the self-join inside a block: members are ranked
    * by `vec_id` and only the first `maxBlock` participate (plans as
    * WindowGroupLimit, so the cap applies before the shuffle). A hot
    * label at corpus scale otherwise makes the block self-join
    * quadratic without bound; the cap trades documented recall
    * (smallest-id members win, mirrored in the DuckDB oracle via
    * QUALIFY) for an O(maxBlock^2)-per-block ceiling. Callers needing
    * full recall inside hot blocks should sub-bucket by an LSH key
    * first (see the sign-bit bucketing in ExtendedQueries.annLsh). */
  def nearDupPairs(embeddings: DataFrame, threshold: Double = 0.3,
      maxBlock: Int = 1000): DataFrame = {
    val p = Dedup.capBuckets(prepared(embeddings), Seq(col("label")),
      col("vec_id"), maxBlock)
    // Self-join the SAME plan with per-side renames ABOVE the join, not
    // below it: the two shuffle subtrees then canonicalize identically,
    // so when the join runs as SMJ (any real scale — broadcast only
    // applies while one side fits in memory) the second side is a
    // ReusedExchange and the corpus is scanned + quantized ONCE.
    val a = p.alias("a")
    val b = p.alias("b")
    a.join(b, col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        col("a.label").as("label"),
        cosine(col("a.qv"), col("b.qv"), col("a.nrm"), col("b.nrm")).as("score"))
      .filter(col("score") >= threshold)
  }
}
