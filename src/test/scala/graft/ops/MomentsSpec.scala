package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MomentsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(vecs: Seq[Seq[Float]], dims: Int) =
    Moments.covarianceStats(
      vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding"),
      dims)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

  test("covarianceStats: hand-computed 2-dim sufficient statistics") {
    // q = (1000, 2000), (3000, -1000)
    val got = stats(Seq(Seq(1.0f, 2.0f), Seq(3.0f, -1.0f)), dims = 2)
    assert(got((1, 1)) === ((2L, 4000L, 4000L, 10000000L))) // 1e6 + 9e6
    assert(got((1, 2)) === ((2L, 4000L, 1000L, -1000000L))) // 2e6 - 3e6
    assert(got((2, 2)) === ((2L, 1000L, 1000L, 5000000L)))  // 4e6 + 1e6
    assert(got.keySet === Set((1, 1), (1, 2), (2, 2)))
  }

  test("covarianceStats: triangular flat-index unpack is right at d=4 corners") {
    // one vector q = (1000, 2000, 3000, 4000): s_ij = q_i * q_j exactly,
    // so every triangle cell independently witnesses its flat index.
    val got = stats(Seq(Seq(1.0f, 2.0f, 3.0f, 4.0f)), dims = 4)
    for (i <- 1 to 4; j <- i to 4)
      assert(got((i, j))._4 === i * j * 1000000L, s"cell ($i,$j)")
    assert(got.size === 10)
  }

  test("covarianceStats: plan is one buffer aggregate, pairs unfold after it") {
    val df = (1L to 100L).map(i => (i, Seq(i.toFloat, (i % 7).toFloat)))
      .toDF("vec_id", "embedding")
    val qe = Moments.covarianceStats(df, dims = 2).queryExecution
    assert(qe.executedPlan.toString.contains("covar_sums_long"))
    // The d^2 generator must sit ABOVE the aggregate (1 row), never on
    // the scan side: no Generate may appear under any Aggregate node.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate}
    val underAgg = qe.optimizedPlan.collect { case a: Aggregate =>
      a.child.collect { case g: Generate => g }.size
    }.sum
    assert(underAgg === 0, "pair generator leaked below the aggregate")
  }

  test("covarianceStats: mixed vector lengths fail loudly") {
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Moments.covarianceStats(df, dims = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    // Either guard may fire depending on partitioning: the update-path
    // check (same task) or the merge-path check (different tasks).
    assert(messages(e).exists(m =>
      m.contains("drifted vector length") ||
        m.contains("merging buffers of different vector lengths")),
      s"unexpected error: $e")
  }

  test("centered: map-side mean subtraction, null rows excluded from the mean") {
    // q = (1000, 2000), (3000, -1000); means = (2000, 500)
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, -1.0f)), (3L, null: Seq[Float])
    ).toDF("vec_id", "embedding")
    val got = Moments.centered(df, dims = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got((1L, 1)) === ((1000L, -1000.0)))
    assert(got((1L, 2)) === ((2000L, 1500.0)))
    assert(got((2L, 1)) === ((3000L, 1000.0)))
    assert(got((2L, 2)) === ((-1000L, -1500.0)))
    assert(got.size === 4) // the null row emits nothing and is not in the mean
  }

  test("centered: drifted vector lengths fail loudly instead of deflating the mean") {
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] { Moments.centered(df, dims = 2).collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("centered: dims=2")), s"unexpected: $e")
  }

  test("centered: the stats side is broadcast, the subtraction never shuffles rows") {
    val df = (1L to 50L).map(i => (i, Seq(i.toFloat, (i % 3).toFloat)))
      .toDF("vec_id", "embedding")
    val plan = Moments.centered(df, dims = 2).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"stats row not broadcast:\n$plan")
  }

  test("pcaTopComponent: recovers a planted principal direction") {
    // Points spread along (0.6, 0.8) with a small orthogonal wiggle:
    // t in [-50, 50] step 1, wiggle +/- 0.01 alternating.
    val pts = (-50 to 50).map { t =>
      val w = if (t % 2 == 0) 0.01 else -0.01
      (t.toLong, Seq((0.6 * t + 0.8 * w).toFloat, (0.8 * t - 0.6 * w).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val (lambda, v) = Moments.pcaTopComponent(df, dims = 2)
    assert(lambda > 0)
    assert(math.abs(v(0) - 0.6) < 0.01 && math.abs(v(1) - 0.8) < 0.01,
      s"got ${v.toSeq}")
    // determinism: same corpus, same component bit-for-bit
    val (l2, v2) = Moments.pcaTopComponent(df, dims = 2)
    assert(l2 === lambda && v2.toSeq === v.toSeq)
  }

  test("pcaDirectionInt: integer direction aligns with the planted component") {
    val pts = (-50 to 50).map { t =>
      val w = if (t % 2 == 0) 0.01 else -0.01
      (t.toLong, Seq((0.6 * t + 0.8 * w).toFloat, (0.8 * t - 0.6 * w).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val v = Moments.pcaDirectionInt(df, dims = 2)
    // milli-unit lattice vector ~ 1000·(0.6, 0.8), first-nz-positive sign
    val nrm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(v(0) / nrm - 0.6) < 0.01 && math.abs(v(1) / nrm - 0.8) < 0.01,
      s"got ${v.toSeq}")
    assert(v.find(_ != 0L).exists(_ > 0L), "sign convention: first non-zero positive")
    // determinism: bit-identical on rerun
    assert(Moments.pcaDirectionInt(df, dims = 2).toSeq === v.toSeq)
  }

  test("pcaProject: centered projections sum to ~zero, ordering follows the component") {
    val pts = (-50 to 50).map { t =>
      val w = if (t % 2 == 0) 0.01 else -0.01
      (t.toLong, Seq((0.6 * t + 0.8 * w).toFloat, (0.8 * t - 0.6 * w).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val rows = Moments.pcaProject(df, dims = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length === pts.size)
    // centered coordinates of a full corpus sum to ~0 (exact up to the
    // one double division per row)
    assert(math.abs(rows.map(_._3).sum) < 1e-6)
    // points were planted along t: projection order must follow vec_id
    // (= t) order, up to overall sign
    val sorted = rows.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a < b } ||
      sorted.zip(sorted.tail).forall { case (a, b) => a > b },
      "projection must be monotone along the planted direction")
    // map-side claim: no shuffle in the projection pass
    val proj = Moments.pcaProject(df, dims = 2)
    proj.collect()
    val plan = proj.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, s"projection pass must not shuffle:\n$plan")
  }

  test("pcaWhiten: whitened coordinates have mean ~0 and population variance ~1") {
    val pts = (-50 to 50).map { t =>
      val w = if (t % 2 == 0) 0.01 else -0.01
      (t.toLong, Seq((0.6 * t + 0.8 * w).toFloat, (0.8 * t - 0.6 * w).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val rows = Moments.pcaWhiten(df, dims = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val n = rows.length.toDouble
    val whites = rows.map(_._3)
    assert(math.abs(whites.sum / n) < 1e-9)
    assert(math.abs(whites.map(x => x * x).sum / n - 1.0) < 1e-9,
      s"population variance must be 1, got ${whites.map(x => x * x).sum / n}")
    // whitening preserves the centered ordering (positive scale factor)
    val byId = rows.sortBy(_._1)
    assert(byId.map(_._2).zip(byId.map(_._3)).toSeq
      .sliding(2).forall {
        case Seq((c1, w1), (c2, w2)) => (c1 < c2) == (w1 < w2)
        case _ => true
      })
    // degenerate corpus (zero variance) fails loudly — the zero
    // covariance matrix is caught at the direction stage (the
    // projection-variance require is unreachable belt-and-braces: the
    // top component's variance is the top eigenvalue, > 0 whenever
    // the covariance is non-zero)
    val flat = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] { Moments.pcaWhiten(flat, dims = 2) }
    assert(e.getMessage.contains("zero covariance matrix"))
  }

  test("histogram: fixed-width buckets with per-bucket extremes, empties absent") {
    val df = Seq(3L, 7L, 12L, 19L, 41L).toDF("m")
    val got = Profile.histogram(df, col("m"), width = 10L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === Map(
      0L -> ((10L, 2L, 3L, 7L)),
      10L -> ((20L, 2L, 12L, 19L)),
      40L -> ((50L, 1L, 41L, 41L)))) // 20-40 absent: no rows, no bucket
  }

  test("ngramTopK: counts, lexicographic ties, and short-doc guard") {
    val docs = Seq(
      (1L, "a b c a b"), // bigrams: "a b" x2, "b c", "c a"
      (2L, "a b"),       // "a b"
      (3L, "x")          // shorter than n: contributes nothing
    ).toDF("doc_id", "text")
    val got = TextOps.ngramTopK(docs, n = 2, k = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((1, "a b", 3L), (2, "b c", 1L), (3, "c a", 1L)))
  }

  test("vocabCoverage: ranks, cumulative counts, and the final share reach 1 when k covers all") {
    val docs = Seq((1L, "a a a b b c"), (2L, "a b")).toDF("doc_id", "text")
    val rows = TextOps.vocabCoverage(docs, k = 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // counts: a=4, b=3, c=1, total 8
    assert(rows.toSeq === Seq(
      (1, "a", 4L, 4L, 0.5),
      (2, "b", 3L, 7L, 7.0 / 8.0),
      (3, "c", 1L, 8L, 1.0)))
    // k smaller than the vocabulary truncates the curve, shares unchanged
    val top1 = TextOps.vocabCoverage(docs, k = 1).collect()
    assert(top1.length === 1 && top1.head.getDouble(4) === 0.5)
  }

  test("vocabCoverage: top-k plans as TakeOrderedAndProject, never a global sort") {
    val docs = Seq((1L, "x y z x")).toDF("doc_id", "text")
    val df = TextOps.vocabCoverage(docs, k = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab top-k must be a partial top-k, got:\n$plan")
  }

  test("ngramTopK: plan takes the per-partition top-k path") {
    val docs = (1L to 50L).map(i => (i, s"w$i w${i + 1} w${i + 2}")).toDF("doc_id", "text")
    val plan = TextOps.ngramTopK(docs, n = 2, k = 5).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("covarianceStats: caller dims that disagree with the data fail loudly") {
    // 4-dim vectors unpacked as dims=2 would silently read first-moment
    // cells as cross-products — the stride check must refuse.
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] { Moments.covarianceStats(df, dims = 2).collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("different length")), s"unexpected: $e")
  }

  test("covarianceStats: empty / all-null corpus emits zero rows (oracle contract)") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Moments.covarianceStats(empty, dims = 2).count() === 0L)
    val allNull = Seq((1L, null: Seq[Float])).toDF("vec_id", "embedding")
    assert(Moments.covarianceStats(allNull, dims = 2).count() === 0L)
    val e = intercept[IllegalArgumentException] {
      Moments.pcaTopComponent(empty, dims = 2)
    }
    assert(e.getMessage.contains("empty corpus"))
  }

  test("covarianceStats: null embedding rows are ignored like builtin sum") {
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, null: Seq[Float]))
      .toDF("vec_id", "embedding")
    val got = Moments.covarianceStats(df, dims = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.values.toSet === Set(1L)) // n counts only the non-null row
  }

  test("statsSample: deterministic, pass-through below the bound, sized near maxN above it") {
    val df = (0L until 4000L).map(i => (i, Seq(1.0f + (i % 7) * 0.1f, 0.5f)))
      .toDF("vec_id", "embedding")
    // below the bound: the SAME frame comes back (no filter, no count drift)
    assert(Moments.statsSample(df, maxStatsN = 5000L).count() === 4000L)
    val s1 = Moments.statsSample(df, maxStatsN = 1000L)
    val n1 = s1.count()
    // binomial around 1000 with sd ~31 — a generous 5-sigma band
    assert(n1 > 800 && n1 < 1200, s"sample size $n1 far from 1000")
    // rerun-stable membership (pure function of vec_id)
    assert(Moments.statsSample(df, maxStatsN = 1000L).collect().map(_.getLong(0)).sorted
      === s1.collect().map(_.getLong(0)).sorted)
  }

  test("sampled direction stays aligned with the exact one on a planted component") {
    // planted dominant direction along dim 1 (variance 100x dim 2's)
    val df = (0L until 2000L).map { i =>
      val t = ((i % 41).toDouble - 20.0) / 20.0
      (i, Seq((t * 2.0).toFloat, (((i % 13) - 6).toDouble * 0.02).toFloat))
    }.toDF("vec_id", "embedding")
    def unit(v: Array[Long]): Array[Double] = {
      val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      v.map(_.toDouble / n)
    }
    val exact = unit(Moments.pcaDirectionInt(df, dims = 2))
    val sampled = unit(Moments.pcaDirectionInt(Moments.statsSample(df, maxStatsN = 400L), dims = 2))
    val cos = math.abs(exact(0) * sampled(0) + exact(1) * sampled(1))
    assert(cos > 0.99, s"sampled direction drifted: cos=$cos")
  }

  test("n > 2M: the exact lattice overflows LOUDLY, the sampled tier runs (the documented remedy)") {
    // 2.2M vectors with |q| ~ 1500 milli-units: n*s_ij ~ 1.1e19 > Long.Max,
    // so the exact n^2-scaled matrix must throw (multiplyExact), never wrap
    val big = spark.range(2200000L).select(col("id").as("vec_id"),
      array((lit(1.4) + (col("id") % 7).cast("double") * lit(0.03)).cast("float"),
        (lit(1.5) - (col("id") % 5).cast("double") * lit(0.02)).cast("float"))
        .as("embedding"))
    intercept[ArithmeticException] {
      Moments.pcaDirectionInt(big, dims = 2)
    }
    // the remedy: sub-sampled stats, full-corpus projection — finite
    // output for every row, no overflow anywhere
    val proj = Moments.pcaProjectSampled(big, dims = 2, maxStatsN = 100000L)
    assert(proj.count() === 2200000L)
    val head = proj.limit(5).collect()
    head.foreach { r =>
      assert(!r.getDouble(1).isNaN && !r.getDouble(1).isInfinite)
      assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite)
    }
    val w = Moments.pcaWhitenSampled(big, dims = 2, maxStatsN = 100000L)
    val wh = w.limit(5).collect()
    wh.foreach(r => assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
  }
}
