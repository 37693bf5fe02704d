package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus retrieval / scoring operators for a training-data pipeline:
  * BM25 top-k search, per-document TF-IDF keyword extraction, and
  * corpus-LM bigram coverage scoring (the CCNet-style "how much of this
  * document is made of common corpus n-grams" quality signal).
  *
  * Determinism contract (the driver's DuckDB oracle compares doubles by
  * EXACT equality): every score is integer-derived until one final,
  * fixed-shape double expression whose operation tree is mirrored
  * verbatim in the generated oracle SQL (`bm25Sql` / `keywordsSql` /
  * `bigramSql` below — single source of truth for the constants). No
  * `ln`/`exp` (libm vs JVM rounding differs); `+ - * /` on doubles are
  * IEEE correctly-rounded in both engines, so identical trees give
  * identical bits.
  */
object Retrieval {

  // ---- BM25 ----------------------------------------------------------------

  /** Top-k documents for a fixed query-term set under BM25 with a
    * rational (log-free) IDF: idf(t) = (N - df + 0.5) / (df + 0.5).
    *
    * Scale shape: the per-document term frequencies are computed MAP-SIDE
    * (`size(filter(tokens, = term))` per query term — no explode, no
    * shuffle of the token stream), so the only data movement is a 1-row
    * corpus-stats aggregate (N, Σdl, df per term) broadcast back via
    * cross join, and a per-partition top-k merge (TakeOrderedAndProject —
    * never a global sort). At 100 TB the stats pass and the score pass
    * are two linear scans; for query sets much larger than a few dozen
    * terms the per-term column form stops paying and the exploded
    * inverted-posting join (cf. `tfidfKeywords`) is the right shape.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.size <= 32, "bm25TopK: 1..32 fixed query terms")
    val toks = TextOps.tokens(col("text"))
    val base = docs.select(
      col("doc_id") +: size(toks).as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, w => w === lit(t))).as(s"tf$i")
        }: _*)
    val stats = base.agg(
      count(lit(1)).as("n"),
      sum(col("dl").cast("long")).as("sumdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, lit(1L)).otherwise(lit(0L))).as(s"df$i")): _*)

    val nD = col("n").cast("double")
    val avgdl = col("sumdl").cast("double") / nD
    // Per-term BM25 contribution; tf = 0 contributes exactly 0.0 (the
    // numerator is 0 and the denominator is > 0), so no CASE is needed.
    val termScores = terms.indices.map { i =>
      val tfD = col(s"tf$i").cast("double")
      val dfD = col(s"df$i").cast("double")
      val idf = (nD - dfD + lit(0.5)) / (dfD + lit(0.5))
      val num = tfD * lit(k1 + 1.0)
      val den = tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl))
      idf * (num / den)
    }
    // Left-associated fixed-order sum — mirrored exactly in bm25Sql.
    val score = termScores.reduceLeft(_ + _)

    val scored = base.crossJoin(broadcast(stats))
      .select(col("doc_id"), score.as("score"))
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
    // Ranking the k survivors: a single-partition window over <= k rows.
    scored.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("rank"), col("score"))
  }

  /** DuckDB oracle for [[bm25TopK]] — generated from the SAME constants
    * so the double expression tree matches bit-for-bit. */
  def bm25Sql(terms: Seq[String], k: Int = 10,
              k1: Double = 1.2, b: Double = 0.75): String = {
    def d(x: Double): String = java.lang.Double.toString(x)
    def q(t: String): String = t.replace("'", "''") // SQL literal escape
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(string_split(text, ' '), w -> w = '${q(t)}')) AS tf$i"
    }.mkString(",\n  ")
    val dfCols = terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i").mkString(",\n  ")
    val termScores = terms.indices.map { i =>
      s"""((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5)) *
         |   ((CAST(tf$i AS DOUBLE) * ${d(k1 + 1.0)}) /
         |    (CAST(tf$i AS DOUBLE) + ${d(k1)} * (${d(1.0 - b)} + ${d(b)} * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))))""".stripMargin
    }.reduceLeft((a, c) => s"($a) + ($c)")
    s"""WITH base AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |  $tfCols
       |  FROM documents),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sumdl,
       |  $dfCols
       |  FROM base),
       |scored AS (SELECT doc_id, $termScores AS score FROM base, stats)
       |SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank, score
       |FROM scored WHERE score > 0.0
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  // ---- TF-IDF keywords -----------------------------------------------------

  /** Top-n keywords per document by TF-IDF with a rational (log-free)
    * IDF: score = tf * (N / df).
    *
    * Scale shape: explode -> (doc, token) partial-aggregated counts (one
    * shuffle of COMPRESSED pairs, map-side combine collapses repeats);
    * the token df table derives from that compressed frame (second,
    * vocabulary-sized shuffle); the df join back is a plain equi-join on
    * token — AQE broadcasts it when the vocabulary is small, and at
    * 100 TB (billion-term vocab) it stays a co-partitioned shuffle join,
    * never a driver collect. Ranking is a per-doc_id window (top-n per
    * key, WindowGroupLimit pushes the rank filter before the full sort
    * materializes).
    */
  def tfidfKeywords(docs: DataFrame, topN: Int = 3): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(df, "token").crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        (col("tf").cast("double") * (col("n").cast("double") / col("df").cast("double")))
          .as("score"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("token").asc)))
      .filter(col("rank") <= topN)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("df"), col("score"))
  }

  def keywordsSql(topN: Int = 3): String =
    s"""WITH tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |  GROUP BY doc_id, token),
       |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |scored AS (SELECT doc_id, tf.token AS token, tf, df,
       |  CAST(tf AS DOUBLE) * (CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) AS score
       |  FROM tf JOIN df ON tf.token = df.token, n)
       |SELECT doc_id, rank, token, tf, df, score FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS INTEGER) AS rank
       |  FROM scored)
       |WHERE rank <= $topN""".stripMargin

  // ---- corpus bigram-LM coverage -------------------------------------------

  /** Per-document "known bigram" coverage against a corpus-trained
    * bigram table: the fraction of a document's word bigrams whose
    * corpus-wide occurrence count is at or above the corpus MEAN bigram
    * count. This is the shape of n-gram-LM quality filtering (CCNet's
    * KenLM score) with the model trained on the corpus itself; the
    * mean threshold keeps it scale-free across SFs, and the comparison
    * `total >= ceil(grand_total / n_distinct)` is overflow-safe integer
    * arithmetic (see the inline note — the equivalent cross-multiply
    * wraps long at web scale) — no double enters until the final ratio.
    *
    * Scale shape: bigrams are built map-side with zip_with (no
    * sequence-descending edge case for 1-token docs: both slices are
    * empty), partial-aggregated per (doc, bigram) before the first
    * shuffle; the corpus model derives from that compressed frame; the
    * model join back is an equi-join on bigram (AQE-broadcast when
    * small, co-partitioned at scale); the mean threshold is a 1-row
    * broadcast. Documents with fewer than 2 tokens have no bigrams and
    * emit no row (documented contract).
    */
  def bigramKnownRatio(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, c) => concat(a, lit(" "), c))
    val occ = docs
      .select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("c"))
    val model = occ.groupBy(col("bg")).agg(sum(col("c")).as("total"))
    val stats = model.agg(sum(col("total")).as("grand_total"),
      count(lit(1)).as("n_distinct"))
    // "total is at or above the corpus mean" as overflow-safe integer
    // arithmetic: total * n_distinct >= grand_total would wrap long at
    // web scale (n_distinct ~1e9 x hot total ~1e10 > 2^63), silently
    // flipping exactly the hottest bigrams to "unknown". The equivalent
    // ceil-division form keeps every intermediate <= grand_total + n.
    val meanCeil = expr("(grand_total + n_distinct - 1) DIV n_distinct")
    occ.join(model, "bg").crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_bigrams"),
        sum(when(col("total") >= meanCeil, col("c"))
          .otherwise(lit(0L))).as("n_known"))
      .select(col("doc_id"), col("n_bigrams"), col("n_known"),
        (col("n_known").cast("double") / col("n_bigrams").cast("double")).as("known_ratio"))
  }

  // ---- PMI collocations ----------------------------------------------------

  /** Pointwise-mutual-information collocation mining over word bigrams,
    * as the log-free RATIO p(xy) / (p(x)·p(y)) =
    * (c_xy · N_uni · N_uni) / (N_bi · c_x · c_y) — the phrase-induction
    * score, rank-equivalent to PMI (log is monotone) and exactly
    * portable across engines (no libm).
    *
    * Scale shape: bigram pairs are built map-side as (w1, w2) columns
    * (never re-split from a concatenated string), partial-aggregated
    * before their one shuffle; unigram counts derive from the token
    * explode the same way; the two unigram joins are equi-joins on the
    * word (AQE-broadcast for small vocabularies, co-partitioned at
    * scale); both grand totals are 1-row broadcast aggregates. The
    * numerator/denominator trees are fixed-parenthesized doubles from
    * exact longs — identical bits in both engines.
    */
  def pmiBigrams(docs: DataFrame, minCount: Long = 5L): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val pairs = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, c) => struct(a.as("w1"), c.as("w2")))
    val bi = docs.select(explode(pairs).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
    val uni = docs.select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    // Grand totals BEFORE the min-count filter: probabilities are over
    // the whole corpus, not the surviving collocations.
    val totals = bi.agg(sum(col("c_xy")).as("n_bi"))
      .crossJoin(broadcast(uni.agg(sum(col("c_w")).as("n_uni"))))
    val nUniD = col("n_uni").cast("double")
    val ratio = (col("c_xy").cast("double") * (nUniD * nUniD)) /
      ((col("n_bi").cast("double") * col("c_x").cast("double")) * col("c_y").cast("double"))
    bi.filter(col("c_xy") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_y")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        ratio.as("pmi_ratio"))
  }

  def pmiSql(minCount: Long = 5L): String =
    s"""WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
       |g AS (SELECT toks[u.i] AS w1, toks[u.i + 1] AS w2
       |  FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)),
       |bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy FROM g GROUP BY w1, w2),
       |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c_w
       |  FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
       |tot AS (SELECT CAST((SELECT sum(c_xy) FROM bi) AS BIGINT) AS n_bi,
       |  CAST((SELECT sum(c_w) FROM uni) AS BIGINT) AS n_uni)
       |SELECT b.w1 AS w1, b.w2 AS w2, b.c_xy AS c_xy, x.c_w AS c_x, y.c_w AS c_y,
       |  (CAST(b.c_xy AS DOUBLE) * (CAST(n_uni AS DOUBLE) * CAST(n_uni AS DOUBLE))) /
       |  ((CAST(n_bi AS DOUBLE) * CAST(x.c_w AS DOUBLE)) * CAST(y.c_w AS DOUBLE)) AS pmi_ratio
       |FROM bi b JOIN uni x ON b.w1 = x.w JOIN uni y ON b.w2 = y.w, tot
       |WHERE b.c_xy >= $minCount""".stripMargin

  def bigramSql: String =
    """WITH occ AS (SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS c FROM (
      |  SELECT doc_id, unnest(list_transform(
      |    generate_series(1, greatest(len(string_split(text, ' ')) - 1, 0)),
      |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS bg
      |  FROM documents)
      |  GROUP BY doc_id, bg),
      |model AS (SELECT bg, CAST(sum(c) AS BIGINT) AS total FROM occ GROUP BY bg),
      |stats AS (SELECT CAST(sum(total) AS BIGINT) AS grand_total,
      |  CAST(count(*) AS BIGINT) AS n_distinct FROM model)
      |SELECT occ.doc_id AS doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |  CAST(sum(CASE WHEN total >= (grand_total + n_distinct - 1) // n_distinct THEN c ELSE 0 END) AS BIGINT) AS n_known,
      |  CAST(sum(CASE WHEN total >= (grand_total + n_distinct - 1) // n_distinct THEN c ELSE 0 END) AS DOUBLE) /
      |    CAST(sum(c) AS DOUBLE) AS known_ratio
      |FROM occ JOIN model ON occ.bg = model.bg, stats
      |GROUP BY occ.doc_id""".stripMargin
}
