package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality-classifier inference: fastText-style linear scoring of
  * documents against a model weight relation — the standard learned
  * quality / toxicity gate of an LLM training-data pipeline (score every
  * document, keep those above a margin threshold).
  *
  * Model shape: a bag-of-words linear model. The margin is the
  * length-normalized weighted token sum
  * `(bias + Σ_token w(token)) / (dl · 1000)` with integer milli-unit
  * weights, so everything up to ONE final double division is exact
  * integer arithmetic — the same log-free determinism contract as
  * [[Retrieval]] (the DuckDB oracle compares doubles bit-for-bit, and
  * identical IEEE expression trees give identical bits; `exp`/sigmoid
  * would not, so the gate thresholds the raw margin, which is monotone
  * in the sigmoid probability anyway).
  *
  * Scale shape: the weight table of a fastText-quality-style model is
  * MODEL-scale (vocab entries), not corpus-scale — it rides to every
  * executor as a driver-held HashMap reference inside the native
  * `linear_score` kernel (the CellExprs centroid pattern: O(1) lookup
  * per token; a constant-folded map literal would linear-scan its keys
  * per `element_at`, O(tokens·vocab) per row). Scoring is a
  * PROJECTION-ONLY pass: one linear scan of the corpus, zero shuffles,
  * zero joins (spec-enforced — no Exchange in the plan). For a vocab too
  * big for a task-shipped reference (say >10^6 entries), the same score
  * is an explode → broadcast-join → doc_id re-agg (one shuffle, the
  * [[Retrieval.tfidfKeywords]] shape); this map-side form is the right
  * one for every real quality model we know of.
  */
object Classify {

  /** Max reference-shipped vocab entries: far above any hand-held gate
    * model, far below anything that should be a join (the HashMap is
    * O(vocab) bytes serialized into every task binary; lookups stay
    * O(1) at any size within it). */
  val MaxLiteralVocab = 65536

  /** Margin + keep flag per document.
    *
    * @param weights  (token → milli-unit weight) model relation,
    *                 driver-held (metadata-scale, like centroids)
    * @param biasMilli intercept in milli-units
    * @param threshold keep documents with margin >= threshold
    */
  def scoreLinear(docs: DataFrame, weights: Seq[(String, Long)], biasMilli: Long,
      threshold: Double, keepCols: Seq[String] = Nil): DataFrame = {
    require(weights.nonEmpty && weights.size <= MaxLiteralVocab,
      s"scoreLinear: 1..$MaxLiteralVocab weight entries, got ${weights.size}")
    require(weights.map(_._1).distinct.size == weights.size,
      "scoreLinear: duplicate token in weight relation")
    // ONE tokenize pass via the native kernel: [bias + Σ w(token),
    // n_tokens]. Integer sum is order-independent; unknown tokens
    // contribute 0 — the out-of-vocabulary convention.
    val sc = graft.expr.LinearScore(col("text"), weights, biasMilli)
    val margin = element_at(col("sc"), 1).cast("double") /
      (element_at(col("sc"), 2).cast("double") * lit(1000.0))
    docs.select(col("doc_id") +: keepCols.map(col) :+ sc.as("sc"): _*)
      .select(col("doc_id") +: keepCols.map(col) :+ margin.as("margin"): _*)
      .withColumn("keep", col("margin") >= lit(threshold))
  }

  /** Shared oracle fragments: the weight VALUES + per-doc accumulator
    * CTEs and the margin expression tree, generated from the SAME
    * constants as the Spark side (single source of truth). The oracle
    * uses the explode → join → group form (result-identical; integer
    * sums are order-independent). */
  private def marginSqlParts(weights: Seq[(String, Long)],
      biasMilli: Long): (String, String) = {
    def q(t: String): String = t.replace("'", "''")
    val values = weights
      .map { case (t, w) => s"('${q(t)}', CAST($w AS BIGINT))" }.mkString(", ")
    val ctes =
      s"""w(token, wt) AS (VALUES $values),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |s AS (SELECT tok.doc_id, CAST(sum(w.wt) AS BIGINT) AS acc
         |  FROM tok JOIN w USING (token) GROUP BY tok.doc_id)""".stripMargin
    val marginSql =
      s"""CAST($biasMilli + coalesce(s.acc, 0) AS DOUBLE) /
         |  (CAST(len(string_split(d.text, ' ')) AS DOUBLE) * 1000.0)""".stripMargin
    (ctes, marginSql)
  }

  /** DuckDB oracle for [[scoreLinear]]. */
  def scoreLinearSql(weights: Seq[(String, Long)], biasMilli: Long,
      threshold: Double): String = {
    val (ctes, marginSql) = marginSqlParts(weights, biasMilli)
    s"""WITH $ctes
       |SELECT d.doc_id, $marginSql AS margin,
       |  ($marginSql) >= ${java.lang.Double.toString(threshold)} AS keep
       |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id""".stripMargin
  }

  /** DuckDB oracle for the best-`k`-per-source curation policy (the
    * [[scoreLinear]] margin ranked inside each source). */
  def bestPerSourceSql(weights: Seq[(String, Long)], biasMilli: Long,
      k: Int): String = {
    val (ctes, marginSql) = marginSqlParts(weights, biasMilli)
    s"""WITH $ctes,
       |m AS (SELECT d.doc_id, d.source, $marginSql AS margin
       |  FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id)
       |SELECT source,
       |  CAST(row_number() OVER (PARTITION BY source ORDER BY margin DESC, doc_id) AS INTEGER) AS rank,
       |  doc_id, margin
       |FROM m
       |QUALIFY row_number() OVER (PARTITION BY source ORDER BY margin DESC, doc_id) <= $k""".stripMargin
  }
}
