package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline.
  *
  * Scale design: every variant is shaped as
  *   per-row signature (map-side, codegen'd)  ->  shuffle on signature /
  *   bucket key  ->  per-bucket candidate pairing.
  * No all-pairs products: exact dedup shuffles on the content hash;
  * MinHash LSH shuffles on (band, band-hash); Jaccard and embedding
  * near-dup join only inside equality-blocked buckets. That keeps the
  * shuffled volume O(rows), not O(rows^2), which is what survives 100 TB.
  */
object Dedup {

  private def toks: Column = split(col("text"), " ")

  /** Exact dedup: hash-groupBy on content hash; keeps min doc_id per
    * group (deterministic representative). */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word 3-gram shingles -> k MinHash signatures. One md5 per shingle;
    * the k "hash functions" are disjoint 8-hex-char slices of that
    * digest (k <= 4), each inducing an independent ordering — 1/5th the
    * hashing of re-salting per function, same LSH behavior. Runs as the
    * native MinHashSigsExpr kernel (a builtin higher-order-function
    * formulation evaluates its lambdas interpreted per shingle — 10x
    * slower measured). */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 4): DataFrame = {
    require(numHashes <= 4, "4 disjoint 8-char slices per md5")
    val sigCols = (0 until numHashes).map(s => col("sig").getItem(s).as(s"mh$s"))
    docs.select(col("doc_id"), graft.expr.ArrayExprs.minhashSigs(col("text"), numHashes).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id") +: sigCols: _*)
  }

  /** LSH banding: candidate pairs = docs agreeing on any band's MinHash.
    * Implemented as explode(band, hash) -> shuffle on (band, hash) ->
    * within-bucket self-join -> distinct pairs. The self-join's two
    * sides recompute the signatures rather than persist them: the
    * signature relation is tiny and single-pass to rebuild, and
    * measured cache materialization costs ~10x the recompute (callers
    * that iterate can persist the `minhashSignatures` output upstream).
    */
  def minhashCandidatePairs(docs: DataFrame, numHashes: Int = 4): DataFrame = {
    val sigs = minhashSignatures(docs, numHashes)
    val banded = sigs.select(col("doc_id"), explode(array(
      (0 until numHashes).map(s => struct(lit(s).as("band"), col(s"mh$s").as("h"))): _*
    )).as("b")).select(col("doc_id"), col("b.band").as("band"), col("b.h").as("h"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** SimHash: per-token hash bit-decomposed; signed bit-count per doc;
    * sign vector packed into an int. `bits` <= 16 (md5 hex digit parity
    * per position — cheap and engine-agnostic). */
  def simhash(docs: DataFrame, bits: Int = 16): DataFrame = {
    val tokensDf = docs.select(col("doc_id"), explode(toks).as("token"))
      .withColumn("h", md5(col("token")))
    val sums = (1 to bits).map { j =>
      // bit j = parity of j-th hex digit of md5(token); identical SQL text
      // runs on the DuckDB side, keeping both engines bit-for-bit equal.
      sum(expr(s"((position(substr(h, $j, 1) IN '0123456789abcdef') - 1) % 2) * 2 - 1"))
        .as(s"s$j")
    }
    val packed = (1 to bits).map { j =>
      when(col(s"s$j") >= 0, lit(1L << (j - 1))).otherwise(lit(0L))
    }.reduce(_ + _)
    tokensDf.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
  }

  /** n-gram Jaccard near-dup on equality-blocked candidate pairs
    * (source, n_chars). Inclusion-exclusion avoids a union materialize. */
  def ngramJaccardPairs(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), col("source"), col("n_chars"),
      array_distinct(toks).as("tokset"))
    val a = t.alias("a")
    val b = t.alias("b")
    a.join(b, col("a.source") === col("b.source") &&
        col("a.n_chars") === col("b.n_chars") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.tokset"), col("b.tokset"))))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (col("inter").cast("double") /
          (size(col("a.tokset")) + size(col("b.tokset")) - col("inter")).cast("double"))
          .as("jaccard"))
  }
}
