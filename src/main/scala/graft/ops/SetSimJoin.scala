package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Set-similarity self-join with PREFIX FILTERING (the Chaudhuri/
  * Bayardo/Vernica family): all document pairs whose token-set Jaccard
  * reaches `tau`, with GUARANTEED completeness — the complement to
  * [[Dedup.ngramJaccardPairs]], whose MinHash candidate generation
  * trades recall for cost (the dedup_recall harness measures that
  * trade; this operator is the exact tier).
  *
  * The filter: order every document's distinct tokens by GLOBAL
  * rarity — (document frequency ASC, token ASC), rare first — and keep
  * only the first `|S| - ceil(tau·|S|) + 1` as the document's PREFIX.
  * Two sets with Jaccard >= tau must share a prefix token: their
  * overlap is at least tau·max(|a|,|b|), and if all common tokens sat
  * outside one side's prefix they would number at most
  * ceil(tau·|S|) - 1 < tau·|S| — contradiction (and under a TOTAL
  * order the smallest common token is inside both prefixes). So ONE
  * hash equi-join on the prefix token finds every qualifying pair.
  *
  * Why the prefix beats the PassJoin segment scheme's failure mode:
  * the joined tokens are each document's RAREST — a template/stopword
  * region shared by the whole corpus sorts to the END of the ordering
  * and never enters a prefix unless the document is almost nothing but
  * template, in which case the pairs ARE near-duplicates and belong in
  * the output. Candidate volume tracks sum-of-df² over RARE tokens —
  * the same bound the dedup_recall postings truth documents.
  *
  * Shape: one token-frequency aggregate (map-side combined), one
  * per-document sort of its own tokens (inside an aggregate fold, no
  * shuffle), one prefix-token equi-join with the classic length
  * pre-filter (tau·|a| <= |b|) AND the PPJoin+ positional upper-bound
  * filter (prefix positions cap the achievable overlap — prunes
  * candidates before they exist), candidate distinct at id-pair grain,
  * two fetch joins, exact Jaccard verify (int/int double division —
  * bit-identical on any engine). Verified pairs only reach the output.
  */
object SetSimJoin {

  /** All (id_a, id_b, jaccard) with id_a < id_b and Jaccard >= tau,
    * over a prepared (doc_id, ts: array<string>) DISTINCT-element sets
    * relation. The element domain is the caller's choice and it
    * matters: on a shared-vocabulary corpus, token sets make most
    * pairs "similar" (the dedup_recall scaladoc measures 69% of ALL
    * pairs at token-Jaccard >= 0.5 on the fixture corpus — the output
    * itself is quadratic and no algorithm can help); 3-gram shingle
    * sets are what near-dup semantics actually want. */
  def jaccardSelfJoin(sets: DataFrame, tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, s"jaccardSelfJoin: tau in (0,1], got $tau")
    // NOT staged, though it feeds four consumers (the df aggregate,
    // the ordering join, both verify fetch sides): an eager
    // localCheckpoint A/B'd neutral-to-slower at sf0.1 (4.2 -> 4.4 s
    // warm) — AQE stage reuse already dedupes the repeated subtree,
    // and materializing a CORPUS-scale relation is exactly what the
    // g6 staging discipline says not to do (stage skinny
    // multi-consumer relations, not big ones).
    val toks = sets.select(col("doc_id"), col("ts"))
    // global document frequency per token — the rarity order
    val df = toks.select(col("doc_id"), explode(col("ts")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tdf"))
    // per-doc tokens ordered (tdf ASC, tok ASC); the sort happens in a
    // per-group array sort of (tdf, tok) structs — no per-doc window
    val ordered = toks.select(col("doc_id"), size(col("ts")).as("n"), explode(col("ts")).as("tok"))
      .join(df, "tok")
      .groupBy(col("doc_id"), col("n"))
      .agg(array_sort(collect_list(struct(col("tdf"), col("tok")))).as("sorted"))
    // prefix length p = n - ceil(tau·n) + 1. The epsilon guards the
    // only dangerous FP direction: a product like 7·0.7 landing a hair
    // ABOVE the exact integer would over-ceil and SHORTEN the prefix
    // (an incompleteness bug); landing below only lengthens it (extra
    // candidates the verify discards). Prefix math never needs to
    // match the oracle — it shapes candidates, the exact verify shapes
    // the output.
    val p = (col("n") - ceil(col("n") * tau - lit(1e-9)).cast("int") + 1).cast("int")
    val prefixes = ordered
      .select(col("doc_id"), col("n"),
        posexplode(slice(col("sorted"), lit(1), p)).as(Seq("pos0", "s")))
      .select(col("doc_id"), col("n"), (col("pos0") + 1).as("pos"),
        col("s.tok").as("tok"))
    val a = prefixes.select(col("doc_id").as("id_a"), col("n").as("na"),
      col("pos").as("pa"), col("tok"))
    val b = prefixes.select(col("doc_id").as("id_b"), col("n").as("nb"),
      col("pos").as("pb"), col("tok"))
    // PPJoin+ positional filter (Xiao et al., WWW'08): Jaccard >= tau
    // needs overlap >= alpha = ceil(tau/(1+tau)·(na+nb)). Both prefixes
    // sort under the SAME global total order, so for the pair's FIRST
    // common token (positions pa/pb) every other common token sits
    // strictly after it on both sides: overlap <= 1 + min(na-pa, nb-pb).
    // Applied per match event it can reject a later common token's
    // event, but the first-event bound always holds, so the pair
    // survives through that event — completeness intact (the distinct
    // collapses events). Epsilon subtracts INSIDE the ceil: drifting
    // alpha down only admits extra candidates for the verify to
    // discard; drifting it up would over-prune.
    val alpha = ceil((col("na") + col("nb")) * lit(tau / (1.0 + tau)) - lit(1e-9))
    val cand = a.join(b,
        a("tok") === b("tok") && col("id_a") < col("id_b") &&
          // length filter: Jaccard >= tau forces tau·|a| <= |b| (and
          // symmetrically) — prune before the verify fetch
          col("nb") * lit(1.0) >= col("na") * tau &&
          col("na") * lit(1.0) >= col("nb") * tau &&
          lit(1) + least(col("na") - col("pa"), col("nb") - col("pb")) >= alpha)
      .select(col("id_a"), col("id_b")).distinct()
    val ta = toks.select(col("doc_id").as("id_a"), col("ts").as("ts_a"))
    val tb = toks.select(col("doc_id").as("id_b"), col("ts").as("ts_b"))
    cand.join(ta, "id_a").join(tb, "id_b")
      .withColumn("inter", size(array_intersect(col("ts_a"), col("ts_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("ts_a")) + size(col("ts_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Convenience: whitespace token sets of a (doc_id, text) relation. */
  def jaccardSelfJoinTokens(docs: DataFrame, tau: Double): DataFrame =
    jaccardSelfJoin(
      docs.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ts")), tau)
}
