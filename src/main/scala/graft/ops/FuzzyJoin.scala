package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PassJoin-style fuzzy string join: all (probe, index) pairs within
  * Levenshtein distance `k`, without ever comparing all pairs.
  *
  * Blocking is the pigeonhole segment scheme (Li/Deng/Feng's PassJoin):
  * every index string is partitioned into k+1 contiguous segments; if
  * ed(r, t) <= k then some segment of r survives unedited in t, and its
  * start position in t is shifted by at most the number of edits before
  * it (<= k). So the probe side only has to emit, for each hypothesized
  * index length in [|t|-k, |t|+k], the substrings that could equal a
  * segment — (2k+1) lengths x (k+1) segments x (<= 2k+1) starts, a
  * constant fan-out per probe row — and candidates fall out of ONE hash
  * equi-join on (index_len, segment_index, segment_text). The equality
  * on index_len makes the |len(r)-len(t)| <= k length filter exact.
  * Completeness is proven differentially against the naive cross join
  * on random corpora in FuzzyJoinSpec — the RangeJoinSpec discipline.
  *
  * Both sides CARRY their full string through the segment join, and the
  * exact `levenshtein` verify (codegen'd; the same function DuckDB
  * exposes, so the operator is oracle-checkable) runs as a filter
  * STREAMED over the join's output inside the same stage — candidate
  * pairs are never materialized, shuffled, or joined-back. This is the
  * load-bearing choice for template-heavy corpora: when many strings
  * share a constant region (e.g. every TPC-H customer name starts
  * "Customer#"), the segment covering that region is one hot key and
  * the candidate set degrades toward |probe|x|index| — as pure
  * streamed-verify CPU. The first cut shuffled bare-id candidates
  * through a distinct and two fetch joins instead, and measured 92 s at
  * sf0.1; this shape measures ~2 s on the same data. The final distinct
  * runs on verified SURVIVORS only (output-scale). At cluster scale the
  * hot segment key is exactly what AQE skew-join splitting exists for;
  * the shuffled relations themselves stay skinny (segments are k+1 rows
  * per index string, probe substrings O(k^2) per probe row).
  *
  * Strings shorter than k+1 have no nonempty segment scheme; for them
  * NO blocking key can discriminate (every short-short pair within
  * length k is a live candidate), but the DISTINCT short strings are
  * bounded by the alphabet (sum of |alphabet|^i for i <= k), so the
  * short path joins distinct short index strings against distinct
  * probe strings of length <= 2k under a broadcast nested loop —
  * metadata-scale by construction — and expands back to ids via two
  * hash equi-joins on the string value. The two paths partition the
  * index by length (>= k+1 vs < k+1), so their unions never overlap.
  *
  * Segment scheme for length l into n = k+1 parts: base = l div n,
  * rem = l mod n; the first n-rem segments have length base, the last
  * rem have base+1. Both sides derive the scheme from the same integer
  * arithmetic, so segment keys agree exactly.
  */
object FuzzyJoin {

  /** Shared segment-scheme columns: given `lenCol` (the index string's
    * length) and `iCol` (segment index 0..k), the segment's start and
    * length under the even-partition rule. */
  private def segLen(lenCol: Column, iCol: Column, n: Int): Column =
    (lenCol / n).cast("int") + when(iCol >= lit(n) - lenCol % n, 1).otherwise(0)

  private def segStart(lenCol: Column, iCol: Column, n: Int): Column =
    iCol * (lenCol / n).cast("int") +
      greatest(lit(0), iCol - (lit(n) - lenCol % n))

  /** All (probe_id, match_id, dist) pairs with
    * levenshtein(probe_str, index_str) <= k.
    *
    * `salts` spreads each segment key over that many shuffle keys
    * (index side salted by id hash, probe side replicated across all
    * salts — the probe-substring relation is the small side, so the
    * replication is the cheap direction). Without it, a template-hot
    * segment is ONE join key and its whole candidate block verifies in
    * a single task: the unsalted form measured 233 s at sf0.1 on the
    * customer-name fixture (every name shares "Customer#"), the salted
    * form ~2 s — same verify count, 16-way spread. */
  def edJoin(index: DataFrame, indexId: Column, indexStr: Column,
      probe: DataFrame, probeId: Column, probeStr: Column,
      k: Int, salts: Int = 16): DataFrame = {
    require(k >= 0 && k <= 4, s"edJoin: k in [0, 4], got $k (probe fan-out is O(k^2))")
    require(salts >= 1, "edJoin: salts >= 1")
    val n = k + 1
    val idx = index.select(indexId.as("r_id"), indexStr.as("r_str"))
    val prb = probe.select(probeId.as("s_id"), probeStr.as("s_str"))

    // --- main path: index strings long enough to have k+1 nonempty segments
    val segs = idx
      .withColumn("r_len", length(col("r_str")))
      .filter(col("r_len") >= n)
      .withColumn("seg_i", explode(sequence(lit(0), lit(k))))
      .select(col("r_id"), col("r_str"), col("r_len"), col("seg_i"),
        col("r_str").substr(segStart(col("r_len"), col("seg_i"), n) + 1,
          segLen(col("r_len"), col("seg_i"), n)).as("seg"),
        pmod(hash(col("r_id")), lit(salts)).as("salt"))

    val probeSubs = {
      val base = prb
        .withColumn("s_len", length(col("s_str")))
        // probes too short to reach any segmentable index length would
        // make the hypothesis sequence descend — they can only match
        // short-path index strings anyway
        .filter(col("s_len") + k >= n)
        .withColumn("r_len", explode(sequence(
          greatest(col("s_len") - k, lit(n)), col("s_len") + k)))
        .withColumn("seg_i", explode(sequence(lit(0), lit(k))))
        .withColumn("seg_len", segLen(col("r_len"), col("seg_i"), n))
        .withColumn("gs", greatest(lit(0),
          segStart(col("r_len"), col("seg_i"), n) - k))
        .withColumn("ge", least(col("s_len") - col("seg_len"),
          segStart(col("r_len"), col("seg_i"), n) + k))
      base
        .filter(col("gs") <= col("ge"))
        .withColumn("start", explode(sequence(col("gs"), col("ge"))))
        // a locally-repetitive probe can emit the same (r_len, seg_i,
        // seg) from several starts; deduping the skinny substring
        // relation BEFORE the join keeps each pair's verify count at
        // one-per-surviving-segment instead of one-per-start
        .select(col("s_id"), col("s_str"), col("r_len"), col("seg_i"),
          col("s_str").substr(col("start") + 1, col("seg_len")).as("seg"))
        .distinct()
        // replicate AFTER the dedup so the distinct runs on the
        // unreplicated relation
        .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    }

    // Pin the join's partition count explicitly: the shuffled inputs
    // are skinny (a few MB even at sf0.1), so AQE's coalescing — which
    // only sees INPUT bytes — would merge the whole join into one or
    // two tasks and serialize the (potentially enormous) join OUTPUT
    // through them, undoing the salting. An explicit repartition by
    // the salted key at the session's shuffle parallelism is preserved
    // by AQE, and ensureRequirements recognizes the co-partitioning so
    // no second exchange is added.
    val nPart = index.sparkSession.sessionState.conf.numShufflePartitions
    val joinKeys = Seq("r_len", "seg_i", "seg", "salt")
    // the threshold form of levenshtein band-limits the DP to O(k·len)
    // with early exit (returns -1 above the threshold) — ~10x cheaper
    // than the full matrix on template-hot candidate blocks where
    // nearly every pair fails the verify
    val mainPairs = segs.repartition(nPart, joinKeys.map(col): _*)
      .join(probeSubs.repartition(nPart, joinKeys.map(col): _*), joinKeys)
      .withColumn("dist", levenshtein(col("s_str"), col("r_str"), k).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= k)
      .select(col("s_id"), col("r_id"), col("dist"))
      .distinct()

    // --- short path: index strings with < k+1 chars (no segment scheme
    // exists; the DISTINCT string populations are alphabet-bounded; at
    // k=0 this degenerates to empty-vs-empty exact matches)
    val shortIdx = idx.filter(length(col("r_str")) < n)
    val shortPrb = prb.filter(length(col("s_str")) <= 2 * k)
    val strPairs = broadcast(shortIdx.select(col("r_str")).distinct())
      .join(shortPrb.select(col("s_str")).distinct(),
        levenshtein(col("s_str"), col("r_str")) <= k)
      .withColumn("dist", levenshtein(col("s_str"), col("r_str")).cast("long"))
    val shortPairs = shortIdx.join(strPairs, "r_str")
      .join(shortPrb, "s_str")
      .select(col("s_id"), col("r_id"), col("dist"))

    mainPairs.unionByName(shortPairs)
      .select(col("s_id").as("probe_id"), col("r_id").as("match_id"), col("dist"))
  }

  /** All deletion variants of `strCol` with up to `k` characters
    * removed (k in [1,2]), including the string itself — the FastSS
    * neighborhood. Fan-out 1 + L + C(L,2) per distinct string. */
  private def deleteVariants(strCol: Column, k: Int): Column = {
    val l = length(strCol)
    def del1(s: Column, len: Column): Column = transform(
      sequence(lit(1), len),
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, len)))
    val d0 = array(strCol)
    val d1 = when(l >= 1, del1(strCol, l)).otherwise(array().cast("array<string>"))
    if (k == 1) array_distinct(concat(d0, d1))
    else {
      // delete positions i < j in one pass: for each i, drop char i
      // then every char j > i of the REMAINDER (equivalent position
      // pairs, no double counting beyond what array_distinct removes)
      val d2 = when(l >= 2, flatten(transform(
        sequence(lit(1), l - 1),
        i => transform(
          sequence(i, l - 1),
          j => concat(strCol.substr(lit(1), i - 1),
            strCol.substr(i + 1, j - i),
            strCol.substr(j + 2, l)))))).otherwise(array().cast("array<string>"))
      array_distinct(concat(d0, d1, d2))
    }
  }

  /** Deletion-neighborhood (FastSS / symmetric-delete) fuzzy join for
    * k <= 2 — the strategy of choice for SHORT strings and small k,
    * complementary to [[edJoin]]'s segment scheme:
    *
    *   - [[edJoin]] (segments): probe fan-out is O(k^2) per row
    *     regardless of string length — right for LONG strings — but
    *     its blocking key is one segment, so corpora sharing a
    *     template region (URLs, "Customer#…" names) degrade toward
    *     all-pairs verify CPU.
    *   - this method: the join key is a whole deletion variant, so a
    *     candidate must agree on ALL BUT <= 2k characters — template
    *     corpora stay selective (candidates ~ output size) — but the
    *     fan-out is 1 + L + C(L,2) variants per distinct string, so
    *     cost grows quadratically with string length at k=2.
    *
    * Correctness (FastSS): ed(s,t) <= k implies the <= k-deletion
    * neighborhoods intersect (each edit is neutralized by at most one
    * deletion on each side); the exact levenshtein verify removes the
    * overgeneration. Proven differentially in FuzzyJoinSpec.
    *
    * Scale shape: both sides collapse to DISTINCT strings first (a
    * duplicate-heavy corpus — a million empty titles — contributes
    * each string once to the variant join; ids are re-expanded at the
    * end via two hash equi-joins on the string value). The variant
    * join is one hash equi-join on the variant text; every other step
    * is map-side or output-scale. No salting is needed because a hot
    * variant key requires many DISTINCT strings inside one deletion
    * ball — which means the verified OUTPUT is itself that large. */
  def edJoinDeletes(index: DataFrame, indexId: Column, indexStr: Column,
      probe: DataFrame, probeId: Column, probeStr: Column,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 2, s"edJoinDeletes: k in [1, 2], got $k — use edJoin for larger k")
    val idx = index.select(indexId.as("r_id"), indexStr.as("r_str"))
    val prb = probe.select(probeId.as("s_id"), probeStr.as("s_str"))
    val idxVar = idx.select(col("r_str")).distinct()
      .select(col("r_str"), explode(deleteVariants(col("r_str"), k)).as("v"))
    val prbVar = prb.select(col("s_str")).distinct()
      .select(col("s_str"), explode(deleteVariants(col("s_str"), k)).as("v"))
    val strPairs = idxVar.join(prbVar, "v")
      .select(col("r_str"), col("s_str")).distinct()
      .withColumn("dist", levenshtein(col("s_str"), col("r_str"), k).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= k)
    strPairs.join(idx, "r_str").join(prb, "s_str")
      .select(col("s_id").as("probe_id"), col("r_id").as("match_id"), col("dist"))
  }

  /** Standing deletion-variant index rows for incremental ed<=k probes
    * — the fuzzy twin of [[Dedup.bandIndex]]: build once per corpus
    * snapshot (or extend per epoch with each batch's survivors), store
    * bucketed by `v` at rest so probes co-locate. One row per (variant,
    * distinct string) plus a (string -> id) side of the SAME relation
    * (ids ride along), so a duplicate-heavy corpus pays its distinct
    * strings in variant fan-out and its duplicates only as skinny id
    * rows. Fan-out per distinct string: 1 + L + C(L,2) (k=2). */
  def deleteVariantIndex(index: DataFrame, indexId: Column, indexStr: Column,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 2, s"deleteVariantIndex: k in [1, 2], got $k")
    val idx = index.select(indexId.as("r_id"), indexStr.as("r_str"))
    idx.select(col("r_str")).distinct()
      .select(col("r_str"), explode(deleteVariants(col("r_str"), k)).as("v"))
      .join(idx, "r_str")
      .select(col("v"), col("r_id"), col("r_str"))
  }

  /** Incremental probe: batch strings against a standing
    * [[deleteVariantIndex]] — O(batch·fanout) new work per epoch, the
    * corpus never re-enumerated (the incrementalMinhashPairs
    * discipline). Returns the same (probe_id, match_id, dist) shape as
    * [[edJoinDeletes]]; FuzzyJoinSpec proves the two agree on the
    * (batch x corpus) restriction. */
  def probeDeletes(probe: DataFrame, probeId: Column, probeStr: Column,
      standingIndex: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 2, s"probeDeletes: k in [1, 2], got $k")
    val prb = probe.select(probeId.as("s_id"), probeStr.as("s_str"))
    val hits = prb.select(col("s_str")).distinct()
      .select(col("s_str"), explode(deleteVariants(col("s_str"), k)).as("v"))
      .join(standingIndex.select(col("v"), col("r_id"), col("r_str")), "v")
      .select(col("s_str"), col("r_id"), col("r_str")).distinct()
      .withColumn("dist", levenshtein(col("s_str"), col("r_str"), k).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= k)
    hits.join(prb, "s_str")
      .select(col("s_id").as("probe_id"), col("r_id").as("match_id"), col("dist"))
  }
}
