package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution over dirty string keys: group records whose names
  * agree under MULTIPLE evidence channels into entities. The match
  * rule is conjunctive — `levenshtein ≤ k` AND `character-trigram
  * Jaccard ≥ tau` — the standard ER posture (any single channel
  * over-matches on templated names; the conjunction requires both a
  * small edit AND high content overlap).
  *
  * Composition, not new machinery — each channel is an existing
  * provably-complete blocked join, and the conjunction is an equi-join
  * of their outputs:
  *  - edit channel: [[FuzzyJoin.edJoinDeletes]] (FastSS deletion
  *    variants; complete for lev ≤ k by the pigeonhole argument in
  *    FuzzyJoinSpec);
  *  - content channel: [[SetSimJoin.jaccardSelfJoin]] over
  *    char-trigram sets (PPJoin prefix filtering; complete for
  *    Jaccard ≥ tau, SetSimJoinSpec);
  *  - conjunction: inner join on the (id_a, id_b) pair key — a pair
  *    satisfying BOTH predicates appears in BOTH channels, so the
  *    join loses nothing (completeness composes through
  *    intersection);
  *  - entities: [[Dedup.connectedComponents]] over the matched pairs
  *    (union-find small / label propagation at scale), singletons
  *    keep their own id.
  *
  * 100 TB shape: both channels are banded equi-joins on skinny
  * relations (variant keys / rarity prefixes), the conjunction joins
  * two already-verified pair sets (≤ matches, not candidates), and CC
  * runs on the match graph — nothing is ever all-pairs.
  */
object EntityResolution {

  /** Distinct character 3-grams of a string; empty array below length
    * 3 (such records can still match through the edit channel — but
    * the conjunction requires trigram evidence, so they resolve as
    * singletons, stated behavior). */
  def charTrigrams(s: Column): Column =
    when(length(s) >= 3,
      array_distinct(transform(sequence(lit(1), length(s) - 2),
        i => s.substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))

  /** (record_id, entity_id, n_members): entity_id is the component-min
    * record id under the conjunctive match rule. */
  def resolve(records: DataFrame, id: Column, name: Column,
      k: Int = 1, tau: Double = 0.9): DataFrame = {
    val recs = records.select(id.cast("long").as("id"), name.as("name"))
    val edits = FuzzyJoin
      .edJoinDeletes(recs, col("id"), col("name"),
        recs, col("id"), col("name"), k)
      .filter(col("probe_id") < col("match_id"))
      .select(col("probe_id").as("id_a"), col("match_id").as("id_b"))
    val trigramSets = recs
      .select(col("id").as("doc_id"), charTrigrams(col("name")).as("ts"))
      .filter(size(col("ts")) > 0)
    val content = SetSimJoin.jaccardSelfJoin(trigramSets, tau)
      .select(col("id_a"), col("id_b"))
    val matches = edits.join(content, Seq("id_a", "id_b"))
    val labels = Dedup.connectedComponents(matches)
      .select(col("node").as("id"), col("label"))
    val ents = recs.join(labels, Seq("id"), "left")
      .select(col("id").as("record_id"),
        coalesce(col("label"), col("id")).as("entity_id"))
    val sizes = ents.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_members"))
    ents.join(sizes, Seq("entity_id"))
      .select(col("record_id"), col("entity_id"), col("n_members"))
  }
}
