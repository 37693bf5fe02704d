package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental connected components under insert-only edge arrival —
  * the cheapest member of the incremental family, because the
  * monotonicity is total: components only MERGE, so the standing
  * labeling is always a REFINEMENT of the merged partition and the
  * refresh never touches the graph at all. It contracts each standing
  * component to its label, maps the batch edges through the labels
  * (unknown endpoints stay themselves — new singletons), and solves
  * CC on THAT graph: O(components + batch) work per batch against the
  * O(|E|·rounds) cold hash-to-min loop, the sharpest
  * incremental-vs-cold gap in the family.
  *
  * Exactness: standing labels are min-node-ids
  * ([[Dedup.connectedComponents]]'s contract), so the contracted
  * solve's min-label for a merged component is the min over its
  * standing labels = the min node id of the merged component — the
  * refresh provably equals the cold CC of the merged edge set
  * (ComponentsSpec proves it differentially). */
object Components {

  /** `standingLabels`: (node, label) from
    * [[Dedup.connectedComponents]] over the pre-batch edges.
    * `batchEdges`: (id_a, id_b) arrivals (orientation/duplicates
    * tolerated; self-pairs after contraction are dropped — an edge
    * INSIDE a standing component merges nothing). Returns (node,
    * label) for every standing node and every new batch endpoint. */
  def refreshComponents(standingLabels: DataFrame,
      batchEdges: DataFrame): DataFrame = {
    val lab = standingLabels.select(col("node"), col("label"))
      .localCheckpoint(true) // mapped twice + final relabel + new-node anti
    val contracted = batchEdges
      .join(lab.select(col("node").as("id_a"), col("label").as("la")),
        Seq("id_a"), "left")
      .join(lab.select(col("node").as("id_b"), col("label").as("lb")),
        Seq("id_b"), "left")
      .select(coalesce(col("la"), col("id_a")).as("id_a"),
        coalesce(col("lb"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    // CC over the contracted graph — components + batch sized
    val merged = Dedup.connectedComponents(contracted)
      .select(col("node").as("old_label"), col("label").as("merged"))
      .localCheckpoint(true) // standing relabel + new-node labels
    val relabeled = lab
      .join(merged, col("label") === col("old_label"), "left")
      .select(col("node"), coalesce(col("merged"), col("label")).as("label"))
    val newNodes = batchEdges.select(col("id_a").as("node"))
      .unionByName(batchEdges.select(col("id_b").as("node"))).distinct()
      .join(lab.select(col("node")), Seq("node"), "left_anti")
    relabeled.unionByName(
      newNodes
        .join(merged, col("node") === col("old_label"), "left")
        .select(col("node"), coalesce(col("merged"), col("node")).as("label")))
  }
}
