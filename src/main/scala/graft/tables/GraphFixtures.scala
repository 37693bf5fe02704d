package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The graph fixture relations, built ONCE per (session, sf-dir) and
  * shared by the whole graph query suite (triangles, clustering,
  * k-core/coreness, LPA, walks, rank/reach increments, components —
  * see each getter's scaladoc for its consumers) — the Prepare
  * convention realized for the query suite: at production scale these
  * are parquet tables at rest, rebuilt per graph snapshot and read by
  * every consumer, not re-derived per query. Without sharing, each
  * consumer pays the same lineitem self-join or join+groupBy again —
  * measured ~2-3 s per query at sf0.1, ~15 s across a suite run.
  *
  * Semantics are UNCHANGED: each getter derives exactly the relation
  * the queries built inline before (same arithmetic, same distinct,
  * same staging), so every DuckDB oracle hash is identical. Only the
  * redundant rebuilds go away.
  *
  * TWO tiers ([[FixtureStore]]):
  *  - session memo — first consumer in a session pays the build, the
  *    rest share the staged instance. Lifecycle is explicit: entries
  *    drop on [[FixtureStore.release]] or when the SparkContext ends;
  *    an abandoned live session keeps its entries (documented cost).
  *  - AT REST — [[materialize]] writes the relations as parquet under
  *    a root; a session configured with `graft.fixtures.dir` (conf) or
  *    `GRAFT_FIXTURES_DIR` (env) READS them instead of rebuilding.
  *    This is the production regime (fixtures rebuilt per snapshot by
  *    a prepare job, every query and every bench run pays only the
  *    scan) and it lets a bench separate build cost from read cost.
  *
  * Attribution note for bench reading (memo tier): within one session
  * the FIRST consumer pays the build; a standalone single-query run
  * pays its own build (cold memo) — both are honest, they measure
  * different regimes (suite at rest vs cold start), the same way
  * j13's staged corpus resolve reads.
  */
object GraphFixtures {

  private def memo(spark: SparkSession, dir: String, key: String)
      (build: => DataFrame): DataFrame =
    FixtureStore.memo(spark, dir, key)(build)

  /** Part co-occurrence pairs (parts sharing >= 1 order), distinct,
    * a < b, staged. Consumers: g9, g10. */
  def partCoPairs(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "part_co_pairs") {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("id_a"), col("y.p").as("id_b")).distinct()
        .localCheckpoint()
    }

  /** Per-pair support stats over the co-occurrence graph: distinct
    * part pairs (long-typed) with their corpus-order support (csup —
    * orders with o % 50 <> 49) and total support (tsup). The ONE
    * self-join every support-derived relation shares. Consumers:
    * g14 directly; [[strongPairs]] and g11's corpus flag derive from
    * it (csup >= 1 ⟺ some corpus order produces the pair — exactly
    * the max-flag g11 computed inline). */
  def supCounts(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "sup_counts") {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .groupBy(col("x.p").cast("long").as("a"), col("y.p").cast("long").as("b"))
        .agg(count(when(col("x.o") % 50 =!= 49, 1)).as("csup"),
          count(lit(1)).as("tsup"))
        .localCheckpoint(true)
    }

  /** Strong co-purchase pairs (parts sharing >= 2 distinct orders),
    * long-typed, staged — a skinny filter over [[supCounts]].
    * Consumers: the strong-graph suite (g12, g15, g16, g17, g19,
    * g20/g21 and successors). */
  def strongPairs(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "strong_pairs") {
      supCounts(spark, dir)
        .filter(col("tsup") >= 2)
        .select(col("a"), col("b"))
        .localCheckpoint(true)
    }

  /** Distinct (cust, supp) purchase pairs flagged by whether any
    * CORPUS order (o % 50 <> 49) produces them — the g11/g13
    * replayed-edge rule. Consumers: g8/g18 (flag ignored — all
    * pairs), g13 (corpus/merged split). */
  def custSuppFlagged(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "cust_supp_flagged") {
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
        .agg(max(col("o_orderkey") % 50 =!= 49).as("in_corpus"))
        .localCheckpoint(true)
    }

  /** Corpus-size-tiered k for the co-occurrence core (the t8 tier
    * discipline, mirrored as a CASE on the pair count in the g24
    * oracle): the sf0.001 fixture's max degree is 138, so a fixed
    * k = 80 leaves an EMPTY core there — vacuous at the smoke SF. The
    * count is one scalar aggregate over the staged pair relation
    * (metadata-scale, the Lpa-bounds precedent). */
  def coOccurCoreK(spark: SparkSession, dir: String): Int =
    if (supCounts(spark, dir).count() < 50000L) 20 else 80

  /** Standing tiered-k core of the CORPUS co-occurrence graph (pairs
    * with csup >= 1) — g24's pre-batch core: in production the
    * standing core is exactly what lives at rest between batches (the
    * incremental refresh's whole premise), so it is a fixture relation
    * like the resolved ER corpus, not a per-query rebuild. Staged: the
    * refresh consumes it twice (protected set + prev-degree audit). */
  def coOccurCorpusCore(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "cooccur_corpus_core") {
      graft.ops.KCore.core(
        supCounts(spark, dir).filter(col("csup") >= 1)
          .select(col("a").as("id_a"), col("b").as("id_b")),
        k = coOccurCoreK(spark, dir))
        .localCheckpoint(true)
    }

  // ---- standing state of the incremental tiers (r17) ----------------
  // The g24/j13 convention extended to the whole incremental family:
  // in production the STANDING state (ranks, hop labels, communities,
  // truss, link features, components of the pre-batch corpus) is
  // exactly what lives at rest between batches — the incremental
  // refresh's whole premise — so it is a prepare-job fixture relation,
  // not a per-query rebuild. Each build is the same deterministic
  // chain the query ran inline before (same arithmetic, same rounds),
  // so every DuckDB oracle hash is unchanged; only the rebuild moves
  // into the prepare step, which the bench reports separately.

  /** g13's standing ranks: 5 cold PageRank rounds over the CORPUS
    * purchase graph (bidirectional, supplier ids offset by 1e9). */
  def corpusRanks(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "corpus_ranks") {
      val corpus = custSuppFlagged(spark, dir).filter(col("in_corpus"))
      val edges = corpus
        .select(col("cust").as("src"), (col("supp") + 1000000000L).as("dst"))
        .unionByName(corpus
          .select((col("supp") + 1000000000L).as("src"), col("cust").as("dst")))
      graft.ops.PageRank.cold(edges, rounds = 5).localCheckpoint(true)
    }

  /** g14's standing labels: 3-hop BFS over the corpus strong graph
    * from the every-100th-part seed cohort. */
  def corpusHops(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "corpus_hops") {
      val sup = supCounts(spark, dir).filter(col("csup") >= 2)
      val corpusE = sup.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(sup.select(col("b").as("src"), col("a").as("dst")))
        .localCheckpoint(true)
      val seeds = Tables.part(spark, dir)
        .filter(col("p_partkey") % 100 === 0)
        .select(col("p_partkey").cast("long").as("id"))
      graft.ops.Reachability.hops(corpusE, seeds, maxHop = 3)
        .localCheckpoint(true)
    }

  /** g21's standing communities: 4 deterministic LPA rounds over the
    * corpus strong graph. */
  def corpusLabels(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "corpus_labels") {
      val sup = supCounts(spark, dir).filter(col("csup") >= 2)
      val corpusE = sup.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(sup.select(col("b").as("src"), col("a").as("dst")))
      graft.ops.Lpa.propagate(corpusE, rounds = 4).localCheckpoint(true)
    }

  /** g35's standing truss: the 3-truss of the corpus strong graph. */
  def corpusTruss(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "corpus_truss") {
      graft.ops.KTruss.truss(
        supCounts(spark, dir).filter(col("csup") >= 2)
          .select(col("a").as("id_a"), col("b").as("id_b")),
        k = 3).localCheckpoint(true)
    }

  /** g37's standing link-prediction features over the corpus strong
    * graph (hub cap 64 — part of the feature definition). */
  def corpusLinkFeatures(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "corpus_link_features") {
      graft.ops.LinkPrediction.features(
        supCounts(spark, dir).filter(col("csup") >= 2)
          .select(col("a").as("id_a"), col("b").as("id_b")),
        maxHubDeg = 64L).localCheckpoint(true)
    }

  /** g40's standing connected components of the corpus strong graph. */
  def corpusComponents(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "corpus_components") {
      graft.ops.Dedup.connectedComponents(
        supCounts(spark, dir).filter(col("csup") >= 2)
          .select(col("a").as("id_a"), col("b").as("id_b")))
        .localCheckpoint(true)
    }

  /** The at-rest prepare step: derive every fixture relation from
    * `dir` and persist it as parquet under `outRoot`, plus the
    * `_source_dir` marker that pins the pairing. A session configured
    * with `graft.fixtures.dir=outRoot` then reads these instead of
    * rebuilding (see [[FixtureStore]]).
    *
    * The build runs with the at-rest tier BYPASSED
    * ([[FixtureStore.buildingInline]]) and the session memo released
    * up front: when the configured fixtures dir already equals
    * `outRoot` (production re-prepare at the same path), an unbypassed
    * getter would serve the very parquet this job is about to replace
    * — overwrite-while-reading at best, silently re-persisted STALE
    * fixtures at worst. Each write is a staged tmp+rename swap
    * ([[FixtureStore.write]]), so a failed prepare leaves the previous
    * fixtures readable. */
  def materialize(spark: SparkSession, dir: String, outRoot: String): Unit =
    FixtureStore.buildingInline {
      FixtureStore.release(spark)
      FixtureStore.writeMarker(spark, outRoot, dir)
      FixtureStore.write(partCoPairs(spark, dir), outRoot, "part_co_pairs")
      FixtureStore.write(supCounts(spark, dir), outRoot, "sup_counts")
      FixtureStore.write(strongPairs(spark, dir), outRoot, "strong_pairs")
      FixtureStore.write(custSuppFlagged(spark, dir), outRoot, "cust_supp_flagged")
      FixtureStore.write(coOccurCorpusCore(spark, dir), outRoot, "cooccur_corpus_core")
      FixtureStore.write(corpusRanks(spark, dir), outRoot, "corpus_ranks")
      FixtureStore.write(corpusHops(spark, dir), outRoot, "corpus_hops")
      FixtureStore.write(corpusLabels(spark, dir), outRoot, "corpus_labels")
      FixtureStore.write(corpusTruss(spark, dir), outRoot, "corpus_truss")
      FixtureStore.write(corpusLinkFeatures(spark, dir), outRoot, "corpus_link_features")
      FixtureStore.write(corpusComponents(spark, dir), outRoot, "corpus_components")
    }
}
