package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B measurement harness for the optimization rounds: times
  * labeled variants of hot operator shapes against the same at-rest
  * fixtures the bench reads, min-of-N inside one JVM (the Bench
  * protocol), so a shape change can be judged in isolation before it
  * is wired into an operator. Not part of the driver contract; results
  * print as one line per variant.
  *
  * Usage: runMain graft.Probe <variant> [...]  (no args = all)
  */
object Probe {

  private def time(runs: Int)(body: => Long): (Double, Long) = {
    var best = Double.MaxValue
    var sig = 0L
    for (_ <- 1 to runs) {
      val t0 = System.nanoTime()
      sig = body
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    (best, sig)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    // same at-rest fixture resolution as Bench
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_probe_fixtures"
    // marker + fixture-set version, like Bench: a stale probe root would
    // silently serve inline rebuilds for newer keys and skew every A/B
    // this round decides from (the r17 ADVICE finding)
    if (!graft.tables.FixtureStore.markerCurrent(spark, root, sfDir)) {
      graft.tables.GraphFixtures.materialize(spark, sfDir, root)
      graft.tables.ErFixtures.materialize(spark, sfDir, root)
    }
    spark.conf.set("graft.fixtures.dir", root)
    graft.tables.FixtureStore.release(spark)

    val runs = sys.env.get("PROBE_RUNS").flatMap(_.toIntOption).getOrElse(3)
    val wanted: String => Boolean =
      if (args.isEmpty) _ => true else args.toSet.contains _

    def report(name: String)(body: => Long): Unit = if (wanted(name)) {
      val (sec, sig) = time(runs)(body)
      println(f"PROBE $name%-28s $sec%8.3f s   sig=$sig")
    }

    def bidir(pairs: DataFrame) =
      pairs.select(col("cust").as("src"), (col("supp") + 1000000000L).as("dst"))
        .unionByName(
          pairs.select((col("supp") + 1000000000L).as("src"), col("cust").as("dst")))

    // g8 shape: 5 cold PageRank iterations over the bipartite graph
    report("pagerank_cold_current") {
      val e0 = graft.tables.GraphFixtures.custSuppFlagged(spark, sfDir)
        .select(col("cust"), col("supp"))
      val r = graft.ops.PageRank.cold(bidir(e0), rounds = 5)
      r.agg(sum(col("pr"))).collect().head.getLong(0)
    }

    // variant: degree-annotated edges pre-partitioned by the per-round
    // join key before staging — does the per-round edge-side exchange
    // disappear, and does it pay?
    report("pagerank_cold_prepart") {
      val e0 = graft.tables.GraphFixtures.custSuppFlagged(spark, sfDir)
        .select(col("cust"), col("supp"))
      val edges = bidir(e0)
      val withDeg = edges
        .join(edges.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
        .repartition(col("src"))
        .localCheckpoint(true)
      val init = withDeg.select(col("src").as("id")).distinct()
        .withColumn("pr", lit(graft.ops.PageRank.InitRank)).localCheckpoint(true)
      val r = graft.ops.PageRank.iterate(withDeg, init, rounds = 5)
      r.agg(sum(col("pr"))).collect().head.getLong(0)
    }

    // variant: no per-round checkpoint — one lazy 5-round chain
    report("pagerank_cold_lazy") {
      val e0 = graft.tables.GraphFixtures.custSuppFlagged(spark, sfDir)
        .select(col("cust"), col("supp"))
      val edges = bidir(e0)
      val withDeg = edges
        .join(edges.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
        .localCheckpoint(true)
      var ranks = withDeg.select(col("src").as("id")).distinct()
        .withColumn("pr", lit(graft.ops.PageRank.InitRank)).localCheckpoint(true)
      for (_ <- 1 to 5)
        ranks = withDeg.join(ranks, col("src") === col("id"))
          .select(col("dst"), expr("(pr * 85) div (100 * deg)").as("contrib"))
          .groupBy(col("dst")).agg(sum(col("contrib")).as("cs"))
          .select(col("dst").as("id"), (lit(graft.ops.PageRank.BaseRank) + col("cs")).as("pr"))
      ranks.agg(sum(col("pr"))).collect().head.getLong(0)
    }

    // plan inspection: one PageRank step over the staged edge relation
    // (prints instead of timing — evidence for the exchange-count diff)
    if (wanted("pagerank_step_plan")) {
      val e0 = graft.tables.GraphFixtures.custSuppFlagged(spark, sfDir)
        .select(col("cust"), col("supp"))
      val withDeg = graft.ops.PageRank.withDegrees(bidir(e0))
      val init = withDeg.select(col("src").as("id")).distinct()
        .withColumn("pr", lit(graft.ops.PageRank.InitRank)).localCheckpoint(true)
      println("=== pagerank step (withDeg staged partitioned on src) ===")
      withDeg.join(init, col("src") === col("id"))
        .select(col("dst"), expr("(pr * 85) div (100 * deg)").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("cs"))
        .select(col("dst").as("id"), (lit(graft.ops.PageRank.BaseRank) + col("cs")).as("pr"))
        .explain("formatted")
    }

    // dedup_recall phase split: exact-truth postings join vs the three
    // banded candidate generators
    report("dedup_truth_only") {
      import graft.tables.Tables
      val docs = Tables.documents(spark, sfDir).filter(col("doc_id") % 2 === 0)
      val ts = docs.select(col("doc_id"),
          graft.expr.ArrayExprs.shingleHashes(col("text")).as("ts"))
        .filter(col("ts").isNotNull)
      val sizes = ts.select(col("doc_id"), size(col("ts")).as("n"))
      val posts = ts.select(col("doc_id"), explode(col("ts")).as("sh"))
      val shared = posts.alias("x")
        .join(posts.alias("y"),
          col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_shared"))
      shared
        .join(broadcast(sizes.select(col("doc_id").as("id_a"), col("n").as("na"))), Seq("id_a"))
        .join(broadcast(sizes.select(col("doc_id").as("id_b"), col("n").as("nb"))), Seq("id_b"))
        .filter(col("n_shared").cast("double") /
          (col("na") + col("nb") - col("n_shared")).cast("double") >= 0.5)
        .count()
    }
    report("dedup_methods_only") {
      import graft.tables.Tables
      val docs = Tables.documents(spark, sfDir).filter(col("doc_id") % 2 === 0)
      graft.ops.Dedup.minhashCandidatePairs(docs).count() +
        graft.ops.Dedup.simhashPairs(docs, bits = 16, maxDist = 1).count() +
        graft.ops.Dedup.winnowPairs(docs, k = 3, w = 4, minShared = 3L).count()
    }

    // g10/g9 triangle-family phase split (r18 item 3: the driver's
    // 32-core run put g10 at 37.1 s vs < 1.9 s at 8 cores — find which
    // phase anti-scales). Phases are cumulative prefixes of
    // Triangles.perNodeCounts over the g10 edge set; subtract
    // neighbors to attribute time.
    def triOriented() = {
      val e = graft.tables.GraphFixtures.partCoPairs(spark, sfDir)
        .select(col("id_a").cast("long").as("a"), col("id_b").cast("long").as("b"))
      val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
      val rk = deg.select(col("v"), (col("d") * lit(1L << 32) + col("v")).as("rk"))
      e.join(broadcast(rk.select(col("v").as("a"), col("rk").as("rka"))), "a")
        .join(broadcast(rk.select(col("v").as("b"), col("rk").as("rkb"))), "b")
        .select(
          when(col("rka") < col("rkb"), col("a")).otherwise(col("b")).as("src"),
          when(col("rka") < col("rkb"), col("b")).otherwise(col("a")).as("dst"),
          greatest(col("rka"), col("rkb")).as("rkdst"))
        .localCheckpoint()
    }
    report("tri_edges_scan") {
      graft.tables.GraphFixtures.partCoPairs(spark, sfDir).count()
    }
    report("tri_orient") { triOriented().count() }
    report("tri_adj_agg") {
      val o = triOriented()
      o.groupBy(col("src")).agg(collect_list(col("dst")).as("nbrs"))
        .select(size(col("nbrs")).as("n")).agg(sum(col("n"))).collect().head.getLong(0)
    }
    report("tri_intersect_full") {
      graft.ops.Triangles.perNodeCounts(
        graft.tables.GraphFixtures.partCoPairs(spark, sfDir))
        .agg(sum(col("n_tri"))).collect().head.getLong(0)
    }
    report("g10_full") {
      SparkEntry.queries("g10_clustering")(spark, sfDir).count()
    }
    report("g9_full") {
      SparkEntry.queries("g9_triangles")(spark, sfDir).count()
    }
    if (wanted("tri_stats")) {
      val o = triOriented()
      val m = o.count()
      val st = o.groupBy(col("src")).agg(count(lit(1)).as("od"))
        .agg(max(col("od")), avg(col("od")), count(lit(1))).collect().head
      val nTri = graft.ops.Triangles.perNodeCounts(
        graft.tables.GraphFixtures.partCoPairs(spark, sfDir))
        .agg(sum(col("n_tri"))).collect().head.getLong(0)
      println(s"TRI_STATS edges=$m maxOutdeg=${st.get(0)} avgOutdeg=${st.get(1)} " +
        s"srcNodes=${st.get(2)} triangleCorners=$nTri")
    }

    // ann_recall execution-mode A/B (r17 default = codegen)
    report("ann_recall_codegen") {
      SparkEntry.queries("ann_recall")(spark, sfDir).count()
    }
    report("ann_recall_interpreted") {
      spark.conf.set("graft.interpretedHarness", "true")
      try SparkEntry.queries("ann_recall")(spark, sfDir).count()
      finally spark.conf.unset("graft.interpretedHarness")
    }

    spark.stop()
  }
}
