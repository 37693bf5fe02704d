package graft

import graft.tables.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Column-WIDTH drift rehearsal, the sibling of `EventsTypeMatrixSpec`'s
  * temporal matrix: the driver regenerates the testdata between rounds
  * and has already drifted `events.ts` three times and `o_orderdate`
  * once. If an id column ships as INT32, Spark's int arithmetic WRAPS
  * where DuckDB promotes (`event_id * 1000000000 + ...` in
  * p5_synthetic_key silently diverges -> every id-arithmetic oracle row
  * goes red with no error anywhere); a FLOAT measure changes agg result
  * types. `Tables.widen` closes both holes with casts inserted only
  * when the stored type differs from the canonical one.
  *
  * This spec writes actually-narrowed parquet (int32 ids, float value,
  * array<double> embedding) and asserts the loaders restore canonical
  * types and representative queries return IDENTICAL results to the
  * canonical data — the narrow int range and exact float widening make
  * bit-equality the right assertion, not a tolerance.
  */
class WidthDriftSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val driftDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("width_drift").toString
    // events: ids narrowed to int32, value to float; ts kept as a
    // proper timestamp (the temporal matrix has its own spec)
    Tables.events(spark, sf)
      .select(col("event_id").cast("int"), col("ts"),
        col("user_id").cast("int"), col("event_type"),
        col("value").cast("float"), col("props"))
      .write.parquet(s"$dir/events.parquet")
    Tables.documents(spark, sf)
      .select(col("doc_id").cast("int"), col("text"), col("lang"),
        col("source"), col("n_chars").cast("int"))
      .write.parquet(s"$dir/documents.parquet")
    Tables.embeddings(spark, sf)
      .select(col("vec_id").cast("int"),
        col("embedding").cast("array<double>"), col("label"))
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("loaders restore canonical widths from narrowed parquet") {
    val ev = Tables.events(spark, driftDir)
    assert(ev.schema("event_id").dataType === LongType)
    assert(ev.schema("user_id").dataType === LongType)
    assert(ev.schema("value").dataType === DoubleType)
    val doc = Tables.documents(spark, driftDir)
    assert(doc.schema("doc_id").dataType === LongType)
    assert(doc.schema("n_chars").dataType === LongType)
    assert(Tables.embeddings(spark, driftDir).schema("vec_id").dataType === LongType)
    // canonical data is untouched by widen: no cast nodes over long/double
    val plan = Tables.events(spark, sf).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("cast(event_id"), plan)
  }

  test("id-arithmetic queries are identical on narrowed data (the int-wrap trap)") {
    // p5 multiplies event_id by 1e9: int32 arithmetic would wrap; the
    // widened long path must match the canonical run exactly. (Queries
    // whose OUTPUT carries `value` are excluded here: float narrowing
    // is lossy by construction, so only their types — covered above —
    // can be asserted, not their digits.)
    for (q <- Seq("p5_synthetic_key", "p6_string_replace")) {
      val fn = SparkEntry.queries(q)
      assert(rows(fn(spark, driftDir)) === rows(fn(spark, sf)), q)
    }
  }

  test("documents queries are identical on narrowed data") {
    for (q <- Seq("g1_explode", "text_fingerprint")) {
      val fn = SparkEntry.queries(q)
      assert(rows(fn(spark, driftDir)) === rows(fn(spark, sf)), q)
    }
  }

  test("SQL temp views inherit the widened schema (Catalog uses the loaders)") {
    // The SQL surface must see the same drift armor as the programmatic
    // one: a view registered over the raw scan would wrap int32
    // arithmetic where the oracle promotes. registerAll reads every
    // table, so link the non-drifted ones into the drift dir.
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")) {
      val link = java.nio.file.Paths.get(driftDir, s"$t.parquet")
      if (!java.nio.file.Files.exists(link))
        java.nio.file.Files.createSymbolicLink(
          link, java.nio.file.Paths.get(sf, s"$t.parquet"))
    }
    graft.sql.Catalog.registerAll(spark, driftDir)
    assert(spark.table("documents").schema("doc_id").dataType === LongType)
    assert(spark.table("documents").schema("n_chars").dataType === LongType)
    assert(spark.table("embeddings").schema("vec_id").dataType === LongType)
    assert(spark.table("events").schema("event_id").dataType === LongType)
    // and the arithmetic actually agrees with the canonical data
    val drifted = spark.sql("SELECT doc_id * 1000000000 + n_chars AS k FROM documents")
      .collect().map(_.getLong(0)).sorted.toSeq
    graft.sql.Catalog.registerAll(spark, sf)
    val canonical = spark.sql("SELECT doc_id * 1000000000 + n_chars AS k FROM documents")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(drifted === canonical)
  }

  test("embedding queries are identical under array<double> + int32 vec_id drift") {
    // float -> double is exact, so quantization and every distance
    // computed from it agree bit-for-bit with the canonical float read
    for (q <- Seq("ann_bruteforce", "dedup_embed_cosine")) {
      val fn = SparkEntry.queries(q)
      assert(rows(fn(spark, driftDir)) === rows(fn(spark, sf)), q)
    }
  }
}
