package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The correctness dump is the driver's whole view of the engine: a
  * query that fails must surface as an explicit red row, never vanish
  * (round 7 lost 51 queries to exactly that), and the manifests must
  * stay machine-parseable whatever garbage ends up in an error message. */
class VerifyDumpSpec extends SparkSpec {

  private def fakeQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "good_query" -> ((s, _) => { import s.implicits._; Seq((1L, "a"), (2L, "b")).toDF("id", "v") }),
    "bad_query" -> ((s, _) => {
      import s.implicits._
      // analysis-time failure with JSON-hostile characters in the message
      Seq(1L).toDF("id").select(col("does\"not\nexist"))
    }))

  test("failed queries land in errors.json; good ones still write output") {
    val out = Files.createTempDirectory("verifydump-").toString
    val errors = Verify.dump(spark, "/unused", out, fakeQueries,
      Map("good_query" -> "SELECT 1 AS id, 'a' AS v"))
    assert(errors.keySet === Set("bad_query"))
    assert(Files.exists(Paths.get(out, "good_query")), "good query output missing")
    assert(!Files.exists(Paths.get(out, "bad_query")), "failed query must not leave output")
    // both manifests parse as strict JSON despite quotes/newlines in the message
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val errs = mapper.readTree(Files.readString(Paths.get(out, "errors.json")))
    assert(errs.has("bad_query") && errs.get("bad_query").asText().nonEmpty)
    val oracle = mapper.readTree(Files.readString(Paths.get(out, "oracle_sql.json")))
    assert(oracle.get("good_query").asText().startsWith("SELECT"))
  }

  test("a query that regresses to failing deletes its stale output from a prior dump") {
    val out = Files.createTempDirectory("verifydump-").toString
    // round N: the query is green and writes output
    Verify.dump(spark, "/unused", out,
      Map("q" -> ((s, _) => { import s.implicits._; Seq(1L).toDF("id") })), Map.empty)
    assert(Files.exists(Paths.get(out, "q")))
    // round N+1 into the SAME outDir: the query now fails at analysis.
    // The stale green parquet must go — a driver that reads result dirs
    // before errors.json would otherwise compare last round's output.
    val errors = Verify.dump(spark, "/unused", out,
      Map("q" -> ((s, _) => { import s.implicits._
        Seq(1L).toDF("id").select(col("nope")) })), Map.empty)
    assert(errors.contains("q"))
    assert(!Files.exists(Paths.get(out, "q")), "stale output must be deleted on failure")
  }

  test("error messages are truncated, control chars escaped") {
    val longMsg = "x" * 1000 + "\t\r"
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "boom" -> ((_, _) => throw new RuntimeException(longMsg)))
    val out = Files.createTempDirectory("verifydump-").toString
    val errors = Verify.dump(spark, "/unused", out, qs, Map.empty)
    assert(errors("boom").length <= 500)
    val parsed = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(Paths.get(out, "errors.json")))
    assert(parsed.get("boom").asText().startsWith("xxx"))
  }
}
