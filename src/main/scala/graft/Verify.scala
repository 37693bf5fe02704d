package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (dev loop —
    // `runMain graft.Verify <sf> <out> text_classify` + tools/check.py)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(',').toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // engine optimizer rules (sessions built withExtensions get these
    // from GraftExtensions; a plain session installs them at runtime)
    spark.experimental.extraOptimizations ++= Seq(graft.plans.TokenCountRule)
    // unknown names fail LOUDLY: a typo'd filter would otherwise dump
    // nothing and present an empty, clean-looking run
    only.foreach { f =>
      val unknown = f -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val qs = only.fold(SparkEntry.queries)(f => SparkEntry.queries.view.filterKeys(f).toMap)
    val os = only.fold(SparkEntry.oracleSql)(f => SparkEntry.oracleSql.view.filterKeys(f).toMap)
    dump(spark, sfDir, outDir, qs, os)
    spark.stop()
  }

  /** Runs every query, writing results under `outDir/<name>` plus two
    * manifests: `oracle_sql.json` and `errors.json` (name → message for
    * queries that failed). A failed query writes no output dir, which a
    * downstream compare would otherwise record as *absent* rather than
    * *red* — the manifest is what keeps every declared query visible in
    * the round's artifacts (the round-7 outage hid 51 failures this
    * way). Factored from main so a spec can drive it with a failing
    * query; returns the error map for the same reason. */
  def dump(spark: SparkSession, sfDir: String, outDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame],
      oracleSql: Map[String, String]): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      // NonFatal: an OutOfMemoryError/LinkageError means a corrupted JVM
      // whose remaining queries would fail or produce garbage while the
      // run still exits 0 with complete-looking manifests — crash the
      // round visibly instead of recording a fatal error as one red row.
      catch { case scala.util.control.NonFatal(e) =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        errors(name) = msg.take(500)
        // A failure must also REMOVE any stale result dir from a prior
        // dump: mode("overwrite") never executed, and a driver that
        // reads result dirs before consulting errors.json would compare
        // a previous round's green output as if it were current.
        // The delete must be VERIFIED: a false return or a throw means
        // the stale green output is still there, and silence here would
        // recreate exactly the false-green hazard this block removes.
        try {
          val p = new org.apache.hadoop.fs.Path(s"$outDir/$name")
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(p) && !(fs.delete(p, true) && !fs.exists(p)))
            System.err.println(
              s"[verify] WARNING: stale output $p survived delete; " +
                "its parquet is from a PRIOR run — trust errors.json, not the dir")
        } catch { case scala.util.control.NonFatal(t) =>
          System.err.println(
            s"[verify] WARNING: could not remove stale output $outDir/$name ($t); " +
              "its parquet is from a PRIOR run — trust errors.json, not the dir")
        }
        System.err.println(s"[verify] $name failed: $msg")
      }
    }
    val json = oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    errors.toMap
  }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL (or an error message) would
    * otherwise make the driver's json.load fail and silently zero the
    * round's correctness. */
  private[graft] def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
