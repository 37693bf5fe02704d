package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // engine optimizer rules (sessions built withExtensions get these
    // from GraftExtensions; a plain session installs them at runtime)
    spark.experimental.extraOptimizations ++= Seq(graft.plans.TokenCountRule)
    // JVM/session warm-up so the first timed query doesn't absorb
    // executor startup, the Janino codegen compiler, the parquet reader
    // path, or the shuffle machinery. Each statement warms one physical
    // machine the timed queries rely on; none computes a timed result.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.range(100000).selectExpr("id", "id % 7 AS k", "CAST(id AS DECIMAL(18,2)) AS d")
      .groupBy("k").agg(org.apache.spark.sql.functions.sum("d")).collect()     // hash agg + shuffle
    spark.range(10000).selectExpr("id", "id % 5 AS p")
      .selectExpr("*", "row_number() OVER (PARTITION BY p ORDER BY id DESC) AS rn")
      .filter("rn = 1").collect()                                              // window exec
    spark.range(1000).selectExpr("id", "explode(array(id, id + 1)) AS e").collect() // generator
    // Warm-up must never abort the bench: a broken table here would zero
    // the whole round's signal; the per-query loop below already records
    // the failure for every query that touches it.
    // NonFatal, not Throwable: an OutOfMemoryError/LinkageError here
    // means a corrupted JVM whose timings would be garbage — let it
    // crash the round visibly rather than skew every number.
    try graft.tables.Tables.events(spark, sfDir).select("event_id").limit(1).collect() // parquet reader
    catch { case scala.util.control.NonFatal(t) => System.err.println(s"[bench] warm-up failed: $t") }
    val errors = Seq.newBuilder[String]
    // A failed query reports sentinel -1 and is excluded from `total`:
    // its wall time (however long it spent failing) would otherwise
    // skew the headline number while producing no result. The `errors`
    // array is the failure signal.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case scala.util.control.NonFatal(t) =>
          errors += name; System.err.println(s"[bench] $name failed: $t")
          name -> -1.0
      }
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.result().map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    // Key order is deliberate: the large per-query map FIRST, the
    // headline metric/value LAST. A log capture that keeps only the
    // tail of this (long) line then still ends with the headline
    // number; JSON parsers don't care about member order.
    println(s"""{"queries":$qs,"errors":$errs,"sf":"$sfDir","n_queries":${results.size},"metric":"total","unit":"sec","value":$total}""")
    spark.stop()
  }
}
