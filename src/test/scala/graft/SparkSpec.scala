package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (per spark_guide.md). */
trait SparkSpec extends AnyFunSuite {

  /** Lowercase-hex MD5 of the UTF-8 bytes — matches Spark's `md5()` and
    * DuckDB's `md5()`, the ordering/bucketing convention every
    * deterministic sampler in the engine keys on. Shared here so the
    * differential-reference specs can't drift apart on the hash. */
  protected def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
