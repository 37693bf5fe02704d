package graft
import org.apache.spark.sql.SparkSession

/** Entry smoke runner: runs SparkEntry.entry on sf0.001, prints row count. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = SparkEntry.entry(spark)
    println(s"ENTRY ROWS=${e.count()}")
    e.show(5, false)
    spark.stop()
  }
}
