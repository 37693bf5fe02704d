package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BlockRangeSourceSpec extends SparkSpec {

  test("batch read covers [start, maxBlock) across partitions") {
    val df = spark.read.format("blockrange")
      .option("start", "10").option("maxBlock", "110")
      .option("numPartitions", "4").load()
    assert(df.rdd.getNumPartitions === 4)
    val agg = df.agg(count(lit(1)), min(col("block_number")), max(col("block_number"))).head()
    assert((agg.getLong(0), agg.getLong(1), agg.getLong(2)) === ((100L, 10L, 109L)))
  }

  test("micro-batch stream advances per poll and honors trailBlocks") {
    val ckpt = java.nio.file.Files.createTempDirectory("br_ckpt").toString
    val stream = spark.readStream.format("blockrange")
      .option("start", "0").option("maxBlock", "1000")
      .option("blocksPerTrigger", "250").option("trailBlocks", "100")
      .load()
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("blocks_out")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT count(*) n, min(block_number) mn, max(block_number) mx FROM blocks_out").head()
    // head reaches 1000; available = head - trail = 900 -> [0, 900)
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) === ((900L, 0L, 899L)))
  }
}
