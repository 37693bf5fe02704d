package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins and aggregations.
  *
  * The reference pre-shards its write path by partition key so writers
  * never contend (`nft/data_services/dynamodb.py` partition-key design);
  * the warehouse-side analog — and the standard 100 TB technique for a
  * fact table joined repeatedly on the same key — is Spark bucketing:
  * `bucketBy(n, key)` + `sortBy(key)` persists the hash-partitioning in
  * the table layout, so every later equi-join or aggregation on that
  * key reads co-located buckets and plans WITHOUT a shuffle (and, with
  * sortBy, without a sort). One shuffle is paid once at write time
  * instead of once per downstream query.
  *
  * Bucketed tables require the session catalog (`saveAsTable`) — plain
  * `parquet(path)` writes cannot carry bucket metadata.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
