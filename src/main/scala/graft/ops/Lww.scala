package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-writer-wins versioned merge.
  *
  * The reference implements LWW as per-item DynamoDB conditional writes
  * (`nft/data_services/dynamodb.py:121-122` single version key,
  * `:180-185` two-level (data_version, attribute_version) guard). In
  * Spark the same semantics over a *set* of rows is an argmax per key by
  * the version column tuple: union(current, incoming) -> keep the row
  * with the highest version vector per key.
  *
  * Scale notes: one shuffle on `keys` (hash partition), sort within
  * partition on the version columns only — no global sort. Replaying the
  * same input is idempotent (same argmax), which is the reference's
  * crawl-replay invariant (A4/K8 in SURVEY.md §2).
  */
object Lww {

  /** Keep, per `keys`, the single row with the greatest `versionCols`
    * tuple (lexicographic). `tieBreak` columns make the result total
    * when version ties are possible (pass the natural unique key).
    */
  def merge(df: DataFrame, keys: Seq[String], versionCols: Seq[String],
            tieBreak: Seq[String] = Nil): DataFrame = {
    val order = versionCols.map(c => col(c).desc) ++ tieBreak.map(c => col(c).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__lww_rn", row_number().over(w))
      .filter(col("__lww_rn") === 1)
      .drop("__lww_rn")
  }

  /** Merge an incoming snapshot into the current table (both with the
    * same schema) — union + argmax. Ties go to `incoming` iff
    * `tiesToIncoming` (the reference's put guard is `<=`,
    * `dynamodb.py:492-494`; update guards are strict `<`,
    * `dynamodb.py:180-185`).
    */
  def upsert(current: DataFrame, incoming: DataFrame, keys: Seq[String],
             versionCols: Seq[String], tiesToIncoming: Boolean = true): DataFrame = {
    val tagged = current.withColumn("__src", lit(if (tiesToIncoming) 0 else 1))
      .unionByName(incoming.withColumn("__src", lit(if (tiesToIncoming) 1 else 0)))
    merge(tagged, keys, versionCols :+ "__src").drop("__src")
  }
}
