package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Merge-based as-of join: for each left row, the latest right row of
  * the same key with `rightTime <= leftTime`.
  *
  * Spark has no native as-of physical operator. The composable
  * formulation (equi-join on the key + time inequality + argmax, see
  * `j5_asof_join`) materializes every (left, matching-right) pair
  * before the partial aggregate collapses them — fine when rights-per-
  * key is small, quadratic pressure when a hot key has millions of
  * both. This operator is the scale path for that case:
  *
  *   1. tag both sides and union them (no pairing),
  *   2. one hash repartition on the key,
  *   3. sort within each partition by (key, time, side-tag, tiebreak) —
  *      Spark's secondary-sort pattern, spill-safe,
  *   4. a single forward sweep per partition: right rows update the
  *      "current" state for their key, left rows emit it.
  *
  * Shuffled volume is O(|left| + |right|) rows — never pairs — and the
  * sweep is O(n) per partition with one live row of state. Rights sort
  * before lefts at equal time, so the match is inclusive (`<=`), and
  * equal-time rights are swept in `tiebreak` order so the last one
  * (highest tiebreak) wins deterministically.
  */
object AsofJoin {

  /** @param left       probe side; all its columns are kept
    * @param right      build side
    * @param leftKey    join key column in `left`
    * @param rightKey   join key column in `right` (same type)
    * @param leftTime   long event-time column in `left`
    * @param rightTime  long event-time column in `right`, same units
    * @param rightVals  right columns to carry (null when no match);
    *                   also the deterministic tiebreak order for
    *                   equal-time rights
    */
  private def requireIntegral(df: DataFrame, c: String, role: String): Unit = {
    val dt = df.schema(c).dataType
    val integral = dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType
    require(integral,
      s"asofJoin $role column '$c' must be an integral type " +
        s"(byte/short/int/long); got ${dt.simpleString}. A string or decimal " +
        "column would silently cast to null (or merge distinct values that " +
        "truncate alike) — re-key to a long (e.g. xxhash64) before the join.")
  }

  /** Key and time columns are restricted to integral types — checked at
    * plan-build time (see requireIntegral). Null keys/times never match:
    * null-key rights are filtered out, null-key lefts emit with null
    * right values (left-join semantics, matching DuckDB's ASOF JOIN). */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightVals: Seq[String]): DataFrame = {
    requireIntegral(left, leftKey, "left key")
    requireIntegral(right, rightKey, "right key")
    requireIntegral(left, leftTime, "left time")
    requireIntegral(right, rightTime, "right time")
    val leftSchema = left.schema
    val rightValFields = rightVals.map { c =>
      val f = right.schema(c)
      StructField(f.name, f.dataType, nullable = true)
    }
    val outSchema = StructType(leftSchema.fields.toSeq ++ rightValFields)

    val lStruct = struct(leftSchema.fieldNames.map(col).toSeq: _*)
    val rStruct = struct(rightVals.map(col): _*)
    val lType = StructType(leftSchema.fields)
    val rType = StructType(rightValFields)

    val lTagged = left.select(
      col(leftKey).cast("long").as("__k"), col(leftTime).cast("long").as("__t"),
      lit(1).as("__tag"), lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val rTagged = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).cast("long").as("__k"), col(rightTime).cast("long").as("__t"),
        lit(0).as("__tag"), lit(null).cast(lType).as("__l"),
        rStruct.as("__r"))

    val sortTiebreak: Seq[Column] = rightVals.map(c => col(s"__r.$c"))
    val swept = lTagged.unionByName(rTagged)
      .repartition(col("__k"))
      .sortWithinPartitions(Seq(col("__k"), col("__t"), col("__tag")) ++ sortTiebreak: _*)
      .mapPartitions { it =>
        var curKey: Long = Long.MinValue
        var haveKey = false
        var curRight: Row = null
        it.flatMap { row =>
          // null-key lefts (rights are pre-filtered) match nothing
          if (row.isNullAt(0)) {
            Some(Row.fromSeq(row.getStruct(3).toSeq ++ rightVals.map(_ => null)))
          } else {
          val k = row.getLong(0)
          if (!haveKey || k != curKey) { curKey = k; haveKey = true; curRight = null }
          if (row.getInt(2) == 0) { // right row: update state, emit nothing
            curRight = row.getStruct(4)
            None
          } else {
            val l = row.getStruct(3)
            val rvals =
              if (curRight == null) rightVals.map(_ => null)
              else curRight.toSeq
            Some(Row.fromSeq(l.toSeq ++ rvals))
          }
          }
        }
      }(Encoders.row(outSchema))
    swept.toDF()
  }
}
