package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LwwSpec extends SparkSpec {
  import spark.implicits._

  test("merge keeps argmax by version tuple") {
    val df = Seq(
      ("k1", 1, 10, "old"), ("k1", 2, 5, "new"),
      ("k2", 2, 1, "a"), ("k2", 2, 2, "b")
    ).toDF("key", "v1", "v2", "payload")
    val got = Lww.merge(df, Seq("key"), Seq("v1", "v2"))
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(got === Map("k1" -> "new", "k2" -> "b"))
  }

  test("upsert ties go to incoming by default (put <= guard) and to current when strict (< guard)") {
    val cur = Seq(("k", 1, "current")).toDF("key", "v", "payload")
    val inc = Seq(("k", 1, "incoming")).toDF("key", "v", "payload")
    val put = Lww.upsert(cur, inc, Seq("key"), Seq("v")).head()
    assert(put.getAs[String]("payload") === "incoming") // dynamodb.py:492-494 `<=`
    val upd = Lww.upsert(cur, inc, Seq("key"), Seq("v"), tiesToIncoming = false).head()
    assert(upd.getAs[String]("payload") === "current") // dynamodb.py:180-185 `<`
  }

  test("upsert is idempotent under replay") {
    val cur = Seq(("a", 1, "x"), ("b", 2, "y")).toDF("key", "v", "payload")
    val inc = Seq(("a", 2, "x2"), ("c", 1, "z")).toDF("key", "v", "payload")
    val once = Lww.upsert(cur, inc, Seq("key"), Seq("v"))
    val twice = Lww.upsert(once, inc, Seq("key"), Seq("v"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
    assert(once.count() === 3)
  }

  test("reconcile reports both anti sides and mismatches") {
    val l = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "val")
    val r = Seq((2, "b"), (3, "X"), (4, "d")).toDF("id", "val")
    val got = Reconcile.fullOuter(l, r, Seq("id"), Seq("val"))
      .collect().map(x => x.getAs[Int]("id") -> x.getAs[String]("status")).toMap
    assert(got === Map(1 -> "left_only", 2 -> "match", 3 -> "mismatch", 4 -> "right_only"))
  }
}
