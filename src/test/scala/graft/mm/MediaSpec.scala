package graft.mm

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class MediaSpec extends SparkSpec {
  import spark.implicits._
  private implicit val s: SparkSession = spark

  private lazy val media =
    Media.asMedia(Tables.documents(spark, "/root/testdata/sf0.001")).as[Media.MediaRow]

  test("featurize is deterministic and matches the binary length") {
    val f1 = Media.features(spark, Tables.documents(spark, "/root/testdata/sf0.001"))
    val f2 = Media.features(spark, Tables.documents(spark, "/root/testdata/sf0.001"))
    assert(f1.collect().map(_.toString).sorted.toSeq === f2.collect().map(_.toString).sorted.toSeq)
    val r = f1.filter(col("doc_id") === 0).head()
    assert(r.getAs[Long]("n_bytes") > 0)
    assert(r.getAs[String]("content_hash").length === 32)
  }

  test("resize produces target-shaped outputs deterministically") {
    val out = Media.resize(media, 64, 64).collect()
    assert(out.length === 500)
    assert(out.forall(_.media.length === 64))
    assert(out.forall(r => r.width === 64 && r.height === 64))
  }

  test("frame sampling explodes one blob into strided frames") {
    val frames = Media.sampleFrames(media, frameBytes = 32, stride = 2).toDF()
    val perDoc = frames.groupBy("media_id").count()
    assert(perDoc.count() === 500)
    // doc 0 has 128 bytes -> 4 frames -> stride 2 -> indices 0, 2
    val d0 = frames.filter(col("media_id") === 0).select("frame_index")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(d0 === Seq(0L, 2L))
  }
}
