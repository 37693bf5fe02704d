package graft.mm

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` media + typed metadata.
  *
  * The decode step (image/audio codecs) is STUBBED with a deterministic
  * fake — the container ships no media libraries — but the Spark-side
  * plumbing is real and is the part that matters at scale: binary
  * columns flow through parquet untouched, feature extraction runs as a
  * partition-batched `mapPartitions` (one codec/digest instance per
  * partition, not per row — the same batching contract a Pandas-UDF
  * `mapInPandas` decode would use), and the output is a narrow typed
  * schema so downstream plans prune the heavy bytes away.
  */
object Media {

  final case class MediaRow(media_id: Long, media: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Long,
                                 height: Long, content_hash: String)

  /** documents.text reinterpreted as an opaque media blob (the fixture
    * stand-in for an image/audio payload). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      col("text").cast("binary").as("media"))

  /** STUB decoder: a real build would hand `bytes` to an image codec
    * here. The fake derives (width, height) from the byte length so the
    * whole path is deterministic and oracle-checkable. */
  private def decodeStub(bytes: Array[Byte]): (Long, Long) =
    (bytes.length.toLong % 640, (bytes.length.toLong / 640) % 480)

  /** Partition-batched featurize: digest + decode per batch of rows. */
  def featurize(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // one instance per partition
      it.map { row =>
        md.reset()
        val digest = md.digest(row.media)
        val hex = digest.map(b => f"${b & 0xff}%02x").mkString
        val (w, h) = decodeStub(row.media)
        MediaFeatures(row.media_id, row.media.length.toLong, w, h, hex)
      }
    }
  }

  /** End-to-end: documents -> media blobs -> decoded features. */
  def features(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    featurize(asMedia(docs).as[MediaRow]).toDF()
  }

  final case class ResizedMedia(media_id: Long, media: Array[Byte],
                                width: Long, height: Long)

  /** STUB resize: a real build would decode, scale to (w, h), re-encode.
    * The fake deterministically re-samples the byte stream to the target
    * "pixel count" so output sizes and partition shapes are realistic. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int)
            (implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val target = math.max(1, (w.toLong * h / 64).toInt) // fake: bytes ~ pixels/64
        val out = Array.tabulate(target)(i => row.media(((i.toLong * row.media.length) / target).toInt))
        ResizedMedia(row.media_id, out, w.toLong, h.toLong)
      }
    }
  }

  final case class Frame(media_id: Long, frame_index: Long, frame: Array[Byte])

  /** STUB frame-sample: a real build would demux a video and decode
    * every `stride`-th frame. The fake slices the byte stream into
    * fixed "frames"; the Spark-side shape — one row in, N frame rows
    * out of a partition-batched decoder — is the real contract. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int)
                  (implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { row =>
        val nFrames = math.max(1, row.media.length / frameBytes)
        (0L until nFrames.toLong by stride.toLong).map { fi =>
          val lo = (fi * frameBytes).toInt
          Frame(row.media_id, fi, row.media.slice(lo, math.min(lo + frameBytes, row.media.length)))
        }
      }
    }
  }
}
