package graft.mm

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` media + typed metadata.
  *
  * Two decode tiers:
  *  - REAL raster decode for the formats the JDK itself ships codecs
  *    for (PNG/JPEG/BMP/GIF via `javax.imageio`, pure JVM, headless):
  *    [[featurizeImages]] / [[resizeImages]] decode actual pixels,
  *    compute luma statistics, and re-encode — no external libraries.
  *  - A deterministic STUB for what the JVM cannot decode (video
  *    demux/codecs, compressed audio): the fixture formula keeps the
  *    oracled queries engine-checkable, and the scaladoc on each stub
  *    marks exactly where a codec library would plug in.
  *
  * The Spark-side plumbing is identical for both tiers and is the part
  * that matters at scale: binary columns flow through parquet
  * untouched, feature extraction runs as a partition-batched
  * `mapPartitions` (one codec/digest instance per partition, not per
  * row — the same batching contract a Pandas-UDF `mapInPandas` decode
  * would use), and the output is a narrow typed schema so downstream
  * plans prune the heavy bytes away.
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

  /** STUB decoder for the ORACLED fixture path: documents.text bytes
    * are not images, and the DuckDB mirror checks this exact formula,
    * so (width, height) derive deterministically from byte length. The
    * REAL decode tier for actual image payloads is [[featurizeImages]]
    * below. */
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
        // an empty blob resizes to an empty blob — indexing media(0)
        // would kill the task, violating the poisoned-blob contract
        if (row.media.isEmpty) ResizedMedia(row.media_id, Array.emptyByteArray, w.toLong, h.toLong)
        else {
          val target = math.max(1, (w.toLong * h / 64).toInt) // fake: bytes ~ pixels/64
          val out = Array.tabulate(target)(i => row.media(((i.toLong * row.media.length) / target).toInt))
          ResizedMedia(row.media_id, out, w.toLong, h.toLong)
        }
      }
    }
  }

  // ---- REAL image decode (JDK javax.imageio — PNG/JPEG/BMP/GIF) ----

  final case class ImageFeatures(media_id: Long, n_bytes: Long,
      width: Option[Long], height: Option[Long], mean_luma: Option[Double],
      content_hash: String)

  private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** BT.601 luma of one packed-RGB pixel — the ONE definition both the
    * luma features and the perceptual hash derive from (a coefficient
    * change must move them together). */
  private def luma(rgb: Int): Double =
    0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)

  /** Mean BT.601 luma over at most a 64x64 sample grid — O(1) per image
    * regardless of resolution, deterministic (fixed grid, no RNG). */
  private def meanLuma(img: java.awt.image.BufferedImage): Double = {
    val (w, h) = (img.getWidth, img.getHeight)
    val (sx, sy) = (math.max(1, w / 64), math.max(1, h / 64))
    var (sum, n) = (0.0, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        sum += luma(img.getRGB(x, y))
        n += 1
        x += sx
      }
      y += sy
    }
    sum / n
  }

  /** REAL decode: pixel dimensions + luma stats from the actual image
    * bytes. Undecodable payloads (not a JDK-supported raster format)
    * yield null dims/luma instead of failing the task — at corpus scale
    * a poisoned blob must not kill the batch. `ImageIO.setUseCache
    * (false)` keeps the codec off executor local disk. */
  def featurizeImages(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val md = MessageDigest.getInstance("MD5")
      it.map { row =>
        md.reset()
        val hex = md.digest(row.media).map(b => f"${b & 0xff}%02x").mkString
        readImage(row.media) match {
          case Some(img) => ImageFeatures(row.media_id, row.media.length.toLong,
            Some(img.getWidth.toLong), Some(img.getHeight.toLong),
            Some(meanLuma(img)), hex)
          case None => ImageFeatures(row.media_id, row.media.length.toLong,
            None, None, None, hex)
        }
      }
    }
  }

  /** Exact box-filter area average, implemented directly: each output
    * pixel is the rounded mean of its source rectangle. Synchronous and
    * toolkit-free — `Image.getScaledInstance` returns an asynchronously
    * produced ToolkitImage whose drawImage is not spec-guaranteed to
    * block until scaling completes, and Graphics2D scaling varies with
    * rendering hints across JVMs; a hand-rolled box filter is the only
    * scaler with ONE portable answer. Upscale degenerates to pixel
    * replication (source box of one pixel), the box-filter contract. */
  private[mm] def areaAverage(src: java.awt.image.BufferedImage, w: Int,
      h: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val (sw, sh) = (src.getWidth, src.getHeight)
    // ONE bulk raster read + one bulk write: per-pixel getRGB pays a
    // color-model conversion per call, which dominates at corpus scale
    val in = src.getRGB(0, 0, sw, sh, null, 0, sw)
    // Alpha-weighted accumulation when the source carries alpha: a fully
    // transparent pixel's RGB channels are undefined payload and must not
    // tint the average — weighting by alpha composites over black, the
    // same answer the old drawImage-onto-TYPE_INT_RGB path produced.
    val hasAlpha = src.getColorModel.hasAlpha
    val res = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val y0 = (y.toLong * sh / h).toInt
      val y1 = math.max(y0 + 1, ((y + 1).toLong * sh / h).toInt)
      var x = 0
      while (x < w) {
        val x0 = (x.toLong * sw / w).toInt
        val x1 = math.max(x0 + 1, ((x + 1).toLong * sw / w).toInt)
        var r = 0L; var g = 0L; var b = 0L; var n = 0L
        var yy = y0
        while (yy < y1) {
          val row = yy * sw
          var xx = x0
          while (xx < x1) {
            val p = in(row + xx)
            if (hasAlpha) {
              val a = (p >>> 24) & 0xff
              r += ((p >> 16) & 0xff) * a; g += ((p >> 8) & 0xff) * a; b += (p & 0xff) * a
            } else {
              r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
            }
            n += 1
            xx += 1
          }
          yy += 1
        }
        val d = if (hasAlpha) n * 255L else n // alpha path sums 255-scaled channels
        res(y * w + x) =
          ((((r + d / 2) / d).toInt) << 16) | ((((g + d / 2) / d).toInt) << 8) |
            (((b + d / 2) / d).toInt)
        x += 1
      }
      y += 1
    }
    out.setRGB(0, 0, w, h, res, 0, w)
    out
  }

  /** REAL resize: decode, scale with the deterministic synchronous
    * box-filter ([[areaAverage]] — no ToolkitImage asynchrony, no
    * rendering-hint variance across JVMs), re-encode PNG (lossless, so
    * resized output is bit-reproducible). Undecodable rows pass through
    * with sentinel dims and their original bytes. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int)
                  (implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { row =>
        readImage(row.media) match {
          case Some(img) =>
            val out = areaAverage(img, w, h)
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", buf)
            ResizedMedia(row.media_id, buf.toByteArray, w.toLong, h.toLong)
          case None => ResizedMedia(row.media_id, row.media, -1L, -1L)
        }
      }
    }
  }

  // ---- perceptual image-hash dedup (aHash over the real decode) ----

  /** 64-bit average hash: box-filter the image to 8×8 (the exact
    * [[areaAverage]] scaler — one portable answer on any JVM), BT.601
    * luma per cell, bit i set iff cell i's luma >= the 64-cell mean.
    * Brightness/contrast shifts move every cell AND the mean together,
    * so re-encodes and mild tone edits hash identically or nearby —
    * the property that makes Hamming distance a near-dup signal. */
  def aHash(img: java.awt.image.BufferedImage): Long = {
    val s = areaAverage(img, 8, 8)
    val lum = new Array[Double](64)
    var i = 0
    while (i < 64) {
      lum(i) = luma(s.getRGB(i % 8, i / 8))
      i += 1
    }
    var mean = 0.0
    i = 0
    while (i < 64) { mean += lum(i); i += 1 }
    mean /= 64.0
    var h = 0L
    i = 0
    while (i < 64) { if (lum(i) >= mean) h |= (1L << i); i += 1 }
    h
  }

  // ---- deterministic synthetic raster fixtures (oracle-able aHash) ----

  /** The 64 aHash bits of [[syntheticPng]](id) — a KNOWN function of
    * doc_id so a SQL oracle can replay the perceptual-dedup result
    * without a codec: docs share a base pattern per group
    * (doc_id % 200, 64 bits from the md5 hex digits of "g<group>":
    * digit i%32's bit i/32), bit 0 pinned 0 and bit 1 pinned 200-side
    * so the 64-cell mean sits STRICTLY inside (0, 200) and every
    * luma>=mean comparison is FP-unambiguous, then doc_id % 3 extra
    * bits flipped at positions 2 + (doc_id*7 + 13j) % 62 — so same-
    * group images sit within Hamming distance 4 (near-dups by
    * construction) while cross-group distance is ~32. */
  private[graft] def syntheticAHashBits(id: Long): Array[Int] = {
    val h = MessageDigest.getInstance("MD5")
      .digest(("g" + (id % 200)).getBytes(StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString
    val bits = Array.tabulate(64) { i =>
      val d = Integer.parseInt(h.charAt(i % 32).toString, 16)
      (d >> (i / 32)) & 1
    }
    bits(0) = 0
    bits(1) = 1
    val nf = (id % 3).toInt
    var j = 0
    while (j < nf) {
      val p = (2 + Math.floorMod(id * 7 + 13L * j, 62L)).toInt
      bits(p) ^= 1
      j += 1
    }
    bits
  }

  /** An 8×8 grayscale PNG (REAL codec both ways: ImageIO write here,
    * ImageIO read in [[hashImages]]) whose aHash equals
    * [[syntheticAHashBits]]: cell i is luma 200 where bit i is set,
    * 0 otherwise; at 8×8 the [[areaAverage]] scaler is the identity, so
    * the decode→scale→threshold pipeline reproduces the bits exactly. */
  private[graft] def syntheticPng(id: Long): Array[Byte] = {
    val bits = syntheticAHashBits(id)
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 64) {
      val v = if (bits(i) == 1) 200 else 0
      img.setRGB(i % 8, i / 8, v * 0x010101)
      i += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** One synthetic PNG per document — the oracled fixture feed for the
    * REAL-decode perceptual dedup ([[nearDupImagePairs]]); generation is
    * map-side (no shuffle, no driver loop). */
  def syntheticImages(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .map(id => MediaRow(id, syntheticPng(id)))
  }

  final case class ImageHash(media_id: Long, n_bytes: Long, ahash: Option[Long])

  /** Per-image aHash; undecodable payloads yield None (the
    * [[featurizeImages]] poisoned-blob convention — never kill the
    * batch). */
  def hashImages(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[ImageHash] = {
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { row =>
        ImageHash(row.media_id, row.media.length.toLong,
          readImage(row.media).map(aHash))
      }
    }
  }

  /** Perceptual near-dup image pairs: exact Hamming pairing over the
    * 64-bit aHash via the shared pigeonhole-banding core
    * ([[graft.ops.Dedup.hammingPairs]] — capped (band, value) buckets,
    * never an all-pairs join; decode runs ONCE per image on the hash
    * pass, pairs never touch pixels). maxDist + 1 must divide 64
    * (default 7 → 8 bands of 8 bits). */
  def nearDupImagePairs(media: Dataset[MediaRow], maxDist: Int = 7,
      maxBucket: Int = 1000)(implicit spark: SparkSession): DataFrame = {
    val hashes = hashImages(media).toDF()
      .filter(col("ahash").isNotNull)
      .select(col("media_id").as("doc_id"), col("ahash").as("sig"))
    graft.ops.Dedup.hammingPairs(hashes, bits = 64, maxDist = maxDist,
        maxBucket = maxBucket)
      .select(col("id_a").as("media_a"), col("id_b").as("media_b"), col("hamming"))
  }

  // ---- REAL audio decode (JDK javax.sound.sampled — WAV/AIFF PCM) ----

  final case class AudioFeatures(media_id: Long, n_bytes: Long,
      sample_rate: Option[Double], channels: Option[Long], n_frames: Option[Long],
      duration_sec: Option[Double], rms: Option[Double], content_hash: String)

  /** REAL audio decode: container/format metadata for any JDK-supported
    * audio file (WAV/AIFF/AU), plus RMS amplitude for 16-bit signed PCM
    * (the training-corpus norm). Non-PCM payloads keep their metadata
    * with null RMS; undecodable ones null everything — a poisoned blob
    * never fails the batch. Partition-batched like the image tier. */
  def featurizeAudio(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { row =>
        md.reset()
        val hex = md.digest(row.media).map(b => f"${b & 0xff}%02x").mkString
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(row.media))
          try {
            val fmt = in.getFormat
            val frames = in.getFrameLength
            val dur = if (frames >= 0 && fmt.getFrameRate > 0)
              Some(frames / fmt.getFrameRate.toDouble) else None
            val rms =
              if (fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                  fmt.getSampleSizeInBits == 16) Some(pcm16Rms(in, fmt.isBigEndian))
              else None
            AudioFeatures(row.media_id, row.media.length.toLong,
              Some(fmt.getSampleRate.toDouble), Some(fmt.getChannels.toLong),
              // getFrameLength uses -1 (NOT_SPECIFIED) as its unknown
              // sentinel; leaking it as Some(-1) would poison sums/avgs
              Some(frames).filter(_ >= 0), dur, rms, hex)
          } finally in.close()
        } catch {
          case _: Exception =>
            AudioFeatures(row.media_id, row.media.length.toLong,
              None, None, None, None, None, hex)
        }
      }
    }
  }

  private def pcm16Rms(in: java.io.InputStream, bigEndian: Boolean): Double = {
    val buf = new Array[Byte](8192)
    var (sumSq, n) = (0.0, 0L)
    var read = in.read(buf)
    while (read > 0) {
      var i = 0
      while (i + 1 < read) {
        val s = if (bigEndian) ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
                else ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
        sumSq += s.toDouble * s.toDouble
        n += 1
        i += 2
      }
      read = in.read(buf)
    }
    if (n == 0) 0.0 else math.sqrt(sumSq / n) / 32768.0
  }

  final case class Frame(media_id: Long, frame_index: Long, frame: Array[Byte])

  /** Per-frame GIF metadata the compositor needs: placement offsets and
    * the disposal method, from the image's `javax_imageio_gif_image_1.0`
    * tree. Defaults (0, 0, "none") when the node is absent. */
  private def gifFrameMeta(reader: javax.imageio.ImageReader, i: Int): (Int, Int, String) = {
    try {
      val root = reader.getImageMetadata(i).getAsTree("javax_imageio_gif_image_1.0")
      var (left, top, disposal) = (0, 0, "none")
      val kids = root.getChildNodes
      var k = 0
      while (k < kids.getLength) {
        val node = kids.item(k)
        node.getNodeName match {
          case "ImageDescriptor" =>
            val a = node.getAttributes
            left = a.getNamedItem("imageLeftPosition").getNodeValue.toInt
            top = a.getNamedItem("imageTopPosition").getNodeValue.toInt
          case "GraphicControlExtension" =>
            disposal = node.getAttributes.getNamedItem("disposalMethod").getNodeValue
          case _ => ()
        }
        k += 1
      }
      (left, top, disposal)
    } catch { case _: Exception => (0, 0, "none") }
  }

  /** Canvas size = the GIF logical screen descriptor; frame 0's raster
    * as the fallback when stream metadata is unavailable. */
  private def gifLogicalScreen(reader: javax.imageio.ImageReader): (Int, Int) = {
    try {
      val root = reader.getStreamMetadata.getAsTree("javax_imageio_gif_stream_1.0")
      val kids = root.getChildNodes
      var k = 0
      while (k < kids.getLength) {
        val node = kids.item(k)
        if (node.getNodeName == "LogicalScreenDescriptor") {
          val a = node.getAttributes
          return (a.getNamedItem("logicalScreenWidth").getNodeValue.toInt,
            a.getNamedItem("logicalScreenHeight").getNodeValue.toInt)
        }
        k += 1
      }
      (reader.getWidth(0), reader.getHeight(0))
    } catch { case _: Exception => (reader.getWidth(0), reader.getHeight(0)) }
  }

  private def deepCopy(img: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
    val c = new java.awt.image.BufferedImage(img.getWidth, img.getHeight, img.getType)
    val g = c.createGraphics()
    try g.drawImage(img, 0, 0, null) finally g.dispose()
    c
  }

  /** REAL frame sampling for the multi-frame container the JDK decodes:
    * animated GIF, with full disposal-method compositing — real-world
    * GIFs are delta-encoded (each frame a partial rect placed at its
    * ImageDescriptor offset), so every frame is composited onto a
    * persistent logical-screen canvas honoring `none` /
    * `restoreToBackgroundColor` / `restoreToPrevious` disposal, and
    * every `stride`-th COMPOSITED frame is emitted as a lossless PNG
    * row — the one-blob-in, N-frame-rows-out contract of video demux,
    * running on actual pixels. All frames decode (state), only sampled
    * ones re-encode (cost). Non-GIF / undecodable payloads yield zero
    * rows (poisoned blobs never fail the batch; a truncated stream
    * yields the frames composited before the error); video codecs the
    * JVM lacks stay on the de-scoped stub below. */
  def sampleFramesGif(media: Dataset[MediaRow], stride: Int = 1)
                     (implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    require(stride > 0, "stride must be positive")
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { row =>
        val frames = scala.collection.mutable.ArrayBuffer.empty[Frame]
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(row.media))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (readers.hasNext) {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              // honor the documented contract: non-GIF payloads yield
              // ZERO rows — without this check any JDK-decodable image
              // (PNG/JPEG/BMP) would emit one frame
              if (reader.getFormatName.equalsIgnoreCase("gif")) {
              val n = reader.getNumImages(true)
              val (cw, ch) = gifLogicalScreen(reader)
              val canvas = new java.awt.image.BufferedImage(cw, ch,
                java.awt.image.BufferedImage.TYPE_INT_ARGB)
              var i = 0
              while (i < n) {
                val img = reader.read(i)
                val (left, top, disposal) = gifFrameMeta(reader, i)
                val saved = if (disposal == "restoreToPrevious") deepCopy(canvas) else null
                val g = canvas.createGraphics()
                try g.drawImage(img, left, top, null) finally g.dispose()
                if (i % stride == 0) {
                  val buf = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(canvas, "png", buf)
                  frames += Frame(row.media_id, i.toLong, buf.toByteArray)
                }
                // disposal applies AFTER the frame is shown, before the next
                disposal match {
                  case "restoreToBackgroundColor" =>
                    val g2 = canvas.createGraphics()
                    try {
                      g2.setComposite(java.awt.AlphaComposite.Clear)
                      g2.fillRect(left, top, img.getWidth, img.getHeight)
                    } finally g2.dispose()
                  case "restoreToPrevious" =>
                    val g2 = canvas.createGraphics()
                    try {
                      g2.setComposite(java.awt.AlphaComposite.Src)
                      g2.drawImage(saved, 0, 0, null)
                    } finally g2.dispose()
                  case _ => ()
                }
                i += 1
              }
              }
            } finally reader.dispose()
          }
        } catch { case _: Exception => () }
        frames
      }
    }
  }

  /** Video container demux — formally DE-SCOPED (accepted limitation,
    * COVERAGE.md): the JVM ships no video codecs and this build's
    * dependency set is frozen, so no real decoder can exist here. This
    * deterministic fake slices the byte stream into fixed "frames" to
    * pin the Spark-side contract — one row in, N strided frame rows out
    * of a partition-batched decoder — which is the part the engine
    * owns; [[sampleFramesGif]] is the real-pixel tier for the
    * multi-frame container the JDK does decode. Swapping in a real
    * demuxer (e.g. a JavaCV/FFmpeg binding, where deps are allowed)
    * replaces only this mapPartitions body. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int)
                  (implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    // plan-build-time validation, like sampleFramesGif: stride = 0 would
    // throw "step cannot be 0" and frameBytes = 0 an ArithmeticException
    // deep inside executor tasks instead of here
    require(stride > 0, s"stride must be positive, got $stride")
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
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
