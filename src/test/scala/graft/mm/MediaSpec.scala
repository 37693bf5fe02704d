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

  // ---- real JDK raster decode tier ----

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }
  private def jpgBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, 0x808080)))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", buf)
    buf.toByteArray
  }

  test("real image decode: exact dims + luma from actual PNG/JPEG bytes; garbage -> nulls") {
    val rows = Seq(
      Media.MediaRow(1L, pngBytes(8, 5, 0xffffff)),   // white 8x5 png
      Media.MediaRow(2L, pngBytes(16, 16, 0x000000)), // black 16x16 png
      Media.MediaRow(3L, jpgBytes(32, 2)),            // grey jpeg
      Media.MediaRow(4L, Array[Byte](1, 2, 3, 4)))    // not an image
    val got = Media.featurizeImages(rows.toDS()).collect().map(f => f.media_id -> f).toMap
    assert(got(1L).width === Some(8L) && got(1L).height === Some(5L))
    assert(math.abs(got(1L).mean_luma.get - 255.0) < 1e-9) // white
    assert(got(2L).width === Some(16L) && got(2L).mean_luma.get === 0.0) // black
    assert(got(3L).width === Some(32L) && got(3L).height === Some(2L))
    assert(math.abs(got(3L).mean_luma.get - 128.0) < 3.0) // jpeg is lossy
    assert(got(4L).width === None && got(4L).mean_luma === None)
    assert(got(4L).content_hash.length === 32) // hash still computed
  }

  test("real image resize: re-encoded PNG decodes back at target dims, bit-reproducible") {
    val rows = Seq(Media.MediaRow(1L, pngBytes(64, 40, 0x4080c0)))
    val out1 = Media.resizeImages(rows.toDS(), 16, 16).collect().head
    val out2 = Media.resizeImages(rows.toDS(), 16, 16).collect().head
    assert(out1.width === 16L && out1.height === 16L)
    assert(out1.media.toSeq === out2.media.toSeq) // lossless PNG, deterministic scaler
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out1.media))
    assert(back.getWidth === 16 && back.getHeight === 16)
    // solid-color input stays the same color after area-averaging
    assert((back.getRGB(8, 8) & 0xffffff) === 0x4080c0)
    // garbage passes through with sentinel dims, bytes untouched
    val junk = Media.resizeImages(Seq(Media.MediaRow(9L, Array[Byte](7, 7))).toDS(), 4, 4)
      .collect().head
    assert(junk.width === -1L && junk.media.toSeq === Seq[Byte](7, 7))
  }

  test("resize alpha handling: transparent pixels do not tint the average (ADVICE r6)") {
    // 2x1 ARGB: opaque red + FULLY TRANSPARENT pixel carrying garbage
    // green in its (undefined) RGB payload
    val img = new java.awt.image.BufferedImage(2, 1, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    img.setRGB(0, 0, 0xffff0000) // opaque red
    img.setRGB(1, 0, 0x0000ff00) // alpha=0, garbage green channel
    val avg = Media.areaAverage(img, 1, 1).getRGB(0, 0)
    // alpha-weighted composite over black: half-intensity red, ZERO green
    assert(((avg >> 16) & 0xff) === 128)
    assert(((avg >> 8) & 0xff) === 0, "transparent pixel's garbage RGB leaked into the average")
    assert((avg & 0xff) === 0)
    // opaque sources are unaffected: solid color stays exact
    val solid = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    (0 until 4).foreach(y => (0 until 4).foreach(x => solid.setRGB(x, y, 0xff4080c0)))
    assert((Media.areaAverage(solid, 2, 2).getRGB(1, 1) & 0xffffff) === 0x4080c0)
  }

  test("real audio decode: WAV metadata + RMS from actual PCM bytes; garbage -> nulls") {
    // 0.5s of a full-scale square wave at 8kHz mono 16-bit: RMS = 1.0
    def wav(hz: Int, seconds: Double, amp: Short): Array[Byte] = {
      val n = (hz * seconds).toInt
      val pcm = new Array[Byte](n * 2)
      (0 until n).foreach { i =>
        val s: Short = if (i % 8 < 4) amp else (-amp).toShort
        pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(hz.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val rows = Seq(
      Media.MediaRow(1L, wav(8000, 0.5, 32767)),
      Media.MediaRow(2L, wav(16000, 0.25, 16384)),
      Media.MediaRow(3L, Array[Byte](9, 9, 9)))
    val got = Media.featurizeAudio(rows.toDS()).collect().map(f => f.media_id -> f).toMap
    assert(got(1L).sample_rate === Some(8000.0) && got(1L).channels === Some(1L))
    assert(got(1L).n_frames === Some(4000L))
    assert(math.abs(got(1L).duration_sec.get - 0.5) < 1e-9)
    assert(math.abs(got(1L).rms.get - 1.0) < 1e-3)  // full-scale square
    assert(math.abs(got(2L).rms.get - 0.5) < 1e-3)  // half-scale
    assert(got(3L).sample_rate === None && got(3L).rms === None)
    assert(got(3L).content_hash.length === 32)
  }

  test("real GIF frame sampling: strided frames decode back with their own pixels") {
    // 5-frame animated GIF, one solid color per frame, written with the
    // JDK's own sequence writer
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new java.awt.image.BufferedImage(6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 4).foreach(y => (0 until 6).foreach(x => img.setRGB(x, y, c)))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val gif = out.toByteArray

    val rows = Seq(Media.MediaRow(1L, gif), Media.MediaRow(2L, Array[Byte](1, 2, 3)))
    val frames = Media.sampleFramesGif(rows.toDS(), stride = 2).collect()
      .map(f => (f.media_id, f.frame_index) -> f.frame).toMap
    // stride 2 over 5 frames -> indices 0, 2, 4; garbage blob -> no rows
    assert(frames.keySet === Set((1L, 0L), (1L, 2L), (1L, 4L)))
    Seq(0, 2, 4).foreach { i =>
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frames((1L, i.toLong))))
      assert(back.getWidth === 6 && back.getHeight === 4)
      assert((back.getRGB(3, 2) & 0xffffff) === colors(i))
    }
  }

  test("non-GIF images yield ZERO frame rows; empty blobs resize without crashing") {
    // the documented sampleFramesGif contract: a decodable PNG is still
    // not a GIF and must not emit a frame (a consumer counting GIFs by
    // output presence would be wrong otherwise)
    val rows = Seq(Media.MediaRow(1L, pngBytes(6, 4, 0xff0000)))
    assert(Media.sampleFramesGif(rows.toDS(), stride = 1).collect().isEmpty)
    // empty media blob: resize emits an empty blob, never indexes media(0)
    val empty = Seq(Media.MediaRow(2L, Array.emptyByteArray)).toDS()
    val resized = Media.resize(empty, 8, 8).collect()
    assert(resized.length === 1 && resized.head.media.isEmpty)
    // stride/frameBytes validated at plan build, not inside tasks
    intercept[IllegalArgumentException] { Media.sampleFrames(empty, frameBytes = 4, stride = 0) }
    intercept[IllegalArgumentException] { Media.sampleFrames(empty, frameBytes = 0, stride = 1) }
  }

  test("delta-encoded GIF: partial-rect frames composite onto the logical-screen canvas") {
    // frame 0 = full 6x4 red; frame 1 = a 2x2 green patch placed at
    // (2,1) via its ImageDescriptor offsets — the delta encoding real
    // GIFs use. The sampled frame 1 must be the full composited screen,
    // not the raw 2x2 rect.
    def solid(w: Int, h: Int, c: Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, c)))
      img
    }
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    def writeFrame(img: java.awt.image.BufferedImage, left: Int, top: Int): Unit = {
      val param = writer.getDefaultWriteParam
      val meta = writer.getDefaultImageMetadata(
        javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img), param)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = new javax.imageio.metadata.IIOMetadataNode(fmt)
      val desc = new javax.imageio.metadata.IIOMetadataNode("ImageDescriptor")
      desc.setAttribute("imageLeftPosition", left.toString)
      desc.setAttribute("imageTopPosition", top.toString)
      desc.setAttribute("imageWidth", img.getWidth.toString)
      desc.setAttribute("imageHeight", img.getHeight.toString)
      desc.setAttribute("interlaceFlag", "FALSE")
      root.appendChild(desc)
      meta.mergeTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), param)
    }
    writeFrame(solid(6, 4, 0xff0000), 0, 0)
    writeFrame(solid(2, 2, 0x00ff00), 2, 1)
    writer.endWriteSequence(); writer.dispose(); ios.close()

    val frames = Media.sampleFramesGif(Seq(Media.MediaRow(1L, out.toByteArray)).toDS())
      .collect().map(f => f.frame_index -> f.frame).toMap
    assert(frames.keySet === Set(0L, 1L))
    val f1 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frames(1L)))
    assert(f1.getWidth === 6 && f1.getHeight === 4) // logical screen, not the 2x2 rect
    assert((f1.getRGB(0, 0) & 0xffffff) === 0xff0000) // frame-0 base persists
    assert((f1.getRGB(2, 1) & 0xffffff) === 0x00ff00) // delta lands at its offset
    assert((f1.getRGB(3, 2) & 0xffffff) === 0x00ff00)
    assert((f1.getRGB(4, 3) & 0xffffff) === 0xff0000) // outside the patch: untouched
  }
  test("aHash dedup: re-encodes and brightness shifts pair up, different content does not") {
    // a gradient image: varied luma so the hash has structure
    def gradient(shift: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) {
        val v = math.min(255, x * 16 + shift)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      buf.toByteArray
    }
    val rows = Seq(
      Media.MediaRow(1L, gradient(0)),
      Media.MediaRow(2L, gradient(0)),            // exact re-encode twin
      Media.MediaRow(3L, gradient(10)),           // brightness shift: mean shifts too
      Media.MediaRow(4L, pngBytes(16, 16, 0x123456)), // flat: complement-ish hash
      Media.MediaRow(5L, Array[Byte](1, 2, 3))    // undecodable: excluded
    ).toDS()
    // brightness invariance: every cell AND the mean move together
    val hs = Media.hashImages(rows).collect().map(h => h.media_id -> h.ahash).toMap
    assert(hs(1L).isDefined && hs(1L) === hs(2L) && hs(1L) === hs(3L))
    assert(hs(5L).isEmpty)
    val pairs = Media.nearDupImagePairs(rows, maxDist = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "flat image must not pair with the gradient")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("synthetic fixture: decoded aHash equals the bit formula (the mm_dedup oracle contract)") {
    // The whole point of syntheticPng: the REAL codec roundtrip
    // (ImageIO write → read → areaAverage → luma → threshold) must
    // reproduce syntheticAHashBits EXACTLY, or the DuckDB oracle's bit
    // arithmetic diverges from the Spark plan. 8×8 identity scaling +
    // pinned 0/200 bits make every comparison FP-unambiguous.
    (0L until 64L).foreach { id =>
      val bits = Media.syntheticAHashBits(id)
      val expected = bits.zipWithIndex.foldLeft(0L) {
        case (h, (b, i)) => if (b == 1) h | (1L << i) else h
      }
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Media.syntheticPng(id)))
      assert(Media.aHash(img) === expected, s"id=$id")
    }
  }
}
