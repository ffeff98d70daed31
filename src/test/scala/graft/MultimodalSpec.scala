package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val media =
    Multimodal.syntheticMedia(GraftSession.table(spark, SF, "documents"))

  test("synthetic media table carries binary payload + typed metadata") {
    assert(media.schema("payload").dataType.typeName == "binary")
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    val m = media.filter(col("payload").isNotNull).limit(1)
      .select("meta.width", "meta.height", "meta.duration_ms").collect()(0)
    assert(m.getInt(0) >= 64 && m.getInt(1) >= 64 && m.getLong(2) > 0)
  }

  test("decodeImage REALLY decodes PNG pixels (javax.imageio, committed fixture)") {
    import spark.implicits._
    // committed fixture: 8x6, left half pure red, right half pure blue
    val png = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$Fixtures/redblue.png"))
    // plus an in-memory generated 4x4 solid green PNG (independent of disk)
    val buf = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) buf.setRGB(x, y, 0x00FF00)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(buf, "png", bos)
    val df = Seq((1L, "image", png), (2L, "image", bos.toByteArray),
        (3L, "image", "not an image".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.decodeImage(df).orderBy("media_id").collect()
    assert(out(0).getInt(out(0).fieldIndex("img_width")) == 8)
    assert(out(0).getInt(out(0).fieldIndex("img_height")) == 6)
    val rgb = out(0).getSeq[Double](out(0).fieldIndex("mean_rgb"))
    assert(math.abs(rgb(0) - 0.5) < 1e-9) // half the pixels fully red
    assert(rgb(1) == 0.0)
    assert(math.abs(rgb(2) - 0.5) < 1e-9) // half fully blue
    val green = out(1).getSeq[Double](out(1).fieldIndex("mean_rgb"))
    assert(green == Seq(0.0, 1.0, 0.0))
    assert(out(2).isNullAt(out(2).fieldIndex("img_width"))) // dirty row -> null, no failure
  }

  test("decodeAudio REALLY decodes WAV PCM (javax.sound, committed fixture)") {
    import spark.implicits._
    // committed fixture: 440 Hz sine, 8 kHz, 16-bit mono, 2000 frames
    val wav = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$Fixtures/tone.wav"))
    val df = Seq((1L, "audio", wav),
        (2L, "audio", "not audio at all".getBytes("UTF-8")),
        (3L, "audio", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.decodeAudio(df).orderBy("media_id").collect()
    val r = out(0)
    assert(r.getInt(r.fieldIndex("audio_sample_rate")) == 8000)
    assert(r.getInt(r.fieldIndex("audio_channels")) == 1)
    assert(r.getInt(r.fieldIndex("audio_bits")) == 16)
    assert(r.getLong(r.fieldIndex("audio_duration_ms")) == 250L)
    // mean |sin| at amplitude 0.5 over whole cycles: computed exactly by
    // the fixture generator = 0.3182546997...
    assert(math.abs(r.getDouble(r.fieldIndex("audio_mean_abs")) - 0.3182546997) < 1e-9)
    assert(out(1).isNullAt(out(1).fieldIndex("audio_sample_rate"))) // dirty -> null
    assert(out(2).isNullAt(out(2).fieldIndex("audio_mean_abs")))    // null payload
  }

  test("decodeVideo REALLY decodes MJPEG-in-AVI frames (committed fixture)") {
    import spark.implicits._
    // committed fixture: 3-frame 16x12 MJPEG AVI at 10fps (red/green/blue)
    val avi = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$Fixtures/sample.avi"))
    // byte-level framing sanity on the COMMITTED file, independent of
    // the reader: RIFF magic, AVI form type, avih microSecPerFrame
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
    assert(new String(avi, 20, 4, "US-ASCII") == "hdrl")
    assert(new String(avi, 24, 4, "US-ASCII") == "avih")
    val usPerFrame = (avi(32) & 0xFFL) | ((avi(33) & 0xFFL) << 8) |
      ((avi(34) & 0xFFL) << 16) | ((avi(35) & 0xFFL) << 24)
    assert(usPerFrame == 100000L)
    val df = Seq((1L, "video", avi),
        (2L, "video", "not an avi".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.decodeVideo(df).orderBy("media_id", "frame_idx").collect()
    val fi = out(0).fieldIndex("frame_idx")
    val frames = out.filter(_.getLong(0) == 1L)
    assert(frames.length == 3)
    assert(frames.map(_.getInt(fi)).toSeq == Seq(0, 1, 2))
    assert(frames.map(_.getLong(out(0).fieldIndex("frame_ms"))).toSeq ==
      Seq(0L, 100L, 200L))
    frames.foreach { f =>
      assert(f.getInt(f.fieldIndex("vid_width")) == 16)
      assert(f.getInt(f.fieldIndex("vid_height")) == 12)
    }
    // JPEG is lossy: solid-color frames come back within a small tolerance
    def rgb(i: Int) = frames(i).getSeq[Double](frames(i).fieldIndex("frame_mean_rgb"))
    assert(rgb(0)(0) > 0.9 && rgb(0)(1) < 0.1 && rgb(0)(2) < 0.1, rgb(0))
    assert(rgb(1)(1) > 0.9 && rgb(1)(0) < 0.1 && rgb(1)(2) < 0.1, rgb(1))
    assert(rgb(2)(2) > 0.9 && rgb(2)(0) < 0.1 && rgb(2)(1) < 0.1, rgb(2))
    // dirty row: one null-frame row, no task failure
    val dirty = out.filter(_.getLong(0) == 2L)
    assert(dirty.length == 1 && dirty(0).isNullAt(fi))
  }

  test("decodeVideo: maxFrames cap and undecodable frame payloads") {
    import spark.implicits._
    import graft.tools.MakeAviFixture
    // 5 frames, capped to 2; second AVI carries NON-JPEG frame bytes
    // (the inter-frame-codec stand-in): framing parses, pixels null
    val good = MakeAviFixture.build(8, 8, 40000,
      (1 to 5).map(_ => MakeAviFixture.jpegFrame(8, 8, 0x808080)))
    val raw = MakeAviFixture.build(8, 8, 40000,
      Seq(Array.fill[Byte](32)(7), Array.fill[Byte](32)(9)))
    val df = Seq((1L, "video", good), (2L, "video", raw))
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.decodeVideo(df, maxFrames = 2)
      .orderBy("media_id", "frame_idx").collect()
    val byId = out.groupBy(_.getLong(0))
    assert(byId(1L).length == 2) // capped
    assert(byId(1L).forall(r => r.getInt(r.fieldIndex("vid_width")) == 8))
    assert(byId(1L).map(_.getLong(out(0).fieldIndex("frame_ms"))).toSeq ==
      Seq(0L, 40L))
    assert(byId(2L).length == 2)
    assert(byId(2L).forall(r => !r.isNullAt(r.fieldIndex("frame_idx")) &&
      r.isNullAt(r.fieldIndex("vid_width")))) // framing real, codec absent
  }

  test("decodeImageFeatures (STUB kernel) is deterministic over binary batches") {
    val feats = Multimodal.decodeImageFeatures(media.limit(50), featureDim = 8)
    val rows = feats.select("media_id", "features").collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val f = r.getSeq[Double](1)
      assert(f.length == 8)
      assert(f.forall(v => v >= 0.0)) // byte-histogram moments are non-negative
    }
    // deterministic: same input => same features
    val again = Multimodal.decodeImageFeatures(media.limit(50), featureDim = 8)
      .select("media_id", "features").collect()
    assert(rows.map(r => (r.getLong(0), r.getSeq[Double](1))).toMap ==
      again.map(r => (r.getLong(0), r.getSeq[Double](1))).toMap)
  }

  test("resize rewrites metadata and bounds payload size") {
    val resized = Multimodal.resize(media.limit(20), 32, 16)
    val r = resized.select("meta.width", "meta.height").distinct().collect()
    assert(r.length == 1 && r(0).getInt(0) == 32 && r(0).getInt(1) == 16)
    val tooBig = resized.filter(octet_length(col("payload")) > 32 * 16).count()
    assert(tooBig == 0)
  }

  test("sampleFrames emits n evenly spaced frames per video row") {
    val n = 4
    val frames = Multimodal.sampleFrames(media, n)
    val perRow = frames.groupBy("media_id").count()
      .select("count").distinct().collect().map(_.getLong(0)).toSet
    assert(perRow == Set(n.toLong))
    val bad = frames.filter(
      col("frame_ms") < 0 || col("frame_ms") >= col("meta.duration_ms")).count()
    assert(bad == 0)
    assert(frames.select("kind").distinct().collect().map(_.getString(0)).toSet
      == Set("video"))
  }

  test("EXIF: committed big-endian fixture parses known tags") {
    // testfiles/exif_be.jpg: hand-built (python struct, independent of
    // the Scala writer) MM-endian APP1 with make/model/orientation/
    // DateTimeOriginal/GPS; model contains a SPACE (NUL-termination,
    // not space-truncation, is the contract)
    val jpeg = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$Fixtures/exif_be.jpg"))
    val info = graft.pipeline.Exif.parse(jpeg)
    assert(info.make == "BEcam")
    assert(info.model == "ModelBE 9000")
    assert(info.orientation.contains(6))
    // DateTimeOriginal (Exif IFD) wins over IFD0's DateTime
    assert(info.datetimeOriginal == "2019:06:15 08:30:00")
    assert(math.abs(info.gpsLat.get - (-(33 + 51 / 60.0 + 36 / 3600.0))) < 1e-12)
    assert(math.abs(info.gpsLon.get - (151 + 12 / 60.0 + 3 / 3600.0)) < 1e-12)
    // the BARE TIFF inside the APP1 parses identically (TIFF payloads
    // are accepted without JPEG framing): SOI(2) + marker(2) + len(2)
    // + "Exif  "(6) = offset 12, EOI trails
    val tiff = java.util.Arrays.copyOfRange(jpeg, 12, jpeg.length - 2)
    assert(graft.pipeline.Exif.parse(tiff) == info)
  }

  test("EXIF: little-endian writer round-trips through the DataFrame surface") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val template = bos.toByteArray
    val tagged = graft.pipeline.Exif.withExif(template,
      make = "Graft", model = "GX 1", orientation = 8,
      datetime = "2024:02:29 12:00:01",
      latDMS = (40L, 26L, 46L), latRef = "N",
      lonDMS = (79L, 58L, 56L), lonRef = "W")
    val df = Seq((1L, tagged), (2L, template), // template: JPEG, no APP1
        (3L, "junk".getBytes("UTF-8")), (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "payload")
    val out = graft.pipeline.Exif.exifMetadata(df).orderBy("media_id").collect()
    val r = out(0)
    assert(r.getString(r.fieldIndex("exif_make")) == "Graft")
    assert(r.getString(r.fieldIndex("exif_model")) == "GX 1")
    assert(r.getInt(r.fieldIndex("exif_orientation")) == 8)
    assert(r.getString(r.fieldIndex("exif_datetime")) == "2024:02:29 12:00:01")
    assert(math.abs(r.getDouble(r.fieldIndex("exif_gps_lat")) -
      (40 + 26 / 60.0 + 46 / 3600.0)) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("exif_gps_lon")) -
      -(79 + 58 / 60.0 + 56 / 3600.0)) < 1e-12)
    // EXIF-less JPEG, junk, and null all yield null columns, no failure
    (1 to 3).foreach(i => assert(out(i).isNullAt(out(i).fieldIndex("exif_make"))))
    // the tagged payload still DECODES as an image (splice preserved it)
    val dec = Multimodal.decodeImage(Seq((1L, "image", tagged))
      .toDF("media_id", "kind", "payload")).collect()(0)
    assert(dec.getInt(dec.fieldIndex("img_width")) == 4)
  }

  test("EXIF: truncated / desynced payloads never throw") {
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val tagged = graft.pipeline.Exif.withExif(bos.toByteArray,
      "A", "B", 1, "2024:01:01 00:00:00", (1L, 2L, 3L), "N", (4L, 5L, 6L), "E")
    // every prefix truncation parses without throwing
    (0 until math.min(tagged.length, 400)).foreach { n =>
      graft.pipeline.Exif.parse(java.util.Arrays.copyOf(tagged, n))
    }
    // corrupt each of the first 200 bytes in turn
    (0 until math.min(tagged.length, 200)).foreach { i =>
      val c = tagged.clone(); c(i) = (c(i) ^ 0x5A).toByte
      graft.pipeline.Exif.parse(c)
    }
  }
}
