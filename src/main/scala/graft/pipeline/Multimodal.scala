package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads plus a typed metadata struct, mirroring how a training-data
  * lake stores raw media next to text.
  *
  * The Spark-side plumbing (schema, partitioning, batch iteration) is real
  * and tested; the actual codecs are NOT in this container, so the decode
  * kernels are deterministic fakes clearly marked STUB — swap in a real
  * decoder (e.g. javax.imageio / ffmpeg bindings on the cluster image)
  * without touching the plan shape.
  */
object Multimodal {

  /** (width, height, mean RGB in [0,1]) of a decoded image — the one
    * shared pixel kernel (image decode and per-frame video decode both
    * use it). Bulk row reads via getRGB(x,y,w,h,...): the per-pixel
    * getRGB call performs a colorspace conversion PER CALL, several
    * times slower on the fan-out-heavy frame path. */
  private def meanRgb(img: java.awt.image.BufferedImage)
      : (Int, Int, Seq[Double]) = {
    val (w, h) = (img.getWidth, img.getHeight)
    var sr = 0L; var sg = 0L; var sb = 0L
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h) * 255.0
    (w, h, Seq(sr / n, sg / n, sb / n))
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  /** Deterministic synthetic media table derived from the documents table
    * (payload = utf8 bytes of the text; metadata derived from doc fields).
    * Stands in for `spark.read.format("binaryFile")` on a media lake. */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    docs.select(
      col("doc_id").as("media_id"),
      kind.as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (pmod(col("doc_id"), lit(16)) * 64 + 64).cast("int").as("width"),
        (pmod(col("doc_id"), lit(9)) * 64 + 64).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10L).as("duration_ms"),
        lit("raw").as("codec")).as("meta"))
  }

  /** REAL image decode over javax.imageio (PNG/BMP/GIF/JPEG readers ship
    * with the JDK — no external codec needed): per row, decode `payload`
    * to pixels and emit dimensions plus mean RGB (0-1 per channel).
    * Undecodable/null payloads yield null columns, not failures — the
    * schema-on-read contract for dirty media lakes. Map-only over binary
    * batches: the same plan shape as the stub kernels, but with a real
    * codec inside. */
  def decodeImage(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("img_width", IntegerType, nullable = true),
      StructField("img_height", IntegerType, nullable = true),
      StructField("mean_rgb", ArrayType(DoubleType), nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val img =
          if (payload == null) null
          // NonFatal: imageio signals malformed payloads with runtime
          // exceptions too (CMMException on broken ICC profiles, IAE,
          // IndexOutOfBounds) — every one is a null row, not a task failure
          else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        else {
          val (w, h, rgb) = meanRgb(img)
          Row.fromSeq(r.toSeq ++ Seq(w, h, rgb))
        }
      }
    }(enc).toDF(outSchema.fieldNames: _*)
  }

  /** REAL audio decode over javax.sound.sampled (WAV/PCM support ships
    * in the JDK — the audio sibling of the imageio trick): sample rate,
    * channels, bit depth, duration, mean absolute amplitude normalized
    * to [0,1]. Undecodable/null payloads yield null columns, not
    * failures. Map-only over binary batches, same plan shape as
    * [[decodeImage]]. Video remains the ONE labeled stub: the JDK ships
    * no video codec. */
  def decodeAudio(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("audio_sample_rate", IntegerType, nullable = true),
      StructField("audio_channels", IntegerType, nullable = true),
      StructField("audio_bits", IntegerType, nullable = true),
      StructField("audio_duration_ms", LongType, nullable = true),
      StructField("audio_mean_abs", DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val decoded: Seq[Any] =
          if (payload == null) Seq(null, null, null, null, null)
          else try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            try {
              val fmt = ais.getFormat
              val frames = ais.getFrameLength
              val durMs: Any =
                // frames == AudioSystem.NOT_SPECIFIED (-1): length
                // unknown — report null, not a truncated-to-0 duration
                if (frames >= 0 && fmt.getFrameRate > 0)
                  (frames * 1000.0 / fmt.getFrameRate).toLong
                else null
              // AudioFormat reports NOT_SPECIFIED (-1) for unknown
              // fields — surface null, not -1-as-a-value (the durMs
              // branch above already honors the same contract)
              def orNull(v: Int): Any = if (v >= 0) v else null
              Seq(orNull(fmt.getSampleRate.toInt), orNull(fmt.getChannels),
                orNull(fmt.getSampleSizeInBits), durMs,
                meanAbs(ais.readAllBytes(), fmt))
            } finally ais.close()
          } catch { // UnsupportedAudioFileException, truncated RIFF, ...
            case scala.util.control.NonFatal(_) => Seq(null, null, null, null, null)
          }
        Row.fromSeq(r.toSeq ++ decoded)
      }
    }(enc).toDF(outSchema.fieldNames: _*)
  }

  /** Mean |sample| over all channels, normalized to [0,1]; null for PCM
    * widths the JDK parser reports but we don't normalize (e.g. float). */
  private def meanAbs(bytes: Array[Byte],
                      fmt: javax.sound.sampled.AudioFormat): java.lang.Double = {
    import javax.sound.sampled.AudioFormat.Encoding
    val be = fmt.isBigEndian
    (fmt.getEncoding, fmt.getSampleSizeInBits) match {
      case (Encoding.PCM_SIGNED, 16) =>
        var i = 0; var acc = 0.0; var n = 0
        while (i + 1 < bytes.length) {
          val s = if (be) ((bytes(i) << 8) | (bytes(i + 1) & 0xFF)).toShort
                  else ((bytes(i + 1) << 8) | (bytes(i) & 0xFF)).toShort
          acc += math.abs(s / 32768.0); n += 1; i += 2
        }
        if (n == 0) 0.0 else acc / n
      case (Encoding.PCM_UNSIGNED, 8) =>
        var i = 0; var acc = 0.0
        while (i < bytes.length) { acc += math.abs(((bytes(i) & 0xFF) - 128) / 128.0); i += 1 }
        if (bytes.isEmpty) 0.0 else acc / bytes.length
      case _ => null
    }
  }

  // ---- video: REAL MJPEG-in-AVI decode -------------------------------

  /** Minimal RIFF/AVI walk (the container format is a public spec:
    * RIFF('AVI ' LIST('hdrl' avih ...) LIST('movi' ##dc/##db ...))):
    * returns (microSecPerFrame, frame payloads) or None when the bytes
    * are not an AVI. Frame chunks may nest inside 'rec ' LISTs; chunk
    * sizes pad to even. */
  private[pipeline] def aviFrames(b: Array[Byte]): Option[(Long, Seq[Array[Byte]])] = {
    def u32(o: Int): Long =
      ((b(o) & 0xFFL)) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    def fourcc(o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (b.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    var usPerFrame = 0L
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def walk(from: Int, to: Int): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = fourcc(pos)
        val size = u32(pos + 4).toInt
        val dataStart = pos + 8
        if (size < 0 || dataStart + size > to) return // truncated: stop clean
        if (id == "LIST" && size >= 4) { // <4: no room for the list type
          val listType = fourcc(dataStart)
          if (listType == "hdrl" || listType == "movi" || listType == "rec " ||
              listType == "strl")
            walk(dataStart + 4, dataStart + size)
        } else if (id == "avih" && size >= 4) {
          usPerFrame = u32(dataStart)
        } else if (id.length == 4 && id(2) == 'd' &&
                   (id(3) == 'c' || id(3) == 'b')) {
          frames += java.util.Arrays.copyOfRange(b, dataStart, dataStart + size)
        }
        pos = dataStart + size + (size & 1) // even padding
      }
    }
    walk(12, b.length)
    Some((usPerFrame, frames.toSeq))
  }

  /** REAL video decode for MJPEG-in-AVI (the one video family needing
    * no codec: RIFF framing is a public spec and every ##dc frame is a
    * JPEG that javax.imageio decodes — the same posture as the zip+StAX
    * XLSX reader). One OUTPUT ROW PER FRAME: frame index, timestamp from
    * the avih microseconds-per-frame, dimensions, mean RGB. Non-AVI /
    * null payloads emit one all-null-frame row (schema-on-read, no task
    * failure); frames whose payload imageio cannot decode (uncompressed
    * ##db DIBs, INTER-FRAME codecs like H.264 — the one remaining
    * labeled stub, genuinely impossible without a codec) keep their
    * (frame_idx, frame_ms) and null pixel columns. flatMap over binary
    * batches — the scale shape is the same map-only scan as
    * [[decodeImage]], fanned out per frame. */
  def decodeVideo(media: DataFrame, maxFrames: Int = 32): DataFrame = {
    require(maxFrames > 0,
      s"decodeVideo: maxFrames must be positive, got $maxFrames " +
        "(0 would silently drop every decodable video's rows)")
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = true),
      StructField("frame_ms", LongType, nullable = true),
      StructField("vid_width", IntegerType, nullable = true),
      StructField("vid_height", IntegerType, nullable = true),
      StructField("frame_mean_rgb", ArrayType(DoubleType), nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val parsed = if (payload == null) None else
          try aviFrames(payload)
          catch { case scala.util.control.NonFatal(_) => None }
        parsed match {
          case None | Some((_, Seq())) =>
            Iterator.single(Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null)))
          case Some((usPerFrame, frames)) =>
            frames.iterator.take(maxFrames).zipWithIndex.map { case (fb, i) =>
              val img =
                try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
                catch { case scala.util.control.NonFatal(_) => null }
              val ms = if (usPerFrame > 0) i * usPerFrame / 1000 else null
              if (img == null)
                Row.fromSeq(r.toSeq ++ Seq(i, ms, null, null, null))
              else {
                val (w, h, rgb) = meanRgb(img)
                Row.fromSeq(r.toSeq ++ Seq(i, ms, w, h, rgb))
              }
            }
        }
      }
    }(enc).toDF(outSchema.fieldNames: _*)
  }

  /** STUB decode kernel (generic feature extraction over arbitrary
    * payloads — real image/audio/VIDEO decode live above; only
    * inter-frame video codecs remain genuinely stubbed, no codec in the
    * JDK): a deterministic fake derives "pixels" from the bytes so the
    * distributed plumbing (mapPartitions over binary batches, output
    * schema, partition sizing) is fully exercised. */
  def decodeImageFeatures(media: DataFrame, featureDim: Int = 8): DataFrame = {
    require(featureDim > 0,
      s"decodeImageFeatures: featureDim must be positive, got $featureDim")
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields :+
      StructField("features", ArrayType(DoubleType), nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        // STUB: byte-histogram moments instead of a real pixel decode.
        val feats = if (payload == null) null else {
          val arr = new Array[Double](featureDim)
          var i = 0
          while (i < payload.length) {
            arr(i % featureDim) += (payload(i) & 0xFF) / 255.0
            i += 1
          }
          arr.map(v => math.round(v * 1e6) / 1e6)
        }
        Row.fromSeq(r.toSeq :+ (if (feats == null) null else feats.toSeq))
      }
    }(enc).toDF(outSchema.fieldNames: _*)
  }

  /** STUB resize: a real kernel re-encodes the image; the fake rewrites the
    * metadata struct (the part a catalog actually tracks) and truncates the
    * payload proportionally — preserving the plan shape of a map-only
    * transform over binary data. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta", struct(
        lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.duration_ms").as("duration_ms"),
        col("meta.codec").as("codec")))
      .withColumn("payload",
        // w * h as a LONG literal: the Int product overflows at 2^31
        // (65536 x 65536 wrapped to 0 and silently emptied every
        // payload); least() keeps the effective cap within Int range
        expr(s"substring(payload, 1, " +
          s"int(least(octet_length(payload), ${w.toLong * h}L)))"))

  /** Frame sampling for video rows: explode N evenly-spaced frame indexes;
    * payload slicing stands in for frame extraction. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    // sequence(0, -1) would DESCEND (Spark picks step -1 when start >
    // stop) and explode bogus frame_idx 0 and -1 rows
    require(n > 0, s"sampleFrames: n must be positive, got $n")
    media.filter(col("kind") === "video")
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_ms",
        (col("meta.duration_ms") * col("frame_idx") / n).cast("long"))
  }
}
