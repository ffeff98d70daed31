package graft.tools

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** Writes testfiles/sample.avi — a 3-frame 16x12 MJPEG AVI (solid red,
  * green, blue frames at 10 fps) assembled from the RIFF/AVI public
  * layout with JPEG payloads produced by the JDK's own imageio encoder.
  * Run once to (re)generate the committed fixture:
  * `sbt "runMain graft.tools.MakeAviFixture [path]"`. */
object MakeAviFixture {

  private def u32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def u16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(id.getBytes(US_ASCII)); o.write(u32(data.length)); o.write(data)
    if ((data.length & 1) == 1) o.write(0) // even padding
    o.toByteArray
  }

  private def list(listType: String, children: Array[Byte]): Array[Byte] =
    chunk("LIST", listType.getBytes(US_ASCII) ++ children)

  def jpegFrame(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** The AVI bytes: RIFF('AVI ' LIST(hdrl avih LIST(strl strh strf))
    * LIST(movi 00dc*)). */
  def build(w: Int, h: Int, usPerFrame: Long,
            frames: Seq[Array[Byte]]): Array[Byte] = {
    val maxFrame = frames.map(_.length).max
    val avih = {
      val o = new ByteArrayOutputStream()
      o.write(u32(usPerFrame)); o.write(u32(0)); o.write(u32(0)); o.write(u32(0))
      o.write(u32(frames.length)); o.write(u32(0)); o.write(u32(1))
      o.write(u32(maxFrame)); o.write(u32(w)); o.write(u32(h))
      (0 until 4).foreach(_ => o.write(u32(0)))
      o.toByteArray
    }
    val strh = {
      val o = new ByteArrayOutputStream()
      o.write("vids".getBytes(US_ASCII)); o.write("MJPG".getBytes(US_ASCII))
      o.write(u32(0)); o.write(u16(0)); o.write(u16(0)) // flags, prio, lang
      o.write(u32(0)) // initial frames
      o.write(u32(1)); o.write(u32(1000000L / usPerFrame)) // scale, rate
      o.write(u32(0)); o.write(u32(frames.length)) // start, length
      o.write(u32(maxFrame)); o.write(u32(0xFFFFFFFFL)); o.write(u32(0))
      o.write(u16(0)); o.write(u16(0)); o.write(u16(w)); o.write(u16(h))
      o.toByteArray
    }
    val strf = { // BITMAPINFOHEADER
      val o = new ByteArrayOutputStream()
      o.write(u32(40)); o.write(u32(w)); o.write(u32(h))
      o.write(u16(1)); o.write(u16(24))
      o.write("MJPG".getBytes(US_ASCII))
      o.write(u32(w * h * 3L)); o.write(u32(0)); o.write(u32(0))
      o.write(u32(0)); o.write(u32(0))
      o.toByteArray
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.map(f => chunk("00dc", f)).reduce(_ ++ _))
    chunk("RIFF", "AVI ".getBytes(US_ASCII) ++ hdrl ++ movi)
  }

  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("testfiles/sample.avi")
    val frames = Seq(0xFF0000, 0x00FF00, 0x0000FF).map(jpegFrame(16, 12, _))
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      build(16, 12, 100000, frames))
    println(s"wrote $path")
  }
}
