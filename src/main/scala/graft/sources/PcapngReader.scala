package graft.sources

import java.io.DataInputStream
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** pcapng (next-generation capture, the format modern tcpdump/Wireshark
  * write by default) — block-framed container feeding the SAME packet
  * decoder as the classic reader ([[PcapReader.decodeEthIpv4]]) and the
  * same output schema, so classic and ng captures union cleanly.
  * Reference surface: contrib/format-pcapng/.../PcapngBatchReader.java +
  * PacketDecoder.java (Drill likewise shares the packet decoder between
  * the two formats). Format (public spec, pcapng.com): every block is
  * [type u32][total length u32][body][total length u32]; a Section
  * Header Block (type 0x0A0D0D0A) opens each section and its byte-order
  * magic (0x1A2B3C4D) fixes endianness for the section; Interface
  * Description Blocks declare link type + timestamp resolution
  * (if_tsresol option, default 10^-6); Enhanced Packet Blocks carry
  * [interface id][ts high][ts low][captured len][original len][data].
  *
  * Unknown block types (name resolution, statistics, custom) are skipped
  * by framing — the length field makes every block skippable without
  * understanding it, which is the format's design point. Timestamps are
  * normalized to (ts_sec, ts_usec) whatever the declared resolution.
  */
object PcapngReader {

  private def u16(b: Array[Byte], off: Int, le: Boolean): Int =
    if (le) ((b(off + 1) & 0xFF) << 8) | (b(off) & 0xFF)
    else ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

  private def u32(b: Array[Byte], off: Int, le: Boolean): Long =
    if (le)
      ((b(off + 3) & 0xFFL) << 24) | ((b(off + 2) & 0xFFL) << 16) |
        ((b(off + 1) & 0xFFL) << 8) | (b(off) & 0xFFL)
    else
      ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
        ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  private val Shb = 0x0A0D0D0AL // palindromic on purpose (endian-proof)
  private val Idb = 0x00000001L
  private val Epb = 0x00000006L

  /** Parse one pcapng file into packet rows (PcapReader.schema). */
  private[graft] def parse(in: DataInputStream, decodeNet: Boolean = true): Iterator[Row] =
    new Iterator[Row] {
      private var le = false
      // declared BEFORE nextRow: its `= advance()` initializer runs at
      // construction, and a later field initializer would RESET the flag
      private var sawShb = false
      // timestamp divisor per interface, in declaration order within the
      // current section (EPBs reference interfaces by index)
      private val tsDiv = scala.collection.mutable.ArrayBuffer[Long]()
      private var nextRow: Row = advance()

      private def pow10(n: Int): Long = { var v = 1L; var i = 0; while (i < n) { v *= 10; i += 1 }; v }

      private def idbDivisor(body: Array[Byte]): Long = {
        // body: link type u16, reserved u16, snaplen u32, then options
        // [code u16][len u16][value padded to 4]... until opt_endofopt(0)
        var off = 8
        while (off + 4 <= body.length) {
          val code = u16(body, off, le)
          val olen = u16(body, off + 2, le)
          if (code == 0) return 1000000L
          if (code == 9 && olen >= 1) { // if_tsresol
            val r = body(off + 4) & 0xFF
            return if ((r & 0x80) != 0) 1L << (r & 0x7F) else pow10(r)
          }
          off += 4 + ((olen + 3) & ~3)
        }
        1000000L // spec default: microseconds
      }

      private def advance(): Row = {
        try {
          while (true) {
            val hdr = new Array[Byte](8)
            if (in.readNBytes(hdr, 0, 8) < 8) { in.close(); return null }
            val isShb = (hdr(0) & 0xFF) == 0x0A && (hdr(1) & 0xFF) == 0x0D &&
              (hdr(2) & 0xFF) == 0x0D && (hdr(3) & 0xFF) == 0x0A
            // the FIRST block must be a Section Header — anything else is
            // not pcapng (e.g. a classic .pcap): error like the classic
            // reader instead of silently yielding zero rows
            require(isShb || sawShb,
              f"not a pcapng file (first block type 0x${u32(hdr, 0, le)}%08x " +
                "is not a Section Header)")
            if (isShb) {
              sawShb = true
              val magic = new Array[Byte](4)
              if (in.readNBytes(magic, 0, 4) < 4) { in.close(); return null }
              le = (magic(0) & 0xFF) == 0x4D // 0x1A2B3C4D stored 4D 3C 2B 1A
              require(le || (magic(0) & 0xFF) == 0x1A,
                f"bad pcapng byte-order magic 0x${magic(0) & 0xFF}%02x...")
              val totalLen = u32(hdr, 4, le)
              if (totalLen < 16 || totalLen > (1 << 26)) { in.close(); return null }
              in.skipNBytes(totalLen - 12) // rest of body + trailing length
              tsDiv.clear() // interfaces are per-section
            } else {
              val blockType = u32(hdr, 0, le)
              val totalLen = u32(hdr, 4, le)
              // corrupt framing (negative/absurd length): stop at the last
              // whole sane block, like the classic reader
              if (totalLen < 12 || totalLen > (1 << 26)) { in.close(); return null }
              val body = new Array[Byte]((totalLen - 12).toInt)
              in.readFully(body)
              in.skipNBytes(4) // trailing total length
              if (blockType == Idb) {
                tsDiv += idbDivisor(body)
              } else if (blockType == Epb && body.length >= 20) {
                val ifId = u32(body, 0, le).toInt
                val ts = (u32(body, 4, le) << 32) | u32(body, 8, le)
                val capLen = u32(body, 12, le).toInt
                val origLen = u32(body, 16, le).toInt
                val div = if (ifId >= 0 && ifId < tsDiv.length) tsDiv(ifId) else 1000000L
                // corrupt cap-len (byte-flipped → negative, or huge →
                // `20 + capLen` overflowing negative) must stop cleanly
                // like any other bad framing, not throw out of the
                // EOF-only catch via copyOfRange
                if (capLen < 0 || capLen > (1 << 26)) { in.close(); return null }
                val data = java.util.Arrays.copyOfRange(body, 20,
                  math.min(20 + capLen, body.length))
                val (src, dst, proto, sport, dport) =
                  if (decodeNet) PcapReader.decodeEthIpv4(data)
                  else (null, null, null, null, null)
                val sec = java.lang.Long.divideUnsigned(ts, div)
                val frac = java.lang.Long.remainderUnsigned(ts, div)
                return Row(sec, frac * 1000000L / div, origLen,
                  src, dst, proto, sport, dport)
              }
              // other block types (SPB/NRB/ISB/custom): skipped by framing
            }
          }
          null // unreachable
        } catch {
          case _: java.io.EOFException => in.close(); null
        }
      }

      def hasNext: Boolean = nextRow != null
      def next(): Row = { val r = nextRow; nextRow = advance(); r }
    }

  def read(spark: SparkSession, path: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(PcapReader.schema)
    val sconf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    FileList.asDataset(spark, path, Set(".pcapng"))
      .mapPartitions { paths =>
        val conf2 = sconf.value
        paths.flatMap { f =>
          val fp = new Path(f)
          val in = new DataInputStream(fp.getFileSystem(conf2).open(fp))
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ =>
              try in.close() catch { case _: java.io.IOException => () }))
          parse(in)
        }
      }(enc).toDF(PcapReader.schema.fieldNames.toSeq: _*)
  }
}
