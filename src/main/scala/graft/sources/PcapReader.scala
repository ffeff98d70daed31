package graft.sources

import java.io.DataInputStream
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Classic libpcap capture reader — "SELECT * FROM my.pcap" is Drill's
  * signature query-anything demo (reference contrib/format-pcapng and the
  * core pcap decoder exec/.../store/pcap/PcapDecoder.java). One row per
  * packet with the fields a security/log workload filters on: timestamp,
  * IPv4 addresses, protocol, ports, lengths. Ethernet+IPv4 framing with
  * TCP/UDP port extraction; other link/protocol shapes yield rows with
  * null network fields rather than failing (schema-on-read over mixed
  * captures).
  *
  * Format (public spec): 24-byte global header (magic 0xa1b2c3d4, either
  * endianness), then per packet a 16-byte record header (ts_sec, ts_usec,
  * incl_len, orig_len) + incl_len bytes of data. Files parallelize one
  * task per file, like the other hand-rolled readers here; packets inside
  * one capture are sequential by construction (record framing carries no
  * sync marker to split on).
  */
object PcapReader {

  val schema: StructType = StructType(Seq(
    StructField("ts_sec", LongType, nullable = false),
    StructField("ts_usec", LongType, nullable = false),
    StructField("orig_len", IntegerType, nullable = false),
    StructField("src_ip", StringType, nullable = true),
    StructField("dst_ip", StringType, nullable = true),
    StructField("protocol", StringType, nullable = true),
    StructField("src_port", IntegerType, nullable = true),
    StructField("dst_port", IntegerType, nullable = true)))

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

  private def ip4(b: Array[Byte], off: Int): String =
    s"${b(off) & 0xFF}.${b(off + 1) & 0xFF}.${b(off + 2) & 0xFF}.${b(off + 3) & 0xFF}"

  /** Decode an IPv4 header starting at `ip` to
    * (src, dst, proto, sport, dport). */
  private def decodeIpv4At(data: Array[Byte], ip: Int):
      (String, String, String, Integer, Integer) = {
    if (data.length < ip + 20 || ((data(ip) >> 4) & 0xF) != 4)
      return (null, null, null, null, null)
    val ihl = (data(ip) & 0x0F) * 4
    val proto = data(ip + 9) & 0xFF
    val src = ip4(data, ip + 12)
    val dst = ip4(data, ip + 16)
    val l4 = ip + ihl
    val protoName = proto match {
      case 6 => "TCP"
      case 17 => "UDP"
      case 1 => "ICMP"
      case other => other.toString
    }
    if ((proto == 6 || proto == 17) && data.length >= l4 + 4)
      (src, dst, protoName, Int.box(u16(data, l4)), Int.box(u16(data, l4 + 2)))
    else (src, dst, protoName, null, null)
  }

  /** Decode one ethernet frame to (src, dst, proto, sport, dport). */
  private[graft] def decodeEthIpv4(data: Array[Byte]):
      (String, String, String, Integer, Integer) =
    if (data.length < 34 || u16(data, 12) != 0x0800)
      (null, null, null, null, null)
    else decodeIpv4At(data, 14)

  /** Field names whose values require the ethernet/IPv4 decode — when a
    * pruned projection requests none of them (e.g. packet counts over
    * ts_sec), the decode is skipped entirely, not just unprojected. */
  val networkFields: Set[String] =
    Set("src_ip", "dst_ip", "protocol", "src_port", "dst_port")

  /** Parse one capture file into packet rows. `decodeNet=false` skips the
    * per-packet ethernet/IPv4 decode (network fields come back null) for
    * projections that don't reference them. */
  private[graft] def parse(in: DataInputStream, decodeNet: Boolean = true): Iterator[Row] = {
    val gh = new Array[Byte](24)
    // a file shorter than the global header (zero-byte rotated capture)
    // is a truncated capture, not a planning error: zero rows, no failure
    if (in.readNBytes(gh, 0, 24) < 24) { in.close(); return Iterator.empty }
    val magicBe = ((gh(0) & 0xFFL) << 24) | ((gh(1) & 0xFFL) << 16) |
      ((gh(2) & 0xFFL) << 8) | (gh(3) & 0xFFL)
    // 0xa1b23c4d / little-endian twin = tcpdump --time-stamp-precision=
    // nano: identical layout, the fractional field is NANOseconds — it
    // normalizes back to the schema's ts_usec contract below
    val littleEndian = magicBe == 0xd4c3b2a1L || magicBe == 0x4d3cb2a1L
    val nanos = magicBe == 0xa1b23c4dL || magicBe == 0x4d3cb2a1L
    require(littleEndian || magicBe == 0xa1b2c3d4L || nanos,
      f"not a classic pcap file (magic 0x$magicBe%08x)")

    def u32(b: Array[Byte], off: Int): Long =
      if (littleEndian)
        ((b(off + 3) & 0xFFL) << 24) | ((b(off + 2) & 0xFFL) << 16) |
          ((b(off + 1) & 0xFFL) << 8) | (b(off) & 0xFFL)
      else
        ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
          ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

    // link-layer header type (bytes 20-23): Ethernet framing only holds
    // for LINKTYPE_ETHERNET (1); LINKTYPE_RAW (101) starts at the IPv4
    // header directly; anything else (e.g. Linux SLL, 802.11) yields the
    // documented null network fields instead of misreading offsets as
    // plausible-looking garbage addresses
    val linkType = u32(gh, 20).toInt

    new Iterator[Row] {
      private val rec = new Array[Byte](16)
      private var nextRow: Row = advance()
      private def advance(): Row = {
        // a capture truncated mid-record (killed tcpdump, partial copy) or
        // with a corrupted record header is normal in the wild: stop
        // cleanly at the last whole, sane packet
        try {
          val got = in.readNBytes(rec, 0, 16)
          if (got < 16) { in.close(); return null }
          val inclLen = u32(rec, 8)
          // snaplen ceiling: a garbage header (flipped bytes) shows up as
          // a negative or absurd length — don't allocate 2 GB for it
          if (inclLen < 0 || inclLen > (1 << 26)) { in.close(); return null }
          val data = new Array[Byte](inclLen.toInt)
          in.readFully(data)
          val (src, dst, proto, sport, dport) =
            if (decodeNet && linkType == 1) decodeEthIpv4(data)
            else if (decodeNet && linkType == 101) decodeIpv4At(data, 0)
            else (null, null, null, null, null)
          Row(u32(rec, 0), if (nanos) u32(rec, 4) / 1000L else u32(rec, 4),
            u32(rec, 12).toInt, src, dst, proto, sport, dport)
        } catch {
          case _: java.io.EOFException => in.close(); null
        }
      }
      def hasNext: Boolean = nextRow != null
      def next(): Row = { val r = nextRow; nextRow = advance(); r }
    }
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val sconf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    FileList.asDataset(spark, path, Set(".pcap"))
      .mapPartitions { paths =>
        val conf2 = sconf.value
        paths.flatMap { f =>
          val fp = new Path(f)
          val in = new DataInputStream(fp.getFileSystem(conf2).open(fp))
          // parse() closes at EOF, but a LIMIT / failed task abandons the
          // iterator mid-file — close on task completion either way
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ =>
              try in.close() catch { case _: java.io.IOException => () }))
          parse(in)
        }
      }(enc).toDF(schema.fieldNames: _*)
  }
}
