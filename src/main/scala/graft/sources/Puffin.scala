package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Hand-rolled Puffin container codec (iceberg.apache.org/puffin-spec)
  * plus the Iceberg v3 `deletion-vector-v1` blob type (table-spec
  * §Position Delete Files / Deletion Vectors). No iceberg-core jar.
  *
  * File layout:    Magic | blob-1 … blob-n | footer
  * Footer layout:  Magic | payload (UTF-8 JSON) | payload-size (int32 LE)
  *                 | flags (4 bytes; bit 0 of byte 0 = payload
  *                 zstd-compressed — this writer always emits 0, the
  *                 reader refuses compressed payloads) | Magic
  * Magic = 0x50 0x46 0x41 0x31 ("PFA1").
  *
  * A `deletion-vector-v1` blob is byte-identical to one Delta DV record
  * — the v3 spec adopted Delta's framing deliberately, so one codec
  * serves both lakes:
  *
  *   [int32 BE len][len bytes: magic-prefixed 64-bit portable roaring]
  *   [int32 BE crc32 of the len bytes]
  *
  * [[DeletionVectors]] supplies the roaring (de)serializer; this object
  * adds the Puffin container. The manifest entry for a DV stores the
  * blob's `content_offset` (of the length prefix) and
  * `content_size_in_bytes` (len + 12, the full framed blob), so reads
  * seek straight to the blob without parsing the footer; the footer is
  * still written spec-complete (type, snapshot-id, sequence-number,
  * referenced-data-file, cardinality) for other engines' planners.
  *
  * Reference posture: Drill's format-iceberg
  * (contrib/format-iceberg/.../IcebergGroupScan.java) plans through
  * iceberg-core, which reads v3 DVs transparently; graft hand-rolls the
  * same bytes from the two public specs. */
object Puffin {

  private val Magic = Array[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"

  /** One deletion-vector blob inside a Puffin file. `offset`/`length`
    * are the manifest's content_offset / content_size_in_bytes. */
  case class DvBlob(referencedDataFile: String, offset: Long, length: Long,
                    cardinality: Long)

  /** Write one Puffin file holding a `deletion-vector-v1` blob per data
    * file. Executor-safe (plain Configuration, e.g. from a broadcast
    * [[SerializableHadoopConf]]); positions need not be sorted or
    * distinct — the roaring serializer canonicalizes. Returns the blob
    * descriptors in input order. */
  def writeDvFile(conf: Configuration, path: Path,
                  deletes: Seq[(String, Seq[Long])],
                  snapshotId: Long, sequenceNumber: Long): Seq[DvBlob] = {
    val fs = path.getFileSystem(conf)
    val os = fs.create(path, true)
    val blobs = Vector.newBuilder[DvBlob]
    try {
      os.write(Magic)
      var offset = 4L
      deletes.foreach { case (dataFile, positions) =>
        val data = DeletionVectors.serialize(positions) // magic + roaring
        val crc = new CRC32(); crc.update(data)
        val framed = ByteBuffer.allocate(4 + data.length + 4) // BE framing
        framed.putInt(data.length).put(data).putInt(crc.getValue.toInt)
        os.write(framed.array)
        blobs += DvBlob(dataFile, offset, 4L + data.length + 4L,
          positions.distinct.size.toLong)
        offset += 4 + data.length + 4
      }
      val out = blobs.result()
      val payload = footerJson(out, snapshotId, sequenceNumber)
        .getBytes("UTF-8")
      os.write(Magic)
      os.write(payload)
      val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payload.length).putInt(0) // flags: uncompressed payload
      os.write(tail.array)
      os.write(Magic)
      out
    } finally os.close()
  }

  private def footerJson(blobs: Seq[DvBlob], snapshotId: Long,
                         sequenceNumber: Long): String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    val arr = root.putArray("blobs")
    blobs.foreach { b =>
      val n = arr.addObject()
      n.put("type", "deletion-vector-v1")
      n.putArray("fields")
      n.put("snapshot-id", snapshotId)
      n.put("sequence-number", sequenceNumber)
      n.put("offset", b.offset)
      n.put("length", b.length)
      val props = n.putObject("properties")
      props.put("referenced-data-file", b.referencedDataFile)
      props.put("cardinality", b.cardinality.toString)
    }
    root.putObject("properties").put("created-by", "graft")
    mapper.writeValueAsString(root)
  }

  /** Deleted row positions of one DV blob, located by the manifest's
    * (content_offset, content_size_in_bytes) — no footer parse, no whole-
    * file read. Verifies the length framing, the roaring magic (inside
    * deserialize) and the CRC. Executor-safe. */
  def readDvBlob(conf: Configuration, path: String, offset: Long,
                 length: Long): Seq[Long] = {
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    try {
      in.seek(offset)
      val dataLen = in.readInt() // BE: length of magic + vector
      require(dataLen + 8L == length,
        s"DV blob at $path:$offset: framed size ${dataLen + 8} != " +
          s"manifest content_size_in_bytes $length")
      val data = new Array[Byte](dataLen)
      in.readFully(data)
      val storedCrc = in.readInt()
      val crc = new CRC32(); crc.update(data)
      require(storedCrc == crc.getValue.toInt,
        s"DV blob at $path:$offset: checksum mismatch")
      DeletionVectors.deserialize(data)
    } finally in.close()
  }

  /** Parse a Puffin footer → the JSON payload (spec/diagnostic path:
    * reads use the manifest offsets instead). Verifies all three magic
    * stamps; refuses compressed payloads. */
  def readFooter(conf: Configuration, path: Path): JsonNode = {
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    try {
      val head = new Array[Byte](4)
      in.readFully(0L, head)
      require(java.util.Arrays.equals(head, Magic), s"not a Puffin file: $path")
      val tail = new Array[Byte](12) // size + flags + magic
      in.readFully(len - 12, tail)
      val tb = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN)
      val payloadSize = tb.getInt
      val flags = tb.getInt
      require(java.util.Arrays.equals(tail.slice(8, 12), Magic),
        s"Puffin trailing magic missing: $path")
      require((flags & 1) == 0,
        s"Puffin footer payload is compressed (flags=$flags) — unsupported: $path")
      val payload = new Array[Byte](payloadSize)
      in.readFully(len - 12 - payloadSize, payload)
      val fmagic = new Array[Byte](4)
      in.readFully(len - 12 - payloadSize - 4, fmagic)
      require(java.util.Arrays.equals(fmagic, Magic),
        s"Puffin footer magic missing: $path")
      new ObjectMapper().readTree(new String(payload, "UTF-8"))
    } finally in.close()
  }
}
