package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

/** Hand-rolled Delta Lake deletion-vector codec — no delta-core jar.
  * Public spec: github.com/delta-io/delta PROTOCOL.md §Deletion Vectors
  * + the RoaringFormatSpec (github.com/RoaringBitmap/RoaringFormatSpec)
  * it delegates the bitmap bytes to. Layout:
  *
  *   DV file:     [0x01 version byte] then per stored DV:
  *                [int32 BE dataSize][data][int32 BE crc32(data)]
  *   data:        [int32 LE magic 1681511377][64-bit roaring portable]
  *   64-bit
  *   portable:    [int64 LE bucket count] then per bucket:
  *                [int32 LE high-32-bits key][32-bit roaring portable]
  *   32-bit
  *   portable:    cookie 12346 (no runs, + int32 container count) or
  *                12347 (runs; count-1 in the high 16 bits + run bitset);
  *                descriptive headers (uint16 key, uint16 card-1);
  *                offset headers; then array (uint16 values) / bitmap
  *                (1024 × int64) / run (uint16 pairs) containers.
  *
  * The `u` storage type derives the file name from a Z85-encoded UUID
  * (ZeroMQ RFC 32/Z85 — Delta reuses that alphabet); `i` inlines the
  * Z85-encoded data in the log; `p` stores an absolute path.
  *
  * The writer emits array containers under cookie 12346 (deleted
  * positions per file are sparse); the reader decodes all three
  * container kinds, so DVs from writers that chose bitmap or run
  * encodings decode too. Reference posture: Drill's format-deltalake
  * (contrib/format-deltalake/.../DeltaGroupScan.java) predates DVs and
  * silently ignores them — graft reads them, because a DV-bearing table
  * read without them returns rows the table says are deleted. */
/** Hadoop Configuration is not Serializable; this wrapper ships one to
  * executors via its Writable form (the standard Spark pattern — its
  * own SerializableConfiguration is private[spark]). */
class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

object DeletionVectors {

  /** PROTOCOL.md: magic prefix of serialized deletion-vector data. */
  private val Magic = 1681511377

  case class DvDescriptor(storageType: String, pathOrInlineDv: String,
                          offset: Int, sizeInBytes: Int, cardinality: Long) {
    /** Absolute path of the DV file ("u"/"p" types) under `tablePath`. */
    def filePath(tablePath: String): String = storageType match {
      case "p" => pathOrInlineDv
      case "u" =>
        // <optional random prefix></>-separated + 20-char z85 UUID
        val (prefix, enc) =
          if (pathOrInlineDv.length > 20)
            (pathOrInlineDv.dropRight(20) + "/", pathOrInlineDv.takeRight(20))
          else ("", pathOrInlineDv)
        val uuid = z85DecodeUuid(enc)
        s"$tablePath/${prefix}deletion_vector_$uuid.bin"
      case other => throw new IllegalArgumentException(
        s"deletion vector storageType '$other' has no file path")
    }
  }

  // ------------------------------------------------------------------ z85

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** ZeroMQ Z85: every 4 bytes → 5 chars, big-endian base-85. */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"z85 input must be 4n bytes, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) { sb.append(Z85Alphabet(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 input must be 5n chars, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val d = if (s(i + j) < 128) Z85Decode(s(i + j).toInt) else -1
        require(d >= 0, s"invalid z85 char '${s(i + j)}'")
        v = v * 85 + d; j += 1
      }
      var k = 3
      while (k >= 0) { out(i / 5 * 4 + (3 - k)) = ((v >> (8 * k)) & 0xff).toByte; k -= 1 }
      i += 5
    }
    out
  }

  private def z85DecodeUuid(enc: String): java.util.UUID = {
    val b = ByteBuffer.wrap(z85Decode(enc))
    new java.util.UUID(b.getLong, b.getLong)
  }

  private def z85EncodeUuid(u: java.util.UUID): String = {
    val b = ByteBuffer.allocate(16)
    b.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    z85Encode(b.array)
  }

  // -------------------------------------------------- roaring (de)serialize

  /** Serialize sorted distinct row indexes as the spec's magic-prefixed
    * 64-bit portable roaring bitmap (array containers, cookie 12346). */
  def serialize(positions: Seq[Long]): Array[Byte] = {
    val sorted = positions.distinct.sorted
    require(sorted.headOption.forall(_ >= 0), "row indexes must be >= 0")
    // bucket by high 32 bits, container by the next 16
    val buckets = sorted.groupBy(p => (p >> 32).toInt).toSeq.sortBy(_._1)
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v)
      bos.write(b.array)
    }
    def le64(v: Long): Unit = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v)
      bos.write(b.array)
    }
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    le32(Magic)
    le64(buckets.size.toLong)
    buckets.foreach { case (key, vals) =>
      le32(key)
      val containers = vals.map(_ & 0xffffffffL)
        .groupBy(v => (v >> 16).toInt).toSeq.sortBy(_._1)
      le32(12346) // SERIAL_COOKIE_NO_RUNCONTAINER
      le32(containers.size)
      containers.foreach { case (ck, cv) => le16(ck); le16(cv.size - 1) }
      // offset header: byte offsets of each container from bitmap start;
      // per RoaringFormatSpec a container over 4096 values is a BITMAP
      // container (8 KiB of words), at most 4096 an array of uint16s
      def containerBytes(card: Int): Int = if (card > 4096) 8192 else 2 * card
      var off = 4 + 4 + 4 * containers.size + 4 * containers.size
      containers.foreach { case (_, cv) => le32(off); off += containerBytes(cv.size) }
      containers.foreach { case (_, cv) =>
        if (cv.size > 4096) {
          val words = new Array[Long](1024)
          cv.foreach { v =>
            val lo = (v & 0xffff).toInt
            words(lo >> 6) |= 1L << (lo & 63)
          }
          val b = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
          words.foreach(b.putLong)
          bos.write(b.array)
        } else cv.foreach(v => le16((v & 0xffff).toInt))
      }
    }
    bos.toByteArray
  }

  /** Decode magic-prefixed 64-bit portable roaring data → row indexes
    * (array, bitmap AND run containers — any spec-conforming writer). */
  def deserialize(data: Array[Byte]): Seq[Long] = {
    val b = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = b.getInt
    require(magic == Magic, s"deletion vector magic $magic (expected $Magic)")
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    val nBuckets = b.getLong
    var bi = 0L
    while (bi < nBuckets) {
      val high = (b.getInt.toLong & 0xffffffffL) << 32
      val cookie = b.getInt
      val (nContainers, runBitset) =
        if ((cookie & 0xffff) == 12347) {
          val n = (cookie >>> 16) + 1
          val bs = new Array[Byte]((n + 7) / 8)
          b.get(bs)
          (n, bs)
        } else {
          require(cookie == 12346, s"roaring cookie $cookie")
          (b.getInt, null)
        }
      def isRun(i: Int): Boolean =
        runBitset != null && (runBitset(i / 8) & (1 << (i % 8))) != 0
      val keys = new Array[Int](nContainers)
      val cards = new Array[Int](nContainers)
      var i = 0
      while (i < nContainers) {
        keys(i) = b.getShort & 0xffff
        cards(i) = (b.getShort & 0xffff) + 1
        i += 1
      }
      // offset header present when no-runs, or >= 4 containers with runs
      if (runBitset == null || nContainers >= 4) b.position(b.position() + 4 * nContainers)
      i = 0
      while (i < nContainers) {
        val base = high | (keys(i).toLong << 16)
        if (isRun(i)) {
          val nRuns = b.getShort & 0xffff
          var r = 0
          while (r < nRuns) {
            val s = b.getShort & 0xffff
            val len = b.getShort & 0xffff
            var v = 0
            while (v <= len) { out += base | (s + v).toLong; v += 1 }
            r += 1
          }
        } else if (cards(i) > 4096) { // bitmap container: 1024 longs
          var w = 0
          while (w < 1024) {
            var word = b.getLong
            while (word != 0) {
              val bit = java.lang.Long.numberOfTrailingZeros(word)
              out += base | (w * 64 + bit).toLong
              word &= word - 1
            }
            w += 1
          }
        } else {
          var v = 0
          while (v < cards(i)) { out += base | (b.getShort & 0xffff).toLong; v += 1 }
        }
        i += 1
      }
      bi += 1
    }
    out.toSeq
  }

  // ------------------------------------------------------------- file I/O

  /** Write one DV FILE holding a deletion vector per data file (the
    * multi-DV packing real writers use) and return each data file's
    * descriptor (storageType "u"). */
  def writeDvFile(spark: org.apache.spark.sql.SparkSession, tablePath: String,
                  deletes: Seq[(String, Seq[Long])]): Map[String, DvDescriptor] =
    writeDvFileConf(spark.sparkContext.hadoopConfiguration, tablePath, deletes)

  /** [[writeDvFile]] with a plain Configuration — executor-safe (e.g.
    * from a broadcast [[SerializableHadoopConf]]); the UUID-derived file
    * name makes direct writes into the table root collision-free, so
    * retried task attempts leave only unreferenced orphans. */
  def writeDvFileConf(conf: org.apache.hadoop.conf.Configuration,
                      tablePath: String,
                      deletes: Seq[(String, Seq[Long])]): Map[String, DvDescriptor] = {
    val uuid = java.util.UUID.randomUUID()
    val path = new org.apache.hadoop.fs.Path(tablePath,
      s"deletion_vector_$uuid.bin")
    val fs = path.getFileSystem(conf)
    val os = fs.create(path, true)
    val descriptors = scala.collection.mutable.Map[String, DvDescriptor]()
    try {
      os.write(1) // DV file format version
      var offset = 1
      deletes.foreach { case (dataFile, positions) =>
        val data = serialize(positions)
        val crc = new CRC32(); crc.update(data)
        val buf = ByteBuffer.allocate(4 + data.length + 4) // BE wrapper
        buf.putInt(data.length).put(data).putInt(crc.getValue.toInt)
        os.write(buf.array)
        descriptors(dataFile) = DvDescriptor("u", z85EncodeUuid(uuid),
          offset, data.length, positions.distinct.size.toLong)
        offset += 4 + data.length + 4
      }
    } finally os.close()
    descriptors.toMap
  }

  /** Row indexes a descriptor deletes; reads+checks the file wrapper for
    * "u"/"p", decodes inline data for "i". Executor-safe: callers pass a
    * plain Configuration (e.g. from a broadcast SerializableConfiguration). */
  def readPositions(desc: DvDescriptor, tablePath: String,
                    conf: org.apache.hadoop.conf.Configuration): Seq[Long] = {
    if (desc.storageType == "i") return deserialize(z85Decode(desc.pathOrInlineDv))
    val p = new org.apache.hadoop.fs.Path(desc.filePath(tablePath))
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      in.seek(desc.offset.toLong)
      val size = in.readInt() // BE wrapper
      require(size == desc.sizeInBytes,
        s"DV at ${p}:${desc.offset}: stored size $size != descriptor ${desc.sizeInBytes}")
      val data = new Array[Byte](size)
      in.readFully(data)
      val storedCrc = in.readInt()
      val crc = new CRC32(); crc.update(data)
      require(storedCrc == crc.getValue.toInt,
        s"DV at ${p}:${desc.offset}: checksum mismatch")
      deserialize(data)
    } finally in.close()
  }
}
