package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** OpenTSDB-on-HBase reader — the zero-egress re-expression of the
  * reference's OpenTSDB storage plugin (contrib/storage-opentsdb/...
  * /OpenTSDB.java queries a live TSD's HTTP API; graft decodes the
  * PUBLIC HBase table schema that TSD stores — opentsdb.net
  * "HBase Schema" user guide — directly from store files through
  * [[HBaseHFileReader]]).
  *
  * Schema surface (2.x defaults, salting OFF):
  *  - `tsdb` table rowkey: metric_uid(3) + base_timestamp(4, aligned
  *    to 3600 s) + (tagk_uid(3) + tagv_uid(3))*;
  *  - family `t` qualifiers: 2-byte SECOND-precision points —
  *    offset(12 bits) << 4 | flags, flags bit 3 = float, bits 0-2 =
  *    value length - 1; COMPACTED columns are concatenations of 2-byte
  *    qualifiers with values concatenated (a trailing 0x00 mix byte
  *    tolerated); 4-byte millisecond qualifiers (first nibble 0xF)
  *    REFUSE loudly (second-precision is the storage default);
  *  - `tsdb-uid` table: family `name`, rows keyed by the 3-byte uid,
  *    qualifiers `metrics`/`tagk`/`tagv` → UTF-8 names (the reverse
  *    map TSD maintains; the forward `id` family is ignored).
  *
  * Output: one row per data point — (metric string, tags map<string,
  * string>, ts long epoch-seconds, value double). UID maps are
  * metadata-scale (TSD allocates them sequentially; cardinality =
  * distinct metric/tag names) and BROADCAST; the data decode stays
  * distributed, one task per store file.
  */
object OpenTsdbReader {

  private def be24(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 16) | ((b(o + 1) & 0xFF) << 8) | (b(o + 2) & 0xFF)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  /** uid → name maps from a tsdb-uid table directory: (metrics, tagk,
    * tagv). Metadata-scale collect by design (one row per distinct
    * name TSD ever allocated). Full HBase read semantics apply —
    * renamed uids resolve to the newest version by (ts, seq_id) and
    * deleted uid rows drop, through the same [[HBaseHFileReader
    * .resolveLatest]] every layered reader shares. */
  def uidMaps(spark: SparkSession, uidDir: String)
      : (Map[Int, String], Map[Int, String], Map[Int, String]) = {
    import org.apache.spark.sql.functions.col
    // the resolution reads the cell relation from six plan branches —
    // persist even at uid-table (metadata) scale to decode files once
    val cells = HBaseHFileReader.readCells(spark, uidDir)
      .filter(col("family") === "name")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val live =
      try HBaseHFileReader.resolveLatest(cells)
        .select("row_key", "qualifier", "value").collect()
      finally cells.unpersist()
    def mapFor(kind: String): Map[Int, String] =
      live.filter(_.getString(1) == kind).map { r =>
        val rk = r.getAs[Array[Byte]](0)
        require(rk.length == 3,
          s"tsdb-uid '$kind' row key has ${rk.length} bytes (expected " +
            "3 — wider uids need tsd.storage.uid.width support)")
        be24(rk, 0) -> new String(r.getAs[Array[Byte]](2), "UTF-8")
      }.toMap
    (mapFor("metrics"), mapFor("tagk"), mapFor("tagv"))
  }

  /** Decode a tsdb data directory against a tsdb-uid directory. */
  def read(spark: SparkSession, tsdbDir: String, uidDir: String): DataFrame = {
    import spark.implicits._
    val (metrics, tagks, tagvs) = uidMaps(spark, uidDir)
    val mB = spark.sparkContext.broadcast(metrics)
    val kB = spark.sparkContext.broadcast(tagks)
    val vB = spark.sparkContext.broadcast(tagvs)
    // HBase semantics BEFORE tsdb decode: TSD's row compaction rewrites
    // points into a compacted column and DELETES the originals — a
    // flushed-but-not-major-compacted table holds both plus the
    // tombstones, and a bare Put scan would emit every point twice.
    // The shared resolveLatest applies all four marker kinds
    // per-version and picks the newest survivor by (ts, seq_id).
    import org.apache.spark.sql.functions.col
    val cells = HBaseHFileReader.readCells(spark, tsdbDir)
      .filter(col("family") === "t")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val live = HBaseHFileReader.resolveLatest(cells)
      .select("row_key", "qualifier_bytes", "value")
    val result = live
      .as[(Array[Byte], Array[Byte], Array[Byte])]
      .flatMap { case (rk, qual, value) =>
        require(rk.length >= 7 && (rk.length - 7) % 6 == 0,
          s"tsdb row key has ${rk.length} bytes — not metric(3)+ts(4)+" +
            "n*(tagk(3)+tagv(3)); salted tables are not supported " +
            "(tsd.storage.salt.buckets must be 0)")
        val metric = mB.value.getOrElse(be24(rk, 0),
          throw new java.io.IOException(
            s"metric uid ${be24(rk, 0)} missing from tsdb-uid"))
        val baseTs = be32(rk, 3)
        val tags = (7 until rk.length by 6).map { o =>
          val k = kB.value.getOrElse(be24(rk, o),
            throw new java.io.IOException(
              s"tagk uid ${be24(rk, o)} missing from tsdb-uid"))
          val v = vB.value.getOrElse(be24(rk, o + 3),
            throw new java.io.IOException(
              s"tagv uid ${be24(rk, o + 3)} missing from tsdb-uid"))
          k -> v
        }.toMap
        require(qual.length >= 2 && qual.length % 2 == 0,
          s"tsdb qualifier of ${qual.length} bytes — not a sequence of " +
            "2-byte second-precision points")
        val nPoints = qual.length / 2
        // ms-precision points (0xF first nibble) can hide ANYWHERE in a
        // compacted column — check every point, not just the first
        (0 until nPoints).foreach { i =>
          require((qual(2 * i) & 0xF0) != 0xF0,
            "millisecond (0xF-prefixed 4-byte) tsdb points are not " +
              "supported; second-precision and compacted-second " +
              "columns are")
        }
        // compacted values may carry ONE trailing mix-meta byte
        var vo = 0
        (0 until nPoints).map { i =>
          val q = ((qual(2 * i) & 0xFF) << 8) | (qual(2 * i + 1) & 0xFF)
          val offset = q >>> 4
          val flags = q & 0xF
          val len = (flags & 0x7) + 1
          val isFloat = (flags & 0x8) != 0
          require(vo + len <= value.length,
            s"tsdb value bytes exhausted at point $i")
          val v: Double =
            if (isFloat) {
              require(len == 4 || len == 8, s"float length $len")
              if (len == 4) java.lang.Float.intBitsToFloat(
                be32(value, vo).toInt).toDouble
              else java.lang.Double.longBitsToDouble(
                (be32(value, vo) << 32) | be32(value, vo + 4))
            } else {
              var x = 0L
              var j = 0
              while (j < len) { x = (x << 8) | (value(vo + j) & 0xFF); j += 1 }
              // sign-extend the big-endian two's-complement integer
              val shift = 64 - 8 * len
              ((x << shift) >> shift).toDouble
            }
          vo += len
          (metric, tags, baseTs + offset, v)
        }
      }
      .toDF("metric", "tags", "ts", "value")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize while the cell cache is live; refusal paths
    // (ms qualifiers, salted keys, missing uids) throw out of count —
    // release BOTH caches instead of leaving blocks pinned
    try result.count()
    catch { case t: Throwable => result.unpersist(); throw t }
    finally cells.unpersist()
    result // caller may unpersist when done
  }

  // ---------------------------------------------------- fixture tooling

  /** Encode fixture cells for [[HBaseHFileReader.writeHFile]]:
    * registers uids sequentially and lays out rowkeys/qualifiers/values
    * exactly per the published schema. `points`: (metric, tags sorted
    * by key at write, epochSeconds, value). Integers with zero
    * fractional part store as variable-length ints, others as doubles
    * (TSD's own storage rule). */
  def fixtureCells(points: Seq[(String, Map[String, String], Long, Double)])
      : (Seq[HBaseHFileReader.Cell], Seq[HBaseHFileReader.Cell]) = {
    def b24(v: Int) = Array(((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val metricIds = scala.collection.mutable.LinkedHashMap[String, Int]()
    val tagkIds = scala.collection.mutable.LinkedHashMap[String, Int]()
    val tagvIds = scala.collection.mutable.LinkedHashMap[String, Int]()
    def id(m: scala.collection.mutable.LinkedHashMap[String, Int],
           s: String): Int = m.getOrElseUpdate(s, m.size + 1)
    val dataCells = points.map { case (metric, tags, ts, value) =>
      val base = (ts / 3600) * 3600
      val offset = (ts - base).toInt
      val rk = b24(id(metricIds, metric)) ++
        Array((base >> 24).toByte, (base >> 16).toByte,
          (base >> 8).toByte, base.toByte) ++
        tags.toSeq.sortBy(_._1).flatMap { case (k, v) =>
          b24(id(tagkIds, k)) ++ b24(id(tagvIds, v)) }
      val isInt = value == math.rint(value) && math.abs(value) < (1L << 62)
      val (flags, vbytes) =
        if (isInt) {
          val l = value.toLong
          val len = if (l >= Byte.MinValue && l <= Byte.MaxValue) 1
                    else if (l >= Short.MinValue && l <= Short.MaxValue) 2
                    else if (l >= Int.MinValue && l <= Int.MaxValue) 4
                    else 8
          (len - 1, (0 until len).reverse.map(i =>
            ((l >> (8 * i)) & 0xFF).toByte).toArray)
        } else {
          val bits = java.lang.Double.doubleToLongBits(value)
          (0x8 | 7, (0 until 8).reverse.map(i =>
            ((bits >> (8 * i)) & 0xFF).toByte).toArray)
        }
      val q = (offset << 4) | flags
      val qualBytes = Array(((q >> 8) & 0xFF).toByte, (q & 0xFF).toByte)
      HBaseHFileReader.Cell(rk, "t",
        new String(qualBytes, "ISO-8859-1"), // display-only string form
        ts * 1000, 4, vbytes, 1L, qualRaw = qualBytes)
    }
    val uidCells =
      (metricIds.toSeq.map(("metrics", _)) ++
        tagkIds.toSeq.map(("tagk", _)) ++
        tagvIds.toSeq.map(("tagv", _))).map { case (kind, (name, uid)) =>
        HBaseHFileReader.Cell(b24(uid), "name", kind, 1L, 4,
          name.getBytes("UTF-8"), 1L)
      }
    // writeHFile does not re-sort: emit HBase order (row bytes
    // unsigned-lex, then family, then qualifier bytes)
    val cellOrd = new Ordering[HBaseHFileReader.Cell] {
      def compare(x: HBaseHFileReader.Cell,
                  y: HBaseHFileReader.Cell): Int = {
        val r = java.util.Arrays.compareUnsigned(x.row, y.row)
        if (r != 0) r
        else if (x.family != y.family) x.family.compare(y.family)
        else java.util.Arrays.compareUnsigned(
          x.qualifierBytes, y.qualifierBytes)
      }
    }
    (dataCells.sorted(cellOrd), uidCells.sorted(cellOrd))
  }
}
