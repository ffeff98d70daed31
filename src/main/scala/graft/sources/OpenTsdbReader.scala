package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

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
  * string>, ts long epoch-seconds, value double).
  *
  * Scale shape: uids resolve as JOINS against the decoded uid
  * RELATION, never a driver-side collect — the 3-byte uid space
  * admits 16.7M names, which is driver-heap scale at the top end.
  * Per-ROW uid references (one row per series x hour bucket, orders
  * below point cardinality) explode to (tagk, tagv) pairs, join the
  * uid relation — broadcast-hinted only when its measured size is
  * under a million names (a forced hint at the 16.7M top end would
  * re-create the driver ceiling; bigger tables take the shuffle
  * join) — and re-assemble the tags map; the per-POINT relation then joins the resolved rows on
  * row key — broadcast-able by AQE when row cardinality allows, a
  * shuffle join when it does not, but the point decode itself stays
  * one task per store file either way. A uid referenced by data but
  * absent from tsdb-uid fails LOUDLY (raise_error on the join's null
  * side), never an inner join's silent drop.
  */
object OpenTsdbReader {

  private def be24(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 16) | ((b(o + 1) & 0xFF) << 8) | (b(o + 2) & 0xFF)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  /** The decoded uid RELATION — (kind, uid, name), kind in
    * metrics/tagk/tagv. Full HBase read semantics apply — renamed uids
    * resolve to the newest version by (ts, seq_id) and deleted uid
    * rows drop, through the same [[HBaseHFileReader.resolveLatest]]
    * every layered reader shares. This is what [[read]] JOINS against;
    * it is never collected there. */
  def uidRelation(spark: SparkSession, uidDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cells = HBaseHFileReader.readCells(spark, uidDir)
      .filter(col("family") === "name")
    HBaseHFileReader.resolveLatest(cells)
      .select("row_key", "qualifier", "value")
      .as[(Array[Byte], String, Array[Byte])]
      .map { case (rk, kind, v) =>
        require(rk.length == 3,
          s"tsdb-uid '$kind' row key has ${rk.length} bytes (expected " +
            "3 — wider uids need tsd.storage.uid.width support)")
        (kind, be24(rk, 0), new String(v, "UTF-8"))
      }.toDF("kind", "uid", "name")
  }

  /** uid → name maps from a tsdb-uid table directory: (metrics, tagk,
    * tagv), as driver-side maps — a convenience for tooling, GUARDED
    * by size: a large install's uid table is driver-heap scale, and
    * [[read]] resolves by join instead. */
  def uidMaps(spark: SparkSession, uidDir: String)
      : (Map[Int, String], Map[Int, String], Map[Int, String]) = {
    val rel = uidRelation(spark, uidDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val live =
      try {
        val n = rel.count()
        require(n <= 4000000L,
          s"tsdb-uid table holds $n name cells — too large to collect " +
            "driver-side; read() resolves uids by join and does not " +
            "need this map")
        rel.collect()
      } finally rel.unpersist()
    def mapFor(kind: String): Map[Int, String] =
      live.filter(_.getString(0) == kind)
        .map(r => r.getInt(1) -> r.getString(2)).toMap
    (mapFor("metrics"), mapFor("tagk"), mapFor("tagv"))
  }

  /** Decode a tsdb data directory against a tsdb-uid directory. */
  def read(spark: SparkSession, tsdbDir: String, uidDir: String): DataFrame = {
    val (plan, caches) = buildRead(spark, tsdbDir, uidDir)
    val result = plan
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize while the caches are live; refusal paths
    // (ms qualifiers, salted keys, missing uids) throw out of count —
    // release every cache instead of leaving blocks pinned
    try result.count()
    catch { case t: Throwable => result.unpersist(); throw t }
    finally caches.foreach(_.unpersist())
    result // caller may unpersist when done
  }

  /** [[read]]'s resolution plan WITHOUT materialization — split out so
    * plan audits can assert the join shape (broadcast uid joins, no
    * driver collect). Returns (plan, interior caches the caller must
    * release once done). */
  private[graft] def buildRead(spark: SparkSession, tsdbDir: String,
                               uidDir: String): (DataFrame, Seq[DataFrame]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // uid relation: three kind-slices join below — persist so the uid
    // store files decode once, not once per slice (metadata scale)
    val uidRel = uidRelation(spark, uidDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the broadcast hint is gated on the relation's actual size: a
    // FORCED hint at the 16.7M-name top end would re-create the very
    // driver-memory ceiling this join path removed (broadcast builds
    // collect to the driver); big uid tables take the shuffle join
    val uidCount = uidRel.count()
    val hintB = uidCount <= 1000000L
    def names(kind: String, uidAlias: String, nameAlias: String) = {
      val slice = uidRel.filter(col("kind") === kind)
        .select(col("uid").as(uidAlias), col("name").as(nameAlias))
      if (hintB) broadcast(slice) else slice
    }
    // HBase semantics BEFORE tsdb decode: TSD's row compaction rewrites
    // points into a compacted column and DELETES the originals — a
    // flushed-but-not-major-compacted table holds both plus the
    // tombstones, and a bare Put scan would emit every point twice.
    // The shared resolveLatest applies all four marker kinds
    // per-version and picks the newest survivor by (ts, seq_id).
    val cells = HBaseHFileReader.readCells(spark, tsdbDir)
      .filter(col("family") === "t")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val live = HBaseHFileReader.resolveLatest(cells)
      .select("row_key", "qualifier_bytes", "value")
    val points = live
      .as[(Array[Byte], Array[Byte], Array[Byte])]
      .flatMap { case (rk, qual, value) =>
        require(rk.length >= 7 && (rk.length - 7) % 6 == 0,
          s"tsdb row key has ${rk.length} bytes — not metric(3)+ts(4)+" +
            "n*(tagk(3)+tagv(3)); salted tables are not supported " +
            "(tsd.storage.salt.buckets must be 0)")
        val baseTs = be32(rk, 3)
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
          (rk, baseTs + offset, v)
        }
      }
      .toDF("rk", "ts", "value")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // per-ROW uid resolution: one row per distinct row key (series x
    // hour bucket), exploded to tag uid pairs, joined against the
    // BROADCAST uid relation, re-assembled into the tags map. A uid
    // the data references but tsdb-uid lacks raises, never drops.
    val rows = points.select("rk").distinct().as[Array[Byte]]
      .map { rk =>
        (rk, be24(rk, 0),
          (7 until rk.length by 6).map(o => (be24(rk, o), be24(rk, o + 3))))
      }.toDF("rk", "metric_uid", "tag_uids")
    def required(name: Column, uid: Column, what: String): Column =
      when(uid.isNotNull, coalesce(name, raise_error(concat(
        lit(s"$what uid "), uid.cast("string"),
        lit(" missing from tsdb-uid")))))
    val resolvedRows = rows
      .select(col("rk"), col("metric_uid"),
        explode_outer(col("tag_uids")).as("p"))
      .select(col("rk"), col("metric_uid"),
        col("p._1").as("tagk_uid"), col("p._2").as("tagv_uid"))
      .join(names("tagk", "__ku", "kname"),
        col("tagk_uid") === col("__ku"), "left")
      .join(names("tagv", "__vu", "vname"),
        col("tagv_uid") === col("__vu"), "left")
      .groupBy("rk", "metric_uid")
      .agg(map_from_entries(collect_list(
        when(col("tagk_uid").isNotNull, struct(
          required(col("kname"), col("tagk_uid"), "tagk").as("key"),
          required(col("vname"), col("tagv_uid"), "tagv").as("value")))))
        .as("tags"))
      .join(names("metrics", "__mu", "mname"),
        col("metric_uid") === col("__mu"), "left")
      .select(col("rk"),
        coalesce(col("mname"), raise_error(concat(
          lit("metric uid "), col("metric_uid").cast("string"),
          lit(" missing from tsdb-uid")))).as("metric"),
        col("tags"))

    val result = points.join(resolvedRows, Seq("rk"))
      .select(col("metric"), col("tags"), col("ts"), col("value"))
    (result, Seq(cells, points, uidRel))
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
