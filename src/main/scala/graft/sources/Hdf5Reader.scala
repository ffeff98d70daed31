package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** HDF5 (.h5) reader — hand-rolled against the publicly documented HDF5
  * File Format Specification (support.hdfgroup.org; reference surface:
  * contrib/format-hdf5/.../HDF5BatchReader.java, which wraps the jhdf
  * library — no code shared, only the output contract). Same posture as
  * the SAS/SPSS/XLSX readers: the binary layout is decoded directly.
  *
  * Layout decoded: superblock version 0, symbol-table groups (B-tree v1 +
  * SNOD nodes + local heaps), version-1 object headers with continuation
  * blocks, dataspace/datatype/layout/filter/attribute messages, data in
  * compact, contiguous, or chunked (B-tree v1 chunk index) layouts with
  * the deflate filter (java.util.zip.Inflater), fixed and
  * variable-length strings (global heap collections), fixed-point and
  * IEEE-float scalars, compound records, and enum-encoded booleans.
  *
  * Two read modes mirror the reference:
  *  - browse (no dataset path): one row per group/dataset — path,
  *    data_type, file_name, data_size, element_count, dataset_data_type,
  *    dimensions, is_link, attributes (map<string,string>), plus typed
  *    previews int_data/double_data (array<array>) and string_data.
  *  - project (dataset path given, the reference's `defaultPath`): the
  *    dataset as rows — 1-D: one column named after the dataset leaf;
  *    2-D: `<type>_col_<k>` columns, one row per first dimension; >2-D:
  *    flattened exactly like the reference (row i, col k = element at
  *    leading-index block k, last-dimension position i, bounded by
  *    dims(0) rows x dims(1) cols); compound: one column per member
  *    (names sanitized to identifiers), one row per record.
  *
  * Access is positioned-read (seek) against the file system — metadata
  * B-trees and chunks are fetched on demand, never the whole file; files
  * parallelize one task per file and a projected dataset's chunk set is
  * the unit a column scan streams through.
  */
object Hdf5Reader {

  private val Undef = -1L // 0xFFFF... "undefined address"

  // ---- byte helpers --------------------------------------------------
  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xFF) << 8) | (b(o) & 0xFF)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xFFL) << 24) | ((b(o + 2) & 0xFFL) << 16) |
      ((b(o + 1) & 0xFFL) << 8) | (b(o) & 0xFFL)
  private def u64(b: Array[Byte], o: Int): Long = {
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xFFL); i -= 1 }
    v
  }
  // element readers honoring the datatype's byte-order flag
  private def e16(b: Array[Byte], o: Int, be: Boolean): Int =
    if (be) ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF) else u16(b, o)
  private def e32(b: Array[Byte], o: Int, be: Boolean): Long =
    if (be) ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
            ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    else u32(b, o)
  private def e64(b: Array[Byte], o: Int, be: Boolean): Long =
    if (be) {
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (b(o + i) & 0xFFL); i += 1 }
      v
    } else u64(b, o)

  private class H5(in: FSDataInputStream) {
    def bytes(pos: Long, n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      in.readFully(pos, b, 0, n)
      b
    }
    // global-heap collections cached per address: a vlen-string dataset
    // resolves every ELEMENT against its GCOL, and refetching the whole
    // collection per element turned a few-MB dataset into ~rowCount
    // full-collection reads (the H5Cache only covers <=4096-byte reads).
    // Total cached bytes ~ total string payload, which projectRows
    // materializes anyway.
    private val gcols = scala.collection.mutable.Map[Long, Array[Byte]]()
    def gcol(addr: Long): Array[Byte] = gcols.getOrElseUpdate(addr, {
      val head = bytes(addr, 16)
      require(new String(head, 0, 4, "ISO-8859-1") == "GCOL",
        "bad global heap signature")
      bytes(addr, u64(head, 8).toInt)
    })
  }

  // ---- model ---------------------------------------------------------
  /** cls: 0 fixed, 1 float, 3 string(fixed), 6 compound, 8 enum, 9 vlen */
  private[graft] case class Dtype(cls: Int, size: Int, signed: Boolean,
                                  vlenStr: Boolean = false,
                                  members: Seq[(String, Int, Dtype)] = Nil,
                                  enumBool: Boolean = false,
                                  be: Boolean = false)
  private[graft] case class Ds(path: String, dims: Seq[Long], dt: Dtype,
                               layoutCls: Int, addr: Long, size: Long,
                               chunkDims: Seq[Int], btree: Long,
                               filters: Seq[Int], compact: Array[Byte],
                               attrs: Map[String, String]) {
    def deflate: Boolean = filters.contains(1)
  }
  private[graft] case class Grp(path: String, attrs: Map[String, String])
  private[graft] case class Lnk(path: String, target: String)
  private[graft] case class Objects(groups: Seq[Grp], datasets: Seq[Ds],
                                    links: Seq[Lnk])

  // ---- object header -------------------------------------------------
  private case class Msg(typ: Int, body: Array[Byte])

  private def readMessages(h: H5, addr: Long): Seq[Msg] = {
    val hd = h.bytes(addr, 16)
    require(hd(0) == 1, s"unsupported object header version ${hd(0)} (v1 only)")
    val nmsgs = u16(hd, 2)
    var remainingBlocks = List((addr + 16, u32(hd, 8).toInt))
    val out = scala.collection.mutable.ArrayBuffer[Msg]()
    var seen = 0
    while (remainingBlocks.nonEmpty && seen < nmsgs) {
      val (bAddr, bLen) = remainingBlocks.head
      remainingBlocks = remainingBlocks.tail
      val blk = h.bytes(bAddr, bLen)
      var p = 0
      while (p + 8 <= bLen && seen < nmsgs) {
        val typ = u16(blk, p)
        val sz = u16(blk, p + 2)
        val body = java.util.Arrays.copyOfRange(blk, p + 8, p + 8 + sz)
        if (typ == 0x10) // continuation: another raw message block
          remainingBlocks = remainingBlocks :+ ((u64(body, 0), u64(body, 8).toInt))
        else if (typ != 0) out += Msg(typ, body)
        seen += 1
        p += 8 + sz
      }
    }
    out.toSeq
  }

  // ---- datatype message ----------------------------------------------
  private def parseDtype(b: Array[Byte], off: Int): (Dtype, Int) = {
    val cls = b(off) & 0x0F
    val ver = (b(off) >> 4) & 0x0F
    val bf0 = b(off + 1) & 0xFF
    val bf1 = b(off + 2) & 0xFF
    val size = u32(b, off + 4).toInt
    var p = off + 8
    cls match {
      case 0 => // fixed-point: props bitOffset(2) precision(2)
        val signed = (bf0 & 0x08) != 0
        (Dtype(0, size, signed, be = (bf0 & 0x01) != 0), p + 4 - off)
      case 1 => // float: props 12 bytes
        (Dtype(1, size, signed = true, be = (bf0 & 0x01) != 0), p + 12 - off)
      case 2 | 4 => // bitfield: class 4 per spec; class 2 is nominally
        // TIME but the HDF5 library never completed it and real files
        // (the reference plugin's own browsing.h5 fixture included) use
        // it for boolean-ish scalars with the same (offset, precision)
        // props — both decode as boolean. Normalized to 4 internally.
        (Dtype(4, size, signed = false, be = (bf0 & 0x01) != 0), p + 4 - off)
      case 3 => // fixed string
        (Dtype(3, size, signed = false), p - off)
      case 6 => // compound
        val n = bf0 | (bf1 << 8)
        val members = (0 until n).map { _ =>
          val nameStart = p
          var e = p
          while (b(e) != 0) e += 1
          val name = new String(b, nameStart, e - nameStart, "UTF-8")
          p = if (ver >= 3) e + 1
              else nameStart + ((e - nameStart) / 8 + 1) * 8
          val mOff =
            if (ver >= 3) { // minimal-size offset
              val ob = if (size < 256) 1 else if (size < 65536) 2 else 4
              var v = 0L; var i = ob - 1
              while (i >= 0) { v = (v << 8) | (b(p + i) & 0xFFL); i -= 1 }
              p += ob; v.toInt
            } else {
              val v = u32(b, p).toInt
              p += 4
              if (ver == 1) p += 1 + 3 + 4 + 4 + 16 // dimensionality block
              v
            }
          val (mt, consumed) = parseDtype(b, p)
          p += consumed
          (name, mOff, mt)
        }
        (Dtype(6, size, signed = false, members = members), p - off)
      case 8 => // enum: base type, then names + values
        val (base, consumed) = parseDtype(b, p)
        p += consumed
        val n = bf0 | (bf1 << 8)
        val names = (0 until n).map { _ =>
          val s = p
          var e = p
          while (b(e) != 0) e += 1
          val nm = new String(b, s, e - s, "UTF-8")
          p = if (ver >= 3) e + 1 else s + ((e - s) / 8 + 1) * 8
          nm
        }
        p += n * base.size
        val isBool = names.map(_.toUpperCase).toSet.subsetOf(Set("TRUE", "FALSE"))
        (Dtype(8, size, base.signed, enumBool = isBool), p - off)
      case 9 => // vlen; only the string flavor is surfaced
        val isStr = (bf0 & 0x0F) == 1
        val (_, consumed) = parseDtype(b, p)
        p += consumed
        (Dtype(9, size, signed = false, vlenStr = isStr), p - off)
      case other =>
        throw new IllegalStateException(s"unsupported HDF5 datatype class $other")
    }
  }

  // ---- dataspace -----------------------------------------------------
  private def parseDims(b: Array[Byte]): Seq[Long] = {
    val ver = b(0)
    if (ver == 1) {
      val rank = b(1) & 0xFF
      (0 until rank).map(i => u64(b, 8 + i * 8))
    } else { // version 2
      val rank = b(1) & 0xFF
      (0 until rank).map(i => u64(b, 4 + i * 8))
    }
  }

  // ---- attributes ----------------------------------------------------
  private def pad8(n: Int): Int = ((n + 7) / 8) * 8

  private def parseAttr(h: H5, b: Array[Byte]): Option[(String, String)] = {
    val ver = b(0)
    require(ver >= 1 && ver <= 3, s"unsupported attribute message version $ver")
    val nameSize = u16(b, 2)
    val dtSize = u16(b, 4)
    val dsSize = u16(b, 6)
    var p = 8 + (if (ver == 3) 1 else 0) // v3: name character-set byte
    val rawName = new String(b, p, nameSize, "UTF-8")
    val name = rawName.takeWhile(_ != 0)
    p += (if (ver == 1) pad8(nameSize) else nameSize)
    val (dt, _) = parseDtype(b, p)
    val dsOff = p + (if (ver == 1) pad8(dtSize) else dtSize)
    val dataOff = dsOff + (if (ver == 1) pad8(dsSize) else dsSize)
    // multi-valued attributes render their first element
    val v = decodeScalar(h, b, dataOff, dt)
    if (v == null) None else Some(name -> v.toString)
  }

  private def decodeScalar(h: H5, b: Array[Byte], off: Int, dt: Dtype): Any =
    dt.cls match {
      case 0 => dt.size match {
        // honor the signed flag at EVERY width (int8 -1 rendered "255",
        // int16 -5 rendered "65531"), like decodeScalarTyped does
        case 1 => if (dt.signed) b(off).toLong else (b(off) & 0xFF).toLong
        case 2 => if (dt.signed) e16(b, off, dt.be).toShort.toLong
                  else e16(b, off, dt.be).toLong
        case 4 => if (dt.signed) e32(b, off, dt.be).toInt.toLong else e32(b, off, dt.be)
        case _ => e64(b, off, dt.be)
      }
      case 1 =>
        if (dt.size == 4) java.lang.Float.intBitsToFloat(e32(b, off, dt.be).toInt).toDouble
        else java.lang.Double.longBitsToDouble(e64(b, off, dt.be))
      case 3 =>
        new String(b, off, dt.size, "UTF-8").takeWhile(_ != 0)
      case 4 => b(off) != 0 // bitfield renders as boolean
      case 8 =>
        val raw = dt.size match {
          case 1 => (b(off) & 0xFF).toLong
          case 2 => e16(b, off, dt.be).toLong
          case _ => e32(b, off, dt.be)
        }
        if (dt.enumBool) raw != 0 else raw
      case 9 if dt.vlenStr => readVlenString(h, b, off)
      case _ => null
    }

  // ---- global heap (vlen strings) ------------------------------------
  private def readVlenString(h: H5, b: Array[Byte], off: Int): String = {
    val len = u32(b, off).toInt
    val heapAddr = u64(b, off + 4)
    val idx = u32(b, off + 12).toInt
    if (heapAddr == Undef || len == 0) return ""
    val coll = h.gcol(heapAddr)
    val collSize = coll.length
    var p = 16
    while (p + 16 <= collSize) {
      val objIdx = u16(coll, p)
      val objSize = u64(coll, p + 8).toInt
      if (objIdx == 0) return "" // free-space terminator: index not found
      if (objIdx == idx)
        return new String(coll, p + 16, math.min(len, objSize), "UTF-8")
      p += 16 + pad8(objSize)
    }
    ""
  }

  // ---- group traversal -----------------------------------------------
  private def heapString(h: H5, heapAddr: Long, offset: Long): String = {
    val hd = h.bytes(heapAddr, 32)
    require(new String(hd, 0, 4, "ISO-8859-1") == "HEAP", "bad local heap signature")
    val segSize = u64(hd, 8)
    val dataAddr = u64(hd, 24)
    val seg = h.bytes(dataAddr, segSize.toInt) // local heaps are metadata-small
    var e = offset.toInt
    while (e < seg.length && seg(e) != 0) e += 1
    new String(seg, offset.toInt, e - offset.toInt, "UTF-8")
  }

  /** Symbol-table entries of one group B-tree (recursing through levels). */
  private def groupEntries(h: H5, btreeAddr: Long, heapAddr: Long):
      Seq[(String, Long, Int, Array[Byte])] = {
    val hd = h.bytes(btreeAddr, 24)
    require(new String(hd, 0, 4, "ISO-8859-1") == "TREE", "bad B-tree signature")
    val level = hd(5) & 0xFF
    val n = u16(hd, 6)
    // keys/children: key0(8) child0(8) key1(8) ... keyN(8)
    val kc = h.bytes(btreeAddr + 24, (2 * n + 1) * 8)
    val children = (0 until n).map(i => u64(kc, 8 + i * 16))
    if (level > 0) children.flatMap(c => groupEntries(h, c, heapAddr))
    else children.flatMap { snodAddr =>
      val sh = h.bytes(snodAddr, 8)
      require(new String(sh, 0, 4, "ISO-8859-1") == "SNOD", "bad SNOD signature")
      val ns = u16(sh, 6)
      val body = h.bytes(snodAddr + 8, ns * 40)
      (0 until ns).map { i =>
        val o = i * 40
        val nameOff = u64(body, o)
        val hdrAddr = u64(body, o + 8)
        val cacheType = u32(body, o + 16).toInt
        val scratch = java.util.Arrays.copyOfRange(body, o + 24, o + 40)
        (heapString(h, heapAddr, nameOff), hdrAddr, cacheType, scratch)
      }
    }
  }

  private def walk(h: H5, hdrAddr: Long, path: String, out: Objects,
                   visited: scala.collection.mutable.Set[Long] =
                     scala.collection.mutable.Set.empty): Objects = {
    // hard links can alias an ancestor group — each object surfaces once
    if (!visited.add(hdrAddr)) return out
    val msgs = readMessages(h, hdrAddr)
    // an attribute of an unsupported datatype class SKIPS (netCDF-4
    // stamps class-7 reference attrs — DIMENSION_LIST/REFERENCE_LIST —
    // on every variable; failing the whole file broke the most common
    // .h5 flavor in the wild), schema-on-read style
    val attrs = msgs.filter(_.typ == 0x0C).flatMap(m =>
      try parseAttr(h, m.body)
      catch { case _: IllegalStateException => None }).toMap
    val symTab = msgs.find(_.typ == 0x11)
    val dtypeMsg = msgs.find(_.typ == 0x03)

    if (symTab.isDefined) { // group
      val btree = u64(symTab.get.body, 0)
      val heap = u64(symTab.get.body, 8)
      var acc =
        if (path == "/") out // root group is not a row (reference contract)
        else Objects(out.groups :+ Grp(path, attrs), out.datasets, out.links)
      if (btree != Undef) {
        groupEntries(h, btree, heap).foreach { case (name, addr, cacheType, scratch) =>
          val childPath = if (path == "/") s"/$name" else s"$path/$name"
          if (cacheType == 2) { // soft link: scratch holds the heap offset
            val target = heapString(h, heap, u32(scratch, 0))
            acc = Objects(acc.groups, acc.datasets, acc.links :+ Lnk(childPath, target))
          } else acc = walk(h, addr, childPath, acc, visited)
        }
      }
      acc
    } else if (dtypeMsg.isDefined && msgs.exists(_.typ == 0x08)) { // dataset
      // (a datatype message without a layout is a committed/named datatype
      //  object — a type definition, not data; not a row)
      // an unsupported dataset datatype class (reference/opaque/time)
      // skips the DATASET, not the file
      val dt = try parseDtype(dtypeMsg.get.body, 0)._1
        catch { case _: IllegalStateException => return out }
      val dims = msgs.find(_.typ == 0x01).map(m => parseDims(m.body)).getOrElse(Nil)
      val layout = msgs.find(_.typ == 0x08).get
      val lb = layout.body
      require(lb(0) == 3, s"unsupported data layout message version ${lb(0)} (v3 only)")
      // full filter pipeline, in declared order: 1 deflate, 2 shuffle,
      // 3 fletcher32 (checksum, verify-skipped); anything else refuses —
      // silently ignoring a transform filter would return garbage values
      val filters = msgs.find(_.typ == 0x0B).map { m =>
        val nf = m.body(1) & 0xFF
        var p = 8
        (0 until nf).map { _ =>
          val id = u16(m.body, p)
          val nameLen = u16(m.body, p + 2)
          val nVals = u16(m.body, p + 6)
          p += 8 + pad8(nameLen) + 4 * nVals + (if (nVals % 2 == 1) 4 else 0)
          id
        }
      }.getOrElse(Nil)
      filters.find(id => id != 1 && id != 2 && id != 3).foreach(id =>
        throw new IllegalStateException(
          s"dataset $path uses unsupported HDF5 filter id $id " +
            "(deflate/shuffle/fletcher32 only)"))
      val ds = (lb(1): @unchecked) match {
        case 0 => // compact
          val sz = u16(lb, 2)
          Ds(path, dims, dt, 0, Undef, sz,
            Nil, Undef, filters, java.util.Arrays.copyOfRange(lb, 4, 4 + sz), attrs)
        case 1 => // contiguous
          Ds(path, dims, dt, 1, u64(lb, 2), u64(lb, 10), Nil, Undef, filters, null, attrs)
        case 2 => // chunked
          val d = lb(2) & 0xFF // rank + 1 (element-size dim)
          val btree = u64(lb, 3)
          val cdims = (0 until d).map(i => u32(lb, 11 + i * 4).toInt)
          Ds(path, dims, dt, 2, Undef, dims.product * dt.size,
            cdims, btree, filters, null, attrs)
      }
      Objects(out.groups, out.datasets :+ ds, out.links)
    } else out
  }

  private[graft] def scan(h: H5): Objects = {
    val magic = try h.bytes(0, 8) catch {
      case _: java.io.EOFException =>
        throw new IllegalArgumentException("not an HDF5 file (too short)")
    }
    require((magic(0) & 0xFF) == 0x89 &&
      new String(magic, 1, 3, "ISO-8859-1") == "HDF", "not an HDF5 file (bad magic)")
    val sb = h.bytes(0, 96)
    require(sb(8) == 0, s"unsupported superblock version ${sb(8)} (v0 only)")
    require(sb(13) == 8 && sb(14) == 8,
      "unsupported offset/length size (8-byte only)")
    val rootHdr = u64(sb, 64)
    walk(new H5Cache(h), rootHdr, "/", Objects(Nil, Nil, Nil))
  }

  /** Small read-through cache so repeated metadata reads don't re-hit the
    * file system; data chunks bypass it (read once each). */
  private class H5Cache(inner: H5) extends H5(null) {
    private val cache = scala.collection.mutable.HashMap[(Long, Int), Array[Byte]]()
    override def bytes(pos: Long, n: Int): Array[Byte] =
      if (n <= 4096) cache.getOrElseUpdate((pos, n), inner.bytes(pos, n))
      else inner.bytes(pos, n)
  }

  // ---- dataset data --------------------------------------------------
  /** Raw row-major element buffer of a dataset. */
  private[graft] def rawData(h: H5, ds: Ds): Array[Byte] = {
    val elemSize = ds.dt.size
    val totalL = ds.dims.product * elemSize
    require(totalL <= Int.MaxValue - 8,
      s"dataset ${ds.path} too large to buffer ($totalL bytes); " +
        "split it or read a sub-dataset")
    val total = totalL.toInt
    ds.layoutCls match {
      case 0 => ds.compact
      case 1 =>
        if (ds.addr == Undef) new Array[Byte](total)
        else h.bytes(ds.addr, math.min(ds.size, total.toLong).toInt)
      case 2 =>
        val out = new Array[Byte](total)
        val rank = ds.dims.length
        // logical strides (in elements) for row-major placement
        val strides = new Array[Long](rank)
        var s = 1L
        (rank - 1 to 0 by -1).foreach { i => strides(i) = s; s *= ds.dims(i) }
        def walkChunks(addr: Long): Unit = {
          val hd = h.bytes(addr, 24)
          require(new String(hd, 0, 4, "ISO-8859-1") == "TREE", "bad chunk B-tree")
          val level = hd(5) & 0xFF
          val n = u16(hd, 6)
          val keySize = 8 + 8 * ds.chunkDims.length
          val kc = h.bytes(addr + 24, (n + 1) * keySize + n * 8)
          (0 until n).foreach { i =>
            val kOff = i * (keySize + 8)
            val chunkBytes = u32(kc, kOff).toInt
            val mask = u32(kc, kOff + 4).toInt
            val offs = (0 until rank).map(d => u64(kc, kOff + 8 + d * 8))
            val child = u64(kc, kOff + keySize)
            if (level > 0) walkChunks(child)
            else {
              var data = h.bytes(child, chunkBytes)
              // undo the filter pipeline in reverse declared order; bit i
              // of the key's mask marks filter i as SKIPPED for this chunk
              ds.filters.zipWithIndex.reverse.foreach { case (fid, fi) =>
                if ((mask & (1 << fi)) == 0) fid match {
                  case 3 => // fletcher32: trailing 4-byte checksum
                    data = java.util.Arrays.copyOfRange(data, 0, data.length - 4)
                  case 1 =>
                    val inf = new java.util.zip.Inflater()
                    inf.setInput(data)
                    val chunkElems = ds.chunkDims.dropRight(1).map(_.toLong).product
                    val buf = new Array[Byte]((chunkElems * elemSize).toInt)
                    var w = 0
                    var stalled = false
                    while (!inf.finished() && w < buf.length && !stalled) {
                      val n = inf.inflate(buf, w, buf.length - w)
                      // truncated/corrupt chunk: inflate returns 0 and
                      // wants input that doesn't exist — error, don't
                      // spin the task at 100% CPU forever
                      if (n == 0 && inf.needsInput()) stalled = true
                      w += n
                    }
                    inf.end()
                    if (stalled) throw new IllegalStateException(
                      s"truncated deflate chunk in HDF5 dataset (got $w of ${buf.length} bytes)")
                    data = buf
                  case 2 => // shuffle: bytes grouped by significance, restore
                    val n = data.length / elemSize
                    val un = new Array[Byte](data.length)
                    var j = 0
                    while (j < elemSize) {
                      var k = 0
                      while (k < n) {
                        un(k * elemSize + j) = data(j * n + k)
                        k += 1
                      }
                      j += 1
                    }
                    data = un
                  case _ => ()
                }
              }
              // copy chunk rows into the logical buffer (edge-clipped)
              val cDims = ds.chunkDims.dropRight(1) // last = element size
              val rowElems = cDims.last.toLong
              def place(dim: Int, logicalBase: Long, chunkBase: Long): Unit =
                if (dim == rank - 1) {
                  val avail = math.min(rowElems, ds.dims(rank - 1) - offs(rank - 1))
                  if (avail > 0 && logicalBase + offs(rank - 1) >= 0) {
                    val dst = ((logicalBase + offs(rank - 1)) * elemSize).toInt
                    val src = (chunkBase * elemSize).toInt
                    val len = (avail * elemSize).toInt
                    if (dst + len <= out.length && src + len <= data.length)
                      System.arraycopy(data, src, out, dst, len)
                  }
                } else {
                  var j = 0L
                  val lim = math.min(cDims(dim).toLong, ds.dims(dim) - offs(dim))
                  val chunkStride = cDims.drop(dim + 1).map(_.toLong).product
                  while (j < lim) {
                    place(dim + 1,
                      logicalBase + (offs(dim) + j) * strides(dim),
                      chunkBase + j * chunkStride)
                    j += 1
                  }
                }
              place(0, 0L, 0L)
            }
          }
        }
        if (ds.btree != Undef) walkChunks(ds.btree)
        out
    }
  }

  /** Decode one element at flat index i. */
  private def element(h: H5, b: Array[Byte], i: Int, dt: Dtype): Any =
    dt.cls match {
      case 6 =>
        Row.fromSeq(dt.members.map { case (_, off, mt) =>
          decodeScalarTyped(h, b, i * dt.size + off, mt) })
      case _ => decodeScalarTyped(h, b, i * dt.size, dt)
    }

  private def decodeScalarTyped(h: H5, b: Array[Byte], off: Int, dt: Dtype): Any =
    dt.cls match {
      case 0 => (dt.size, dt.signed) match {
        case (1, true) => java.lang.Byte.valueOf(b(off))
        case (1, false) => java.lang.Short.valueOf((b(off) & 0xFF).toShort)
        case (2, true) => java.lang.Short.valueOf(e16(b, off, dt.be).toShort)
        case (2, false) => java.lang.Integer.valueOf(e16(b, off, dt.be) & 0xFFFF)
        case (4, true) => java.lang.Integer.valueOf(e32(b, off, dt.be).toInt)
        case (4, false) =>
          java.lang.Long.valueOf(e32(b, off, dt.be) & 0xFFFFFFFFL)
        case _ => java.lang.Long.valueOf(e64(b, off, dt.be))
      }
      case 1 =>
        if (dt.size == 4) java.lang.Float.valueOf(
          java.lang.Float.intBitsToFloat(e32(b, off, dt.be).toInt))
        else java.lang.Double.valueOf(java.lang.Double.longBitsToDouble(e64(b, off, dt.be)))
      case 4 => java.lang.Boolean.valueOf(b(off) != 0)
      case 3 => new String(b, off, dt.size, "UTF-8").takeWhile(_ != 0)
      case 8 =>
        val raw: Long = dt.size match {
          case 1 => b(off).toLong
          case 2 => e16(b, off, dt.be).toLong
          case _ => e32(b, off, dt.be)
        }
        if (dt.enumBool) java.lang.Boolean.valueOf(raw != 0) else java.lang.Long.valueOf(raw)
      case 9 if dt.vlenStr => readVlenString(h, b, off)
      case other => throw new IllegalStateException(s"unsupported element class $other")
    }

  private def sparkType(dt: Dtype): DataType = dt.cls match {
    // unsigned fixed-point widens to the next signed type (u64 stays
    // LongType: the spec's raw bits, like most readers) — mapping u32
    // to IntegerType wrapped every value >= 2^31 negative
    case 0 => (dt.size, dt.signed) match {
      case (1, true) => ByteType
      case (1, false) => ShortType
      case (2, true) => ShortType
      case (2, false) => IntegerType
      case (4, true) => IntegerType
      case (4, false) => LongType
      case _ => LongType
    }
    case 1 => if (dt.size == 4) FloatType else DoubleType
    case 4 => BooleanType
    case 3 => StringType
    case 8 => if (dt.enumBool) BooleanType else LongType
    case 9 if dt.vlenStr => StringType
    case 6 => StructType(dt.members.map { case (n, _, mt) =>
      StructField(n, sparkType(mt), nullable = true) })
    case other => throw new IllegalStateException(s"unsupported datatype class $other")
  }

  private def javaTypeName(dt: Dtype): String = dt.cls match {
    case 0 => dt.size match {
      case 1 => "byte"; case 2 => "short"; case 4 => "int"; case _ => "long"
    }
    case 1 => if (dt.size == 4) "float" else "double"
    case 2 => "boolean"
    case 3 | 9 => "String"
    case 6 => "compound"
    case 8 => if (dt.enumBool) "boolean" else "enum"
    case _ => "unknown"
  }

  private def colPrefix(dt: Dtype): String = dt.cls match {
    case 0 | 8 => "int_col_"
    case 1 => "float_col_"
    case _ => "string_col_"
  }

  // ---- browse mode ---------------------------------------------------
  val browseSchema: StructType = StructType(Seq(
    StructField("path", StringType), StructField("data_type", StringType),
    StructField("file_name", StringType), StructField("data_size", LongType),
    StructField("element_count", LongType),
    StructField("dataset_data_type", StringType),
    StructField("dimensions", StringType), StructField("is_link", BooleanType),
    StructField("attributes", MapType(StringType, StringType)),
    StructField("int_data", ArrayType(ArrayType(LongType))),
    StructField("double_data", ArrayType(ArrayType(DoubleType))),
    StructField("string_data", ArrayType(StringType))))

  private val PreviewRowLimit = 20  // the reference's preview bounds
  private val PreviewColLimit = 100

  /** The (possibly >2-D flattened) preview matrix, reference shape:
    * >2-D: out(i)(k) = element(leading block k, last-dim position i),
    * bounded by dims(0) rows x dims(1) cols — exactly the reference's
    * flatten-transpose. */
  private def previewMatrix(h: H5, ds: Ds, raw: Array[Byte]): Seq[Seq[Any]] = {
    val dims = ds.dims
    if (dims.length <= 1) {
      val n = math.min(dims.headOption.getOrElse(1L), PreviewRowLimit.toLong).toInt
      Seq((0 until n).map(i => element(h, raw, i, ds.dt)))
    } else if (dims.length == 2) {
      val rows = math.min(dims(0), PreviewRowLimit.toLong).toInt
      val cols = math.min(dims(1), PreviewColLimit.toLong).toInt
      (0 until rows).map(r =>
        (0 until cols).map(c => element(h, raw, (r * dims(1) + c).toInt, ds.dt)))
    } else {
      val last = dims.last
      val rows = math.min(dims(0), PreviewRowLimit.toLong).toInt
      val cols = math.min(dims(1), PreviewColLimit.toLong).toInt
      (0 until rows).map(i =>
        (0 until cols).map(k => element(h, raw, (k * last + i).toInt, ds.dt)))
    }
  }

  private[graft] def browseRows(h: H5, objs: Objects, fileName: String): Seq[Row] = {
    val groupRows = objs.groups.map(g => Row(
      g.path, "GROUP", fileName, null, null, null, null, false,
      if (g.attrs.isEmpty) null else g.attrs, null, null, null))
    val linkRows = objs.links.map(l => Row(
      l.path, "LINK", fileName, null, null, null, null, true,
      Map("target" -> l.target), null, null, null))
    val dsRows = objs.datasets.map { ds =>
      val elemCount = ds.dims.product max 1L
      // browse is a metadata listing with a small preview — buffering a
      // multi-GB dataset for a 20x100 preview (or throwing on >2GB ones)
      // defeated the "never the whole file" posture; oversized datasets
      // list with metadata only and an empty preview
      val previewable = elemCount * ds.dt.size <= (64L << 20)
      val m = if (previewable) previewMatrix(h, ds, rawData(h, ds))
              else Seq.empty[Seq[Any]]
      val (ints, dbls, strs) = ds.dt.cls match {
        case 0 | 8 =>
          (m.map(_.map {
            case b: java.lang.Byte => b.longValue
            case s: java.lang.Short => s.longValue
            case i: java.lang.Integer => i.longValue
            case l: java.lang.Long => l.longValue
            case b: java.lang.Boolean => if (b) 1L else 0L
            case _ => 0L
          }), null, null)
        case 1 =>
          (null, m.map(_.map {
            case f: java.lang.Float => f.doubleValue
            case d: java.lang.Double => d.doubleValue
            case _ => 0.0
          }), null)
        case 3 | 9 => (null, null, m.flatten.map(_.toString))
        case _ => (null, null, null) // compound preview via projection mode
      }
      Row(ds.path, "DATASET", fileName, elemCount * ds.dt.size, elemCount,
        javaTypeName(ds.dt), ds.dims.mkString("[", ", ", "]"), false,
        if (ds.attrs.isEmpty) null else ds.attrs, ints, dbls, strs)
    }
    groupRows ++ linkRows ++ dsRows
  }

  // ---- projection mode -----------------------------------------------
  private[graft] def projectSchema(ds: Ds): StructType = {
    val leaf = ds.path.substring(ds.path.lastIndexOf('/') + 1)
    if (ds.dt.cls == 6)
      StructType(ds.dt.members.map { case (n, _, mt) =>
        StructField(n.replaceAll("[^A-Za-z0-9_]", "_"), sparkType(mt), nullable = true) })
    else if (ds.dims.length <= 1)
      StructType(Seq(StructField(leaf, sparkType(ds.dt), nullable = true)))
    else {
      val cols = ds.dims(1).toInt
      val prefix = colPrefix(ds.dt)
      StructType((0 until cols).map(k =>
        StructField(s"$prefix$k", sparkType(ds.dt), nullable = true)))
    }
  }

  private[graft] def projectRows(h: H5, ds: Ds): Seq[Row] = {
    val raw = rawData(h, ds)
    if (ds.dt.cls == 6) {
      val n = ds.dims.headOption.getOrElse(1L).toInt
      (0 until n).map(i => element(h, raw, i, ds.dt).asInstanceOf[Row])
    } else if (ds.dims.length <= 1) {
      val n = ds.dims.headOption.getOrElse(1L).toInt
      (0 until n).map(i => Row(element(h, raw, i, ds.dt)))
    } else if (ds.dims.length == 2) {
      val rows = ds.dims(0).toInt
      val cols = ds.dims(1).toInt
      (0 until rows).map(r => Row.fromSeq(
        (0 until cols).map(c => element(h, raw, r * cols + c, ds.dt))))
    } else {
      // reference >2-D flatten: row i, col k = (leading block k, last-dim i)
      val last = ds.dims.last
      val rows = ds.dims(0).toInt
      val cols = ds.dims(1).toInt
      (0 until rows).map(i => Row.fromSeq(
        (0 until cols).map(k => element(h, raw, (k * last + i).toInt, ds.dt))))
    }
  }

  // ---- public API ----------------------------------------------------
  private def withFile[A](spark: SparkSession, file: String)(f: (H5, String) => A): A = {
    val fp = new Path(file)
    val in = fp.getFileSystem(spark.sparkContext.hadoopConfiguration).open(fp)
    try f(new H5(in), fp.getName) finally in.close()
  }

  /** Browse mode: one row per group/dataset/link across all matched files. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(browseSchema)
    // session Hadoop conf rides to executors — a bare Configuration()
    // drops fs credentials/endpoints (s3a etc.), the XlsxReader fix
    val sconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    FileList.asDataset(spark, path, Set(".h5", ".hdf5"))
      .mapPartitions { files =>
        val conf = sconf.value
        files.flatMap { f =>
          val fp = new Path(f)
          val in = fp.getFileSystem(conf).open(fp)
          // browseRows materializes EAGERLY, so close per file: a
          // task-completion close left one open handle per processed
          // file and large partitions exhausted the executor fd limit
          try {
            val h = new H5(in)
            browseRows(h, scan(h), fp.getName).iterator
          } finally { try in.close() catch {
            case _: java.io.IOException => () } }
        }
      }(enc).toDF(browseSchema.fieldNames.toSeq: _*)
  }

  /** Projection mode (the reference's `defaultPath`): one dataset as rows. */
  def readDataset(spark: SparkSession, path: String, datasetPath: String): DataFrame = {
    val files = FileList.resolve(spark, path, Set(".h5", ".hdf5"))
    val schema = withFile(spark, files.head) { (h, _) =>
      val objs = scan(h)
      val ds = objs.datasets.find(_.path == datasetPath).getOrElse(
        throw new IllegalArgumentException(
          s"dataset $datasetPath not found (have: ${objs.datasets.map(_.path).mkString(", ")})"))
      projectSchema(ds)
    }
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val sconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    FileList.asDataset(spark, files) // reuse the schema pass's listing
      .mapPartitions { files =>
        val conf = sconf.value
        files.flatMap { f =>
          val fp = new Path(f)
          val in = fp.getFileSystem(conf).open(fp)
          // projectRows materializes eagerly too — close per file (the
          // fd-limit rationale above)
          try {
          val h = new H5(in)
          val objs = scan(h)
          objs.datasets.find(_.path == datasetPath).map { ds =>
            // schema-on-read degrade like the SPSS/SAS/Access readers:
            // a file whose dataset differs in column count/order/type
            // aligns BY NAME (missing null-fill, extra drop) instead of
            // crashing the encoder on an arity mismatch
            SchemaAlign.align(projectRows(h, ds).iterator,
              SchemaAlign.plan(schema, projectSchema(ds)))
          }.getOrElse(Iterator.empty)
          } finally { try in.close() catch {
            case _: java.io.IOException => () } }
        }
      }(enc).toDF(schema.fieldNames.toSeq: _*)
  }
}
