package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-column data-skipping
  * layout for 100 TB scans. A table range-sorted on one column skips
  * files only for predicates on THAT column; interleaving the bits of
  * k rank-quantized columns makes file-level min/max ranges tight on
  * EVERY participating column at once, so a filter on any of them
  * prunes most files from the parquet footer stats alone (the recipe
  * popularized by Delta's `OPTIMIZE ... ZORDER BY`; Drill's parquet
  * metadata pruning — ref exec/.../store/parquet/ParquetGroupScan.java
  * rowgroup filtering — is the read side that such a layout feeds).
  *
  * Scale shape: one aggregation pass computes per-column equi-depth
  * boundaries (`percentile_approx`, 2^bits buckets — KBs, broadcast as
  * literals), then bucket ids come from a codegen'd higher-order
  * `aggregate` over the boundary array (no join, no window, no
  * shuffle), and the single shuffle is the `repartitionByRange` on the
  * z-value that the rewrite needs anyway. Nothing driver-side scales
  * with row count.
  */
object ZOrder {

  /** Order-preserving numeric key for a zorder column. Numerics,
    * dates and timestamps cast straight to double; STRINGS rank by
    * their first 7 bytes folded big-endian into a long (the same
    * truncated-binary ordering Delta's zorder uses for strings) —
    * ANSI-safe, no cast errors. Unsupported types error up front. */
  private def sortKey(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case _: NumericType | BooleanType =>
        col(c).cast("double")
      // DATE / NTZ cannot cast("double") (AnalysisException under
      // Spark 4's ANSI rules) — go through their integer epoch forms
      case DateType => unix_date(col(c)).cast("double")
      case TimestampType => unix_micros(col(c)).cast("double")
      case TimestampNTZType =>
        unix_micros(col(c).cast(TimestampType)).cast("double")
      case StringType =>
        // first 6 UTF-8 BYTES folded big-endian (Delta's truncated-binary
        // string ordering): the old per-CHAR fold clamped every
        // codepoint > 255 to 255, so all non-Latin-1 strings collapsed
        // onto one key and the column contributed ZERO z-order
        // discrimination. Short strings zero-pad on the right
        // (left-aligned), preserving lexicographic byte order. SIX
        // bytes, not seven: the sort key casts to double for the shared
        // boundaries() machinery, and a 56-bit fold exceeded the 53-bit
        // mantissa — strings differing only in the 7th byte's low bits
        // collapsed onto one key, losing exactly the discrimination the
        // per-char fix bought. 48 bits is double-exact. NULL keeps the
        // bucket-0 routing in bucketId (null key, not a max key).
        when(col(c).isNull, lit(null).cast("double")).otherwise(
          org.apache.spark.sql.functions.conv(
            org.apache.spark.sql.functions.hex(
              substring(
                org.apache.spark.sql.functions.concat(
                  org.apache.spark.sql.functions.encode(col(c), "UTF-8"),
                  lit(Array.fill[Byte](6)(0))),
                1, 6)),
            16, 10).cast("double"))
      case t => throw new IllegalArgumentException(
        s"zorder: column '$c' has unsupported type ${t.simpleString} " +
          "(numeric, string, date, timestamp supported)")
    }
  }

  /** Per-column equi-depth bucket boundaries (ascending, 2^bits - 1
    * interior cuts). Null-safe: nulls sort into bucket 0 (an all-null
    * or empty input yields zero cuts — everything buckets to 0).
    * Public so a long-lived table can compute cuts ONCE and pass them
    * to every incremental [[withZValue]]/[[layout]] call — buckets
    * then stay stable across daily writes instead of drifting with
    * each batch's distribution. */
  def boundaries(df: DataFrame, cols: Seq[String], bits: Int = 8)
      : Map[String, Array[Double]] = {
    val buckets = 1 << bits
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val aggs = cols.map(c => percentile_approx(sortKey(df, c),
      typedLit(probs), lit(10000)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    cols.map { c =>
      val arr = Option(row.get(row.fieldIndex(c)))
        .map(_.asInstanceOf[scala.collection.Seq[Any]]
          .map(v => Option(v).fold(Double.NaN)(_.toString.toDouble)).toArray)
        .getOrElse(Array.empty[Double])
      c -> arr
    }.toMap
  }

  /** Bucket id (0 .. 2^bits-1) of key `k` against sorted `cuts`: the
    * count of boundaries strictly below the value (cuts are attained
    * key values — p-quantiles — so `<` keeps the minimum in bucket 0),
    * via one codegen'd HOF pass over the literal array. Null keys land
    * in bucket 0; NaN cuts (all-null column) drop out. */
  private def bucketId(k: Column, cuts: Array[Double]): Column = {
    val arr = typedLit(cuts.filterNot(_.isNaN).toSeq)
    when(k.isNull, lit(0L)).otherwise(
      aggregate(arr, lit(0L),
        (acc, b) => acc + when(k > b, 1L).otherwise(0L)))
  }

  /** The interleaved z-value of `bucketIds` (dimension-major bit
    * interleave, most significant bits first): bit i of dimension d
    * lands at position i * k + d of the result. Static expression tree
    * of bits*k bitwise terms — whole-stage codegen keeps it in one
    * projection. */
  private def interleave(bucketIds: Seq[Column], bits: Int): Column = {
    val k = bucketIds.size
    val terms = for {
      i <- 0 until bits // bit index within a dimension
      (b, d) <- bucketIds.zipWithIndex
    } yield shiftleft(shiftright(b, i).bitwiseAND(1L), i * k + d)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Append a `zval` column interleaving `cols` (each rank-quantized to
    * `bits` bits against equi-depth boundaries — computed from `df`
    * unless stable `cuts` are supplied). */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 8,
                 as: String = "zval",
                 cuts: Map[String, Array[Double]] = Map.empty): DataFrame = {
    require(cols.nonEmpty, "zorder: at least one column")
    require(cols.size * bits <= 63,
      s"zorder: ${cols.size} cols x $bits bits exceeds a long")
    // refuse, never silently REPLACE: withColumn(as, ...) would clobber
    // a real user column of the same name and layout() would then drop
    // it from the rewritten table
    require(!df.columns.contains(as),
      s"zorder: input already has a column named '$as' — pass a " +
        "different `as` name")
    val cut = if (cuts.nonEmpty) cuts else boundaries(df, cols, bits)
    // caller-supplied cuts must fit `bits`: boundaries computed at a
    // HIGHER bits yield bucket ids whose high bits interleave() would
    // silently discard — a non-monotone encoding that scrambles the
    // clustering with no error; a missing column gets a clear message
    cols.foreach { c =>
      require(cut.contains(c), s"zorder: no cuts supplied for column '$c'")
      require(cut(c).length < (1 << bits),
        s"zorder: ${cut(c).length} cuts for '$c' exceed $bits bits " +
          s"(max ${(1 << bits) - 1}) — recompute boundaries at this bits")
    }
    df.withColumn(as,
      interleave(cols.map(c => bucketId(sortKey(df, c), cut(c))), bits))
  }

  /** Rewrite `df` into `files` z-clustered output partitions: range
    * partition + sort within on the z-value, value column dropped.
    * Writing the result yields files whose min/max footer ranges are
    * tight on every `cols` member — the layout data-skipping wants. */
  def layout(df: DataFrame, cols: Seq[String], files: Int,
             bits: Int = 8,
             cuts: Map[String, Array[Double]] = Map.empty): DataFrame = {
    // collision-safe internal name: a table with a real "zval" column
    // must z-order fine (withZValue refuses collisions on its PUBLIC
    // output name; here the column is plumbing we drop ourselves)
    val zc = "__g_zval"
    val z = withZValue(df, cols, bits, as = zc, cuts = cuts)
    z.repartitionByRange(files, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }
}
