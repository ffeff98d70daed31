package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Drill's complex-data and shape-changing operators on DataFrames.
  * Reference: exec/.../physical/impl/{flatten,unnest,unpivot}, and
  * expr/fn/impl/Mappify.java (kvgen).
  */
object ComplexOps {

  /** FLATTEN(array) — one output row per element (Drill flatten/).
    * `as == arrayCol` (the natural in-place flatten) is supported: the
    * naive withColumn-then-drop deleted the just-computed result. */
  def flatten(df: DataFrame, arrayCol: String, as: String): DataFrame =
    if (as == arrayCol) df.withColumn(as, explode(col(arrayCol)))
    else df.withColumn(as, explode(col(arrayCol))).drop(arrayCol)

  /** FLATTEN preserving rows with empty/null arrays (explode_outer). */
  def flattenOuter(df: DataFrame, arrayCol: String, as: String): DataFrame =
    if (as == arrayCol) df.withColumn(as, explode_outer(col(arrayCol)))
    else df.withColumn(as, explode_outer(col(arrayCol))).drop(arrayCol)

  /** KVGEN(map) — map column into repeated {key, value} rows. */
  def kvgen(df: DataFrame, mapCol: String): DataFrame =
    df.select(df.columns.filter(_ != mapCol).map(col) :+
      explode(col(mapCol)): _*) // yields `key`, `value`

  /** UNPIVOT: wide columns → (name, value) long form (Drill unpivot/).
    * Values unify to double when every value column is numeric, else to
    * string — a blanket double cast silently nulled every value of a
    * string column. */
  def unpivot(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
              nameAs: String = "col_name", valueAs: String = "col_value"): DataFrame = {
    val allNumeric = valueCols.forall(c => df.schema(c).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType])
    val target = if (allNumeric) "double" else "string"
    val entries = valueCols.map(c => struct(lit(c).as(nameAs), col(c).cast(target).as(valueAs)))
    df.select(idCols.map(col) :+ explode(array(entries: _*)).as("kv"): _*)
      .select(idCols.map(col) :+ col(s"kv.$nameAs") :+ col(s"kv.$valueAs"): _*)
  }

  /** PIVOT via conditional aggregation (Drill expresses this with CASE). */
  def pivotAgg(df: DataFrame, groupCol: String, pivotCol: String,
               valueCol: String, pivotValues: Seq[String]): DataFrame =
    df.groupBy(col(groupCol))
      .pivot(pivotCol, pivotValues)
      .sum(valueCol)

  /** TopN: total-order limit without a global sort of every partition —
    * Spark's TakeOrderedAndProject kicks in for sort+limit. */
  def topN(df: DataFrame, n: Int, orderBy: Column*): DataFrame =
    df.orderBy(orderBy: _*).limit(n)

  /** Per-group TopN (Drill window + filter idiom). Working column uses a
    * collision-resistant name — a user column literally named "rn" was
    * silently clobbered and dropped. */
  def topNPerGroup(df: DataFrame, n: Int, partitionBy: Seq[String],
                   orderBy: Column*): DataFrame = {
    val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("_rn_topn", row_number().over(w))
      .filter(col("_rn_topn") <= n).drop("_rn_topn")
  }

  /** Range-partition + sort-within-partition (Drill rangepartitioner/ +
    * orderedpartitioner/): the distributed total-sort primitive. */
  def rangePartitionSort(df: DataFrame, partitions: Int, by: Column*): DataFrame =
    df.repartitionByRange(partitions, by: _*).sortWithinPartitions(by: _*)

  /** Two-phase global row numbering — the scalable replacement for
    * `Window.orderBy(...)` with no partitioning, which moves the WHOLE
    * table through one task. Phase 1: deterministic range bucketing on the
    * leading numeric sort key from its min/max bounds (the role of Drill's
    * rangepartitioner/ fed by statistics/); phase 2: per-bucket
    * row_number plus the cumulative count of earlier buckets. Only the
    * #buckets-row stats relation passes through a single-partition
    * exchange; the big table shuffles once, hash-balanced on bucket.
    * Deterministic bucketing (not repartitionByRange) matters: the bucket
    * id is recomputed identically on both the counts branch and the
    * numbering branch, with no reliance on sampled partition boundaries.
    * Assumes the leading key is not pathologically skewed; a production
    * variant swaps in quantile-sketch bounds for the bucket edges. */
  def globalRowNumber(df: DataFrame, buckets: Int, key: Column,
                      descending: Boolean, asCol: String,
                      tieBreak: Column*): DataFrame = {
    val k0 = key.cast("double")
    val k = if (descending) -k0 else k0
    // NaN keys: Spark orders NaN GREATEST (last under asc, first under
    // desc) but NaN arithmetic poisons both the bounds and the bucket
    // formula — exclude NaN from bounds and route it to the bucket its
    // ORDER position demands, or global numbering silently interleaves
    val kb = when(isnan(k), lit(null)).otherwise(k)
    val bounds = df.agg(min(kb).as("_lo"), max(kb).as("_hi"))
    // null keys bucket where the ORDER puts them (Spark: nulls first
    // asc, last desc) — least() silently skipped the null and dumped
    // them in the last bucket, breaking global order for asc sorts
    val nullBucket = if (descending) buckets - 1 else 0
    val nanBucket = if (descending) 0 else buckets - 1
    val withB = df.crossJoin(broadcast(bounds))
      .withColumn("_bkt", when(k.isNull, lit(nullBucket))
        .when(isnan(k), lit(nanBucket))
        .otherwise(least(
          floor((k - col("_lo")) / (col("_hi") - col("_lo") + lit(1e-9)) * buckets),
          lit(buckets - 1))).cast("int"))
      .drop("_lo", "_hi")
      // lazy localCheckpoint: counts AND numbering read the same
      // materialized bucketing — without it the source scanned three
      // times (bounds, counts, numbering), and a nondeterministic
      // upstream could bucket on different rows than it numbered
      .localCheckpoint(false)
    val counts = withB.groupBy("_bkt").agg(count(lit(1)).as("_cnt"))
    val offsets = counts.withColumn("_off",
        coalesce(sum("_cnt").over(Window.orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_bkt", "_off")
    val order = (if (descending) key.desc else key.asc) +: tieBreak.map(_.asc)
    val w = Window.partitionBy("_bkt").orderBy(order: _*)
    withB.join(broadcast(offsets), "_bkt")
      .withColumn(asCol, (row_number().over(w) + col("_off")).cast("long"))
      .drop("_bkt", "_off")
  }

  /** Closed-form ntile from a (1-based) global row number and total count —
    * lets quantile assignment ride the two-phase numbering instead of a
    * single-partition window. */
  def ntileFromRowNumber(rn: Column, n: Int, total: Column): Column = {
    val baseL = floor(total.cast("double") / n).cast("long")
    val rem = total.cast("long") - baseL * n
    val boundary = rem * (baseL + 1)
    when(rn <= boundary, floor((rn - 1) / (baseL + 1)) + 1)
      .otherwise(rem + floor((rn - boundary - 1) / baseL) + 1)
      .cast("int")
  }

  /** Skew-salted equi-join — the manual form of AQE's skew handling for
    * when a handful of hot keys would pin one reducer (Drill handles this
    * with its hash-partitioning exchange fan-out). The (typically bigger,
    * skewed) left side gets a deterministic salt in [0, buckets); the
    * right side replicates each row to every salt bucket, so the hot key's
    * rows spread over `buckets` reducers. Result is identical to the plain
    * join; the salt never escapes. */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: Column, rightKey: Column,
                 buckets: Int = 8,
                 joinType: String = "inner",
                 spreadDuplicates: Boolean = false): DataFrame = {
    // right/full outer would emit `buckets` null-extended copies of every
    // unmatched right row (it was replicated before the join) — refuse
    // rather than silently multiply
    require(Set("inner", "left", "leftouter")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only (got $joinType): the " +
        "replicated right side would duplicate unmatched right rows")
    // salt must be DETERMINISTIC under task retry (a recomputed map task
    // must route each row to the same reducer — the SPARK-23207 class of
    // bug), yet still spread a hot key's rows: hash the row's HASHABLE
    // columns (xxhash64 refuses MapType — skip those, never fail
    // analysis), not a row id and not just the key. Known degradation:
    // EXACT-duplicate rows share a salt and collapse to one bucket; set
    // `spreadDuplicates` to mix in a partition-local row index — only
    // safe when the left plan reads a deterministic source directly
    // (file scans: row order within a split is file order, so a retried
    // task recomputes the same salts), NOT downstream of a shuffle.
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val hashable = left.schema.fields.filterNot(f => hasMap(f.dataType)).map(f => col(f.name))
    // all-map left side: hashing the KEY would make the salt a pure
    // function of the key — the hot key collapses to one bucket and the
    // "mitigation" silently no-ops while still paying the right-side
    // replication (and a map-typed key even fails analysis). spark_
    // partition_id is deterministic under retry (same split, same id)
    // and spreads a hot key across its source partitions.
    val contentHash =
      if (hashable.nonEmpty) xxhash64(struct(hashable.toSeq: _*))
      else spark_partition_id().cast("long")
    val saltBase =
      if (spreadDuplicates) contentHash + monotonically_increasing_id()
      else contentHash
    val l = left.withColumn("_salt_l", pmod(saltBase, lit(buckets)).cast("int"))
    val r = right.withColumn("_salt_r",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, leftKey === rightKey && col("_salt_l") === col("_salt_r"), joinType)
      .drop("_salt_l", "_salt_r")
  }

  /** ANALYZE-style column statistics (Drill statistics/): one row per
    * numeric column with ndv/nulls/min/max/avg — map-combinable, one pass. */
  def tableStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).cast("long").as(s"${c}_count"),
        count_distinct(col(c)).as(s"${c}_ndv"),
        round(min(col(c)).cast("double"), 6).as(s"${c}_min"),
        round(max(col(c)).cast("double"), 6).as(s"${c}_max"),
        round(avg(col(c)), 6).as(s"${c}_avg"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
