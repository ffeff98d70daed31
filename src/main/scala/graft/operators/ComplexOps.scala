package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Drill's complex-data and shape-changing operators on DataFrames.
  * Reference: exec/.../physical/impl/{flatten,unnest,unpivot}, and
  * expr/fn/impl/Mappify.java (kvgen).
  */
object ComplexOps {

  /** FLATTEN(array) — one output row per element (Drill flatten/). */
  def flatten(df: DataFrame, arrayCol: String, as: String): DataFrame =
    df.withColumn(as, explode(col(arrayCol))).drop(arrayCol)

  /** FLATTEN preserving rows with empty/null arrays (explode_outer). */
  def flattenOuter(df: DataFrame, arrayCol: String, as: String): DataFrame =
    df.withColumn(as, explode_outer(col(arrayCol))).drop(arrayCol)

  /** KVGEN(map) — map column into repeated {key, value} rows. */
  def kvgen(df: DataFrame, mapCol: String): DataFrame =
    df.select(df.columns.filter(_ != mapCol).map(col) :+
      explode(col(mapCol)): _*) // yields `key`, `value`

  /** UNPIVOT: wide columns → (name, value) long form (Drill unpivot/). */
  def unpivot(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
              nameAs: String = "col_name", valueAs: String = "col_value"): DataFrame = {
    val entries = valueCols.map(c => struct(lit(c).as(nameAs), col(c).cast("double").as(valueAs)))
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

  /** Per-group TopN (Drill window + filter idiom). */
  def topNPerGroup(df: DataFrame, n: Int, partitionBy: Seq[String],
                   orderBy: Column*): DataFrame = {
    val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n).drop("rn")
  }

  /** Range-partition + sort-within-partition (Drill rangepartitioner/ +
    * orderedpartitioner/): the distributed total-sort primitive. */
  def rangePartitionSort(df: DataFrame, partitions: Int, by: Column*): DataFrame =
    df.repartitionByRange(partitions, by: _*).sortWithinPartitions(by: _*)

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
