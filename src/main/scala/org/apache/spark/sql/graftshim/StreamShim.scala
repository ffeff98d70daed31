package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.SparkSession

/** The one `private[sql]` bridge a v1 streaming Source needs:
  * MicroBatchExecution asserts the DataFrame returned by getBatch has
  * isStreaming=true, and the only way to mint one is
  * SparkSession.internalCreateDataFrame — the same shim delta-spark's
  * DeltaSource uses (io.delta ships classes under org.apache.spark.sql
  * for exactly this access). Nothing else reaches into spark internals.
  */
object StreamShim {
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
