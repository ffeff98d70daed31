package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}

/** External-system federation — Drill's storage-plugin story (reference:
  * contrib/storage-jdbc/.../JdbcStoragePlugin.java) over Spark's built-in
  * connectors. The JDBC path is exercised in ScalaTest against embedded
  * Derby (the only database shipped in this container); predicate pushdown
  * and partitioned parallel reads come from Spark's JDBC source.
  *
  * (Kafka/Mongo/HTTP plugins have no connector jars in this zero-egress
  * container, so they are intentionally NOT wrapped here — wrapping
  * untestable code would be claim inflation.)
  */
object Federation {

  def jdbcProps(user: String = "graft", password: String = ""): Properties = {
    val p = new Properties()
    p.setProperty("user", user)
    if (password.nonEmpty) p.setProperty("password", password)
    p
  }

  /** Read a whole table over JDBC. */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Partitioned parallel JDBC read — each Spark task issues its own
    * bounded query (Drill parallelizes the same way via fragment minor
    * IDs). Required posture for any JDBC table big enough to matter. */
  def jdbcPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long,
                      upperBound: Long, numPartitions: Int,
                      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props)

  /** Write a DataFrame out as a JDBC table (Drill CTAS into a plugin). */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: Properties = new Properties()): Unit =
    df.write.mode("overwrite").jdbc(url, table, props)
}
