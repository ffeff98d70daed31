package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (scalatest runs suites in
  * one forked JVM; getOrCreate dedupes). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val SF = "/root/testdata/sf0.001"
  val Fixtures = "/root/repo/testfiles"
}
