package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ComplexOps

class ComplexOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("globalRowNumber equals a global window row_number") {
    val cust = GraftSession.table(spark, SF, "customer")
      .select("c_custkey", "c_acctbal")
    val twoPhase = ComplexOps.globalRowNumber(cust, 8, col("c_acctbal"),
        descending = true, "pos", col("c_custkey"))
      .select("c_custkey", "pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = cust.select(col("c_custkey"),
        row_number().over(Window.orderBy(col("c_acctbal").desc, col("c_custkey"))).as("pos"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(twoPhase == naive)
  }

  test("globalRowNumber plan partitions the big table by bucket, not one task") {
    val cust = GraftSession.table(spark, SF, "customer")
      .select("c_custkey", "c_acctbal")
    val plan = ComplexOps.globalRowNumber(cust, 8, col("c_acctbal"),
      descending = false, "rn").queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(_bkt"),
      "expected the numbering window to shuffle on the bucket key")
  }

  test("ntileFromRowNumber matches the ntile window function") {
    import spark.implicits._
    for (total <- Seq(7, 8, 1500)) {
      val df = (1 to total).map(_.toLong).toDF("rn")
      val closed = df.select(col("rn"),
          ComplexOps.ntileFromRowNumber(col("rn"), 4, lit(total)).as("nt"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val naive = df.select(col("rn"),
          ntile(4).over(Window.orderBy("rn")).as("nt"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(closed == naive, s"total=$total")
    }
  }

  test("rangePartitionSort: partitions ordered and sorted within (SURVEY row 37)") {
    val orders = GraftSession.table(spark, SF, "orders")
      .select("o_orderkey", "o_totalprice")
    val parted = ComplexOps.rangePartitionSort(orders, 4, col("o_orderkey"))
      .withColumn("pid", spark_partition_id())
    // sorted within each partition
    val w = Window.partitionBy("pid").orderBy(lit(1)) // physical row order check below
    val violations = parted
      .withColumn("prev", lag("o_orderkey", 1).over(
        Window.partitionBy("pid").orderBy(monotonically_increasing_id())))
      .filter(col("prev") > col("o_orderkey")).count()
    assert(violations == 0)
    // partition key ranges must not overlap
    val ranges = parted.groupBy("pid")
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .orderBy("pid").collect()
    val sorted = ranges.sortBy(_.getAs[Long]("lo"))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"))
      case _ =>
    }
  }

  test("q_sort gate avoids a whole-table single-partition exchange") {
    val plan = QueriesRelational.queries("q_sort")(spark, SF)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(_bkt"),
      "two-phase numbering structure missing from q_sort")
  }

  test("saltedJoin equals the plain join and spreads the hot key") {
    import spark.implicits._
    // skewed left: one hot key with 1000 rows
    val left = ((1 to 1000).map(i => (42L, i)) ++ (1 to 50).map(i => (i.toLong, i)))
      .toDF("k", "v")
    val right = (1 to 60).map(i => (i.toLong, s"r$i")).toDF("rk", "name")
      .union(Seq((42L, "hot")).toDF("rk", "name")).distinct()
    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    val salted = ComplexOps.saltedJoin(left, right, col("k"), col("rk"), buckets = 4)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.count(_.head == 42L) >= 1000)
  }

  test("saltedJoin survives MapType columns and can spread exact duplicates") {
    import spark.implicits._
    // a map column used to fail xxhash64 analysis outright
    val left = ((1 to 200).map(_ => (42L, "dup")) ++ Seq((7L, "x")))
      .toDF("k", "v")
      .withColumn("m", map(col("v"), col("k")))
    val right = Seq((42L, "hot"), (7L, "seven")).toDF("rk", "name")
    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    val salted = ComplexOps.saltedJoin(left, right, col("k"), col("rk"), buckets = 4)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    // spreadDuplicates: identical rows stop collapsing into one bucket,
    // and (identical rows being interchangeable) the result multiset is
    // unchanged
    val spread = ComplexOps.saltedJoin(left, right, col("k"), col("rk"),
        buckets = 4, spreadDuplicates = true)
      .select("k", "v", "name")
    assert(spread.count() === 201L)
    assert(spread.collect().map(_.toSeq).toSet == plain)
  }

  test("flatten in place, topNPerGroup user 'rn' column, NaN row numbering") {
    import spark.implicits._
    // in-place flatten (as == arrayCol) must keep the result column
    val arrDf = Seq((1L, Seq("x", "y"))).toDF("id", "tags")
    val flat = ComplexOps.flatten(arrDf, "tags", "tags")
    assert(flat.columns.toSeq == Seq("id", "tags"))
    assert(flat.as[(Long, String)].collect().toSet == Set((1L, "x"), (1L, "y")))
    // a pre-existing user column named rn survives topNPerGroup
    val rnDf = Seq((1L, "g", 99L), (2L, "g", 98L)).toDF("id", "grp", "rn")
    val top = ComplexOps.topNPerGroup(rnDf, 1, Seq("grp"), col("id"))
    assert(top.columns.contains("rn"))
    assert(top.select("rn").as[Long].collect().toSeq == Seq(99L))
    // NaN keys: sorted greatest => numbered LAST under asc, FIRST desc
    val nanDf = Seq((1L, 1.0), (2L, Double.NaN), (3L, 5.0), (4L, 2.0))
      .toDF("id", "v")
    val asc = ComplexOps.globalRowNumber(nanDf, 2, col("v"),
        descending = false, "rk", col("id"))
      .select("id", "rk").as[(Long, Long)].collect().toMap
    assert(asc(2L) == 4L, s"NaN must number last asc: $asc")
    assert(asc(1L) == 1L && asc(4L) == 2L && asc(3L) == 3L)
    val desc = ComplexOps.globalRowNumber(nanDf, 2, col("v"),
        descending = true, "rk", col("id"))
      .select("id", "rk").as[(Long, Long)].collect().toMap
    assert(desc(2L) == 1L, s"NaN must number first desc: $desc")
    assert(desc(3L) == 2L && desc(4L) == 3L && desc(1L) == 4L)
  }

  test("topN plans as TakeOrderedAndProject (no global sort)") {
    val plan = ComplexOps.topN(
        GraftSession.table(spark, SF, "orders"), 5, col("o_totalprice").desc)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
