package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DeltaLogReader, DeltaLogWriter, IcebergTable,
  PaimonTable}

/** `INSERT INTO dfs...` routed to each target's native append commit
  * (DmlSql.insert). */
class InsertSqlSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): String = {
    val base = s"/tmp/graft_test/ins_$name"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    base
  }

  private def withWs[A](body: => A): A = {
    spark.conf.set("graft.dfs.workspace.ins", "/tmp/graft_test")
    try body finally spark.conf.unset("graft.dfs.workspace.ins")
  }

  test("INSERT INTO a delta table: VALUES, column list, null back-fill") {
    import spark.implicits._
    val base = freshDir("delta")
    DeltaLogWriter.write(Seq((1L, "a", 10.0)).toDF("k", "v", "w"), base)
    withWs {
      val r = spark.sql(
        "INSERT INTO dfs.ins.`ins_delta` VALUES (2, 'b', 20.0), (3, 'c', 30.0)")
        .collect()(0)
      assert(r.getString(1).contains("2 rows inserted") &&
        r.getString(1).contains("delta v"))
      // column list: unlisted w inserts NULL, values cast (int -> bigint)
      val r2 = spark.sql(
        "INSERT INTO dfs.ins.`ins_delta` (v, k) SELECT 'd', 4").collect()(0)
      assert(r2.getString(1).contains("1 rows inserted"))
      val got = DeltaLogReader.read(spark, base).collect()
        .map(x => (x.getLong(0), x.getString(1),
          Option(x.get(2)).map(_.asInstanceOf[Double]))).toSet
      assert(got == Set((1L, "a", Some(10.0)), (2L, "b", Some(20.0)),
        (3L, "c", Some(30.0)), (4L, "d", None)))
      // time travel: the pre-insert version still has one row
      assert(DeltaLogReader.read(spark, base, Some(0L)).count() == 1)
    }
  }

  test("INSERT INTO iceberg and paimon tables commit native snapshots") {
    import spark.implicits._
    val ice = freshDir("ice")
    IcebergTable.write(Seq((1L, "a")).toDF("k", "v"), ice)
    val pk = freshDir("pk")
    PaimonTable.writePk(Seq((1L, "old"), (2L, "b")).toDF("k", "v"), pk,
      Seq("k"))
    withWs {
      val r = spark.sql(
        "INSERT INTO dfs.ins.`ins_ice` SELECT 2, 'b'").collect()(0)
      assert(r.getString(1).contains("iceberg snapshot"))
      assert(IcebergTable.read(spark, ice).collect()
        .map(_.getLong(0)).toSet == Set(1L, 2L))

      // a PK paimon table upserts: k=1 replaced, k=3 added
      val r2 = spark.sql(
        "INSERT INTO dfs.ins.`ins_pk` VALUES (1, 'new'), (3, 'c')")
        .collect()(0)
      assert(r2.getString(1).contains("paimon snapshot"))
      val got = PaimonTable.read(spark, pk).collect()
        .map(x => (x.getLong(0), x.getString(1))).toSet
      assert(got == Set(1L -> "new", 2L -> "b", 3L -> "c"))
    }
  }

  test("INSERT OVERWRITE replaces table contents in one commit") {
    import spark.implicits._
    val base = freshDir("ovw")
    DeltaLogWriter.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), base)
    withWs {
      val r = spark.sql(
        "INSERT OVERWRITE dfs.ins.`ins_ovw` VALUES (9, 'z')").collect()(0)
      assert(r.getString(1).contains("1 rows inserted"))
      assert(DeltaLogReader.read(spark, base).collect()
        .map(_.getLong(0)).toSet == Set(9L))
      // the pre-overwrite version still time-travels
      assert(DeltaLogReader.read(spark, base, Some(0L)).count() == 2)
      // paimon PK targets refuse overwrite with a clear error
      val pk = freshDir("ovwpk")
      PaimonTable.writePk(Seq((1L, "a")).toDF("k", "v"), pk, Seq("k"))
      val e = intercept[Exception] {
        spark.sql("INSERT OVERWRITE dfs.ins.`ins_ovwpk` VALUES (2, 'b')")
      }
      assert(e.getMessage.contains("not supported"))
    }
  }

  test("INSERT INTO a plain parquet dir appends files; errors are clear") {
    import spark.implicits._
    val base = freshDir("plain")
    Seq((1, "a")).toDF("k", "v").write.parquet(base)
    withWs {
      val r = spark.sql(
        "INSERT INTO dfs.ins.`ins_plain` SELECT 2, 'b'").collect()(0)
      assert(r.getString(1).contains("1 rows inserted"))
      assert(spark.read.parquet(base).count() == 2)

      val missing = intercept[Exception] {
        spark.sql("INSERT INTO dfs.ins.`ins_nope` SELECT 1")
      }
      assert(missing.getMessage.contains("no such table"))
      val arity = intercept[Exception] {
        spark.sql("INSERT INTO dfs.ins.`ins_plain` SELECT 1, 'x', 99")
      }
      assert(arity.getMessage.contains("columns but query returns"))
      val unknown = intercept[Exception] {
        spark.sql("INSERT INTO dfs.ins.`ins_plain` (zz) SELECT 1")
      }
      assert(unknown.getMessage.contains("unknown column"))
    }
  }

  test("INSERT INTO a hive-partitioned CTAS dir re-partitions the append " +
      "instead of dropping flat files at the base") {
    import spark.implicits._
    val base = freshDir("hivepart")
    withWs {
      spark.conf.set("graft.dfs.workspace.hp", "/tmp/graft_test")
      try {
        Seq((1L, "x", "a"), (2L, "y", "b")).toDF("k", "v", "g")
          .createOrReplaceTempView("hp_src")
        spark.sql(s"CREATE TABLE dfs.hp.`ins_hivepart` PARTITION BY (g) AS " +
          "SELECT * FROM hp_src")
        val r = spark.sql(
          "INSERT INTO dfs.hp.`ins_hivepart` VALUES (3, 'z', 'a'), (4, 'w', 'c')")
          .collect()(0)
        assert(r.getString(1).contains("partitioned by g"),
          s"insert must honor the hive layout: ${r.getString(1)}")
        // base dir holds ONLY partition dirs — no flat part files
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val flat = fs.listStatus(new org.apache.hadoop.fs.Path(base))
          .filter(_.isFile).map(_.getPath.getName)
          .filterNot(n => n.startsWith("_") || n.startsWith("."))
        assert(flat.isEmpty, s"flat files at base: ${flat.mkString(", ")}")
        val got = spark.sql("SELECT k, g FROM dfs.hp.`ins_hivepart`")
          .collect().map(x => (x.getLong(0), x.getString(1))).toSet
        assert(got == Set((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c")))
      } finally spark.conf.unset("graft.dfs.workspace.hp")
    }
  }

  test("MERGE USING an un-aliased named source scopes columns under the " +
      "source's own name") {
    import spark.implicits._
    val base = freshDir("mrgname")
    DeltaLogWriter.write(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), base)
    Seq((2L, 99.0), (3L, 30.0)).toDF("mk", "mv")
      .createOrReplaceTempView("mrg_src")
    withWs {
      spark.sql(
        """MERGE INTO dfs.ins.`ins_mrgname` AS t USING mrg_src
           ON t.k = mrg_src.mk
           WHEN MATCHED THEN UPDATE SET v = mrg_src.mv
           WHEN NOT MATCHED THEN INSERT (k, v) VALUES (mrg_src.mk, mrg_src.mv)""")
      val got = DeltaLogReader.read(spark, base).collect()
        .map(x => (x.getLong(0), x.getDouble(1))).toSet
      assert(got == Set((1L, 10.0), (2L, 99.0), (3L, 30.0)))
    }
  }

  test("double-quoted string literals survive the UPDATE clause scanner") {
    import spark.implicits._
    val base = freshDir("dquote")
    DeltaLogWriter.write(Seq((1L, "old"), (2L, "keep")).toDF("k", "msg"), base)
    withWs {
      // the literal contains both a comma and the word WHERE — a scanner
      // blind to double quotes would split inside it
      spark.sql(
        """UPDATE dfs.ins.`ins_dquote` SET msg = "not, where it was" WHERE k = 1""")
      val got = DeltaLogReader.read(spark, base).collect()
        .map(x => (x.getLong(0), x.getString(1))).toSet
      assert(got == Set((1L, "not, where it was"), (2L, "keep")))
    }
  }

  test("INSERT column list resolves case-insensitively (Spark default)") {
    import spark.implicits._
    val base = freshDir("caseins")
    DeltaLogWriter.write(Seq((1L, "a")).toDF("k", "v"), base)
    withWs {
      val r = spark.sql(
        "INSERT INTO dfs.ins.`ins_caseins` (K, V) VALUES (2, 'b')").collect()(0)
      assert(r.getString(1).contains("1 rows inserted"))
      val got = DeltaLogReader.read(spark, base).collect()
        .map(x => (x.getLong(0), x.getString(1))).toSet
      assert(got == Set((1L, "a"), (2L, "b")))
      // duplicate detection is case-insensitive too
      val e = intercept[Exception] {
        spark.sql("INSERT INTO dfs.ins.`ins_caseins` (k, K) VALUES (3, 4)")
      }
      assert(e.getMessage.contains("duplicate column"))
    }
  }

  test("MERGE clauses may contain CASE WHEN expressions") {
    import spark.implicits._
    val base = freshDir("mcase")
    DeltaLogWriter.write(
      Seq((1L, 5.0, "z"), (2L, -3.0, "z")).toDF("k", "v", "dir"), base)
    Seq((1L, 7.0), (2L, -9.0), (3L, 0.0)).toDF("mk", "mv")
      .createOrReplaceTempView("mcase_src")
    withWs {
      // CASE WHEN inside both the UPDATE SET and the INSERT VALUES —
      // a clause splitter blind to CASE cuts at the inner WHEN
      spark.sql(
        """MERGE INTO dfs.ins.`ins_mcase` t USING mcase_src s ON t.k = s.mk
           WHEN MATCHED THEN UPDATE SET
             v = s.mv, dir = CASE WHEN s.mv > 0 THEN 'up' ELSE 'down' END
           WHEN NOT MATCHED THEN INSERT (k, v, dir)
             VALUES (s.mk, s.mv, CASE WHEN s.mv >= 0 THEN 'up' ELSE 'down' END)""")
      val got = DeltaLogReader.read(spark, base).collect()
        .map(x => (x.getLong(0), x.getDouble(1), x.getString(2))).toSet
      assert(got == Set((1L, 7.0, "up"), (2L, -9.0, "down"), (3L, 0.0, "up")))
    }
  }

  test("MERGE ON condition may END in a CASE WHEN expression") {
    import spark.implicits._
    val base = freshDir("moncase")
    DeltaLogWriter.write(
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "kind", "v"), base)
    Seq((1L, true, 9.0), (2L, false, 8.0)).toDF("mk", "x", "mv")
      .createOrReplaceTempView("moncase_src")
    withWs {
      // the ON condition itself carries a top-level CASE WHEN — a
      // CASE-blind WHEN split truncated it at the CASE's WHEN and
      // failed with 'unsupported clause' on valid SQL
      spark.sql(
        """MERGE INTO dfs.ins.`ins_moncase` t USING moncase_src s
           ON t.k = s.mk AND t.kind = CASE WHEN s.x THEN 'a' ELSE 'b' END
           WHEN MATCHED THEN UPDATE SET v = s.mv""")
      val got = DeltaLogReader.read(spark, base).collect()
        .map(x => (x.getLong(0), x.getDouble(2))).toSet
      assert(got == Set((1L, 9.0), (2L, 8.0)))
    }
  }

  test("backslash-escaped quotes inside literals survive the scanners") {
    import spark.implicits._
    val base = freshDir("escq")
    DeltaLogWriter.write(Seq((1L, "x"), (2L, "y")).toDF("k", "note"), base)
    withWs {
      // \' inside the literal once closed the string early; the scanner
      // then saw the WHERE inside the literal as top-level and split
      spark.sql(
        "UPDATE dfs.ins.`ins_escq` SET note = 'can\\'t where due' WHERE k = 1")
      val got = graft.sources.DeltaLogReader.read(spark, base).collect()
        .map(x => (x.getLong(0), x.getString(1))).toSet
      assert(got == Set((1L, "can't where due"), (2L, "y")))
    }
  }

  test("positional INSERT accepts a query with duplicate column names") {
    import spark.implicits._
    val base = freshDir("dupcols")
    DeltaLogWriter.write(Seq((1L, 1L)).toDF("a", "b"), base)
    withWs {
      // SELECT id, id — name-based source resolution threw
      // AMBIGUOUS_REFERENCE on valid positional SQL
      spark.sql("INSERT INTO dfs.ins.`ins_dupcols` (a, b) SELECT 7, 7")
      val got = graft.sources.DeltaLogReader.read(spark, base).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == Set((1L, 1L), (7L, 7L)))
    }
  }

  test("INSERT OVERWRITE a plain dir FROM ITSELF stages then swaps") {
    import spark.implicits._
    val base = freshDir("selfow")
    (1L to 100L).map(i => (i, i % 7)).toDF("k", "g")
      .write.mode("overwrite").parquet(base)
    withWs {
      val r = spark.sql(
        "INSERT OVERWRITE dfs.ins.`ins_selfow` " +
          "SELECT * FROM dfs.ins.`ins_selfow` WHERE k <= 40").collect()(0)
      assert(r.getString(1).contains("40 rows inserted"), r.getString(1))
      val got = spark.read.parquet(base)
      assert(got.count() == 40 &&
        got.select("k").collect().map(_.getLong(0)).toSet == (1L to 40L).toSet)
      // no staging residue
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(base + ".__overwrite_tmp")))
    }
  }

  test("ANALYZE: same basename in two workspaces keeps BOTH stats") {
    import spark.implicits._
    val d1 = freshDir("stats_ws1"); val d2 = freshDir("stats_ws2")
    Seq((1L, "a")).toDF("k", "v").write.mode("overwrite")
      .parquet(s"$d1/users.parquet")
    (1L to 5L).map(i => (i, "b")).toDF("k", "v").write.mode("overwrite")
      .parquet(s"$d2/users.parquet")
    val sdir = freshDir("stats_dir")
    spark.conf.set("graft.stats.dir", sdir)
    spark.conf.set("graft.dfs.workspace.w1", d1)
    spark.conf.set("graft.dfs.workspace.w2", d2)
    try {
      spark.sql("ANALYZE TABLE dfs.w1.`users.parquet` COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE dfs.w2.`users.parquet` COMPUTE STATISTICS")
      // keyed by basename alone, the second silently overwrote the
      // first and the optimizer applied ws2's counts to ws1's table
      val rows = graft.sources.StatsCatalog.statsTable(spark, sdir)
        .select("table_name", "row_count").distinct()
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows == Set(("users", 1L), ("users", 5L)), rows.toString)
    } finally {
      spark.conf.unset("graft.stats.dir")
      spark.conf.unset("graft.dfs.workspace.w1")
      spark.conf.unset("graft.dfs.workspace.w2")
    }
  }

  test("ANALYZE TABLE on a catalog-resolvable name is NOT claimed by graft") {
    import spark.implicits._
    Seq((1, "a")).toDF("id", "s").createOrReplaceTempView("an_tv")
    // graft's claim would return the (ok, summary) result relation; the
    // native path reaches Spark's analyzer, which rejects ANALYZE on a
    // temp view with its own error — proving the command fell through
    val e = intercept[Exception] {
      spark.sql("ANALYZE TABLE an_tv COMPUTE STATISTICS").collect()
    }
    assert(!e.getMessage.contains("graft"),
      s"ANALYZE on a catalog name must reach Spark's handler: ${e.getMessage}")
  }
}
