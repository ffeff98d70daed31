package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DeltaLogReader, DeltaLogWriter, IcebergTable,
  PaimonTable}

/** ALTER TABLE ADD COLUMNS (schema evolution, all three formats) and
  * the OPTIMIZE SQL verb routed to the maintenance triad. */
class SchemaEvolutionSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): String = {
    val base = s"/tmp/graft_test/evo_$name"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    base
  }

  private def withWs[A](body: => A): A = {
    spark.conf.set("graft.dfs.workspace.evo", "/tmp/graft_test")
    try body finally spark.conf.unset("graft.dfs.workspace.evo")
  }

  test("delta ADD COLUMNS: null-fill, insert into evolved schema, travel") {
    import spark.implicits._
    val base = freshDir("delta")
    DeltaLogWriter.write(Seq((1L, "a")).toDF("k", "v"), base)
    withWs {
      val r = spark.sql(
        "ALTER TABLE dfs.evo.`evo_delta` ADD COLUMNS (score DOUBLE)")
        .collect()(0)
      assert(r.getString(1).contains("1 columns added"))
      val evolved = DeltaLogReader.read(spark, base)
      assert(evolved.columns.toSeq == Seq("k", "v", "score"))
      assert(evolved.collect()(0).isNullAt(2))
      spark.sql(
        "INSERT INTO dfs.evo.`evo_delta` VALUES (2, 'b', 9.5)")
      val got = DeltaLogReader.read(spark, base).collect()
        .map(x => (x.getLong(0), Option(x.get(2)))).toMap
      assert(got == Map(1L -> None, 2L -> Some(9.5)))
      // pre-evolution version keeps the 2-column schema
      assert(DeltaLogReader.read(spark, base, Some(0L)).columns.toSeq ==
        Seq("k", "v"))
      // duplicate column refuses
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE dfs.evo.`evo_delta` ADD COLUMNS (v STRING)")
      }
      assert(e.getMessage.contains("already exists"))
    }
  }

  test("iceberg ADD COLUMNS: fresh field ids, null-fill, evolved append") {
    import spark.implicits._
    val base = freshDir("ice")
    IcebergTable.write(Seq((1L, "a")).toDF("k", "v"), base)
    withWs {
      spark.sql("ALTER TABLE dfs.evo.`evo_ice` ADD COLUMNS (n BIGINT)")
    }
    val evolved = IcebergTable.read(spark, base)
    assert(evolved.columns.toSeq == Seq("k", "v", "n"))
    assert(evolved.collect()(0).isNullAt(2))
    // appends now carry the evolved schema
    IcebergTable.write(Seq((2L, "b", 7L)).toDF("k", "v", "n"), base)
    assert(IcebergTable.read(spark, base).collect()
      .map(x => (x.getLong(0), if (x.isNullAt(2)) -1L else x.getLong(2)))
      .toSet == Set(1L -> -1L, 2L -> 7L))
    // field ids are fresh: the schema json's last field id > old max
    val meta = IcebergTable.loadMeta(spark, base)
    import scala.jdk.CollectionConverters._
    val ids = meta.schemaNode.get("fields").elements.asScala
      .map(_.get("id").asInt).toSeq
    assert(ids.distinct.size == ids.size && ids.max >= 3)
    // schemas history is APPEND-ONLY: evolution mints a fresh schema-id
    // instead of silently redefining id 0
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latest = fs.listStatus(new org.apache.hadoop.fs.Path(base, "metadata"))
      .map(_.getPath).filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .maxBy(_.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt)
    val in = fs.open(latest)
    val root = try new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(in) finally in.close()
    val schemaIds = root.get("schemas").elements.asScala
      .map(_.get("schema-id").asInt).toSeq
    assert(schemaIds.distinct.size == schemaIds.size && schemaIds.size >= 2,
      s"evolution should append a new schema id: $schemaIds")
    assert(root.get("current-schema-id").asInt == schemaIds.max)
  }

  test("paimon ADD COLUMNS on a PK table: latest-schema reads, travel") {
    import spark.implicits._
    val base = freshDir("pk")
    PaimonTable.writePk(Seq((1L, "a")).toDF("k", "v"), base, Seq("k"))
    withWs {
      spark.sql("ALTER TABLE dfs.evo.`evo_pk` ADD COLUMNS (w STRING)")
    }
    val evolved = PaimonTable.read(spark, base)
    assert(evolved.columns.toSeq == Seq("k", "v", "w"))
    assert(evolved.collect()(0).isNullAt(2))
    // upsert with the evolved schema; old row still null-fills
    PaimonTable.writePk(Seq((2L, "b", "W2")).toDF("k", "v", "w"), base,
      Seq("k"))
    assert(PaimonTable.read(spark, base).collect()
      .map(x => (x.getLong(0), Option(x.getString(2)))).toSet ==
      Set(1L -> None, 2L -> Some("W2")))
    // time travel to snapshot 1 keeps the pre-evolution schema
    assert(PaimonTable.read(spark, base, snapshotId = Some(1L))
      .columns.toSeq == Seq("k", "v"))
  }

  test("DESCRIBE HISTORY lists the commit log for all three formats") {
    import spark.implicits._
    val delta = freshDir("histd")
    DeltaLogWriter.write(Seq((1L, "a")).toDF("k", "v"), delta)
    DeltaLogWriter.write(Seq((2L, "b")).toDF("k", "v"), delta)
    val ice = freshDir("histi")
    IcebergTable.write(Seq((1L, "a")).toDF("k", "v"), ice)
    val pk = freshDir("histp")
    PaimonTable.writePk(Seq((1L, "a")).toDF("k", "v"), pk, Seq("k"))
    graft.sources.DeltaDml.delete(spark, delta,
      org.apache.spark.sql.functions.col("k") === 1L)
    withWs {
      val d = spark.sql("DESCRIBE HISTORY dfs.evo.`evo_histd`").collect()
      assert(d.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
      // DML commits carry commitInfo — history names the operation
      assert(d.map(_.getString(2)).toSeq == Seq("commit", "commit", "DELETE"))
      val i = spark.sql("DESCRIBE HISTORY dfs.evo.`evo_histi`").collect()
      assert(i.length == 1 && i(0).getBoolean(2)) // is_current_ancestor
      val p = spark.sql("DESC HISTORY dfs.evo.`evo_histp`").collect()
      assert(p.length == 1 && p(0).getString(2) == "APPEND")
    }
  }

  test("OPTIMIZE routes to the maintenance triad") {
    import spark.implicits._
    val delta = freshDir("optd")
    DeltaLogWriter.write(Seq((1L, "a")).toDF("k", "v"), delta)
    DeltaLogWriter.write(Seq((2L, "b")).toDF("k", "v"), delta)
    val ice = freshDir("opti")
    IcebergTable.write(Seq((1L, "a")).toDF("k", "v"), ice)
    IcebergTable.write(Seq((2L, "b")).toDF("k", "v"), ice)
    withWs {
      val d = spark.sql("OPTIMIZE dfs.evo.`evo_optd`").collect()(0)
      assert(d.getBoolean(0) && d.getString(1).contains("compacted"))
      assert(DeltaLogReader.read(spark, delta).count() == 2)
      val i = spark.sql("OPTIMIZE dfs.evo.`evo_opti`").collect()(0)
      assert(i.getString(1).contains("rewrite_data_files"))
      assert(IcebergTable.read(spark, ice).count() == 2)
    }
  }
}
