package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{IcebergTable, Puffin}
import org.apache.hadoop.fs.Path
import scala.jdk.CollectionConverters._

/** Iceberg format-v3 deletion vectors: the Puffin container codec and
  * the DV read/write/supersede lifecycle on real tables. */
class PuffinSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): String = {
    val base = s"/tmp/graft_test/puffin_$name"
    val p = new Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    base
  }

  private def conf = spark.sparkContext.hadoopConfiguration

  test("puffin DV file: blob round-trip, footer structure, spec framing") {
    val dir = freshDir("codec")
    val p = new Path(dir, "x.puffin")
    val deletes = Seq(
      "/data/a.parquet" -> Seq(0L, 5L, 70000L, (1L << 33) + 7L),
      "/data/b.parquet" -> (0L until 5000L).toSeq) // >4096 → bitmap container
    val blobs = Puffin.writeDvFile(conf, p, deletes, snapshotId = 9L,
      sequenceNumber = 4L)
    assert(blobs.map(_.referencedDataFile) == deletes.map(_._1))
    assert(blobs.map(_.cardinality) == Seq(4L, 5000L))
    // read back through the manifest-offset path
    blobs.zip(deletes).foreach { case (b, (_, positions)) =>
      assert(Puffin.readDvBlob(conf, p.toString, b.offset, b.length) ==
        positions.distinct.sorted)
    }
    // footer: spec-complete blob metadata, matching offsets
    val footer = Puffin.readFooter(conf, p)
    val fb = footer.get("blobs").elements.asScala.toSeq
    assert(fb.size == 2)
    assert(fb.forall(_.get("type").asText == "deletion-vector-v1"))
    assert(fb.map(_.get("offset").asLong) == blobs.map(_.offset))
    assert(fb.map(_.get("length").asLong) == blobs.map(_.length))
    assert(fb.map(_.get("snapshot-id").asLong).distinct == Seq(9L))
    assert(fb.map(_.get("properties").get("referenced-data-file").asText) ==
      deletes.map(_._1))
    assert(fb.map(_.get("properties").get("cardinality").asText) ==
      Seq("4", "5000"))
    // corrupted payload byte → CRC refusal
    val fs = p.getFileSystem(conf)
    val bytes = {
      val in = fs.open(p)
      val len = fs.getFileStatus(p).getLen.toInt
      val b = new Array[Byte](len); in.readFully(0, b); in.close(); b
    }
    bytes(blobs.head.offset.toInt + 6) = (bytes(blobs.head.offset.toInt + 6) ^ 1).toByte
    val corrupt = new Path(dir, "corrupt.puffin")
    val os = fs.create(corrupt, true); os.write(bytes); os.close()
    val e = intercept[IllegalArgumentException](
      Puffin.readDvBlob(conf, corrupt.toString, blobs.head.offset, blobs.head.length))
    assert(e.getMessage.contains("checksum"))
  }

  test("deleteFromDv: v3 upgrade, merge-on-read via DVs, row lineage") {
    import spark.implicits._
    val base = freshDir("dv")
    val src = (1L to 400L).map(i => (i, s"v$i")).toDF("k", "v")
    IcebergTable.write(src.filter($"k" <= 200), base)
    IcebergTable.write(src.filter($"k" > 200), base)
    val s3 = IcebergTable.deleteFromDv(spark, base, col("k") % 10 < 3)
    assert(s3 == 3L)
    val keys = IcebergTable.read(spark, base)
      .select("k").as[Long].collect().toSet
    assert(keys == (1L to 400L).filter(_ % 10 >= 3).toSet)
    // time travel to the pre-delete snapshot still sees everything
    assert(IcebergTable.read(spark, base, snapshotId = Some(2L)).count() == 400)
    // the table is format-version 3 with row lineage
    val metaJson = {
      val p = new Path(base, "metadata/v3.metadata.json")
      val in = p.getFileSystem(conf).open(p)
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      finally in.close()
    }
    assert(metaJson.get("format-version").asInt == 3)
    assert(metaJson.get("next-row-id").asLong == 400L)
    assert(metaJson.get("snapshots").elements.asScala
      .find(_.get("snapshot-id").asLong == 3L).get.has("first-row-id"))
    // delete carrier is PUFFIN, not parquet
    val dels = IcebergTable.liveEntries(spark, base).filter(_.content == 1)
    assert(dels.nonEmpty && dels.forall(_.isDv))
    assert(dels.forall(_.contentOffset.isDefined))
  }

  test("second DV delete supersedes: one DV per file, positions merged") {
    import spark.implicits._
    val base = freshDir("supersede")
    IcebergTable.write((1L to 300L).map(i => (i, i % 7)).toDF("k", "g"), base)
    IcebergTable.deleteFromDv(spark, base, col("k") % 10 < 2)
    IcebergTable.deleteFromDv(spark, base, col("k") % 10 === 5)
    val keys = IcebergTable.read(spark, base)
      .select("k").as[Long].collect().toSet
    assert(keys == (1L to 300L).filter(k => k % 10 >= 2 && k % 10 != 5).toSet)
    // supersede: every data file has exactly ONE live DV
    val dvs = IcebergTable.liveEntries(spark, base).filter(_.content == 1)
    assert(dvs.forall(_.isDv))
    val byRef = dvs.groupBy(_.referencedDataFile.get)
    assert(byRef.values.forall(_.size == 1),
      s"multiple live DVs per file: ${byRef.view.mapValues(_.size).toMap}")
    // and the survivor carries the MERGED positions (0,1,5 mod 10)
    val total = dvs.map(_.recordCount).sum
    assert(total == (1L to 300L).count(k => k % 10 < 2 || k % 10 == 5))
  }

  test("DV replaces older v2 position deletes of the same file at scan " +
      "and merges them on write") {
    import spark.implicits._
    val base = freshDir("v2mix")
    // single data file, so the v2 delete and the DV target the SAME file
    IcebergTable.write(
      (1L to 200L).map(i => (i, s"x$i")).toDF("k", "v").coalesce(1), base)
    // v2 position delete first…
    IcebergTable.deleteFrom(spark, base, col("k") <= 10)
    // …then a DV delete on the same file: must merge the parquet
    // positions so nothing deleted resurrects
    IcebergTable.deleteFromDv(spark, base, col("k") > 190)
    val keys = IcebergTable.read(spark, base)
      .select("k").as[Long].collect().toSet
    assert(keys == (11L to 190L).toSet)
    val dvs = IcebergTable.liveEntries(spark, base)
      .filter(e => e.content == 1 && e.isDv)
    assert(dvs.map(_.recordCount).sum == 20L)
  }

  test("append after DV delete: new rows unaffected, v3 sticks, " +
      "next-row-id advances") {
    import spark.implicits._
    val base = freshDir("appendafter")
    IcebergTable.write((1L to 100L).map(i => (i, "a")).toDF("k", "t"), base)
    IcebergTable.deleteFromDv(spark, base, col("k") % 2 === 0)
    IcebergTable.write((101L to 150L).map(i => (i, "b")).toDF("k", "t"), base)
    val keys = IcebergTable.read(spark, base)
      .select("k").as[Long].collect().toSet
    assert(keys == ((1L to 100L).filter(_ % 2 == 1) ++ (101L to 150L)).toSet)
    val meta = IcebergTable.loadMeta(spark, base)
    assert(meta.formatVersion == 3)
    assert(meta.nextRowId == 150L)
  }

  test("v3 tables route every position-delete producer through DVs") {
    import spark.implicits._
    val base = freshDir("route")
    IcebergTable.write((1L to 300L).map(i => (i, s"v$i")).toDF("k", "v"), base)
    IcebergTable.deleteFromDv(spark, base, col("k") <= 10) // v3 upgrade
    // the v2-era API on a v3 table must still produce DVs (spec: new
    // position deletes in v3 are deletion vectors)
    IcebergTable.deleteFrom(spark, base, col("k") > 290)
    val dels = IcebergTable.liveEntries(spark, base).filter(_.content == 1)
    assert(dels.nonEmpty && dels.forall(_.isDv),
      s"non-DV position delete on a v3 table: ${dels.filterNot(_.isDv)}")
    val keys = IcebergTable.read(spark, base)
      .select("k").as[Long].collect().toSet
    assert(keys == (11L to 290L).toSet)
  }

  test("row lineage: _row_id unique + inherited, pre-upgrade files NULL, " +
      "post-upgrade appends ranged from next-row-id") {
    import spark.implicits._
    val base = freshDir("lineage")
    // pre-v3 files (no id range) …
    IcebergTable.write((1L to 100L).map(i => (i, "old")).toDF("k", "t"), base)
    // … v3 upgrade (next-row-id initializes to 100) …
    IcebergTable.deleteFromDv(spark, base, col("k") <= 5)
    // … two post-upgrade appends: ids [100,150) then [150,170)
    IcebergTable.write((101L to 150L).map(i => (i, "a")).toDF("k", "t"), base)
    IcebergTable.write((151L to 170L).map(i => (i, "b")).toDF("k", "t"), base)
    val df = IcebergTable.readWithLineage(spark, base)
      .select(col("k"), col("_row_id"), col("_last_updated_sequence_number"))
    val rows = df.collect()
    assert(rows.length == 95 + 50 + 20)
    val (pre, post) = rows.partition(_.getLong(0) <= 100)
    // pre-upgrade rows: NULL lineage id (the spec's upgrade posture)
    assert(pre.forall(_.isNullAt(1)))
    // post-upgrade rows: exactly the minted ranges, no duplicates
    val ids = post.map(_.getLong(1)).sorted
    assert(ids.toSeq == (100L until 170L).toSeq)
    // _last_updated_sequence_number = the file's data sequence number;
    // the later append out-sequences the earlier one
    val seqOf = rows.filterNot(_.isNullAt(2))
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(seqOf(120L) < seqOf(160L))
    // refuses on a pre-v3 table
    val v2base = freshDir("lineage_v2")
    IcebergTable.write((1L to 5L).map(i => (i, "x")).toDF("k", "t"), v2base)
    val e = intercept[IllegalArgumentException](
      IcebergTable.readWithLineage(spark, v2base))
    assert(e.getMessage.contains("format-v3"))
  }

  test("readChangesBetween surfaces DV deletes as delete rows, " +
      "changed-file-pruned from manifest metadata") {
    import spark.implicits._
    val base = freshDir("changes")
    IcebergTable.write((1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"), base)
    IcebergTable.deleteFromDv(spark, base, col("k") % 10 === 0)
    val ch = IcebergTable.readChangesBetween(spark, base, fromSnapshotId = 1L)
      .select("_change_type", "k").as[(String, Long)].collect()
    assert(ch.forall(_._1 == "delete"))
    assert(ch.map(_._2).toSet == (10L to 100L by 10L).toSet)
  }

  test("UPDATE and MERGE on a v3 table write DVs through the shared " +
      "position-delete route") {
    import spark.implicits._
    val base = freshDir("updroute")
    IcebergTable.write((1L to 100L).map(i => (i, "x")).toDF("k", "t"), base)
    IcebergTable.deleteFromDv(spark, base, col("k") > 95) // v3 upgrade
    val (_, n) = graft.sources.IcebergDml.update(spark, base,
      col("k") % 10 === 0, Map("t" -> lit("u")))
    assert(n == 9L) // 10,20,...,90 (96..100 already dead)
    val rows = IcebergTable.read(spark, base)
      .select("k", "t").as[(Long, String)].collect().toMap
    assert(rows.size == 95)
    (1L to 95L).foreach { k =>
      assert(rows(k) == (if (k % 10 == 0) "u" else "x"))
    }
    // every position-delete carrier in the table is a DV
    val dels = IcebergTable.liveEntries(spark, base).filter(_.content == 1)
    assert(dels.nonEmpty && dels.forall(_.isDv))
  }

  test("DV delete with no matches commits nothing") {
    import spark.implicits._
    val base = freshDir("nomatch")
    IcebergTable.write((1L to 50L).map(i => (i, "z")).toDF("k", "t"), base)
    val snap = IcebergTable.deleteFromDv(spark, base, col("k") > 999)
    assert(snap == 1L)
    assert(IcebergTable.read(spark, base).count() == 50)
  }
}
