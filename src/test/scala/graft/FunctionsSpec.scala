package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ContextFunctions, DrillFunctions}

class FunctionsSpec extends AnyFunSuite {
  import TestSpark._

  test("typeof reports runtime SQL types (SURVEY row 58)") {
    import spark.implicits._
    val df = Seq((1L, "x", 1.5)).toDF("a", "b", "c")
    val r = df.select(
      DrillFunctions.typeOf(col("a")).as("ta"),
      DrillFunctions.typeOf(col("b")).as("tb"),
      DrillFunctions.typeOf(col("c")).as("tc")).collect()(0)
    assert(r.getString(0) == "bigint")
    assert(r.getString(1) == "string")
    assert(r.getString(2) == "double")
  }

  test("truncTo truncates toward zero (Drill TRUNC(x, n))") {
    import spark.implicits._
    val df = Seq((3.14159, -2.71828)).toDF("p", "n")
    val r = df.select(
      DrillFunctions.truncTo(col("p"), 2).as("tp"),
      DrillFunctions.truncTo(col("n"), 2).as("tn")).collect()(0)
    assert(r.getDouble(0) == 3.14)
    assert(r.getDouble(1) == -2.71) // toward zero, NOT floor
  }

  test("truncTo is decimal-exact and overflow-safe (setScale DOWN)") {
    import spark.implicits._
    // 0.29 * 100 = 28.999... in doubles: the old long-cast emitted 0.28
    val df = Seq((0.29, 1.0e19)).toDF("x", "big")
    val r = df.select(
      DrillFunctions.truncTo(col("x"), 2).as("tx"),
      DrillFunctions.truncTo(col("big"), 2).as("tb")).collect()(0)
    assert(r.getDouble(0) == 0.29, s"double-multiply drift: ${r.getDouble(0)}")
    assert(r.getDouble(1) == 1.0e19) // old (x*100).cast(long) threw under ANSI
  }

  test("regexpMatches is FULL-STRING anchored like Drill's matcher.matches()") {
    import spark.implicits._
    val df = Seq(("abcdef", "10.0.0.99")).toDF("s", "ip")
    val r = df.select(
      DrillFunctions.regexpMatches(col("s"), "cde").as("sub"),
      DrillFunctions.regexpMatches(col("s"), "abc.*").as("full"),
      DrillFunctions.regexpMatches(col("ip"), "10\\..*").as("ipm")).collect()(0)
    assert(!r.getBoolean(0), "substring hit must NOT match (anchored)")
    assert(r.getBoolean(1) && r.getBoolean(2))
  }

  test("timeBucket truncates toward zero for pre-1970 epochs (reference %)") {
    import spark.implicits._
    val df = Seq((-1000L, 55L)).toDF("neg", "pos")
    val r = df.select(
      graft.functions.DistributionFunctions
        .timeBucketMs(col("neg"), lit(600000L)).as("nb"),
      graft.functions.DistributionFunctions
        .timeBucketMs(col("pos"), lit(10L)).as("pb")).collect()(0)
    assert(r.getLong(0) == 0L, s"Java %: -1000 - (-1000 % 600000) = 0, got ${r.getLong(0)}")
    assert(r.getLong(1) == 50L)
  }

  test("low/highAddress return 0.0.0.0 on /31 and /32 (no usable hosts)") {
    import spark.implicits._
    import graft.functions.NetworkFunctions._
    val df = Seq(("1.2.3.4/32", "1.2.3.4/31", "10.0.0.0/24"))
      .toDF("c32", "c31", "c24")
    val r = df.select(lowAddress(col("c32")), highAddress(col("c32")),
      lowAddress(col("c31")), highAddress(col("c31")),
      lowAddress(col("c24")), highAddress(col("c24"))).collect()(0)
    assert(r.getString(0) == "0.0.0.0" && r.getString(1) == "0.0.0.0")
    assert(r.getString(2) == "0.0.0.0" && r.getString(3) == "0.0.0.0")
    assert(r.getString(4) == "10.0.0.1" && r.getString(5) == "10.0.0.254")
  }

  test("context functions expose session identity (SURVEY row 57)") {
    val r = spark.range(1).select(ContextFunctions.contextRow(spark): _*)
      .collect()(0)
    assert(r.getAs[String]("session_id") == spark.sparkContext.applicationId)
    assert(r.getAs[String]("session_user").nonEmpty)
    assert(r.getAs[String]("current_schema") == spark.catalog.currentDatabase)
    assert(r.getAs[String]("current_catalog") == spark.catalog.currentCatalog())
    assert(r.getAs[String]("engine_version").startsWith("4."))
  }

  test("phonetic + distance functions (Drill contrib/udfs)") {
    import spark.implicits._
    val df = Seq(("Robert", "Rupert")).toDF("a", "b")
    val r = df.select(
      soundex(col("a")).as("sa"), soundex(col("b")).as("sb"),
      levenshtein(col("a"), col("b")).as("lev")).collect()(0)
    assert(r.getString(0) == "R163")
    assert(r.getString(1) == "R163") // classic soundex pair
    assert(r.getInt(2) == 2) // o->u, b->p
  }

  test("phonetic family matches commons-codec reference encodings") {
    import spark.implicits._
    val df = Seq("Thompson", "MacDonald").toDF("n")
    val r = df.select(
      call_function("metaphone", col("n")).as("mp"),
      call_function("nysiis", col("n")).as("ny"),
      call_function("refined_soundex", col("n")).as("rs"),
      call_function("double_metaphone", col("n")).as("dm"),
      call_function("cologne_phonetic", col("n")).as("cp"),
      call_function("dm_soundex", col("n")).as("dms"),
      call_function("match_rating_encoder", col("n")).as("mr"),
      call_function("caverphone1", col("n")).as("c1")).collect()
    assert(r(0).getString(0) == "TMPS" || r(0).getString(0) == "0MPS")
    assert(r(0).getString(1) == "TANPSA") // nysiis(Thompson)
    assert(r(1).getString(1) == "MCDANA") // nysiis(MacDonald)
    assert(r.forall(row => (0 until 8).forall(i => row.getString(i).nonEmpty)))
    // dm_soundex returns ALL Daitch-Mokotoff pronunciation branches
    // pipe-joined (the reference's soundex(), not encode()'s first-only)
    val dm = Seq("Auerbach").toDF("n")
      .select(call_function("dm_soundex", col("n"))).collect()(0).getString(0)
    assert(dm.contains("|") && dm.split('|').contains("097400"), dm)
    // refined_soundex survives non-ASCII letters (pre-stripped to A-Z)
    // instead of ArrayIndexOutOfBounds-failing the scan
    val acc = Seq("café", "Łukasz").toDF("n")
      .select(call_function("refined_soundex", col("n"))).collect()
    assert(acc.forall(!_.isNullAt(0)))
  }

  test("entropy: exact values on uniform char distributions") {
    import spark.implicits._
    val df = Seq(("aaaa", "ab", "abcd", "aab")).toDF("u", "b", "q", "m")
    val r = df.select(
      call_function("entropy", col("u")).as("eu"),
      call_function("entropy", col("b")).as("eb"),
      call_function("entropy", col("q")).as("eq"),
      call_function("entropy", col("m")).as("em")).collect()(0)
    assert(r.getDouble(0) == 0.0) // single symbol
    assert(r.getDouble(1) == 1.0) // two equiprobable -> 1 bit
    assert(r.getDouble(2) == 2.0) // four equiprobable -> 2 bits
    assert(math.abs(r.getDouble(3) - 0.9182958340544896) < 1e-12) // p=(2/3,1/3)
  }

  test("network functions: known-answer CIDR math") {
    import spark.implicits._
    import graft.functions.NetworkFunctions._
    val df = Seq(("192.168.1.1", "10.1.2.3", "10.0.0.0/24")).toDF("ip1", "ip2", "cidr")
    val r = df.select(
      inetAton(col("ip1")).as("n1"),
      inetNtoa(inetAton(col("ip1"))).as("rt"),
      isPrivateIp(col("ip1")).as("p1"),
      isPrivateIp(lit("8.8.8.8")).as("p2"),
      inNetwork(col("ip2"), lit("10.0.0.0/8")).as("in1"),
      inNetwork(lit("11.0.0.1"), lit("10.0.0.0/8")).as("in2"),
      netmask(col("cidr")).as("nm"),
      broadcastAddress(col("cidr")).as("bc"),
      lowAddress(col("cidr")).as("lo"),
      highAddress(col("cidr")).as("hi"),
      addressCount(col("cidr")).as("cnt"),
      isValidIpv4(lit("256.1.1.1")).as("bad")).collect()(0)
    assert(r.getLong(0) == 3232235777L)
    assert(r.getString(1) == "192.168.1.1")
    assert(r.getBoolean(2) && !r.getBoolean(3))
    assert(r.getBoolean(4) && !r.getBoolean(5))
    assert(r.getString(6) == "255.255.255.0")
    assert(r.getString(7) == "10.0.0.255")
    assert(r.getString(8) == "10.0.0.1")
    assert(r.getString(9) == "10.0.0.254")
    assert(r.getLong(10) == 254L)
    assert(!r.getBoolean(11))
  }

  test("url_encode/url_decode round-trip (Drill NetworkFunctions)") {
    import spark.implicits._
    import graft.functions.NetworkFunctions._
    val df = Seq("a b&c=d/e?").toDF("s")
    val r = df.select(
      urlEncode(col("s")).as("enc"),
      urlDecode(urlEncode(col("s"))).as("rt")).collect()(0)
    assert(r.getString(0) == "a+b%26c%3Dd%2Fe%3F")
    assert(r.getString(1) == "a b&c=d/e?")
  }

  test("width_bucket / kendall tau / punctuation_pattern / time_bucket") {
    import spark.implicits._
    import graft.functions.DistributionFunctions._
    val df = Seq((5.5, "Hello, World! 123", 1234567L)).toDF("v", "s", "t")
    val r = df.select(
      widthBucket(col("v"), lit(0.0), lit(10.0), lit(5L)).as("wb"),
      punctuationPattern(col("s")).as("pp"),
      timeBucketMs(col("t"), lit(1000L)).as("tb")).collect()(0)
    assert(r.getLong(0) == 3L)
    assert(r.getString(1) == ",_!_")
    assert(r.getLong(2) == 1234000L)

    val xy = Seq((1, 1, 1.0, 10.0), (1, 2, 2.0, 20.0), (1, 3, 3.0, 30.0),
      (2, 1, 1.0, 30.0), (2, 2, 2.0, 20.0), (2, 3, 3.0, 10.0))
      .toDF("g", "i", "x", "y")
    val taus = kendallTau(xy, "g", "i", "x", "y")
      .orderBy("g").collect().map(_.getAs[Double]("kendall_tau"))
    assert(taus.toSeq == Seq(1.0, -1.0)) // perfectly concordant / discordant
  }

  test("string-distance family matches Drill's own test values (contrib/udfs TestStringDistanceFunctions)") {
    import spark.implicits._
    val df = Seq(("Big car", "red car")).toDF("a", "b")
    val r = df.select(
      call_function("cosine_distance", col("a"), col("b")).as("cos"),
      call_function("hamming_distance", col("a"), col("b")).as("ham"),
      call_function("jaccard_distance", col("a"), col("b")).as("jac"),
      call_function("jaro_distance", col("a"), col("b")).as("jaro"),
      call_function("longest_common_substring_distance", col("a"), col("b")).as("lcs"),
      levenshtein(col("a"), col("b")).as("lev")).collect()(0)
    // expected values transcribed from the reference's test class
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-9)
    assert(r.getDouble(1) == 3.0)
    assert(math.abs(r.getDouble(2) - 0.5555555555555556) < 1e-12)
    assert(math.abs(r.getDouble(3) - 0.2857142857142857) < 1e-12)
    // LCS subsequence " car" (4): 7 + 7 - 2*4
    assert(r.getDouble(4) == 6.0)
    assert(r.getInt(5) == 3)
    // fuzzy_score: commons-text javadoc examples
    val f = Seq(("Workshop", "ws"), ("Workshop", "wo"),
        ("Apache Software Foundation", "asf"))
      .toDF("t", "q")
      .select(call_function("fuzzy_score", col("t"), col("q")).as("s"))
      .collect().map(_.getDouble(0))
    assert(f.toSeq == Seq(2.0, 4.0, 3.0), f.toSeq)
    // NULL_IF_NULL + arity check, like the reference
    assert(df.select(call_function("jaro_distance", lit(null).cast("string"),
      col("b"))).collect()(0).isNullAt(0))
    val e = intercept[Exception] {
      spark.sql("SELECT jaro_distance('a')").collect()
    }
    assert(e.getMessage.contains("2 arguments"), e.getMessage)
  }

  test("nearest_date floors all reference intervals; year_week; percent_change") {
    import spark.implicits._
    import graft.functions.DrillFunctions._
    val df = Seq("2018-05-04 11:47:43").toDF("s")
      .select(to_timestamp(col("s")).as("t"))
    def nd(i: String) = nearestDate(col("t"), i).cast("string")
    val r = df.select(nd("YEAR"), nd("QUARTER"), nd("WEEK_SUNDAY"),
      nd("WEEK_MONDAY"), nd("HALF_HOUR"), nd("QUARTER_HOUR"),
      nd("HALF_MINUTE"), nd("QUARTER_MINUTE")).collect()(0)
    assert(r.getString(0) == "2018-01-01 00:00:00")
    assert(r.getString(1) == "2018-04-01 00:00:00")
    assert(r.getString(2) == "2018-04-29 00:00:00") // Fri -> previous Sunday
    assert(r.getString(3) == "2018-04-30 00:00:00") // Fri -> previous Monday
    assert(r.getString(4) == "2018-05-04 11:30:00")
    assert(r.getString(5) == "2018-05-04 11:45:00")
    assert(r.getString(6) == "2018-05-04 11:47:30")
    assert(r.getString(7) == "2018-05-04 11:47:30")
    val e = intercept[IllegalArgumentException](nearestDate(col("t"), "FORTNIGHT"))
    assert(e.getMessage.contains("not a valid time statement"))
    assert(df.select(yearWeek(col("t"))).collect()(0).getInt(0) == 201818)
    val pc = Seq((100.0, 125.0), (120.0, 0.0), (0.0, 5.0)).toDF("o", "n")
      .select(percentChange(col("o"), col("n"))).collect().map(_.getDouble(0))
    assert(pc.toSeq == Seq(25.0, 0.0, 0.0))
  }

  test("registry tail: md2, get_map_schema, is_valid_ip(v6), context timestamps") {
    import spark.implicits._
    // md2 of the empty string and 'abc' — RFC 1319 test vectors
    val m = Seq(("", "abc")).toDF("e", "a")
      .select(call_function("md2", col("e")), call_function("md2", col("a")))
      .collect()(0)
    assert(m.getString(0) == "8350e5a3e24c153df2275c9f80692773")
    assert(m.getString(1) == "da853b0d3f88d99b30283a69e6ded6bb")

    val sch = Seq((1L, "x")).toDF("id", "s")
      .select(call_function("get_map_schema",
        struct(col("id"), col("s"))).as("m"))
      .collect()(0).getMap[String, String](0)
    assert(sch == Map("id" -> "BIGINT", "s" -> "STRING"))

    import graft.functions.NetworkFunctions._
    val ips = Seq("192.168.1.1", "256.1.1.1", "2001:db8::1", "::1", "::",
      "2001:db8:0:0:0:0:2:1", "1:2:3:4:5:6:7:8:9", "not an ip", "1::2::3")
      .toDF("ip")
      .select(col("ip"), isValidIp(col("ip")).as("v"),
        isValidIpv6(col("ip")).as("v6"))
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2)))
      .toMap
    assert(ips("192.168.1.1") == (true, false))
    assert(ips("256.1.1.1") == (false, false))
    assert(ips("2001:db8::1") == (true, true))
    assert(ips("::1") == (true, true))
    assert(ips("::") == (true, true))
    assert(ips("2001:db8:0:0:0:0:2:1") == (true, true))
    assert(ips("1:2:3:4:5:6:7:8:9") == (false, false))
    assert(ips("not an ip") == (false, false))
    assert(ips("1::2::3") == (false, false))

    import graft.functions.ContextFunctions._
    val ctx = spark.range(1)
      .select(localTime().as("lt"), timeOfDay().as("tod"),
        statementTimestamp().as("st"), transactionTimestamp().as("tt"))
      .collect()(0)
    assert(!ctx.isNullAt(0) && ctx.getString(1).nonEmpty)
    assert(ctx.getTimestamp(2) == ctx.getTimestamp(3)) // fixed per statement
  }

  test("similar_to translates SQL:99 patterns exactly (RegexpUtil.sqlToRegexSimilar)") {
    import graft.functions.DrillFunctions.{similarTo, sqlToRegexSimilar}
    import spark.implicits._
    assert(sqlToRegexSimilar("a%b_c") == "a.*b.c")
    assert(sqlToRegexSimilar("a$b\\c") == "a\\$b\\\\c")
    assert(sqlToRegexSimilar("[a-c]%") == "[a-c].*")
    assert(sqlToRegexSimilar("x!%y", '!') == "x%y") // escaped % is literal
    val df = Seq(("abc", "a$b", "50%")).toDF("s", "d", "p")
    val r = df.select(
      similarTo(col("s"), "a%"), similarTo(col("s"), "a"), // full anchor
      similarTo(col("d"), "a$b"), similarTo(col("p"), "50!%", '!'),
      similarTo(col("s"), "(abc|xyz)"), similarTo(col("s"), "a[b-d]c"))
      .collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getBoolean(2) && r.getBoolean(3))
    assert(r.getBoolean(4) && r.getBoolean(5))
    intercept[IllegalArgumentException](sqlToRegexSimilar("a]b"))
    intercept[IllegalArgumentException](sqlToRegexSimilar("a[bc"))
    intercept[IllegalArgumentException](sqlToRegexSimilar("ab!", '!'))
  }

  test("HADOOPV varint codec matches org.apache.hadoop.io.WritableUtils exactly") {
    import graft.functions.ConvertBinary
    // the INDEPENDENT validator: Hadoop's own WritableUtils (on Spark's
    // classpath) produced/consumed the reference's vlong framing — every
    // boundary + a seeded sweep must round-trip through BOTH codecs
    val rnd = new scala.util.Random(42)
    val vals = Seq(0L, 1L, -1L, 127L, 128L, -112L, -113L, 255L, 256L,
      Long.MaxValue, Long.MinValue, Int.MaxValue.toLong, Int.MinValue.toLong) ++
      (1 to 200).map(_ => rnd.nextLong())
    vals.foreach { v =>
      val buf = new org.apache.hadoop.io.DataOutputBuffer()
      org.apache.hadoop.io.WritableUtils.writeVLong(buf, v)
      val hadoopBytes = java.util.Arrays.copyOf(buf.getData, buf.getLength)
      assert(ConvertBinary.writeVLong(v).toSeq == hadoopBytes.toSeq,
        s"writeVLong($v) diverges from WritableUtils")
      assert(ConvertBinary.readVLong(hadoopBytes) == v,
        s"readVLong(WritableUtils bytes) != $v")
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(ConvertBinary.writeVLong(v)))
      assert(org.apache.hadoop.io.WritableUtils.readVLong(in) == v,
        s"WritableUtils cannot read graft's encoding of $v")
    }
  }

  test("convert_from error paths: wrong length, unknown encoding, non-literal") {
    import spark.implicits._
    val df = Seq(("0011223344", 1)).toDF("h", "i")
    val e1 = intercept[Exception](
      df.select(expr("convert_from(unhex(h), 'INT')")).collect())
    assert(e1.getMessage.contains("wrong buffer length") ||
      Option(e1.getCause).exists(_.getMessage.contains("wrong buffer length")))
    val e2 = intercept[Exception](
      df.select(expr("convert_from(unhex(h), 'NOPE')")).collect())
    assert(e2.getMessage.toLowerCase.contains("nope") ||
      e2.getMessage.contains("unknown convert_from"))
    val e3 = intercept[Exception](
      df.select(expr("convert_from(unhex(h), h)")).collect())
    assert(e3.getMessage.contains("string literal"))
    // NULL_IF_NULL posture
    val r = spark.sql("SELECT convert_from(CAST(NULL AS BINARY), 'INT') AS v")
      .collect()(0)
    assert(r.isNullAt(0))
    // varint trailing bytes refuse (exact-length posture, unlike the
    // reference's window API which silently ignored a tail)
    val e4 = intercept[Exception](
      spark.sql("SELECT convert_from(unhex('0000'), 'BIGINT_HADOOPV')").collect())
    assert(e4.getMessage.contains("trailing") ||
      Option(e4.getCause).exists(_.getMessage.contains("trailing")))
    // UINT4 encode range check: 2^32+5 must not alias 5
    val e5 = intercept[Exception](
      spark.sql("SELECT convert_to(4294967301, 'UINT4')").collect())
    assert(e5.getMessage.contains("unsigned 32-bit") ||
      Option(e5.getCause).exists(_.getMessage.contains("unsigned 32-bit")))
    // non-binary first arg refuses instead of silently casting int->bytes
    val e6 = intercept[Exception](
      spark.sql("SELECT convert_from(5, 'INT')").collect())
    assert(e6.getMessage.contains("BINARY"))
  }

  test("convert_from cracks SequenceFile binary keys from SQL (QS q_read_seqfile wiring)") {
    import spark.implicits._
    // a SequenceFile written by HADOOP's writer with BytesWritable keys
    // holding big-endian longs — the HBase-key shape the codecs exist for
    val dir = java.nio.file.Files.createTempDirectory("seqconv").toString + "/f"
    spark.sparkContext.parallelize(Seq(7L, 42L, -3L), 1)
      .map { k => // writables built task-side (not serializable)
        (new org.apache.hadoop.io.BytesWritable(
          java.nio.ByteBuffer.allocate(8).putLong(k).array()),
         new org.apache.hadoop.io.BytesWritable(
          java.nio.ByteBuffer.allocate(8).putLong(k * 100).array()))
      }.saveAsSequenceFile(dir)
    graft.sources.SequenceFileReader.read(spark, dir)
      .createOrReplaceTempView("seq_bin")
    val got = spark.sql(
      """SELECT convert_from(binary_key, 'BIGINT_BE') AS k,
                convert_from(binary_value, 'BIGINT_BE') AS v
         FROM seq_bin ORDER BY k""").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((-3L, -300L), (7L, 700L), (42L, 4200L)))
  }

  test("CIDR helpers yield null per dirty row instead of an ANSI cast crash") {
    import spark.implicits._
    import graft.functions.NetworkFunctions._
    val df = Seq(("10.0.0.5", "10.0.0.0/24"), ("10.0.0.5", "10.0.0.0/xx"),
      ("10.0.0.5", "garbage"), ("10.0.0.5", "10.0.0.0/99"))
      .toDF("ip", "cidr")
    val got = df.select(inNetwork(col("ip"), col("cidr"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0))).toSeq
    assert(got == Seq(Some(true), None, None, None))
    // ZOrder date columns: the cast-to-double path fails analysis under
    // ANSI — must go through the epoch forms
    val zd = Seq((java.sql.Date.valueOf("2024-01-05"), 1),
      (java.sql.Date.valueOf("2020-06-01"), 2)).toDF("d", "i")
    val z = graft.operators.ZOrder.withZValue(zd, Seq("d", "i"), bits = 2)
    assert(z.count() == 2)
    // null strings in a zorder column rank LOW (bucket 0), not max
    val zs = Seq((Option("zzz"), 1), (Option.empty[String], 2),
      (Option("aaa"), 3)).toDF("s", "i")
    val zv = graft.operators.ZOrder.withZValue(zs, Seq("s"), bits = 2)
      .select("i", "zval").as[(Int, Long)].collect().toMap
    assert(zv(2) <= zv(1) && zv(2) <= zv(3), s"null string must rank low: $zv")
  }

  test("kvgen/mappify explodes a JSON map column (SURVEY row 36)") {
    import spark.implicits._
    val df = Seq((1L, """{"a": 1, "b": 2}""")).toDF("id", "js")
    val rows = df.select(col("id"),
        explode(DrillFunctions.convertFromJsonMap(col("js"))))
      .orderBy("key").collect()
    assert(rows.map(r => (r.getString(1), r.getString(2))).toSeq ==
      Seq(("a", "1"), ("b", "2")))
  }
}
