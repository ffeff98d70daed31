package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.DrillFunctions._

/** §2.2 function-library coverage (Drill exec/expr/fn/impl), each with a
  * DuckDB oracle. Functions with engine-specific semantics (xxhash64,
  * murmur, typeof, initcap) are covered in ScalaTest instead.
  */
object QueriesFunctions {
  import GraftSession.{table => T}

  val queries: Map[String, QueriesRelational.Q] = Map(
    // ---- typeof (row 58; Drill TypeFunctions.typeof — Spark's
    // built-in expression of the same name): runtime SQL type names of
    // literal-typed expressions, hashed against a literal oracle ----
    "q_typeof" -> ((s, _) =>
      s.sql("""
        SELECT typeof(CAST(1 AS BIGINT)) AS t_bigint,
               typeof(CAST(1 AS INT)) AS t_int,
               typeof('x') AS t_string,
               typeof(1.5D) AS t_double,
               typeof(DATE'2024-01-01') AS t_date,
               typeof(TIMESTAMP'2024-01-01 00:00:00') AS t_ts,
               typeof(CAST(1.50 AS DECIMAL(9, 2))) AS t_dec,
               typeof(true) AS t_bool,
               typeof(array(1, 2)) AS t_array,
               typeof(map('k', 1)) AS t_map
        FROM range(1)""")),

    // ---- context functions (row 57; Drill ContextFunctions
    // current_schema / session context): the deterministic
    // catalog-context slice as SQL (session_id / user forms stay
    // spec-verified — they are environment-dependent by design) ----
    "q_context_fns" -> ((s, _) =>
      s.sql("""
        SELECT current_database() AS db, current_catalog() AS cat,
               current_schema() AS sch
        FROM range(1)""")),

    // ---- GIS non-algebra stragglers (row 58e4): srid round-trip
    // through st_geomfromtext(wkt, srid) and the EXACT Esri-JSON
    // renderings of st_asjson (point / paths / rings with wkid) vs
    // literal oracles ----
    "q_gis_stragglers" -> ((s, _) => {
      import graft.functions.GisFunctions._
      val poly = stGeomFromTextSrid(
        lit("POLYGON ((0 0, 2 0, 2 2, 0 0))"), lit(3857))
      s.range(1).select(
        stSrid(stGeomFromTextSrid(lit("POINT (1 0)"), lit(3857))).as("srid"),
        stAsJson(stGeomFromText(lit("POINT (1.5 -2.5)"))).as("pj"),
        stAsJson(stGeomFromText(lit("LINESTRING (0 0, 1 1)"))).as("lj"),
        stAsJson(poly, stSrid(poly)).as("gj"))
    }),

    // ---- bloom filter (row 58f; the sketch family next to the gated
    // HLL/t-digest): no false negatives on the 20 smallest orderkeys
    // (deterministic pick), false-positive rate over 1000 known-absent
    // probes bounded — sketch hashing is seed-fixed, so every boolean
    // is deterministic and a quality miss flips the row hashes ----
    "q_bloom_filter" -> ((s, d) => {
      import s.implicits._
      val orders = T(s, d, "orders")
      // size from the actual cardinality — an under-provisioned filter
      // saturates and the fp bound below fails by design
      val bf = orders.stat.bloomFilter("o_orderkey", orders.count(), 0.03)
      val keys = orders.orderBy("o_orderkey").limit(20)
        .select("o_orderkey").collect().map(_.getLong(0)).toSeq
      // orderkeys end well below 1e9 at every fixture SF
      val absent = 1000000000L until 1000001000L
      val fpBounded = absent.count(bf.mightContain) <= 90 // 3x the 3% fpp
      keys.map(k => (k, bf.mightContain(k), fpBounded))
        .toDF("o_orderkey", "present", "fp_bounded")
    }),

    // ---- count-min sketch (row 58f): per-flag estimates of the
    // lineitem return flags never undercount and stay within the
    // configured eps*N overcount bound; seed fixed ----
    "q_count_min" -> ((s, d) => {
      import s.implicits._
      val li = T(s, d, "lineitem")
      val total = li.count()
      val cms = li.stat.countMinSketch("l_returnflag", eps = 0.005,
        confidence = 0.99, seed = 42)
      val cap = (0.005 * total).toLong + 1
      val exact = li.groupBy("l_returnflag").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.keys.toSeq.sorted.map { f =>
        val est = cms.estimateCount(f)
        (f, est >= exact(f), est <= exact(f) + cap)
      }.toDF("l_returnflag", "lower_ok", "upper_ok")
    }),

    "q_string_fns" -> ((s, d) =>
      T(s, d, "customer").filter(col("c_custkey") < 200)
        .select(col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_name")).as("lo"),
          substring(col("c_name"), 1, 8).as("pre"),
          length(col("c_name")).as("len"),
          regexp_replace(col("c_name"), "Customer", "C").as("repl"),
          call_function("split_part", col("c_name"), lit("#"), lit(2)).as("num_part"),
          reverse(col("c_name")).as("rev"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          concat_ws("-", col("c_mktsegment"), col("c_name")).as("joined"),
          instr(col("c_name"), "#").as("pos"))),

    "q_regex_fns" -> ((s, d) =>
      T(s, d, "customer").filter(col("c_custkey") < 200)
        .select(col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
          col("c_name").rlike("00").as("has00"),
          col("c_name").ilike("customer%").as("ilk"),
          regexp_replace(col("c_name"), "[0-9]", "x").as("masked"))),

    "q_math_fns" -> ((s, d) =>
      T(s, d, "lineitem").filter(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(abs(-col("l_extendedprice")), 2).as("abs_p"),
          ceil(col("l_quantity")).as("ceil_q"),
          floor(col("l_quantity")).as("floor_q"),
          round(sqrt(col("l_extendedprice")), 6).as("sqrt_p"),
          round(log(col("l_extendedprice")), 6).as("ln_p"),
          round(log10(col("l_extendedprice")), 6).as("log_p"),
          round(pow(col("l_quantity"), 2), 4).as("pow_q"),
          (col("l_orderkey") % 7).as("mod_k"),
          signum(col("l_discount") - 0.05).cast("int").as("sgn"),
          round(cbrt(col("l_extendedprice")), 6).as("cbrt_p"))),

    "q_date_fns" -> ((s, d) =>
      T(s, d, "orders").filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("qtr"),
          last_day(col("o_orderdate")).as("month_end"),
          trunc(col("o_orderdate"), "month").as("month_start"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_2002"))),

    "q_cast_fns" -> ((s, d) =>
      T(s, d, "orders").filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          col("o_orderkey").cast("string").as("key_str"),
          col("o_totalprice").cast("decimal(18,2)").cast("string").as("price_str"),
          col("o_orderdate").cast("date").as("od"),
          (lit("123").cast("bigint") + col("o_orderkey")).as("k2"),
          floor(col("o_totalprice")).as("price_int"))),

    "q_null_fns" -> ((s, d) =>
      T(s, d, "customer").filter(col("c_custkey") < 300)
        .select(col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(none)")).as("seg2"),
          nullif(col("c_mktsegment"), lit("BUILDING")).isNull.cast("int").as("was_building"),
          round(least(col("c_acctbal"), lit(1000.0)), 2).as("capped"),
          greatest(col("c_nationkey"), lit(10)).as("nk_floor"))),

    "q_hash_fns" -> ((s, d) =>
      T(s, d, "customer").filter(col("c_custkey") < 100)
        .select(col("c_custkey"),
          md5Hex(col("c_name")).as("md5_hash"),
          sha256Hex(col("c_name")).as("sha256_hash"))),

    "q_parse_url" -> ((s, d) => {
      val url = concat(lit("https://www.example.com/seg/"), lower(col("c_mktsegment")),
        lit("?cust="), col("c_custkey"), lit("&n="), col("c_nationkey"))
      T(s, d, "customer").filter(col("c_custkey") < 200)
        .select(col("c_custkey"),
          parseUrlHost(url).as("host"),
          parseUrlPath(url).as("path"),
          parseQueryParam(url, "cust").as("cust_param"))
    }),

    "q_convert_json" -> ((s, d) =>
      T(s, d, "customer").filter(col("c_custkey") < 200)
        .select(col("c_custkey"),
          convertToJson(struct(col("c_custkey"), col("c_mktsegment"))).as("js"))),

    "q_agg_basic" -> ((s, d) =>
      T(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        count_distinct(col("l_partkey")).as("n_parts"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(min("l_extendedprice"), 2).as("min_price"),
        round(max("l_extendedprice"), 2).as("max_price"))),

    "q_agg_stats" -> ((s, d) =>
      T(s, d, "lineitem").groupBy("l_returnflag").agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 2).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qp"))),

    "q_agg_bool" -> ((s, d) =>
      T(s, d, "lineitem").groupBy("l_returnflag").agg(
        bool_and(col("l_quantity") > 0).as("all_pos"),
        bool_or(col("l_discount") > 0.08).as("any_big_disc"))),

    "q_agg_collect" -> ((s, d) =>
      T(s, d, "customer").groupBy("c_nationkey").agg(
        array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segs"))),

    "q_percentiles" -> ((s, d) =>
      T(s, d, "lineitem").groupBy("l_returnflag").agg(
        round(call_function("percentile", col("l_quantity"), lit(0.25)), 4).as("p25"),
        round(call_function("percentile", col("l_quantity"), lit(0.5)), 4).as("p50"),
        round(call_function("percentile", col("l_quantity"), lit(0.75)), 4).as("p75"),
        round(call_function("percentile", col("l_quantity"), lit(0.9)), 4).as("p90"))),

    "q_approx_distinct" -> ((s, d) =>
      T(s, d, "lineitem").agg(
        count_distinct(col("l_partkey")).as("exact_cnt"),
        (abs(approx_count_distinct(col("l_partkey")) - count_distinct(col("l_partkey")))
          <= count_distinct(col("l_partkey")) * 0.05).as("within_tol"))),

    "q_grouping_fn" -> ((s, d) =>
      T(s, d, "customer").cube("c_mktsegment")
        .agg(grouping(col("c_mktsegment")).cast("int").as("g"),
          count(lit(1)).as("n"))
        .select("c_mktsegment", "g", "n")),

    // Drill BitFunctions.java: bitwise and/or/xor, shifts, popcount
    "q_bit_fns" -> ((s, d) =>
      T(s, d, "customer").filter(col("c_custkey") < 500)
        .select(col("c_custkey"),
          col("c_custkey").bitwiseAND(255).as("band_and"),
          col("c_custkey").bitwiseOR(16).as("band_or"),
          col("c_custkey").bitwiseXOR(col("c_nationkey")).as("bxor"),
          shiftleft(col("c_custkey") % 16, 2).as("shl"),
          shiftright(col("c_custkey"), 1).as("shr"),
          bit_count(col("c_custkey")).as("pop"))),

    // second string batch: translate/ascii/chr/left/right/repeat/btrim
    // (Drill StringFunctions.java covers all of these)
    "q_string_fns2" -> ((s, d) =>
      T(s, d, "customer").filter(col("c_custkey") < 200)
        .select(col("c_custkey"),
          translate(col("c_name"), "Cust", "Kast").as("trans"),
          ascii(col("c_mktsegment")).as("asc"),
          expr("char(65 + c_custkey % 26)").as("letter"),
          expr("left(c_name, 4)").as("l4"),
          expr("right(c_name, 3)").as("r3"),
          repeat(lit("ab"), 3).as("rep"),
          expr("btrim(c_name, 'Cr0123456789')").as("trimmed"))),

    // entropy + entropy_per_byte (ThreatHuntingFunctions.java): both
    // engines compute log2 Shannon entropy over the char distribution —
    // DuckDB via its entropy() aggregate on exploded chars, graft via
    // the native one-pass kernel; 6dp rounding absorbs FP-order noise
    "q_entropy" -> ((s, d) => {
      val ent = call_function("entropy", col("text"))
      T(s, d, "documents").select(col("doc_id"),
        round(ent, 6).as("ent_bits"),
        round(ent / nullif(octet_length(col("text")), lit(0)), 9)
          .as("ent_per_byte"))
    }),

    // Drill-specific long-tail fns (StringFunctions.java parse_query /
    // isdate / byte_substr / binary_string-string_binary role): query
    // strings via str_to_map, format-aware to_number, try-cast date
    // validity, binary substring + hex round-trip
    "q_drill_fns_tail" -> ((s, d) =>
      T(s, d, "customer").filter(col("c_custkey") < 200)
        .select(col("c_custkey"),
          expr("str_to_map(concat('seg=', c_mktsegment, '&key=', c_custkey), '&', '=')")
            .getItem("seg").as("qp_seg"),
          expr("cast(to_number(format_number(c_custkey * 1000 + 500, 0), '9,999,999') as double)")
            .as("parsed_num"),
          expr("try_cast(CASE WHEN c_custkey % 3 = 0 THEN '2024-01-15' ELSE c_name END AS DATE) IS NOT NULL")
            .as("is_date"),
          hex(expr("substring(encode(c_name, 'utf-8'), 3, 4)")).as("bsub_hex"),
          hex(encode(col("c_mktsegment"), "utf-8")).as("seg_hex"))),

    "q_date_fns2" -> ((s, d) =>
      T(s, d, "orders").filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          weekofyear(col("o_orderdate")).as("wk"),
          dayofyear(col("o_orderdate")).as("doy"),
          make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)).as("month_first"),
          add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))),

    // third date batch: format-string parse round-trip, dow, intervals,
    // epoch-day arithmetic (Drill DateTypeFunctions + DateUtilFunctions)
    "q_date_fns3" -> ((s, d) =>
      T(s, d, "orders").filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          to_date(date_format(col("o_orderdate"), "dd/MM/yyyy"), "dd/MM/yyyy")
            .as("rt_date"),
          dayofweek(col("o_orderdate")).as("dow"),
          (col("o_orderdate").cast("date") + expr("INTERVAL 90 DAYS")).as("plus90"),
          datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
            .as("epoch_day"),
          trunc(col("o_orderdate"), "quarter").as("q_start"))),

    // fourth date batch: broader date/interval arithmetic parity —
    // months_between on month boundaries, next_day, timestampadd,
    // weekday, year-month interval literals, make_timestamp (Drill
    // DateTypeFunctions: age/date_add family + Calcite TIMESTAMPADD)
    "q_date_fns4" -> ((s, d) =>
      T(s, d, "orders").filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          months_between(lit("2002-01-01").cast("date"),
            trunc(col("o_orderdate"), "month")).cast("int").as("months_to_2002"),
          next_day(col("o_orderdate").cast("date"), "Monday").as("next_mon"),
          expr("timestampadd(YEAR, 2, cast(o_orderdate as timestamp))")
            .cast("date").as("plus2y"),
          expr("weekday(o_orderdate)").cast("int").as("wd"),
          (col("o_orderdate").cast("date") + expr("INTERVAL '1-2' YEAR TO MONTH"))
            .cast("date").as("plus1y2m"),
          expr("""unix_timestamp(make_timestamp(year(o_orderdate),
            month(o_orderdate), day(o_orderdate), 12, 30, 15))""")
            .as("noonish_epoch"))),

    // Drill repeated_count / repeated_contains and friends over arrays
    // (ref exec/.../expr/fn/impl/SimpleRepeatedFunctions.java)
    "q_array_fns" -> ((s, d) => {
      val words = split(graft.pipeline.TextAnalysis.normalize(col("text")), " ")
      T(s, d, "documents")
        .select(col("doc_id"),
          size(words).as("n_words"),
          array_contains(words, "the").cast("int").as("has_the"),
          array_position(words, "the").as("pos_the"),
          element_at(words, 1).as("first_word"),
          element_at(words, -1).as("last_word"),
          array_join(slice(words, 1, 3), " ").as("first3"))
    }),

    // Drill TDigestFunctions: approximate percentile vs exact, gated with
    // the same tolerance pattern as q_approx_distinct.
    "q_approx_percentile" -> ((s, d) =>
      T(s, d, "lineitem").groupBy("l_returnflag").agg(
        round(call_function("percentile", col("l_extendedprice"), lit(0.5)), 4).as("p50_exact"),
        (abs(call_function("approx_percentile", col("l_extendedprice"), lit(0.5), lit(1000))
          - call_function("percentile", col("l_extendedprice"), lit(0.5)))
          <= call_function("percentile", col("l_extendedprice"), lit(0.5)) * 0.02)
          .as("within_tol"))),

    // Drill contrib/udfs string-distance functions (LevenshteinDistance
    // etc.); soundex/metaphone are engine-specific, asserted in ScalaTest.
    // SQL:99 SIMILAR TO (StringFunctions.java similar_to +
    // RegexpUtil.sqlToRegexSimilar): the oracle hand-translates each
    // SQL pattern to the regex DuckDB's SIMILAR TO takes natively, so
    // graft's translator is cross-checked against an independent
    // rendering of the same rules ----
    "q_similar_to" -> ((s, d) => {
      import graft.functions.DrillFunctions.similarTo
      T(s, d, "customer").filter(col("c_custkey") < 800)
        .select(col("c_custkey"),
          similarTo(col("c_name"), "Customer#%1").as("ends_1"),
          similarTo(col("c_mktsegment"), "(BUILDING|MACHINERY)").as("seg_alt"),
          similarTo(col("c_name"), "Customer#0000001__").as("id_1xx"),
          similarTo(col("c_mktsegment"), "[A-F]%").as("seg_af"))
    }),

    // contrib/udfs DateFunctions tail: nearest_date (time-series GROUP
    // BY floor, ref DateConversionUtils.java), year_week, percent_change
    // (DistributionFunctions.java zero-handling included) ----
    "q_contrib_dates" -> ((s, d) =>
      T(s, d, "orders").filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          graft.functions.DrillFunctions.nearestDate(
            col("o_orderdate").cast("timestamp"), "QUARTER")
            .cast("date").as("nd_quarter"),
          graft.functions.DrillFunctions.nearestDate(
            col("o_orderdate").cast("timestamp"), "WEEK_SUNDAY")
            .cast("date").as("nd_wk_sun"),
          graft.functions.DrillFunctions.nearestDate(
            col("o_orderdate").cast("timestamp"), "WEEK_MONDAY")
            .cast("date").as("nd_wk_mon"),
          graft.functions.DrillFunctions.yearWeek(col("o_orderdate")).as("yw"),
          round(graft.functions.DrillFunctions.percentChange(
            col("o_totalprice"), col("o_totalprice") - col("o_custkey")), 6)
            .as("pct"))),

    "q_string_distance" -> ((s, d) =>
      T(s, d, "customer").filter(col("c_custkey") < 300)
        .select(col("c_custkey"),
          levenshtein(col("c_name"), lit("Customer#000000042")).as("lev"),
          levenshtein(col("c_mktsegment"), lit("BUILDING")).as("lev_seg"))),

    // The rest of Drill's string-distance pack (contrib/udfs
    // StringDistanceFunctions.java -> commons-text, bound as native
    // expressions): jaccard (char-set) and hamming (rpad to equal
    // length — both engines truncate-or-fill to 10) oracle exactly
    // against DuckDB's identical algorithms. jaro/cosine/fuzzy/LCS are
    // spec-verified against the reference's own test values instead
    // (commons-text's jaro core disagrees with DuckDB's on long
    // unequal-length pairs, and the reference semantics win) ----
    "q_string_distance2" -> ((s, d) =>
      T(s, d, "customer").filter(col("c_custkey") < 500)
        .select(col("c_custkey"),
          round(call_function("jaccard_distance",
            lower(col("c_name")), lower(col("c_mktsegment"))), 6).as("jac_d"),
          round(call_function("hamming_distance",
            rpad(lower(col("c_name")), 10, "#"),
            rpad(lower(col("c_mktsegment")), 10, "#")), 6).as("ham_d"))),

    // Drill contrib/udfs NetworkFunctions.java: inet_aton/ntoa, CIDR math,
    // private-range tests — all pure Column arithmetic (see
    // functions/NetworkFunctions.scala). IPs/CIDRs derived from order keys
    // so the oracle can re-derive them with identical integer arithmetic.
    // md2 — the one digest Spark lacks (Drill contrib/udfs
    // CryptoFunctions): RFC 1319's own published test vectors as the
    // literal oracle, computed by graft's native expression
    "q_md2" -> ((s, _) => {
      import s.implicits._
      Seq((1, ""), (2, "a"), (3, "abc"), (4, "message digest"),
        (5, "abcdefghijklmnopqrstuvwxyz"))
        .toDF("id", "raw")
        .select(col("id"), call_function("md2", col("raw")).as("digest"))
    }),

    // URL percent-codec (Drill wraps java.net.URLEncoder; Spark's
    // url_encode/url_decode are the same codec): GOLDEN literal pairs
    // generated with java.net.URLEncoder itself — java semantics differ
    // from RFC 3986 pedantry exactly where it matters ('~' encodes to
    // %7E, '*' stays, space becomes '+') — plus the decode round-trip
    "q_url_codec" -> ((s, _) => {
      import s.implicits._
      Seq(
        (1, "a b&c/d"), (2, "héllo wörld"), (3, "100% + 2 = ?"),
        (4, "x~y_z-1.2*"), (5, "a=b&c=d"), (6, "päth/to?q=1#frag"),
        (7, "quote'dq\""), (8, "tab\tnl\n"))
        .toDF("id", "raw")
        .select(col("id"),
          call_function("url_encode", col("raw")).as("enc"),
          call_function("url_decode",
            call_function("url_encode", col("raw"))).as("roundtrip"))
    }),

    "q_network_fns" -> ((s, d) => {
      import graft.functions.NetworkFunctions._
      val o = col("o_orderkey")
      val ip = concat_ws(".", (o % 223 + 1).cast("string"),
        ((o * 7) % 256).cast("string"), ((o * 13) % 256).cast("string"),
        ((o * 29) % 256).cast("string"))
      val cidr = concat((o % 223 + 1).cast("string"), lit(".0.0.0/"),
        (o % 17 + 8).cast("string"))
      T(s, d, "orders").filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"), ip.as("ip"),
          inetAton(ip).as("ip_num"),
          inetNtoa(inetAton(ip)).as("ip_rt"),
          isValidIpv4(ip).as("valid"),
          isPrivateIp(ip).as("priv"),
          inNetwork(ip, lit("10.0.0.0/8")).as("in10"),
          netmask(cidr).as("nm"),
          broadcastAddress(cidr).as("bc"),
          lowAddress(cidr).as("lo"),
          highAddress(cidr).as("hi"),
          addressCount(cidr).as("n_hosts"))
    }),

    // Drill contrib/udfs PhoneticFunctions.java: the commons-codec family
    // behind one native expression (functions/Phonetics.scala); expected
    // encodings in the oracle are independently computed literals.
    "q_phonetic" -> ((s, _) => {
      import s.implicits._
      Seq("Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak", "Pfister",
        "Thompson", "MacDonald", "Knight", "Wright", "Garcia", "Lukasiewicz")
        .toDF("name")
        .select(col("name"),
          soundex(col("name")).as("sdx"),
          call_function("refined_soundex", col("name")).as("rsdx"),
          call_function("metaphone", col("name")).as("mp"),
          call_function("nysiis", col("name")).as("ny"),
          call_function("caverphone2", col("name")).as("cv"))
    }),

    // Drill contrib/udfs CryptoFunctions.java tail: sha1/sha384/sha512 +
    // an aes_encrypt/aes_decrypt round-trip (ECB = deterministic mode;
    // Spark built-ins). DuckDB computes md5/sha256; the digests it lacks
    // are independently-computed literals in the oracle.
    "q_crypto_fns" -> ((s, _) => {
      import s.implicits._
      val key = lit("0123456789abcdef")
      Seq("graft", "drill", "spark", "lineitem", "100TB").toDF("s")
        .select(col("s"),
          md5(col("s")).as("md5_hex"),
          sha1(col("s")).as("sha1_hex"),
          sha2(col("s"), 256).as("sha256_hex"),
          sha2(col("s"), 384).as("sha384_hex"),
          sha2(col("s"), 512).as("sha512_hex"),
          expr("cast(aes_decrypt(aes_encrypt(s, '0123456789abcdef', 'ECB'), " +
            "'0123456789abcdef', 'ECB') as string)").as("aes_rt"))
    }),

    // Drill contrib/udfs DistributionFunctions.java width_bucket +
    // ThreatHuntingFunctions.java punctuation_pattern. Bucket bounds are
    // chosen so the width (5.0) is exact in binary floating point — no
    // engine-dependent boundary rounding.
    "q_distribution_fns" -> ((s, d) => {
      import graft.functions.DistributionFunctions._
      T(s, d, "lineitem").filter(col("l_orderkey") < 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          widthBucket(col("l_quantity"), lit(0.0), lit(50.0), lit(10L)).as("qty_bucket"))
    }),

    // Drill contrib/udfs ThreatHuntingFunctions.java punctuation_pattern
    // (the log-template shape extractor); entropy from the same pack is
    // spec-gated (FunctionsSpec) — log-based doubles aren't bit-portable.
    "q_punct_pattern" -> ((s, d) =>
      T(s, d, "documents").select(col("doc_id"),
        graft.functions.DistributionFunctions.punctuationPattern(
          substring(col("text"), 1, 80)).as("punct"))),

    // True Kendall rank correlation per nation (Drill's kendall_correlation
    // is a sequential-pair approximation; this gates the exact statistic).
    "q_kendall" -> ((s, d) =>
      graft.functions.DistributionFunctions.kendallTau(
        T(s, d, "supplier"), "s_nationkey", "s_suppkey", "s_acctbal", "s_suppkey")),

    // Drill contrib/udfs TimeBucketFunctions.java: integer floor-div
    // bucketing of epoch time.
    "q_time_bucket" -> ((s, d) => {
      val ev = T(s, d, "events")
      val ms = graft.streaming.Events.tsSeconds(ev) * 1000
      ev.select(col("event_id"),
        graft.functions.DistributionFunctions.timeBucketMs(ms, lit(600000L)).as("bucket_ms"))
    }),

    // Drill contrib/udfs gis/: point construction + haversine distance +
    // predicates, over coordinates derived from keys with arithmetic the
    // oracle shares (pure libm math — same IEEE double pipeline both
    // engines, rounded like the other math gates).
    "q_gis_fns" -> ((s, d) => {
      import graft.functions.GisFunctions._
      val lon = (col("c_custkey") % 360) - 180 + 0.25
      val lat = ((col("c_nationkey") * 7) % 180) - 90 + 0.5
      T(s, d, "customer").filter(col("c_custkey") < 500)
        .select(col("c_custkey"),
          round(lon, 2).as("lon"), round(lat, 2).as("lat"),
          round(stDistanceKm(lon, lat, lit(0.0), lit(0.0)), 6).as("dist_km"),
          stDWithinKm(lon, lat, lit(0.0), lit(0.0), 5000.0).as("within_5000km"),
          stWithinBBox(lon, lat, -30, -30, 30, 30).as("in_bbox"))
    }),

    // Planar geometry core (contrib/udfs gis/: STGeomFromText,
    // STWithin, STEnvelope): WKT-parsed diamond polygon, ray-casting
    // containment. The oracle re-derives containment in closed form —
    // a diamond is the L1 ball, so `inside` == |lon|+|lat| < r, exact
    // in SQL (no data point sits on the boundary: coordinate sums land
    // on 0.1 multiples, r = 3.05 between them) ----
    "q_gis_polygon" -> ((s, d) => {
      import graft.functions.GisFunctions._
      val lon = (col("o_orderkey") % 100).cast("double") / 10.0 - 5.0
      val lat = ((col("o_orderkey") * 7) % 100).cast("double") / 10.0 - 5.0
      val g = stGeomFromText(
        lit("POLYGON ((3.05 0, 0 3.05, -3.05 0, 0 -3.05, 3.05 0))"))
      T(s, d, "orders").filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          round(lon, 1).as("lon"), round(lat, 1).as("lat"),
          stContains(g, lon, lat).as("inside"),
          round(stXMax(g), 2).as("env_xmax"))
    }),

    // DE-9IM predicate pack (contrib/udfs gis/STIntersects/Disjoint/
    // Equals/Touches/Crosses/Overlaps — Esri-backed in the reference,
    // re-derived from the DE-9IM definitions here). The fixtures are
    // AXIS-ALIGNED rectangles and horizontal/vertical segments generated
    // from o_orderkey, so every predicate has a CLOSED-FORM interval
    // answer the oracle computes with pure integer arithmetic — no
    // geometry code shared with the implementation. eq_rot asserts
    // ring-rotation-invariant polygon equality (always true).
    "q_gis_predicates" -> ((s, d) => {
      import graft.functions.GisFunctions._
      import org.apache.spark.sql.Column
      val k = col("o_orderkey")
      def w(c: Column): Column = c.cast("string")
      // rect A [ax1,ax2]x[ay1,ay2], rect B, horizontal L, collinear M,
      // vertical V — identical derivations in the oracle SQL
      val ax1 = k % 5; val ax2 = ax1 + 1 + (k % 3)
      val ay1 = (k * 2) % 5; val ay2 = ay1 + 1 + ((k * 5) % 2)
      val bx1 = (k * 3) % 6; val bx2 = bx1 + 1 + ((k * 7) % 3)
      val by1 = (k * 11) % 5; val by2 = by1 + 1 + (k % 2)
      val ly = (k * 13) % 7 - 1
      val lx1 = (k * 17) % 5 - 1; val lx2 = lx1 + 1 + ((k * 19) % 4)
      val mx1 = (k * 23) % 6 - 2; val mx2 = mx1 + 1 + ((k * 29) % 3)
      val vx = (k * 31) % 5
      val vy1 = (k * 37) % 4 - 2; val vy2 = vy1 + 2 + (k % 2)
      def rect(x1: Column, y1: Column, x2: Column, y2: Column): Column =
        stGeomFromText(concat(lit("POLYGON (("),
          w(x1), lit(" "), w(y1), lit(", "), w(x2), lit(" "), w(y1), lit(", "),
          w(x2), lit(" "), w(y2), lit(", "), w(x1), lit(" "), w(y2), lit(", "),
          w(x1), lit(" "), w(y1), lit("))")))
      def seg(x1: Column, y1: Column, x2: Column, y2: Column): Column =
        stGeomFromText(concat(lit("LINESTRING ("),
          w(x1), lit(" "), w(y1), lit(", "), w(x2), lit(" "), w(y2), lit(")")))
      val ga = rect(ax1, ay1, ax2, ay2)
      val gaRot = stGeomFromText(concat(lit("POLYGON (("),
        w(ax2), lit(" "), w(ay1), lit(", "), w(ax2), lit(" "), w(ay2), lit(", "),
        w(ax1), lit(" "), w(ay2), lit(", "), w(ax1), lit(" "), w(ay1), lit(", "),
        w(ax2), lit(" "), w(ay1), lit("))")))
      val gb = rect(bx1, by1, bx2, by2)
      val gl = seg(lx1, ly, lx2, ly)
      val gm = seg(mx1, ly, mx2, ly)
      val gv = seg(vx, vy1, vx, vy2)
      T(s, d, "orders").filter(k < 400)
        .select(k.as("o_orderkey"),
          stIntersects(ga, gb).as("r_int"),
          stDisjoint(ga, gb).as("r_disj"),
          stEquals(ga, gb).as("r_eq"),
          stTouches(ga, gb).as("r_touch"),
          stOverlaps(ga, gb).as("r_overlap"),
          stCrosses(ga, gb).as("r_cross"),
          stEquals(ga, gaRot).as("eq_rot"),
          stIntersects(gl, ga).as("l_int"),
          stTouches(gl, ga).as("l_touch"),
          stCrosses(gl, ga).as("l_cross"),
          stIntersects(gl, gm).as("ll_int"),
          stEquals(gl, gm).as("ll_eq"),
          stTouches(gl, gm).as("ll_touch"),
          stOverlaps(gl, gm).as("ll_overlap"),
          stIntersects(gl, gv).as("lv_int"),
          stCrosses(gl, gv).as("lv_cross"),
          stTouches(gl, gv).as("lv_touch"))
    }),

    // Constructive geometry, CONVEX slice (contrib/udfs gis/STUnion,
    // STDifference; Esri-backed intersection): fixtures are axis-aligned
    // rectangles derived so B properly bites A's right edge (proper
    // crossings only — degenerate contact is spec territory), C is
    // disjoint, D strictly contained. Every area has a CLOSED-FORM
    // interval-arithmetic answer the oracle computes with integer
    // arithmetic; NULL (= empty geometry) surfaces as -1.
    "q_gis_clip" -> ((s, d) => {
      import graft.functions.GisFunctions._
      import org.apache.spark.sql.Column
      val k = col("o_orderkey")
      def w(c: Column): Column = c.cast("string")
      val ax1 = k % 5; val ax2 = ax1 + 4 + k % 3
      val ay1 = (k * 2) % 5; val ay2 = ay1 + 4 + (k * 5) % 2
      val bx1 = ax1 + 1 + k % 2; val bx2 = ax2 + 1 + (k * 7) % 3
      val by1 = ay1 + 1; val by2 = ay2 - 1
      val cx1 = ax2 + 2; val cx2 = cx1 + 2
      val dx1 = ax1 + 1; val dx2 = ax2 - 1
      val dy1 = ay1 + 1; val dy2 = ay2 - 1
      def rect(x1: Column, y1: Column, x2: Column, y2: Column): Column =
        stGeomFromText(concat(lit("POLYGON (("),
          w(x1), lit(" "), w(y1), lit(", "), w(x2), lit(" "), w(y1), lit(", "),
          w(x2), lit(" "), w(y2), lit(", "), w(x1), lit(" "), w(y2), lit(", "),
          w(x1), lit(" "), w(y1), lit("))")))
      val ga = rect(ax1, ay1, ax2, ay2)
      val gb = rect(bx1, by1, bx2, by2)
      val gc = rect(cx1, ay1, cx2, ay1 + 3)
      val gd = rect(dx1, dy1, dx2, dy2)
      T(s, d, "orders").filter(k < 400)
        .select(k.as("o_orderkey"),
          round(stArea(stIntersection(ga, gb)), 6).as("inter_area"),
          round(stArea(stUnion(ga, gb)), 6).as("union_area"),
          size(stUnion(ga, gb)("xs")).as("union_nv"),
          round(stArea(stDifference(ga, gb)), 6).as("diff_area"),
          size(stDifference(ga, gb)("xs")).as("diff_nv"),
          round(coalesce(stArea(stIntersection(ga, gc)), lit(-1.0)), 6)
            .as("disj_inter"),
          round(stArea(stIntersection(ga, gd)), 6).as("cont_inter"),
          round(stArea(stUnion(ga, gd)), 6).as("cont_union"),
          round(coalesce(stArea(stDifference(gd, ga)), lit(-1.0)), 6)
            .as("cont_diff"))
    }),

    // CONCAVE clip (round 16 narrowing of the 58e5 refusal): L-shaped
    // subjects (orthogonally convex, so any axis-aligned window yields
    // ONE piece) intersect parameterized windows; the oracle re-derives
    // every area with exact rectangle interval arithmetic:
    // area(L ∩ W) = area(outer ∩ W) − area(notch ∩ W).
    "q_gis_clip_concave" -> ((s, d) => {
      import graft.functions.GisFunctions._
      import org.apache.spark.sql.Column
      val k = col("o_orderkey")
      def w(c: Column): Column = c.cast("string")
      val x1 = k % 5; val y1 = (k * 2) % 5
      val x2 = x1 + 6 + k % 3; val y2 = y1 + 6 + (k * 5) % 2
      val nx1 = x1 + 3 + k % 2; val ny1 = y1 + 3 + (k * 3) % 2
      val wx1 = x1 + 1 + (k * 7) % 3; val wy1 = y1 + 1 + (k * 11) % 3
      val wx2 = wx1 + 4 + k % 4; val wy2 = wy1 + 4 + (k * 13) % 2
      // L-shape: outer rect minus its top-right notch corner (CCW)
      val ell = stGeomFromText(concat(lit("POLYGON (("),
        w(x1), lit(" "), w(y1), lit(", "), w(x2), lit(" "), w(y1), lit(", "),
        w(x2), lit(" "), w(ny1), lit(", "), w(nx1), lit(" "), w(ny1), lit(", "),
        w(nx1), lit(" "), w(y2), lit(", "), w(x1), lit(" "), w(y2), lit(", "),
        w(x1), lit(" "), w(y1), lit("))")))
      def rect(a1: Column, b1: Column, a2: Column, b2: Column): Column =
        stGeomFromText(concat(lit("POLYGON (("),
          w(a1), lit(" "), w(b1), lit(", "), w(a2), lit(" "), w(b1), lit(", "),
          w(a2), lit(" "), w(b2), lit(", "), w(a1), lit(" "), w(b2), lit(", "),
          w(a1), lit(" "), w(b1), lit("))")))
      val win = rect(wx1, wy1, wx2, wy2)
      val contain = rect(x1 - 1, y1 - 1, x2 + 1, y2 + 1)
      T(s, d, "orders").filter(k < 400)
        .select(k.as("o_orderkey"),
          round(coalesce(stArea(stIntersection(ell, win)), lit(-1.0)), 6)
            .as("inter_area"),
          round(coalesce(stArea(stIntersection(win, ell)), lit(-1.0)), 6)
            .as("inter_area_swap"),
          round(stArea(stIntersection(ell, contain)), 6).as("full_area"))
    }),

    // st_buffer, convex slice (ref contrib/udfs gis/STBuffer.java —
    // Esri GeometryEngine.buffer there). Every derived measure has a
    // CLOSED FORM the oracle recomputes with no geometry code: rounded-
    // rect area = wh + 2(w+h)d + the 32-gon disc (16 d² sin(π/16)),
    // vertex count is a constant of the construction, envelope extremes
    // are EXACT (arc endpoints emitted from the edge normals, no trig),
    // erosion of a rectangle is the exact inset (empty → -1 sentinel),
    // and the point buffer is the bare disc-gon. Areas round to 6dp on
    // BOTH engines so a libm-vs-JDK sin() ulp can never flip the hash.
    "q_gis_buffer" -> ((s, d) => {
      import graft.functions.GisFunctions._
      import org.apache.spark.sql.Column
      val k = col("o_orderkey")
      def w(c: Column): Column = c.cast("string")
      val x1 = k % 5; val y1 = (k * 2) % 5
      val x2 = x1 + 3 + k % 4; val y2 = y1 + 2 + (k * 5) % 3
      val dd = (lit(1) + (k * 7) % 3).cast("double")
      def rect(a1: Column, b1: Column, a2: Column, b2: Column): Column =
        stGeomFromText(concat(lit("POLYGON (("),
          w(a1), lit(" "), w(b1), lit(", "), w(a2), lit(" "), w(b1), lit(", "),
          w(a2), lit(" "), w(b2), lit(", "), w(a1), lit(" "), w(b2), lit(", "),
          w(a1), lit(" "), w(b1), lit("))")))
      val r = rect(x1, y1, x2, y2)
      val pt = stGeomFromText(concat(lit("POINT ("), w(x1), lit(" "),
        w(y1), lit(")")))
      val buffed = call_function("st_buffer", r, dd)
      val eroded = call_function("st_buffer", r, -dd)
      T(s, d, "orders").filter(k < 400)
        .select(k.as("o_orderkey"),
          round(stArea(buffed), 6).as("buf_area"),
          size(buffed("xs")).as("nv"),
          stXMin(buffed).as("bxmin"), stXMax(buffed).as("bxmax"),
          stYMin(buffed).as("bymin"), stYMax(buffed).as("bymax"),
          round(coalesce(stArea(eroded), lit(-1.0)), 6).as("ero_area"),
          round(stArea(call_function("st_buffer", pt, dd)), 6)
            .as("pt_area"))
    }),

    // MULTI-piece concave intersection (ConvexClip round-13 narrowing):
    // a parameterized U-shape clipped by a band ABOVE its notch floor
    // yields TWO prongs — an honest MULTIPOLYGON whose st_area sums the
    // parts — while a band below the floor yields one rectangle. Every
    // prong is axis-aligned, so the oracle is pure interval arithmetic:
    // m_area = (a + W - b)(H - h - 1), envelope = the U's own extremes.
    "q_gis_clip_multi" -> ((s, d) => {
      import graft.functions.GisFunctions._
      import org.apache.spark.sql.Column
      val k = col("o_orderkey")
      val wd = (lit(8) + k % 5).cast("double")
      val ht = (lit(6) + k % 3).cast("double")
      val a = (lit(2) + k % 2).cast("double")
      val b = a + 2.0 + (k % 3).cast("double")
      val h = (lit(2) + k % 2).cast("double")
      def w(c: Column): Column = c.cast("string")
      def pt(x: Column, y: Column): Column =
        concat(w(x), lit(" "), w(y))
      val z = lit(0.0)
      val uWkt = concat(lit("POLYGON (("),
        pt(z, z), lit(", "), pt(wd, z), lit(", "), pt(wd, ht), lit(", "),
        pt(b, ht), lit(", "), pt(b, h), lit(", "), pt(a, h), lit(", "),
        pt(a, ht), lit(", "), pt(z, ht), lit("))"))
      def rectWkt(x1: Column, y1: Column, x2: Column, y2: Column): Column =
        concat(lit("POLYGON (("),
          pt(x1, y1), lit(", "), pt(x2, y1), lit(", "),
          pt(x2, y2), lit(", "), pt(x1, y2), lit("))"))
      val u = stGeomFromText(uWkt)
      val band = stGeomFromText(
        rectWkt(lit(-1.0), h + 1.0, wd + 1.0, ht + 2.0))
      val low = stGeomFromText(
        rectWkt(lit(-1.0), lit(-1.0), wd + 1.0, h - 1.0))
      val multi = call_function("st_intersection", u, band)
      val single = call_function("st_intersection", u, low)
      T(s, d, "orders").filter(k < 400)
        .select(k.as("o_orderkey"),
          stNumGeometries(multi).as("m_pieces"),
          round(stArea(multi), 6).as("m_area"),
          stXMin(multi).as("m_xmin"), stXMax(multi).as("m_xmax"),
          stYMin(multi).as("m_ymin"), stYMax(multi).as("m_ymax"),
          stNumGeometries(single).as("s_pieces"),
          round(stArea(single), 6).as("s_area"),
          single("gtype").as("s_gtype"))
    }),

    // CONCAVE boundary-merging st_union (edge-fragment walk, round-20
    // narrowing of the convex-only refusal): a parameterized L-shape
    // unions an overlapping rectangle protruding past its bottom arm —
    // one hole-free ring whose area/envelope/vertex count are pure
    // interval arithmetic (all fixtures rectilinear, all crossings
    // proper) — plus a concave-side containment case (union == the L).
    "q_gis_union_concave" -> ((s, d) => {
      import graft.functions.GisFunctions._
      import org.apache.spark.sql.Column
      val k = col("o_orderkey")
      val wd = (lit(8) + k % 5).cast("double")   // bottom arm width
      val ht = (lit(6) + k % 3).cast("double")   // total height
      val a = (lit(2) + k % 2).cast("double")    // vertical arm width
      def w(c: Column): Column = c.cast("string")
      def pt(x: Column, y: Column): Column = concat(w(x), lit(" "), w(y))
      val z = lit(0.0)
      // L: bottom arm wd x 2 + vertical arm a wide up to ht
      val ellWkt = concat(lit("POLYGON (("),
        pt(z, z), lit(", "), pt(wd, z), lit(", "), pt(wd, lit(2.0)),
        lit(", "), pt(a, lit(2.0)), lit(", "), pt(a, ht), lit(", "),
        pt(z, ht), lit("))"))
      def rectWkt(x1: Column, y1: Column, x2: Column, y2: Column): Column =
        concat(lit("POLYGON (("),
          pt(x1, y1), lit(", "), pt(x2, y1), lit(", "),
          pt(x2, y2), lit(", "), pt(x1, y2), lit("))"))
      val ell = stGeomFromText(ellWkt)
      // overlaps the vertical arm (left edge inside it), protrudes
      // right past the L: overlap = 1x1, protrusion rest of 1-high band
      val band = stGeomFromText(
        rectWkt(a - 1.0, lit(3.0), wd + 1.0, lit(4.0)))
      val inner = stGeomFromText(
        rectWkt(lit(3.0), lit(0.5), lit(5.0), lit(1.5)))
      val u = call_function("st_union", ell, band)
      val uc = call_function("st_union", ell, inner)
      T(s, d, "orders").filter(k < 400)
        .select(k.as("o_orderkey"),
          stNumGeometries(u).as("u_pieces"),
          u("gtype").as("u_gtype"),
          round(stArea(u), 6).as("u_area"),
          size(u("xs")).as("u_nv"),
          stXMin(u).as("u_xmin"), stXMax(u).as("u_xmax"),
          stYMin(u).as("u_ymin"), stYMax(u).as("u_ymax"),
          round(stArea(uc), 6).as("c_area"),
          size(uc("xs")).as("c_nv"))
    }),

    // BOTH-concave st_intersection (the round-21 narrowing of the last
    // intersection refusal: the union's edge-fragment walk with the
    // side test flipped). All fixtures RECTILINEAR and parameterized,
    // so every measure is pure interval arithmetic. Four dispositions:
    // a single-ring L∩L (area wd−a, 6 vertices, exact envelope), an
    // INTERLOCKING pair whose intersection is two disjoint rectangles
    // (honest MULTIPOLYGON, area a+2), concave-in-concave containment
    // (the inner Γ returns verbatim, area 1.25), and a disjoint pair
    // (EMPTY intersection → −1 sentinel, a value not a refusal).
    "q_gis_clip_both_concave" -> ((s, d) => {
      import graft.functions.GisFunctions._
      import org.apache.spark.sql.Column
      val k = col("o_orderkey")
      val wd = (lit(8) + k % 5).cast("double")   // bottom arm width
      val ht = (lit(6) + k % 3).cast("double")   // total height
      val a = (lit(2) + k % 2).cast("double")    // vertical arm width
      val vb = a + 1.0                           // B's arm sits right of A's
      def w(c: Column): Column = c.cast("string")
      def pt(x: Column, y: Column): Column = concat(w(x), lit(" "), w(y))
      def poly(pts: Column*): Column = stGeomFromText(concat(
        (lit("POLYGON ((") +: pts.flatMap(p => Seq(p, lit(", ")))
          .dropRight(1) :+ lit("))")): _*))
      val z = lit(0.0)
      // A: L — bottom arm wd×2 + vertical arm a wide up to ht
      val ell = poly(pt(z, z), pt(wd, z), pt(wd, lit(2.0)),
        pt(a, lit(2.0)), pt(a, ht), pt(z, ht), pt(z, z))
      // B: mirrored L — bottom arm [vb, wd+1]×[−1,1] + vertical arm
      // [vb, vb+1] up to 5; its arms cross A's bottom arm properly
      val bee = poly(pt(vb, lit(-1.0)), pt(wd + 1.0, lit(-1.0)),
        pt(wd + 1.0, lit(1.0)), pt(vb + 1.0, lit(1.0)),
        pt(vb + 1.0, lit(5.0)), pt(vb, lit(5.0)), pt(vb, lit(-1.0)))
      // C: Γ — vertical arm [vb,vb+1]×[−1,4] + horizontal arm
      // [−1,vb+1]×[3,4]; interlocks with A in TWO disjoint pieces
      // ([vb,vb+1]×[0,2] through the bottom arm, [0,a]×[3,4] through
      // the vertical arm — the Γ's corner lies outside A)
      val gam = poly(pt(vb, lit(-1.0)), pt(vb + 1.0, lit(-1.0)),
        pt(vb + 1.0, lit(4.0)), pt(lit(-1.0), lit(4.0)),
        pt(lit(-1.0), lit(3.0)), pt(vb, lit(3.0)), pt(vb, lit(-1.0)))
      // D: a small Γ strictly inside A's vertical arm (containment)
      val innerG = stGeomFromText(lit("POLYGON ((0.5 3, 1.5 3, " +
        "1.5 3.5, 1 3.5, 1 5, 0.5 5, 0.5 3))"))
      // E: the same Γ shifted past A's right edge (disjoint → empty)
      val farG = poly(pt(wd + 2.0, lit(3.0)), pt(wd + 3.0, lit(3.0)),
        pt(wd + 3.0, lit(3.5)), pt(wd + 2.5, lit(3.5)),
        pt(wd + 2.5, lit(5.0)), pt(wd + 2.0, lit(5.0)),
        pt(wd + 2.0, lit(3.0)))
      val i1 = call_function("st_intersection", ell, bee)
      val i1s = call_function("st_intersection", bee, ell)
      val m = call_function("st_intersection", ell, gam)
      val c = call_function("st_intersection", ell, innerG)
      val dd = call_function("st_intersection", ell, farG)
      T(s, d, "orders").filter(k < 400)
        .select(k.as("o_orderkey"),
          i1("gtype").as("i_gtype"),
          stNumGeometries(i1).as("i_pieces"),
          round(stArea(i1), 6).as("i_area"),
          size(i1("xs")).as("i_nv"),
          stXMin(i1).as("i_xmin"), stXMax(i1).as("i_xmax"),
          stYMin(i1).as("i_ymin"), stYMax(i1).as("i_ymax"),
          round(stArea(i1s), 6).as("i_area_swap"),
          stNumGeometries(m).as("m_pieces"),
          round(stArea(m), 6).as("m_area"),
          stXMin(m).as("m_xmin"), stXMax(m).as("m_xmax"),
          stYMin(m).as("m_ymin"), stYMax(m).as("m_ymax"),
          round(stArea(c), 6).as("c_area"),
          size(c("xs")).as("c_nv"),
          round(coalesce(stArea(dd), lit(-1.0)), 6).as("d_area"))
    }),

    // ST_UnionAggregate's disjoint slice (st_union_multi over
    // collect_list): per group, a set of BY-CONSTRUCTION disjoint
    // rectangles (x-stride 3 > width 2; y fixed per group) unions into
    // one MULTIPOLYGON whose part count / summed area / envelope the
    // oracle recomputes with count/min/max arithmetic.
    "q_union_agg" -> ((s, d) => {
      import graft.functions.GisFunctions._
      import org.apache.spark.sql.Column
      val k = col("o_orderkey")
      val grp = (k % 4).as("grp")
      val x1 = (k * 3).cast("double")
      val y1 = ((k % 4) * 10).cast("double")
      def w(c: Column): Column = c.cast("string")
      val rectWkt = concat(lit("POLYGON (("),
        w(x1), lit(" "), w(y1), lit(", "),
        w(x1 + 2.0), lit(" "), w(y1), lit(", "),
        w(x1 + 2.0), lit(" "), w(y1 + 1.0), lit(", "),
        w(x1), lit(" "), w(y1 + 1.0), lit("))"))
      T(s, d, "orders").filter(k < 200)
        .select(grp, stGeomFromText(rectWkt).as("g"))
        .groupBy("grp")
        .agg(call_function("st_union_multi", collect_list(col("g"))).as("u"))
        .select(col("grp"),
          stNumGeometries(col("u")).as("n_parts"),
          round(stArea(col("u")), 6).as("area"),
          stXMin(col("u")).as("xmin"), stXMax(col("u")).as("xmax"),
          stYMin(col("u")).as("ymin"), stYMax(col("u")).as("ymax"))
    }),

    // st_transform 4326 <-> 3857 (reference contrib/udfs gis/
    // STTransform.java, narrowed to closed-form pairs): the Web
    // Mercator formulas are elementary — x = R*radians(lon),
    // y = R*ln(tan(pi/4 + radians(lat)/2)) — so the oracle recomputes
    // them verbatim in SQL. Meters round to 2dp (cm): the libm-vs-JDK
    // tan/ln ulp gap is ~1e-8 m at Mercator magnitudes, five orders
    // under the rounding step. The round-trip back to 4326 rounds at
    // 9dp against the exact inputs (binary-exact .25/.5 offsets, so
    // the 1e-12-degree inversion error cannot straddle a boundary).
    "q_st_transform" -> ((s, d) => {
      import graft.functions.GisFunctions._
      import org.apache.spark.sql.Column
      val k = col("o_orderkey")
      val lon = (k % 360).cast("double") - 180.0 + 0.25
      val lat = ((k * 7) % 160).cast("double") - 80.0 + 0.5
      def w(c: Column): Column = c.cast("string")
      val pt = stGeomFromText(concat(lit("POINT ("), w(lon), lit(" "),
        w(lat), lit(")")))
      val merc = stTransform(pt, 4326, 3857)
      val back = stTransform(merc, 3857, 4326)
      T(s, d, "orders").filter(k < 400)
        .select(k.as("o_orderkey"),
          round(element_at(merc("xs"), 1), 2).as("mx"),
          round(element_at(merc("ys"), 1), 2).as("my"),
          round(element_at(back("xs"), 1), 9).as("rt_lon"),
          round(element_at(back("ys"), 1), 9).as("rt_lat"))
    }),

    // st_transform 4326 <-> UTM (Krüger series, WGS84): FIXED known
    // points against literal expected values cross-validated by two
    // independent published formulations (the Karney n-series and the
    // USGS/Snyder e-series agree to <1 mm on these points; tools/
    // utm_golden.py regenerates both). Eastings/northings at 2dp (cm,
    // every value >=2 mm from a rounding boundary); the round trip
    // back to degrees at 6dp.
    "q_st_transform_utm" -> ((s, _) => {
      import graft.functions.GisFunctions._
      import s.implicits._
      val pts = Seq( // (id, lon, lat, epsg)
        (1, 2.2945, 48.8584, 32631),   // Eiffel Tower, 31N
        (2, -73.5, 40.5, 32618),       // Snyder's example point, 18N
        (3, 151.2153, -33.8568, 32756),// Sydney, 56S
        (4, 3.0, 0.0, 32631),          // equator x central meridian
        (5, 103.85, 1.29, 32648),      // Singapore, 48N
        (6, -122.4194, 37.7749, 32610))// San Francisco, 10N
      pts.map { case (id, lon, lat, epsg) =>
        val pt = stGeomFromText(
          concat(lit("POINT ("), lit(lon.toString), lit(" "),
            lit(lat.toString), lit(")")))
        val utm = stTransform(pt, 4326, epsg)
        val back = stTransform(utm, epsg, 4326)
        s.range(1).select(lit(id).as("id"),
          round(element_at(utm("xs"), 1), 2).as("easting"),
          round(element_at(utm("ys"), 1), 2).as("northing"),
          round(element_at(back("xs"), 1), 6).as("rt_lon"),
          round(element_at(back("ys"), 1), 6).as("rt_lat"))
      }.reduce(_ unionAll _)
    }),

    // Mergeable HLL sketch columns (Spark's Datasketches-backed built-ins):
    // per-group sketches union to an estimate within tolerance of the
    // global exact count — the "sketch once, merge cheaply" contract that
    // replaces a second full count-distinct pass at 100 TB.
    "q_hll_sketch" -> ((s, d) => {
      val l = T(s, d, "lineitem")
      val perGroup = l.groupBy("l_returnflag")
        .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
      val merged = perGroup.agg(
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"),
        count(lit(1)).as("n_groups"))
      val exact = l.agg(count_distinct(col("l_partkey")).as("exact_cnt"))
      merged.crossJoin(exact).select(col("n_groups"), col("exact_cnt"),
        (abs(col("est") - col("exact_cnt")) <= col("exact_cnt") * 0.05)
          .as("within_tol"))
    }),

    // Typed binary convert_from/convert_to codecs (ref exec/.../expr/fn/
    // impl/conv/BigIntBEConvertFrom.java and siblings; Hadoop vlong per
    // exec/util/ByteBufUtil.java). The INTEGER family's oracle derives
    // every signed value ARITHMETICALLY from the big-endian hex
    // (('0x'||h)::UBIGINT, two's-complement fold in SQL) — no decode
    // logic is shared with the implementation, and the little-endian
    // columns must land on the same arithmetic value, so a wrong byte
    // order on either side fails the gate. Round-trip columns prove the
    // encoders byte-exactly (hex back to the input literal).
    "q_convert_binary" -> ((s, _) => {
      import s.implicits._
      ConvCorpus.toDF("tag", "be8", "le8", "vl", "be4", "le4", "be2", "le2", "b1")
        .select(col("tag"),
          expr("convert_from(unhex(be8), 'BIGINT_BE')").as("v_be8"),
          expr("convert_from(unhex(le8), 'BIGINT')").as("v_le8"),
          expr("convert_from(unhex(le8), 'UINT8')").as("v_uint8"),
          expr("convert_from(unhex(vl), 'BIGINT_HADOOPV')").as("v_vlong"),
          expr("convert_from(unhex(be4), 'INT_BE')").as("v_int_be"),
          expr("convert_from(unhex(le4), 'INT')").as("v_int_le"),
          expr("convert_from(unhex(be4), 'UINT4_BE')").as("v_uint4"),
          expr("cast(convert_from(unhex(be2), 'SMALLINT_BE') as int)").as("v_small_be"),
          expr("cast(convert_from(unhex(le2), 'SMALLINT') as int)").as("v_small_le"),
          expr("cast(convert_from(unhex(b1), 'TINYINT') as int)").as("v_tiny"),
          expr("convert_from(unhex(b1), 'BOOLEAN_BYTE')").as("v_bool"),
          expr("upper(hex(convert_to(convert_from(unhex(be8),'BIGINT_BE'), 'BIGINT_BE')))").as("rt_be8"),
          expr("upper(hex(convert_to(convert_from(unhex(vl),'BIGINT_HADOOPV'), 'BIGINT_HADOOPV')))").as("rt_vl"),
          expr("upper(hex(convert_to(convert_from(unhex(le4),'INT'), 'INT')))").as("rt_le4"))
    }),

    // The temporal/float/text half of the codec family. Oracle values
    // are public-spec constants (IEEE-754 layouts, epoch millis, UTF
    // encodings) verified independently; DATE_EPOCH floors to the day
    // with the reference's truncating % semantics.
    "q_convert_binary2" -> ((s, _) => {
      import s.implicits._
      Seq(1).toDF("one").select(
        expr("convert_from(unhex('00000176BBFEB2C0'), 'DATE_EPOCH_BE')").as("d_be"),
        expr("convert_from(unhex('C0B2FEBB76010000'), 'DATE_EPOCH')").as("d_le"),
        expr("convert_from(unhex('00000176BBFEB2C0'), 'TIME_EPOCH_BE')").as("t_ms"),
        expr("convert_from(unhex('00000176BBFEB2C0'), 'TIMESTAMP_EPOCH_BE')").as("ts_be"),
        expr("convert_from(unhex('C0B2FEBB76010000'), 'TIMESTAMP_EPOCH')").as("ts_le"),
        expr("cast(convert_from(unhex('3FC00000'), 'FLOAT_BE') as double)").as("f_be"),
        expr("cast(convert_from(unhex('0000C03F'), 'FLOAT') as double)").as("f_le"),
        expr("convert_from(unhex('C004000000000000'), 'DOUBLE_BE')").as("dbl_be"),
        expr("convert_from(unhex('00000000000004C0'), 'DOUBLE')").as("dbl_le"),
        expr("convert_from(unhex('68C3A96C6C6F'), 'UTF8')").as("s_utf8"),
        expr("convert_from(unhex('FEFF00680069'), 'UTF16')").as("s_utf16"),
        expr("upper(hex(convert_to(DATE'2021-01-01', 'DATE_EPOCH_BE')))").as("rt_date"),
        expr("upper(hex(convert_to(TIMESTAMP'2021-01-01 03:30:00', 'TIMESTAMP_EPOCH_BE')))").as("rt_ts"),
        expr("upper(hex(convert_to('héllo', 'UTF8')))").as("rt_utf8"),
        expr("upper(hex(convert_to(convert_from(unhex('FEFF00680069'),'UTF16'), 'UTF16')))").as("rt_utf16"))
    }),

    // Drill contrib/udfs UserAgentFunctions.java: the rule cascade in
    // functions/UserAgent.scala, mirrored verbatim in the oracle SQL over
    // the same inline corpus.
    "q_parse_ua" -> ((s, _) => {
      import s.implicits._
      import graft.functions.UserAgent
      UaCorpus.toDF("ua_id", "ua").select(col("ua_id"),
        UserAgent.browser(col("ua")).as("browser"),
        UserAgent.browserVersion(col("ua")).as("browser_version"),
        UserAgent.osName(col("ua")).as("os"),
        UserAgent.deviceClass(col("ua")).as("device_class"),
        UserAgent.isBot(col("ua")).as("is_bot"))
    }))

  /** Inline UA corpus for q_parse_ua — one row per branch of the rule
    * cascade (each major browser/OS/device family + three bot shapes). */
  private val UaCorpus = Seq(
    (1, "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"),
    (2, "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91"),
    (3, "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0"),
    (4, "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Mobile/15E148 Safari/604.1"),
    (5, "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.6 Safari/605.1.15"),
    (6, "Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.43 Mobile Safari/537.36"),
    (7, "Mozilla/5.0 (Linux; Android 13; SM-X710) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.6045.163 Safari/537.36"),
    (8, "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)"),
    (9, "curl/8.4.0"),
    (10, "python-requests/2.31.0"),
    (11, "Mozilla/5.0 (compatible; MSIE 10.0; Windows NT 6.1; Trident/6.0)"),
    (12, "Mozilla/5.0 (Windows NT 6.1; Trident/7.0; rv:11.0) like Gecko"),
    (16, "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/64.0.3282.140 Safari/537.36 Edge/18.17763"),
    (17, "Mozilla/5.0 (Linux; Android 10; HD1913) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/118.0.0.0 Mobile Safari/537.36 EdgA/118.0.2088.81"),
    (13, "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/118.0.0.0 Safari/537.36 OPR/104.0.0.0"),
    (14, "Mozilla/5.0 (iPad; CPU OS 16_6 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.6 Mobile/15E148 Safari/604.1"),
    (15, "SomeRandomClient/1.0"))

  /** q_convert_binary fixture: per row one sample value per width —
    * (tag, 8-byte BE/LE hex, Hadoop-vlong hex, 4-byte BE/LE, 2-byte
    * BE/LE, 1-byte). Boundary set: 0, 1, -2, max, min, 255, a
    * distinct-byte pattern. */
  private val ConvCorpus = Seq(
    ("a", "0000000000000000", "0000000000000000", "00", "00000000", "00000000", "0000", "0000", "00"),
    ("b", "0000000000000001", "0100000000000000", "01", "00000001", "01000000", "0001", "0100", "01"),
    ("c", "FFFFFFFFFFFFFFFE", "FEFFFFFFFFFFFFFF", "FE", "FFFFFFFE", "FEFFFFFF", "FFFE", "FEFF", "FE"),
    ("d", "7FFFFFFFFFFFFFFF", "FFFFFFFFFFFFFF7F", "887FFFFFFFFFFFFFFF", "7FFFFFFF", "FFFFFF7F", "7FFF", "FF7F", "7F"),
    ("e", "8000000000000000", "0000000000000080", "807FFFFFFFFFFFFFFF", "80000000", "00000080", "8000", "0080", "80"),
    ("f", "00000000000000FF", "FF00000000000000", "8FFF", "000000FF", "FF000000", "00FF", "FF00", "FF"),
    ("g", "123456789ABCDEF0", "F0DEBC9A78563412", "88123456789ABCDEF0", "12345678", "78563412", "1234", "3412", "12"))

  private val ConvCorpusSql: String = ConvCorpus.map { case (t, a, b, c, d, e, f, g, h) =>
    s"('$t','$a','$b','$c','$d','$e','$f','$g','$h')"
  }.mkString(", ")

  val oracle: Map[String, String] = Map(
    "q_gis_stragglers" -> """
      SELECT * FROM (VALUES (3857,
        '{"x":1.5,"y":-2.5,"spatialReference":{"wkid":4326}}',
        '{"paths":[[[0.0,0.0],[1.0,1.0]]],"spatialReference":{"wkid":4326}}',
        '{"rings":[[[0.0,0.0],[2.0,0.0],[2.0,2.0],[0.0,0.0]]],"spatialReference":{"wkid":3857}}'))
      t(srid, pj, lj, gj)""",
    "q_bloom_filter" -> """
      SELECT o_orderkey, true AS present, true AS fp_bounded
      FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20)""",
    "q_count_min" -> """
      SELECT * FROM (VALUES ('A', true, true), ('N', true, true),
        ('R', true, true)) t(l_returnflag, lower_ok, upper_ok)""",
    "q_typeof" -> """
      SELECT * FROM (VALUES ('bigint', 'int', 'string', 'double', 'date',
        'timestamp', 'decimal(9,2)', 'boolean', 'array<int>',
        'map<string,int>'))
      t(t_bigint, t_int, t_string, t_double, t_date, t_ts, t_dec,
        t_bool, t_array, t_map)""",
    "q_context_fns" -> """
      SELECT * FROM (VALUES ('default', 'spark_catalog', 'default'))
      t(db, cat, sch)""",
    "q_gis_clip" ->
      """WITH g AS (
           SELECT o_orderkey,
             o_orderkey % 5 AS ax1,
             o_orderkey % 5 + 4 + (o_orderkey % 3) AS ax2,
             (o_orderkey*2) % 5 AS ay1,
             (o_orderkey*2) % 5 + 4 + ((o_orderkey*5) % 2) AS ay2,
             o_orderkey % 5 + 1 + (o_orderkey % 2) AS bx1,
             o_orderkey % 5 + 4 + (o_orderkey % 3) + 1 + ((o_orderkey*7) % 3) AS bx2
           FROM orders WHERE o_orderkey < 400),
         m AS (SELECT *,
             (ax2-ax1)*(ay2-ay1) AS area_a,
             (bx2-bx1)*(ay2-1-(ay1+1)) AS area_b,
             (ax2-bx1)*(ay2-1-(ay1+1)) AS area_i
           FROM g)
         SELECT o_orderkey,
           area_i::DOUBLE AS inter_area,
           (area_a + area_b - area_i)::DOUBLE AS union_area,
           8::INTEGER AS union_nv,
           (area_a - area_i)::DOUBLE AS diff_area,
           8::INTEGER AS diff_nv,
           (-1)::DOUBLE AS disj_inter,
           ((ax2-ax1-2)*(ay2-ay1-2))::DOUBLE AS cont_inter,
           area_a::DOUBLE AS cont_union,
           (-1)::DOUBLE AS cont_diff
         FROM m""",
    "q_gis_clip_concave" ->
      """WITH g AS (
           SELECT o_orderkey,
             o_orderkey % 5 AS x1,
             (o_orderkey*2) % 5 AS y1,
             o_orderkey % 5 + 6 + (o_orderkey % 3) AS x2,
             (o_orderkey*2) % 5 + 6 + ((o_orderkey*5) % 2) AS y2,
             o_orderkey % 5 + 3 + (o_orderkey % 2) AS nx1,
             (o_orderkey*2) % 5 + 3 + ((o_orderkey*3) % 2) AS ny1,
             o_orderkey % 5 + 1 + ((o_orderkey*7) % 3) AS wx1,
             (o_orderkey*2) % 5 + 1 + ((o_orderkey*11) % 3) AS wy1
           FROM orders WHERE o_orderkey < 400),
         g2 AS (SELECT *, wx1 + 4 + (o_orderkey % 4) AS wx2,
                       wy1 + 4 + ((o_orderkey*13) % 2) AS wy2 FROM g),
         m AS (SELECT o_orderkey,
             GREATEST(0, LEAST(x2, wx2) - GREATEST(x1, wx1))
               * GREATEST(0, LEAST(y2, wy2) - GREATEST(y1, wy1))
             - GREATEST(0, LEAST(x2, wx2) - GREATEST(nx1, wx1))
               * GREATEST(0, LEAST(y2, wy2) - GREATEST(ny1, wy1)) AS inter,
             (x2 - x1) * (y2 - y1) - (x2 - nx1) * (y2 - ny1) AS full_a
           FROM g2)
         SELECT o_orderkey,
           (CASE WHEN inter <= 0 THEN -1 ELSE inter END)::DOUBLE AS inter_area,
           (CASE WHEN inter <= 0 THEN -1 ELSE inter END)::DOUBLE AS inter_area_swap,
           full_a::DOUBLE AS full_area
         FROM m""",
    "q_gis_buffer" ->
      """WITH g AS (
           SELECT o_orderkey,
             (o_orderkey % 5)::DOUBLE AS x1,
             ((o_orderkey*2) % 5)::DOUBLE AS y1,
             (3 + o_orderkey % 4)::DOUBLE AS wd,
             (2 + (o_orderkey*5) % 3)::DOUBLE AS ht,
             (1 + (o_orderkey*7) % 3)::DOUBLE AS dd
           FROM orders WHERE o_orderkey < 400)
         SELECT o_orderkey,
           round(wd*ht + 2*(wd + ht)*dd + 16*dd*dd*sin(pi()/16), 6)
             AS buf_area,
           36 AS nv,
           x1 - dd AS bxmin, x1 + wd + dd AS bxmax,
           y1 - dd AS bymin, y1 + ht + dd AS bymax,
           round(CASE WHEN wd > 2*dd AND ht > 2*dd
                 THEN (wd - 2*dd) * (ht - 2*dd) ELSE -1.0 END, 6)
             AS ero_area,
           round(16*dd*dd*sin(pi()/16), 6) AS pt_area
         FROM g""",
    "q_gis_clip_multi" ->
      """WITH g AS (
           SELECT o_orderkey,
             (8 + o_orderkey % 5)::DOUBLE AS wd,
             (6 + o_orderkey % 3)::DOUBLE AS ht,
             (2 + o_orderkey % 2)::DOUBLE AS a,
             (2 + o_orderkey % 2 + 2 + o_orderkey % 3)::DOUBLE AS b,
             (2 + o_orderkey % 2)::DOUBLE AS h
           FROM orders WHERE o_orderkey < 400)
         SELECT o_orderkey,
           2 AS m_pieces,
           round((a + wd - b) * (ht - h - 1), 6) AS m_area,
           0.0 AS m_xmin, wd AS m_xmax,
           h + 1 AS m_ymin, ht AS m_ymax,
           1 AS s_pieces,
           round(wd * (h - 1), 6) AS s_area,
           'POLYGON' AS s_gtype
         FROM g""",
    "q_gis_union_concave" ->
      """WITH g AS (
           SELECT o_orderkey,
             (8 + o_orderkey % 5)::DOUBLE AS wd,
             (6 + o_orderkey % 3)::DOUBLE AS ht,
             (2 + o_orderkey % 2)::DOUBLE AS a
           FROM orders WHERE o_orderkey < 400)
         SELECT o_orderkey,
           1 AS u_pieces,
           'POLYGON' AS u_gtype,
           round(wd * 2 + a * (ht - 2) + (wd + 2 - a) - 1, 6) AS u_area,
           10 AS u_nv,
           0.0 AS u_xmin, wd + 1 AS u_xmax,
           0.0 AS u_ymin, ht AS u_ymax,
           round(wd * 2 + a * (ht - 2), 6) AS c_area,
           6 AS c_nv
         FROM g""",
    "q_gis_clip_both_concave" ->
      """WITH g AS (
           SELECT o_orderkey,
             (8 + o_orderkey % 5)::DOUBLE AS wd,
             (6 + o_orderkey % 3)::DOUBLE AS ht,
             (2 + o_orderkey % 2)::DOUBLE AS a
           FROM orders WHERE o_orderkey < 400)
         SELECT o_orderkey,
           'POLYGON' AS i_gtype,
           1 AS i_pieces,
           round(wd - a, 6) AS i_area,
           6 AS i_nv,
           a + 1 AS i_xmin, wd AS i_xmax, 0.0 AS i_ymin, 2.0 AS i_ymax,
           round(wd - a, 6) AS i_area_swap,
           2 AS m_pieces,
           round(a + 2, 6) AS m_area,
           0.0 AS m_xmin, a + 2 AS m_xmax, 0.0 AS m_ymin, 4.0 AS m_ymax,
           1.25 AS c_area, 6 AS c_nv,
           -1.0 AS d_area
         FROM g""",
    "q_union_agg" ->
      """WITH g AS (
           SELECT o_orderkey % 4 AS grp, (o_orderkey * 3)::DOUBLE AS x1
           FROM orders WHERE o_orderkey < 200)
         SELECT grp,
           count(*)::INT AS n_parts,
           round(count(*) * 2.0, 6) AS area,
           min(x1) AS xmin, max(x1) + 2 AS xmax,
           (grp * 10)::DOUBLE AS ymin, (grp * 10 + 1)::DOUBLE AS ymax
         FROM g GROUP BY grp""",
    "q_st_transform" ->
      """WITH g AS (
           SELECT o_orderkey,
             (o_orderkey % 360)::DOUBLE - 180 + 0.25 AS lon,
             ((o_orderkey*7) % 160)::DOUBLE - 80 + 0.5 AS lat
           FROM orders WHERE o_orderkey < 400)
         SELECT o_orderkey,
           round(6378137 * radians(lon), 2) AS mx,
           round(6378137 * ln(tan(pi()/4 + radians(lat)/2)), 2) AS my,
           round(lon, 9) AS rt_lon,
           round(lat, 9) AS rt_lat
         FROM g""",
    "q_st_transform_utm" ->
      """SELECT id, easting::DOUBLE AS easting, northing::DOUBLE AS northing,
           rt_lon::DOUBLE AS rt_lon, rt_lat::DOUBLE AS rt_lat
         FROM (VALUES
           (1, 448252.00, 5411954.91, 2.2945, 48.8584),
           (2, 627103.09, 4484335.40, -73.5, 40.5),
           (3, 334900.57, 6252288.75, 151.2153, -33.8568),
           (4, 500000.00, 0.00, 3.0, 0.0),
           (5, 372057.37, 142612.91, 103.85, 1.29),
           (6, 551130.77, 4180998.88, -122.4194, 37.7749))
         AS t(id, easting, northing, rt_lon, rt_lat)""",
    "q_gis_predicates" ->
      """WITH g AS (
           SELECT o_orderkey, o_orderkey AS k,
             o_orderkey % 5 AS ax1, o_orderkey % 5 + 1 + (o_orderkey % 3) AS ax2,
             (o_orderkey*2) % 5 AS ay1,
             (o_orderkey*2) % 5 + 1 + ((o_orderkey*5) % 2) AS ay2,
             (o_orderkey*3) % 6 AS bx1,
             (o_orderkey*3) % 6 + 1 + ((o_orderkey*7) % 3) AS bx2,
             (o_orderkey*11) % 5 AS by1,
             (o_orderkey*11) % 5 + 1 + (o_orderkey % 2) AS by2,
             (o_orderkey*13) % 7 - 1 AS ly,
             (o_orderkey*17) % 5 - 1 AS lx1,
             (o_orderkey*17) % 5 + ((o_orderkey*19) % 4) AS lx2,
             (o_orderkey*23) % 6 - 2 AS mx1,
             (o_orderkey*23) % 6 - 1 + ((o_orderkey*29) % 3) AS mx2,
             (o_orderkey*31) % 5 AS vx,
             (o_orderkey*37) % 4 - 2 AS vy1,
             (o_orderkey*37) % 4 + (o_orderkey % 2) AS vy2
           FROM orders WHERE o_orderkey < 400),
         p AS (SELECT *,
             (greatest(ax1,bx1) <= least(ax2,bx2) AND greatest(ay1,by1) <= least(ay2,by2)) AS rint,
             (greatest(ax1,bx1) < least(ax2,bx2)) AS xint,
             (greatest(ay1,by1) < least(ay2,by2)) AS yint,
             (ax1=bx1 AND ax2=bx2 AND ay1=by1 AND ay2=by2) AS req,
             (bx1<=ax1 AND ax2<=bx2 AND by1<=ay1 AND ay2<=by2) AS awinb,
             (ax1<=bx1 AND bx2<=ax2 AND ay1<=by1 AND by2<=ay2) AS bwina,
             (ly >= ay1 AND ly <= ay2 AND lx2 >= ax1 AND lx1 <= ax2) AS lint,
             (ly > ay1 AND ly < ay2 AND least(lx2,ax2) > greatest(lx1,ax1)) AS lenters
           FROM g)
         SELECT o_orderkey,
           rint AS r_int, NOT rint AS r_disj, req AS r_eq,
           (rint AND NOT (xint AND yint)) AS r_touch,
           (xint AND yint AND NOT req AND NOT awinb AND NOT bwina) AS r_overlap,
           FALSE AS r_cross,
           TRUE AS eq_rot,
           lint AS l_int,
           (lint AND NOT lenters) AS l_touch,
           (lenters AND (lx1 < ax1 OR lx2 > ax2)) AS l_cross,
           (greatest(lx1,mx1) <= least(lx2,mx2)) AS ll_int,
           (lx1 = mx1 AND lx2 = mx2) AS ll_eq,
           (greatest(lx1,mx1) = least(lx2,mx2)) AS ll_touch,
           (greatest(lx1,mx1) < least(lx2,mx2) AND NOT (lx1=mx1 AND lx2=mx2)
              AND NOT (lx1<=mx1 AND mx2<=lx2) AND NOT (mx1<=lx1 AND lx2<=mx2)) AS ll_overlap,
           (vx >= lx1 AND vx <= lx2 AND ly >= vy1 AND ly <= vy2) AS lv_int,
           (vx > lx1 AND vx < lx2 AND ly > vy1 AND ly < vy2) AS lv_cross,
           ((vx >= lx1 AND vx <= lx2 AND ly >= vy1 AND ly <= vy2)
              AND NOT (vx > lx1 AND vx < lx2 AND ly > vy1 AND ly < vy2)) AS lv_touch
         FROM p""",
    "q_convert_binary" ->
      s"""WITH t(tag, be8, le8, vl, be4, le4, be2, le2, b1) AS (VALUES $ConvCorpusSql),
         u AS (SELECT tag, ('0x'||be8)::UBIGINT AS u8, ('0x'||be4)::UBIGINT AS u4,
                      ('0x'||be2)::UBIGINT AS u2, ('0x'||b1)::UBIGINT AS u1,
                      be8, vl, le4 FROM t),
         s AS (SELECT tag,
                 (CASE WHEN u8 >= 9223372036854775808::UBIGINT
                       THEN u8::HUGEINT - 18446744073709551616::HUGEINT
                       ELSE u8::HUGEINT END)::BIGINT AS s8,
                 (CASE WHEN u4 >= 2147483648 THEN u4::BIGINT - 4294967296
                       ELSE u4::BIGINT END)::INTEGER AS s4,
                 (CASE WHEN u2 >= 32768 THEN u2::BIGINT - 65536
                       ELSE u2::BIGINT END)::INTEGER AS s2,
                 (CASE WHEN u1 >= 128 THEN u1::BIGINT - 256
                       ELSE u1::BIGINT END)::INTEGER AS s1,
                 u4::BIGINT AS uu4, (u1 <> 0) AS bb, be8, vl, le4 FROM u)
         SELECT tag, s8 AS v_be8, s8 AS v_le8, s8 AS v_uint8, s8 AS v_vlong,
                s4 AS v_int_be, s4 AS v_int_le, uu4 AS v_uint4,
                s2 AS v_small_be, s2 AS v_small_le, s1 AS v_tiny, bb AS v_bool,
                be8 AS rt_be8, vl AS rt_vl, le4 AS rt_le4
         FROM s""",
    "q_convert_binary2" ->
      """SELECT DATE '2021-01-01' AS d_be, DATE '2021-01-01' AS d_le,
         12600000 AS t_ms,
         TIMESTAMP '2021-01-01 03:30:00' AS ts_be,
         TIMESTAMP '2021-01-01 03:30:00' AS ts_le,
         1.5::DOUBLE AS f_be, 1.5::DOUBLE AS f_le,
         (-2.5)::DOUBLE AS dbl_be, (-2.5)::DOUBLE AS dbl_le,
         'héllo' AS s_utf8, 'hi' AS s_utf16,
         '00000176BB3E7000' AS rt_date, '00000176BBFEB2C0' AS rt_ts,
         '68C3A96C6C6F' AS rt_utf8, 'FEFF00680069' AS rt_utf16""",
    "q_string_fns" ->
      """SELECT c_custkey, upper(c_name) AS up, lower(c_name) AS lo, substr(c_name, 1, 8) AS pre,
         length(c_name) AS len, regexp_replace(c_name, 'Customer', 'C', 'g') AS repl,
         split_part(c_name, '#', 2) AS num_part, reverse(c_name) AS rev,
         lpad(c_custkey::VARCHAR, 8, '0') AS padded,
         concat_ws('-', c_mktsegment, c_name) AS joined,
         strpos(c_name, '#') AS pos
         FROM customer WHERE c_custkey < 200""",
    "q_regex_fns" ->
      """SELECT c_custkey, regexp_extract(c_name, '([0-9]+)', 1) AS digits,
         regexp_matches(c_name, '00') AS has00,
         c_name ILIKE 'customer%' AS ilk,
         regexp_replace(c_name, '[0-9]', 'x', 'g') AS masked
         FROM customer WHERE c_custkey < 200""",
    "q_math_fns" ->
      """SELECT l_orderkey, l_linenumber, round(abs(-l_extendedprice), 2) AS abs_p,
         ceil(l_quantity)::BIGINT AS ceil_q, floor(l_quantity)::BIGINT AS floor_q,
         round(sqrt(l_extendedprice), 6) AS sqrt_p, round(ln(l_extendedprice), 6) AS ln_p,
         round(log10(l_extendedprice), 6) AS log_p, round(pow(l_quantity, 2), 4) AS pow_q,
         l_orderkey % 7 AS mod_k, sign(l_discount - 0.05)::INT AS sgn,
         round(cbrt(l_extendedprice), 6) AS cbrt_p
         FROM lineitem WHERE l_orderkey < 500""",
    "q_date_fns" ->
      """SELECT o_orderkey, year(o_orderdate)::INT AS yr, month(o_orderdate)::INT AS mo,
         day(o_orderdate)::INT AS dom, quarter(o_orderdate)::INT AS qtr,
         last_day(o_orderdate::DATE) AS month_end,
         date_trunc('month', o_orderdate)::DATE AS month_start,
         (o_orderdate::DATE + 30) AS plus30,
         date_diff('day', o_orderdate::DATE, DATE '2002-01-01')::INT AS days_to_2002
         FROM orders WHERE o_orderkey < 500""",
    "q_cast_fns" ->
      """SELECT o_orderkey, o_orderkey::VARCHAR AS key_str,
         o_totalprice::DECIMAL(18,2)::VARCHAR AS price_str,
         o_orderdate::DATE AS od, ('123'::BIGINT + o_orderkey) AS k2,
         floor(o_totalprice)::BIGINT AS price_int
         FROM orders WHERE o_orderkey < 1000""",
    "q_null_fns" ->
      """SELECT c_custkey, coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg2,
         (nullif(c_mktsegment, 'BUILDING') IS NULL)::INT AS was_building,
         round(least(c_acctbal, 1000.0), 2) AS capped,
         greatest(c_nationkey, 10) AS nk_floor
         FROM customer WHERE c_custkey < 300""",
    "q_hash_fns" ->
      "SELECT c_custkey, md5(c_name) AS md5_hash, sha256(c_name) AS sha256_hash FROM customer WHERE c_custkey < 100",
    "q_parse_url" ->
      """SELECT c_custkey,
         regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         regexp_extract(url, '^https?://[^/?]+(/[^?]*)', 1) AS path,
         regexp_extract(url, 'cust=([^&]*)', 1) AS cust_param
         FROM (SELECT c_custkey, 'https://www.example.com/seg/' || lower(c_mktsegment)
               || '?cust=' || c_custkey || '&n=' || c_nationkey AS url
               FROM customer WHERE c_custkey < 200)""",
    "q_convert_json" ->
      """SELECT c_custkey, to_json(struct_pack(c_custkey := c_custkey, c_mktsegment := c_mktsegment)) AS js
         FROM customer WHERE c_custkey < 200""",
    "q_agg_basic" ->
      """SELECT count(*) AS n_rows, count(DISTINCT l_partkey) AS n_parts,
         round(sum(l_quantity), 2) AS sum_qty, round(avg(l_extendedprice), 4) AS avg_price,
         round(min(l_extendedprice), 2) AS min_price, round(max(l_extendedprice), 2) AS max_price
         FROM lineitem""",
    "q_agg_stats" ->
      """SELECT l_returnflag, round(stddev_samp(l_quantity), 4) AS sd_qty,
         round(var_samp(l_quantity), 2) AS var_qty,
         round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
         round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp
         FROM lineitem GROUP BY l_returnflag""",
    "q_agg_bool" ->
      """SELECT l_returnflag, bool_and(l_quantity > 0) AS all_pos,
         bool_or(l_discount > 0.08) AS any_big_disc
         FROM lineitem GROUP BY l_returnflag""",
    "q_agg_collect" ->
      """SELECT c_nationkey, string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segs
         FROM customer GROUP BY c_nationkey""",
    "q_percentiles" ->
      """SELECT l_returnflag, round(quantile_cont(l_quantity, 0.25), 4) AS p25,
         round(quantile_cont(l_quantity, 0.5), 4) AS p50,
         round(quantile_cont(l_quantity, 0.75), 4) AS p75,
         round(quantile_cont(l_quantity, 0.9), 4) AS p90
         FROM lineitem GROUP BY l_returnflag""",
    "q_approx_distinct" ->
      "SELECT count(DISTINCT l_partkey) AS exact_cnt, TRUE AS within_tol FROM lineitem",
    "q_grouping_fn" ->
      """SELECT c_mktsegment, grouping(c_mktsegment)::INT AS g, count(*) AS n
         FROM customer GROUP BY CUBE(c_mktsegment)""",
    "q_string_distance" ->
      """SELECT c_custkey, levenshtein(c_name, 'Customer#000000042') AS lev,
         levenshtein(c_mktsegment, 'BUILDING') AS lev_seg
         FROM customer WHERE c_custkey < 300""",
    "q_similar_to" ->
      """SELECT c_custkey,
         c_name SIMILAR TO 'Customer#.*1' AS ends_1,
         c_mktsegment SIMILAR TO '(BUILDING|MACHINERY)' AS seg_alt,
         c_name SIMILAR TO 'Customer#0000001..' AS id_1xx,
         c_mktsegment SIMILAR TO '[A-F].*' AS seg_af
         FROM customer WHERE c_custkey < 800""",
    "q_contrib_dates" ->
      """SELECT o_orderkey,
         date_trunc('quarter', o_orderdate)::DATE AS nd_quarter,
         (date_trunc('week', o_orderdate + INTERVAL 1 DAY) - INTERVAL 1 DAY)::DATE AS nd_wk_sun,
         date_trunc('week', o_orderdate)::DATE AS nd_wk_mon,
         (year(o_orderdate) * 100 + weekofyear(o_orderdate))::INT AS yw,
         round(CASE WHEN o_totalprice - o_custkey = 0 OR o_totalprice = 0 THEN 0
               ELSE ((o_totalprice - o_custkey) - o_totalprice) * 100.0 / o_totalprice END, 6) AS pct
         FROM orders WHERE o_orderkey < 1000""",
    "q_string_distance2" ->
      """SELECT c_custkey,
         round(1 - jaccard(lower(c_name), lower(c_mktsegment)), 6) AS jac_d,
         round(hamming(rpad(lower(c_name), 10, '#'), rpad(lower(c_mktsegment), 10, '#')), 6)::DOUBLE AS ham_d
         FROM customer WHERE c_custkey < 500""",
    "q_bit_fns" ->
      """SELECT c_custkey, c_custkey & 255 AS band_and, c_custkey | 16 AS band_or,
         xor(c_custkey, c_nationkey) AS bxor,
         ((c_custkey % 16) << 2) AS shl, (c_custkey >> 1) AS shr,
         bit_count(c_custkey)::INT AS pop
         FROM customer WHERE c_custkey < 500""",
    "q_string_fns2" ->
      """SELECT c_custkey, translate(c_name, 'Cust', 'Kast') AS trans,
         ascii(c_mktsegment) AS asc, chr(65 + (c_custkey % 26)::INT) AS letter,
         left(c_name, 4) AS l4, right(c_name, 3) AS r3,
         repeat('ab', 3) AS rep,
         trim(c_name, 'Cr0123456789') AS trimmed
         FROM customer WHERE c_custkey < 200""",
    "q_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
                     FROM documents),
         e AS (SELECT doc_id, entropy(c) AS h FROM ch GROUP BY 1)
         SELECT d.doc_id, round(coalesce(e.h, 0), 6) AS ent_bits,
                round(coalesce(e.h, 0) / nullif(strlen(d.text), 0), 9)
                  AS ent_per_byte
         FROM documents d LEFT JOIN e USING (doc_id)""",
    "q_drill_fns_tail" ->
      """SELECT c_custkey,
         regexp_extract('seg=' || c_mktsegment || '&key=' || c_custkey,
                        'seg=([^&]*)', 1) AS qp_seg,
         (c_custkey * 1000 + 500)::DOUBLE AS parsed_num,
         (try_cast(CASE WHEN c_custkey % 3 = 0 THEN '2024-01-15' ELSE c_name END
                   AS DATE) IS NOT NULL) AS is_date,
         hex(substring(c_name, 3, 4)) AS bsub_hex,
         hex(c_mktsegment) AS seg_hex
         FROM customer WHERE c_custkey < 200""",
    "q_date_fns2" ->
      """SELECT o_orderkey, weekofyear(o_orderdate)::INT AS wk,
         dayofyear(o_orderdate)::INT AS doy,
         make_date(year(o_orderdate)::INT, month(o_orderdate)::INT, 1) AS month_first,
         (o_orderdate::DATE + INTERVAL 3 MONTH)::DATE AS plus3m,
         epoch(o_orderdate)::BIGINT AS epoch_s,
         strftime(o_orderdate, '%Y-%m') AS ym
         FROM orders WHERE o_orderkey < 500""",
    "q_date_fns3" -> """
      SELECT o_orderkey,
        strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y')::DATE AS rt_date,
        (dayofweek(o_orderdate) + 1)::INT AS dow,
        (o_orderdate::DATE + 90) AS plus90,
        (o_orderdate::DATE - '1970-01-01'::DATE)::INT AS epoch_day,
        date_trunc('quarter', o_orderdate)::DATE AS q_start
      FROM orders WHERE o_orderkey < 500""",
    "q_date_fns4" -> """
      SELECT o_orderkey,
        date_diff('month', date_trunc('month', o_orderdate)::DATE,
                  DATE '2002-01-01')::INT AS months_to_2002,
        (o_orderdate::DATE + ((7 - isodow(o_orderdate)) % 7 + 1)::INT) AS next_mon,
        (o_orderdate::TIMESTAMP + INTERVAL 2 YEAR)::DATE AS plus2y,
        (isodow(o_orderdate) - 1)::INT AS wd,
        (o_orderdate::DATE + INTERVAL '1 year 2 months')::DATE AS plus1y2m,
        epoch(make_timestamp(year(o_orderdate)::BIGINT, month(o_orderdate)::BIGINT,
          day(o_orderdate)::BIGINT, 12::BIGINT, 30::BIGINT, 15.0))::BIGINT AS noonish_epoch
      FROM orders WHERE o_orderkey < 500""",
    "q_array_fns" -> s"""
      WITH t AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w FROM documents)
      SELECT doc_id, len(w) AS n_words,
        list_contains(w, 'the')::INT AS has_the,
        coalesce(list_position(w, 'the'), 0)::BIGINT AS pos_the,
        w[1] AS first_word, w[-1] AS last_word,
        array_to_string(w[1:3], ' ') AS first3
      FROM t""",
    "q_approx_percentile" ->
      """SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
         TRUE AS within_tol FROM lineitem GROUP BY l_returnflag""",
    "q_md2" ->
      """SELECT * FROM (VALUES
           (1, '8350e5a3e24c153df2275c9f80692773'),
           (2, '32ec01ec4a6dac72c0ab96fb34c0b5d1'),
           (3, 'da853b0d3f88d99b30283a69e6ded6bb'),
           (4, 'ab4f496bfb2a530b219ff33031fe06b0'),
           (5, '4e8ddff3650292ab5a4108c3aa47940b'))
         AS t(id, digest)""",
    "q_url_codec" ->
      """SELECT * FROM (VALUES
           (1, 'a+b%26c%2Fd', 'a b&c/d'),
           (2, 'h%C3%A9llo+w%C3%B6rld', 'héllo wörld'),
           (3, '100%25+%2B+2+%3D+%3F', '100% + 2 = ?'),
           (4, 'x%7Ey_z-1.2*', 'x~y_z-1.2*'),
           (5, 'a%3Db%26c%3Dd', 'a=b&c=d'),
           (6, 'p%C3%A4th%2Fto%3Fq%3D1%23frag', 'päth/to?q=1#frag'),
           (7, 'quote%27dq%22', 'quote''dq"'),
           (8, 'tab%09nl%0A', e'tab\tnl\n'))
         AS t(id, enc, roundtrip)""",
    "q_network_fns" -> """
      WITH base AS (SELECT o_orderkey,
          (o_orderkey % 223 + 1) AS a, (o_orderkey * 7) % 256 AS b,
          (o_orderkey * 13) % 256 AS c, (o_orderkey * 29) % 256 AS dd,
          (o_orderkey % 17 + 8) AS p
        FROM orders WHERE o_orderkey < 2000),
      ips AS (SELECT o_orderkey, a, b,
          a || '.' || b || '.' || c || '.' || dd AS ip,
          a*16777216 + b*65536 + c*256 + dd AS ip_num,
          a*16777216 AS net_num,
          ((4294967295 << (32 - p)) & 4294967295) AS mask, p
        FROM base)
      SELECT o_orderkey, ip, ip_num,
        ((ip_num >> 24) & 255) || '.' || ((ip_num >> 16) & 255) || '.' ||
          ((ip_num >> 8) & 255) || '.' || (ip_num & 255) AS ip_rt,
        TRUE AS valid,
        (a = 10 OR (a = 172 AND b BETWEEN 16 AND 31) OR (a = 192 AND b = 168)) AS priv,
        (a = 10) AS in10,
        ((mask >> 24) & 255) || '.' || ((mask >> 16) & 255) || '.' ||
          ((mask >> 8) & 255) || '.' || (mask & 255) AS nm,
        ((net_num + 4294967295 - mask) >> 24) || '.' ||
          (((net_num + 4294967295 - mask) >> 16) & 255) || '.' ||
          (((net_num + 4294967295 - mask) >> 8) & 255) || '.' ||
          ((net_num + 4294967295 - mask) & 255) AS bc,
        ((net_num + 1) >> 24) || '.' || (((net_num + 1) >> 16) & 255) || '.' ||
          (((net_num + 1) >> 8) & 255) || '.' || ((net_num + 1) & 255) AS lo,
        ((net_num + 4294967294 - mask) >> 24) || '.' ||
          (((net_num + 4294967294 - mask) >> 16) & 255) || '.' ||
          (((net_num + 4294967294 - mask) >> 8) & 255) || '.' ||
          ((net_num + 4294967294 - mask) & 255) AS hi,
        ((1::BIGINT << (32 - p)) - 2) AS n_hosts
      FROM ips""",
    "q_phonetic" -> """
      SELECT * FROM (VALUES
        ('Robert', 'R163', 'R901096', 'RBRT', 'RABAD', 'RPT1111111'),
        ('Rupert', 'R163', 'R901096', 'RPRT', 'RAPAD', 'RPT1111111'),
        ('Ashcraft', 'A261', 'A03039026', 'AXKR', 'ASCRAF', 'ASKRFT1111'),
        ('Ashcroft', 'A261', 'A03039026', 'AXKR', 'ASCRAF', 'ASKRFT1111'),
        ('Tymczak', 'T522', 'T6083503', 'TMKS', 'TYNCSA', 'TMKSK11111'),
        ('Pfister', 'P236', 'P1203609', 'PFST', 'FASTAR', 'PFSTA11111'),
        ('Thompson', 'T512', 'T6081308', '0MPS', 'TANPSA', 'TMPSN11111'),
        ('MacDonald', 'M235', 'M803608076', 'MKTN', 'MCDANA', 'MKTNT11111'),
        ('Knight', 'K523', 'K380406', 'NT', 'NAGT', 'KNT1111111'),
        ('Wright', 'W623', 'W090406', 'RT', 'WRAGT', 'RT11111111'),
        ('Garcia', 'G620', 'G40930', 'KRX', 'GARC', 'KSA1111111'),
        ('Lukasiewicz', 'L222', 'L70303035', 'LKSW', 'LACASA', 'LKSWKS1111'))
      t(name, sdx, rsdx, mp, ny, cv)""",
    "q_crypto_fns" -> """
      WITH expected(s, sha1_hex, sha384_hex, sha512_hex) AS (VALUES
        ('graft', '9c298007ec968fa5b8de22a5356f4bd8a865daf2',
         '3b8e78ae95659f35ecb3e55352806168a0cd122dd65f601dafb3efa8241ecaf115bc5620dfdd44aeced207c7296ac99c',
         '9c44f55c8de907639d0523a52334481349eceb2026e01915e6ef670097086f5d1c95a486fe5736af87dd4e9f79fbd59814cf8b4d73bcfda3cf6e7f23b081e077'),
        ('drill', '12e014092855ffa74e381ebd16531ccd486f7b85',
         'c3e84a2f15b6acc4001bd03a7a0fc880f60a84462cbe14607ecb58794450ed123c6fce8cb9863d239d3d53d4611b9792',
         '542603a7b33d1d803654131f6a2ebcca80034a6e6d99d44df37856b43b3fdbcfcb5134e67cc475e832fe8894e4a8ff3d2219c3cecd94a18e59d6fbf8103093e8'),
        ('spark', '7187dadeaa9825054bf26bb1a84055243400af16',
         'f1667b342b89a85c7e568e7e0b458eba562b81cb1a6941976b760b39fe45f463ff8ac366425324c9ac19943940030fd1',
         'ba6f19274b9b168078f7898e3b29af732e9d165312f1c4a55a550d906002572d913b64139bd89b4b01e59b0ece016bbb8a580ece282dfafb73b5ea54266b08ff'),
        ('lineitem', 'ab22b54f50cfe04e9671740f7b93e46d08a25bb1',
         '364487bb9a75692f2ed0db3fce7778a2be8315ca84f8f16f24803f01ca9fd4cb68908724a699129c34059a692cc43030',
         'b4dd0622715ed23cd6b2042e9dd02d952b3787b980ea4ded81ec76534a90569105b1067c1dcca0143b02fabdc8d2ec1edc8e8eb8b189a5306892cd323df0e0fc'),
        ('100TB', '9d0d364847638e4ff3655890b785c28b1ae9db8a',
         '049e5f0c8fa1dd8009e93752d151330be2abb41182616ec13bfc7a56dcec743269173642256db5db89136aaa6c8aeb80',
         'd5d72d41f910496aee37343c76f612d0d4a8512c002a7da2bbbb245aee32b0e794b13fd4ac5ce73fbdbc16663fd13d9737e4f53a66f2b826b866d276690f457c'))
      SELECT s, md5(s) AS md5_hex, sha1_hex, sha256(s) AS sha256_hex,
        sha384_hex, sha512_hex, s AS aes_rt
      FROM expected""",
    "q_distribution_fns" -> """
      SELECT l_orderkey, l_linenumber,
        (CASE WHEN l_quantity < 0 THEN 0
              WHEN l_quantity >= 50 THEN 11
              ELSE 1 + floor(l_quantity / 5.0) END)::BIGINT AS qty_bucket
      FROM lineitem WHERE l_orderkey < 2000""",
    "q_punct_pattern" -> """
      SELECT doc_id, regexp_replace(regexp_replace(substr(text, 1, 80),
        '[a-zA-Z0-9]', '', 'g'), ' ', '_', 'g') AS punct
      FROM documents""",
    "q_kendall" -> """
      WITH b AS (SELECT s_nationkey AS g, s_suppkey AS i,
          s_acctbal::DOUBLE AS x, s_suppkey::DOUBLE AS y FROM supplier),
      p AS (SELECT a.g,
          sum(CASE WHEN (a.x - c.x) * (a.y - c.y) > 0 THEN 1 ELSE 0 END)::BIGINT AS concordant,
          sum(CASE WHEN (a.x - c.x) * (a.y - c.y) < 0 THEN 1 ELSE 0 END)::BIGINT AS discordant,
          count(*) AS n_pairs
        FROM b a JOIN b c ON a.g = c.g AND a.i < c.i GROUP BY a.g)
      SELECT g AS s_nationkey, concordant, discordant,
        round((concordant - discordant)::DOUBLE / n_pairs, 6) AS kendall_tau
      FROM p""",
    "q_time_bucket" -> """
      SELECT event_id,
        (epoch_ns(ts) // 1000000000 * 1000) -
          (epoch_ns(ts) // 1000000000 * 1000) % 600000 AS bucket_ms
      FROM events""",
    "q_gis_polygon" -> """
      SELECT o_orderkey,
        round((o_orderkey % 100)/10.0 - 5.0, 1) AS lon,
        round(((o_orderkey * 7) % 100)/10.0 - 5.0, 1) AS lat,
        (abs((o_orderkey % 100)/10.0 - 5.0) +
         abs(((o_orderkey * 7) % 100)/10.0 - 5.0)) < 3.05 AS inside,
        3.05 AS env_xmax
      FROM orders WHERE o_orderkey < 2000""",
    "q_gis_fns" -> """
      WITH pts AS (SELECT c_custkey,
          (c_custkey % 360) - 180 + 0.25 AS lon,
          ((c_nationkey * 7) % 180) - 90 + 0.5 AS lat
        FROM customer WHERE c_custkey < 500),
      d AS (SELECT c_custkey, lon, lat,
          2 * 6371.0088 * asin(sqrt(
            pow(sin(radians(0 - lat) / 2), 2) +
            cos(radians(lat)) * cos(radians(0)) *
            pow(sin(radians(0 - lon) / 2), 2))) AS dist
        FROM pts)
      SELECT c_custkey, round(lon, 2) AS lon, round(lat, 2) AS lat,
        round(dist, 6) AS dist_km,
        (dist <= 5000.0) AS within_5000km,
        (lon >= -30 AND lon <= 30 AND lat >= -30 AND lat <= 30) AS in_bbox
      FROM d""",
    "q_hll_sketch" -> """
      SELECT count(DISTINCT l_returnflag) AS n_groups,
             count(DISTINCT l_partkey) AS exact_cnt, TRUE AS within_tol
      FROM lineitem""",
    "q_parse_ua" -> s"""
      WITH uas(ua_id, ua) AS (VALUES $UaValuesSql),
      c AS (SELECT ua_id, ua,
          regexp_matches(ua, '(?i)(bot|crawler|spider|slurp|curl|wget|python-requests|headless)') AS is_bot
        FROM uas)
      SELECT ua_id,
        CASE WHEN is_bot THEN 'Robot'
             WHEN strpos(ua, 'Edg/') > 0 OR strpos(ua, 'Edge/') > 0
               OR strpos(ua, 'EdgA/') > 0 OR strpos(ua, 'EdgiOS/') > 0 THEN 'Edge'
             WHEN strpos(ua, 'OPR/') > 0 THEN 'Opera'
             WHEN strpos(ua, 'Chrome/') > 0 THEN 'Chrome'
             WHEN strpos(ua, 'Firefox/') > 0 THEN 'Firefox'
             WHEN strpos(ua, 'Safari/') > 0 AND strpos(ua, 'Version/') > 0 THEN 'Safari'
             WHEN strpos(ua, 'MSIE ') > 0 OR strpos(ua, 'Trident/') > 0 THEN 'IE'
             ELSE 'Other' END AS browser,
        CASE WHEN is_bot THEN ''
             WHEN strpos(ua, 'Edg/') > 0 OR strpos(ua, 'Edge/') > 0
               OR strpos(ua, 'EdgA/') > 0 OR strpos(ua, 'EdgiOS/') > 0
               THEN regexp_extract(ua, 'Edg(?:e|A|iOS)?/([0-9.]+)', 1)
             WHEN strpos(ua, 'OPR/') > 0 THEN regexp_extract(ua, 'OPR/([0-9.]+)', 1)
             WHEN strpos(ua, 'Chrome/') > 0 THEN regexp_extract(ua, 'Chrome/([0-9.]+)', 1)
             WHEN strpos(ua, 'Firefox/') > 0 THEN regexp_extract(ua, 'Firefox/([0-9.]+)', 1)
             WHEN strpos(ua, 'Safari/') > 0 AND strpos(ua, 'Version/') > 0
               THEN regexp_extract(ua, 'Version/([0-9.]+)', 1)
             WHEN strpos(ua, 'MSIE ') > 0 THEN regexp_extract(ua, 'MSIE ([0-9.]+)', 1)
             WHEN strpos(ua, 'Trident/') > 0 THEN regexp_extract(ua, 'rv:([0-9.]+)', 1)
             ELSE '' END AS browser_version,
        CASE WHEN strpos(ua, 'Windows NT') > 0 THEN 'Windows'
             WHEN strpos(ua, 'Android') > 0 THEN 'Android'
             WHEN strpos(ua, 'iPhone') > 0 OR strpos(ua, 'iPad') > 0
               OR strpos(ua, 'iPod') > 0 THEN 'iOS'
             WHEN strpos(ua, 'Mac OS X') > 0 THEN 'macOS'
             WHEN strpos(ua, 'Linux') > 0 THEN 'Linux'
             ELSE 'Other' END AS os,
        CASE WHEN is_bot THEN 'Robot'
             WHEN strpos(ua, 'iPad') > 0 OR (strpos(ua, 'Android') > 0
               AND strpos(ua, 'Mobile') = 0) THEN 'Tablet'
             WHEN strpos(ua, 'iPhone') > 0 OR strpos(ua, 'iPod') > 0
               OR strpos(ua, 'Mobile') > 0 THEN 'Phone'
             ELSE 'Desktop' END AS device_class,
        is_bot
      FROM c""")

  /** The UA corpus as SQL VALUES rows (single-quote escaped). */
  private def UaValuesSql: String =
    UaCorpus.map { case (id, ua) => s"($id, '${ua.replace("'", "''")}')" }
      .mkString(",\n        ")
}
