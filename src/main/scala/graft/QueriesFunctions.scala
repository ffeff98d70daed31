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

    "q_date_fns2" -> ((s, d) =>
      T(s, d, "orders").filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          weekofyear(col("o_orderdate")).as("wk"),
          dayofyear(col("o_orderdate")).as("doy"),
          make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)).as("month_first"),
          add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))),

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
    "q_string_distance" -> ((s, d) =>
      T(s, d, "customer").filter(col("c_custkey") < 300)
        .select(col("c_custkey"),
          levenshtein(col("c_name"), lit("Customer#000000042")).as("lev"),
          levenshtein(col("c_mktsegment"), lit("BUILDING")).as("lev_seg"))))

  val oracle: Map[String, String] = Map(
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
    "q_date_fns2" ->
      """SELECT o_orderkey, weekofyear(o_orderdate)::INT AS wk,
         dayofyear(o_orderdate)::INT AS doy,
         make_date(year(o_orderdate)::INT, month(o_orderdate)::INT, 1) AS month_first,
         (o_orderdate::DATE + INTERVAL 3 MONTH)::DATE AS plus3m,
         epoch(o_orderdate)::BIGINT AS epoch_s,
         strftime(o_orderdate, '%Y-%m') AS ym
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
         TRUE AS within_tol FROM lineitem GROUP BY l_returnflag""")
}
