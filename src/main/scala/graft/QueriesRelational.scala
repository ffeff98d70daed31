package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{ComplexOps, TemporalJoins}

/** §2.1 relational-core coverage: each entry is (spark, sfDir) => DataFrame
  * with a DuckDB oracle in `oracle`. Column aliases match the oracle
  * exactly (the driver hash-compares by column name).
  *
  * Determinism rules used throughout (see SURVEY §5): money sums rounded
  * to 2dp, ratios 4-6dp, dates cast to DATE, no raw ns timestamps.
  */
object QueriesRelational {
  import GraftSession.{table => T}

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_scan_project" -> ((s, d) =>
      T(s, d, "lineitem")
        .filter(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("price"))),

    "q_filter_pushdown" -> ((s, d) =>
      T(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_quantity") < 10)
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("l_extendedprice")), 2).as("revenue"))),

    "q1_agg" -> ((s, d) =>
      T(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))),

    "q_sorted_agg" -> ((s, d) =>
      // Drill's StreamingAgg consumes sorted input; in Spark the same
      // physical choice is sort-based agg — semantics identical.
      T(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_items"), round(sum("l_quantity"), 2).as("sum_qty"))),

    "q_hash_join" -> ((s, d) =>
      T(s, d, "orders").join(T(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))),

    "q_broadcast_join" -> ((s, d) =>
      T(s, d, "lineitem").join(broadcast(T(s, d, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          round(sum("l_extendedprice"), 2).as("revenue"))),

    "q_multi_join" -> ((s, d) =>
      T(s, d, "customer")
        .join(T(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(T(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(T(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("c_mktsegment") === "BUILDING")
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows"))),

    "q_outer_join" -> ((s, d) =>
      T(s, d, "customer").join(T(s, d, "orders"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))),

    "q_full_outer_join" -> ((s, d) => {
      val sup = T(s, d, "supplier").filter(col("s_acctbal") > 3000)
        .groupBy(col("s_nationkey").as("snk")).agg(count(lit(1)).as("n_sup"))
      val cust = T(s, d, "customer").filter(col("c_acctbal") > 8000)
        .groupBy(col("c_nationkey").as("cnk")).agg(count(lit(1)).as("n_cust"))
      sup.join(cust, col("snk") === col("cnk"), "full_outer")
        .select(coalesce(col("snk"), col("cnk")).as("nationkey"),
          col("n_sup"), col("n_cust"))
    }),

    "q_semi_join" -> ((s, d) =>
      T(s, d, "customer").join(T(s, d, "orders"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")),

    // the subtracted side is FILTERED (customers without F-status
    // orders): against the full orders table the result is empty at
    // every SF — a vacuous gate an always-empty bug would pass
    "q_anti_join" -> ((s, d) =>
      T(s, d, "customer").join(
          T(s, d, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")),

    "q_cross_join" -> ((s, d) =>
      T(s, d, "region").select("r_name")
        .crossJoin(T(s, d, "orders").select("o_orderstatus").distinct())),

    "q_lateral_unnest" -> ((s, d) =>
      T(s, d, "documents")
        .select(col("doc_id"),
          explode(split(graft.pipeline.TextAnalysis.normalize(col("text")), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n_occur"), count_distinct(col("doc_id")).as("n_docs"))),

    "q_lateral_join" -> ((s, d) => {
      // true correlated LATERAL (Drill join/lateral + unnest): top-3
      // orders per customer via a correlated ordered-limit subquery.
      views(s, d, "customer", "orders")
      s.sql("""SELECT c.c_custkey, t.o_orderkey, t.price
               FROM customer c
               JOIN LATERAL (
                 SELECT o_orderkey, round(o_totalprice, 2) AS price
                 FROM orders WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t""")
    }),

    "q_sort" -> ((s, d) =>
      // total-order position via two-phase numbering — no single-partition
      // window over the full table (see ComplexOps.globalRowNumber).
      ComplexOps.globalRowNumber(
          T(s, d, "customer").select(col("c_custkey"), col("c_acctbal")),
          32, col("c_acctbal"), descending = true, "pos", col("c_custkey"))
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("bal"), col("pos"))),

    "q_topn" -> ((s, d) =>
      ComplexOps.topN(T(s, d, "orders"), 10, col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))),

    "q_limit_offset" -> ((s, d) =>
      T(s, d, "orders").orderBy("o_orderkey").select("o_orderkey")
        .offset(5).limit(20)),

    "q_distinct" -> ((s, d) =>
      T(s, d, "customer").select("c_mktsegment", "c_nationkey").distinct()),

    "q_union_all" -> ((s, d) =>
      T(s, d, "customer").select(col("c_custkey").as("id"), lit("cust").as("src"))
        .unionAll(T(s, d, "supplier").select(col("s_suppkey").as("id"), lit("supp").as("src")))),

    "q_union_distinct" -> ((s, d) =>
      T(s, d, "customer").select(col("c_nationkey").as("nk"))
        .union(T(s, d, "supplier").select(col("s_nationkey").as("nk"))).distinct()),

    "q_intersect" -> ((s, d) =>
      T(s, d, "customer").select(col("c_custkey").as("k"))
        .intersect(T(s, d, "orders").select(col("o_custkey").as("k")))),

    // subtracted side filtered for the same non-vacuousness reason as
    // q_anti_join (P-status keeps the two gates' slices independent)
    "q_except" -> ((s, d) =>
      T(s, d, "customer").select(col("c_custkey").as("k"))
        .except(T(s, d, "orders").filter(col("o_orderstatus") === "P")
          .select(col("o_custkey").as("k")))),

    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      T(s, d, "customer").select(col("c_custkey"), col("c_mktsegment"),
        rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
    }),

    "q_window_laglead" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      T(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        round(lag("o_totalprice", 1).over(w), 2).as("prev_price"),
        round(lead("o_totalprice", 1).over(w), 2).as("next_price"))
    }),

    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        round(sum("o_totalprice").over(w), 2).as("run_total"))
    }),

    // RANGE frame with VALUE bounds: peers by key distance, not row
    // position (Calcite/Drill RANGE BETWEEN n PRECEDING)
    "q_window_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderkey"))
        .rangeBetween(-1000L, Window.currentRow)
      T(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        count(lit(1)).over(w).as("n_in_range"))
    }),

    // aggregate FILTER (WHERE ...) clause (Calcite supports it; the
    // conditional-aggregation form every BI tool emits)
    "q_agg_filter_clause" -> ((s, d) =>
      T(s, d, "orders").groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_all"),
          count_if(col("o_totalprice") > 150000).as("n_big"),
          round(sum(when(col("o_orderstatus") === "F", col("o_totalprice"))
            .otherwise(lit(0.0))), 2).as("f_total"))),

    "q_window_firstlast" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        round(first("o_totalprice").over(w), 2).as("first_price"),
        round(last("o_totalprice").over(w), 2).as("last_price"),
        round(nth_value(col("o_totalprice"), 2).over(w), 2).as("second_price"))
    }),

    "q_window_ntile" -> ((s, d) => {
      // ntile/percent_rank/cume_dist in closed form from the two-phase
      // global row number (the ordering key is unique, so rank == rn) —
      // replaces an un-partitioned window over the whole table.
      val cust = T(s, d, "customer")
      val n = cust.agg(count(lit(1)).as("_n"))
      ComplexOps.globalRowNumber(cust.select(col("c_custkey"), col("c_acctbal")),
          32, col("c_acctbal"), descending = false, "rn", col("c_custkey"))
        .crossJoin(broadcast(n))
        .select(col("c_custkey"),
          ComplexOps.ntileFromRowNumber(col("rn"), 4, col("_n")).as("quartile"),
          round((col("rn") - 1).cast("double") / (col("_n") - 1), 6).as("pr"),
          round(col("rn").cast("double") / col("_n"), 6).as("cd"))
    }),

    "q_rollup" -> ((s, d) =>
      T(s, d, "customer")
        .rollup("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"))),

    "q_having" -> ((s, d) =>
      T(s, d, "part").groupBy("p_brand").agg(count(lit(1)).as("n"))
        .filter(col("n") > 20)),

    "q_scalar_subquery" -> ((s, d) => {
      views(s, d, "customer")
      s.sql("""SELECT c_custkey,
               round(c_acctbal - (SELECT avg(c_acctbal) FROM customer), 4) AS diff_from_avg
               FROM customer""")
    }),

    "q_correlated_subquery" -> ((s, d) => {
      views(s, d, "customer")
      s.sql("""SELECT c_custkey, c_nationkey FROM customer c
               WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                                  WHERE c2.c_nationkey = c.c_nationkey)""")
    }),

    "q_cte" -> ((s, d) => {
      views(s, d, "orders")
      s.sql("""WITH big_orders AS (SELECT * FROM orders WHERE o_totalprice > 100000)
               SELECT o_orderstatus, count(*) AS n,
                      round(sum(o_totalprice), 2) AS total
               FROM big_orders GROUP BY o_orderstatus""")
    }),

    "q_values" -> ((s, d) => {
      views(s, d, "region")
      s.sql("""SELECT t.k, t.label, r_name
               FROM (VALUES (0,'zero'),(1,'one'),(2,'two')) AS t(k, label)
               JOIN region ON r_regionkey = t.k""")
    }),

    "q_case" -> ((s, d) =>
      T(s, d, "orders")
        .select(when(col("o_totalprice") > 150000, "high")
          .when(col("o_totalprice") > 50000, "mid")
          .otherwise("low").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))),

    "q_pivot" -> ((s, d) =>
      T(s, d, "orders").join(T(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .count()
        .na.fill(0L)
        .toDF("c_mktsegment", "n_o", "n_f", "n_p")),

    "q_unpivot" -> ((s, d) =>
      T(s, d, "lineitem").filter(col("l_orderkey") < 100)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(round(col("l_quantity"), 4).as("l_quantity"),
            round(col("l_discount"), 4).as("l_discount"),
            round(col("l_tax"), 4).as("l_tax")),
          "measure", "val")),

    "q_flatten" -> ((s, d) =>
      T(s, d, "documents").select(col("doc_id"),
        explode(split(graft.pipeline.TextAnalysis.normalize(col("text")), " ")).as("word"))),

    "q_kvgen" -> ((s, d) =>
      T(s, d, "events").select(col("event_id"),
          explode(graft.functions.DrillFunctions.convertFromJsonMap(col("props"))))),

    "q_range_partition" -> ((s, d) =>
      // distributed total-order primitive; correctness = the sorted result
      ComplexOps.rangePartitionSort(
          T(s, d, "orders").select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price")),
          8, col("o_orderkey"))),

    "q_table_stats" -> ((s, d) =>
      ComplexOps.tableStats(T(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))),

    "q_salted_join" -> ((s, d) =>
      // skew-salted join must produce EXACTLY the plain join's result
      ComplexOps.saltedJoin(
          T(s, d, "lineitem"), T(s, d, "orders"),
          col("l_orderkey"), col("o_orderkey"), buckets = 8)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice")), 2).as("revenue"))),

    "q_json_schema_on_read" -> ((s, d) => {
      val ev = T(s, d, "events")
      val inferred = graft.sources.SchemaOnRead.inferJsonColumn(ev, "props")
      inferred.select(col("event_id"), col("props_parsed.k").as("k_val"))
        .filter(col("k_val").isNotNull)
    }),

    // ---- AS-OF join: each purchase picks up the latest prior click of
    // the same user. events.ts is an epoch-NANOS long (nanosAsLong);
    // the operator keeps it exact. Oracle = DuckDB's native ASOF LEFT
    // JOIN, a fully independent implementation of the same semantics ----
    "q_asof_join" -> ((s, d) => {
      val ev = T(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      TemporalJoins.asofJoin(purchases, clicks, "user_id", "user_id",
          "ts", "ts", payload = Seq("value"))
        .select(col("event_id"),
          (expr("ts div 1000000000") - expr("prev_ts div 1000000000"))
            .as("gap_sec"),
          round(col("prev_value"), 6).as("prev_value"))
    }),

    // ---- AS-OF join, FORWARD direction: each purchase picks up the
    // EARLIEST click at or after it (merge_asof direction='forward').
    // Oracle = an independent correlated-min + rejoin formulation ----
    "q_asof_forward" -> ((s, d) => {
      val ev = T(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      TemporalJoins.asofJoinForward(purchases, clicks, "user_id", "user_id",
          "ts", "ts", payload = Seq("value"))
        .select(col("event_id"),
          (expr("next_ts div 1000000000") - expr("ts div 1000000000"))
            .as("gap_sec"),
          round(col("next_value"), 6).as("next_value"))
    }),

    // ---- AS-OF join, NEAREST direction: closer of the two candidates
    // wins, ties break backward. Oracle = conditional max/min over the
    // per-user join with the same tie rule ----
    "q_asof_nearest" -> ((s, d) => {
      val ev = T(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      TemporalJoins.asofJoinNearest(purchases, clicks, "user_id", "user_id",
          "ts", "ts", payload = Seq("value"))
        .select(col("event_id"),
          (expr("near_ts div 1000000000") - expr("ts div 1000000000"))
            .as("gap_sec"),
          round(col("near_value"), 6).as("near_value"))
    }),

    // ---- point-in-interval RANGE join: clicks landing inside the 24 h
    // window after each error, per user; bin-quantized equi-join, exact
    // residual filter. Oracle = plain inequality join ----
    "q_range_join" -> ((s, d) => {
      val dayNs = 86400L * 1000000000L
      val ev = T(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user"), col("ts"))
      val windows = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"),
          col("ts").as("w_start"), (col("ts") + dayNs).as("w_end"))
      TemporalJoins.rangeJoin(clicks, windows, "c_user", "user_id",
          "ts", "w_start", "w_end", binSize = dayNs)
        .select(col("err_id"), col("click_id"))
    }))

  private def views(s: SparkSession, d: String, names: String*): Unit =
    names.foreach(n => T(s, d, n).createOrReplaceTempView(n))

  val oracle: Map[String, String] = Map(
    "q_scan_project" ->
      "SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price FROM lineitem WHERE l_orderkey < 1000",
    "q_filter_pushdown" ->
      "SELECT count(*) AS cnt, round(sum(l_extendedprice), 2) AS revenue FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_quantity < 10",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
         round(avg(l_quantity),4) AS avg_qty, round(avg(l_extendedprice),4) AS avg_price,
         round(avg(l_discount),6) AS avg_disc, count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q_sorted_agg" ->
      "SELECT l_orderkey, count(*) AS n_items, round(sum(l_quantity),2) AS sum_qty FROM lineitem GROUP BY l_orderkey",
    "q_hash_join" ->
      "SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice),2) AS revenue FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment",
    "q_broadcast_join" ->
      "SELECT p_brand, count(*) AS n_items, round(sum(l_extendedprice),2) AS revenue FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand",
    "q_multi_join" ->
      """SELECT r_name, n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, count(*) AS n_rows
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE c_mktsegment = 'BUILDING' GROUP BY r_name, n_name""",
    "q_outer_join" ->
      "SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey",
    "q_full_outer_join" ->
      """SELECT coalesce(snk, cnk) AS nationkey, n_sup, n_cust FROM
         (SELECT s_nationkey AS snk, count(*) AS n_sup FROM supplier WHERE s_acctbal > 3000 GROUP BY 1) s
         FULL OUTER JOIN
         (SELECT c_nationkey AS cnk, count(*) AS n_cust FROM customer WHERE c_acctbal > 8000 GROUP BY 1) c
         ON snk = cnk""",
    "q_semi_join" ->
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
    "q_anti_join" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')",
    "q_cross_join" ->
      "SELECT r_name, o_orderstatus FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) t",
    "q_lateral_unnest" ->
      """SELECT word, count(*) AS n_occur, count(DISTINCT doc_id) AS n_docs FROM
         (SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
          FROM documents) GROUP BY word""",
    "q_lateral_join" -> """
      SELECT c.c_custkey, t.o_orderkey, t.price
      FROM customer c, LATERAL (
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t""",
    "q_sort" ->
      "SELECT c_custkey, round(c_acctbal, 2) AS bal, row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS pos FROM customer",
    "q_topn" ->
      "SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q_limit_offset" ->
      "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 5",
    "q_distinct" ->
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    "q_union_all" ->
      "SELECT c_custkey AS id, 'cust' AS src FROM customer UNION ALL SELECT s_suppkey AS id, 'supp' AS src FROM supplier",
    "q_union_distinct" ->
      "SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey AS nk FROM supplier",
    "q_intersect" ->
      "SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey AS k FROM orders",
    "q_except" ->
      "SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'P'",
    "q_window_rank" ->
      """SELECT c_custkey, c_mktsegment,
         rank() OVER w AS rnk, dense_rank() OVER w AS drnk, row_number() OVER w AS rn
         FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)""",
    "q_window_laglead" ->
      """SELECT o_orderkey, o_custkey,
         round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
         round(lead(o_totalprice, 1) OVER w, 2) AS next_price
         FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
    "q_window_firstlast" ->
      """SELECT o_orderkey, o_custkey,
         round(first_value(o_totalprice) OVER w, 2) AS first_price,
         round(last_value(o_totalprice) OVER w, 2) AS last_price,
         round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
         FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
    "q_window_range_frame" ->
      """SELECT o_orderkey, o_custkey,
         count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
           RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_in_range
         FROM orders""",
    "q_agg_filter_clause" ->
      """SELECT o_orderpriority, count(*) AS n_all,
         count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
         round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice
                        ELSE 0.0 END), 2) AS f_total
         FROM orders GROUP BY 1""",
    "q_window_running" ->
      """SELECT o_orderkey, o_custkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
         FROM orders""",
    "q_window_ntile" ->
      """SELECT c_custkey, ntile(4) OVER w AS quartile,
         round(percent_rank() OVER w, 6) AS pr, round(cume_dist() OVER w, 6) AS cd
         FROM customer WINDOW w AS (ORDER BY c_acctbal, c_custkey)""",
    "q_rollup" ->
      "SELECT c_mktsegment, c_nationkey, count(*) AS n, round(sum(c_acctbal),2) AS bal FROM customer GROUP BY ROLLUP(c_mktsegment, c_nationkey)",
    "q_having" ->
      "SELECT p_brand, count(*) AS n FROM part GROUP BY p_brand HAVING count(*) > 20",
    "q_scalar_subquery" ->
      "SELECT c_custkey, round(c_acctbal - (SELECT avg(c_acctbal) FROM customer), 4) AS diff_from_avg FROM customer",
    "q_correlated_subquery" ->
      """SELECT c_custkey, c_nationkey FROM customer c
         WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)""",
    "q_cte" ->
      """WITH big_orders AS (SELECT * FROM orders WHERE o_totalprice > 100000)
         SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM big_orders GROUP BY o_orderstatus""",
    "q_values" ->
      """SELECT t.k, t.label, r_name FROM (VALUES (0,'zero'),(1,'one'),(2,'two')) AS t(k, label)
         JOIN region ON r_regionkey = t.k""",
    "q_case" ->
      """SELECT CASE WHEN o_totalprice > 150000 THEN 'high'
                WHEN o_totalprice > 50000 THEN 'mid' ELSE 'low' END AS bucket,
         count(*) AS n FROM orders GROUP BY 1""",
    "q_pivot" ->
      """SELECT c_mktsegment,
         count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
         count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
         count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
         FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment""",
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, round(l_quantity,4) AS val FROM lineitem WHERE l_orderkey < 100
         UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', round(l_discount,4) FROM lineitem WHERE l_orderkey < 100
         UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', round(l_tax,4) FROM lineitem WHERE l_orderkey < 100""",
    "q_flatten" ->
      """SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word FROM documents""",
    "q_kvgen" ->
      """SELECT event_id, k AS key, json_extract_string(props, '$.' || k) AS value
         FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)""",
    "q_range_partition" ->
      "SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders",
    "q_salted_join" ->
      """SELECT o_orderstatus, count(*) AS n_items,
         round(sum(l_extendedprice), 2) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderstatus""",
    "q_table_stats" ->
      """SELECT count(l_quantity)::BIGINT AS l_quantity_count, count(DISTINCT l_quantity) AS l_quantity_ndv,
         round(min(l_quantity)::DOUBLE, 6) AS l_quantity_min, round(max(l_quantity)::DOUBLE, 6) AS l_quantity_max,
         round(avg(l_quantity), 6) AS l_quantity_avg,
         count(l_extendedprice)::BIGINT AS l_extendedprice_count, count(DISTINCT l_extendedprice) AS l_extendedprice_ndv,
         round(min(l_extendedprice)::DOUBLE, 6) AS l_extendedprice_min, round(max(l_extendedprice)::DOUBLE, 6) AS l_extendedprice_max,
         round(avg(l_extendedprice), 6) AS l_extendedprice_avg,
         count(l_discount)::BIGINT AS l_discount_count, count(DISTINCT l_discount) AS l_discount_ndv,
         round(min(l_discount)::DOUBLE, 6) AS l_discount_min, round(max(l_discount)::DOUBLE, 6) AS l_discount_max,
         round(avg(l_discount), 6) AS l_discount_avg
         FROM lineitem""",
    "q_json_schema_on_read" ->
      "SELECT event_id, json_extract(props, '$.k')::BIGINT AS k_val FROM events WHERE json_extract(props, '$.k') IS NOT NULL",
    "q_asof_join" -> """
      WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
           c AS (SELECT * FROM events WHERE event_type = 'click')
      SELECT p.event_id,
        epoch_ns(p.ts) // 1000000000 - epoch_ns(c.ts) // 1000000000 AS gap_sec,
        round(c.value, 6) AS prev_value
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""",
    "q_asof_forward" -> """
      WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
           c AS (SELECT * FROM events WHERE event_type = 'click'),
      m AS (SELECT p.event_id, min(epoch_ns(c.ts)) AS nts
            FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts >= p.ts
            GROUP BY 1)
      SELECT p.event_id,
        m.nts // 1000000000 - epoch_ns(p.ts) // 1000000000 AS gap_sec,
        round(cv.value, 6) AS next_value
      FROM p JOIN m USING (event_id)
      LEFT JOIN (SELECT user_id, epoch_ns(ts) AS nts2, value FROM c) cv
        ON cv.user_id = p.user_id AND cv.nts2 = m.nts""",
    "q_asof_nearest" -> """
      WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
           c AS (SELECT * FROM events WHERE event_type = 'click'),
      m AS (SELECT p.event_id, p.user_id, epoch_ns(p.ts) AS pts,
              max(CASE WHEN c.ts <= p.ts THEN epoch_ns(c.ts) END) AS bts,
              min(CASE WHEN c.ts >= p.ts THEN epoch_ns(c.ts) END) AS fts
            FROM p LEFT JOIN c ON p.user_id = c.user_id
            GROUP BY 1, 2, 3),
      pick AS (SELECT event_id, user_id, pts,
              CASE WHEN bts IS NOT NULL AND (fts IS NULL OR pts - bts <= fts - pts)
                   THEN bts ELSE fts END AS nts
            FROM m)
      SELECT pick.event_id,
        nts // 1000000000 - pts // 1000000000 AS gap_sec,
        round(cv.value, 6) AS near_value
      FROM pick
      LEFT JOIN (SELECT user_id, epoch_ns(ts) AS cts, value FROM c) cv
        ON cv.user_id = pick.user_id AND cv.cts = pick.nts""",
    "q_range_join" -> """
      WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
           e AS (SELECT * FROM events WHERE event_type = 'error')
      SELECT e.event_id AS err_id, c.event_id AS click_id
      FROM e JOIN c ON c.user_id = e.user_id
        AND c.ts >= e.ts AND c.ts <= e.ts + INTERVAL 86400 SECONDS""")
}
