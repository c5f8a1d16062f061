package graft.queries

import graft.config.Pin._

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-H-style analytics over the driver's star schema (TESTDATA.md).
  *
  * These are the scale-bearing operators (SURVEY.md §2.2: the reference has
  * none of them, so Spark built-ins define the semantics): hash/broadcast
  * joins, partial aggregation, window functions, semi joins, set ops,
  * rollups, top-k. Plan hygiene at 100 TB:
  *   - dimension tables (`region`, `nation`, `part`, `customer`, `supplier`)
  *     are broadcast — no shuffle of the fact table for those joins;
  *   - filters sit directly on scans (predicate pushdown into parquet);
  *   - aggregates use map-side partial aggregation (hash agg on decimals);
  *   - top-k is `orderBy.limit` → Spark's TakeOrderedAndProject, which never
  *     materializes a full sort at scale.
  */
object AnalyticsQueries {
  import Q._

  val all: Map[String, QueryFn] = Map(
    // TPC-H Q1 shape: full-scan partial-agg; the bench headliner.
    "q1_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum2(col("l_quantity")).as("sum_qty"),
          sum2(col("l_extendedprice")).as("sum_base_price"),
          sum4(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          sum6(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("sum_charge"),
          avg2(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // TPC-H Q3 shape: broadcast dim filter + fact join + grouped top-k.
    "q3_shipping_priority" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < to_timestamp(lit("1998-03-15")))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > to_timestamp(lit("1998-03-15")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum4(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q4 shape: semi join with a non-equi conjunct.
    "q4_order_priority" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1996-04-01")))
      val li = t(s, dir, "lineitem")
      ord.join(li,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // TPC-H Q5 shape: star join, small dims broadcast, one fact shuffle.
    "q5_region_revenue" -> ((s, dir) => {
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      val supp = t(s, dir, "supplier")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      val li = t(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust.withColumnRenamed("c_nationkey", "cn_key")),
          col("o_custkey") === col("c_custkey") &&
            col("cn_key") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum4(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q6 shape: pushdown-heavy single-table filter + scalar agg.
    "q6_revenue_forecast" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum4(col("l_extendedprice") * col("l_discount")).as("revenue"))),

    // Window function: top-3 customers by spend per nation.
    "q_top_customers_window" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      val spend = ord
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("c_name"))
        .agg(sum2(col("o_totalprice")).as("total_spent"))
      val w = Window.partitionBy(col("n_name"))
        .orderBy(col("total_spent").desc, col("c_name"))
      spend.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .orderBy(col("n_name"), col("rk"))
    }),

    // Distinct aggregation (shuffle-heavy; expand + two-phase agg).
    "q_distinct_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("distinct_parts"),
          countDistinct(col("l_suppkey")).as("distinct_supps"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"))),

    // Set operation: customers active in 1995 but not 1996.
    "q_setop_except" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val y95 = ord.filter(
        col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1996-01-01")))
        .select(col("o_custkey").as("custkey"))
      val y96 = ord.filter(
        col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01")))
        .select(col("o_custkey").as("custkey"))
      y95.except(y96).orderBy(col("custkey"))
    }),

    // Set operation: customers active in BOTH years.
    "q_setop_intersect" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val y95 = ord.filter(
        col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1996-01-01")))
        .select(col("o_custkey").as("custkey"))
      val y96 = ord.filter(
        col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01")))
        .select(col("o_custkey").as("custkey"))
      y95.intersect(y96).orderBy(col("custkey"))
    }),

    // Multiset (bag) set ops: each surviving row keeps its multiplicity
    // difference/minimum — Spark plans these as aggregate+generate, not
    // the distinct-based anti/semi joins of EXCEPT/INTERSECT.
    "q_setop_except_all" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val y95 = ord.filter(
        col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1996-01-01")))
        .select(col("o_custkey").as("custkey"))
      val y96 = ord.filter(
        col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01")))
        .select(col("o_custkey").as("custkey"))
      y95.exceptAll(y96).groupBy(col("custkey"))
        .agg(count(lit(1)).as("multiplicity"))
        .orderBy(col("custkey"))
    }),

    "q_setop_intersect_all" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val y95 = ord.filter(
        col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1996-01-01")))
        .select(col("o_custkey").as("custkey"))
      val y96 = ord.filter(
        col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01")))
        .select(col("o_custkey").as("custkey"))
      y95.intersectAll(y96).groupBy(col("custkey"))
        .agg(count(lit(1)).as("multiplicity"))
        .orderBy(col("custkey"))
    }),

    // Global top-k: TakeOrderedAndProject, not a full sort.
    "q_orders_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)),

    // Broadcast dim join + agg by brand.
    "q_brand_volume" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("cnt"), sum2(col("l_quantity")).as("sum_qty"))
        .orderBy(col("p_brand"))),

    // Rollup (grouping sets).
    "q_rollup_flags" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // CUBE: all four grouping combinations in one pass (Spark expands to a
    // single Expand + partial-agg — no per-grouping re-scan).
    "q_cube_flags" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), sum2(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // PIVOT: event counts per day fanned out to one column per type.
    // The pivot value list is declared, so the plan is a single groupBy
    // with conditional aggregates — no second pass to discover values.
    "q_pivot_events" -> ((s, dir) =>
      events(s, dir)
        .select(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .groupBy(col("day"))
        // the table's actual event_type domain (all five values)
        .pivot("event_type",
          Seq("view", "click", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("day"), col("view").as("n_view"),
          col("click").as("n_click"), col("purchase").as("n_purchase"),
          col("signup").as("n_signup"), col("error").as("n_error"))
        .orderBy(col("day"))),

    // Window FRAME (rows unbounded-preceding): exact running spend per
    // customer — decimal accumulation keeps the running sums portable.
    "q_running_total" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          sum(dec2(col("o_totalprice"))).over(w).cast("double")
            .as("run_total"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    // Self-join against a derived aggregate (above-average orders).
    "q_above_avg_orders" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val avgP = ord.groupBy(col("o_orderstatus").as("st"))
        .agg((sum(dec2(col("o_totalprice"))).cast("double") /
          count(lit(1)).cast("double")).as("avg_p"))
      ord.join(broadcast(avgP), col("o_orderstatus") === col("st"))
        .filter(col("o_totalprice") > col("avg_p"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_above"))
        .orderBy(col("o_orderstatus"))
    }),

    // COHORT RETENTION: users bucketed by first-seen week, distinct
    // active users per (cohort week, weeks-since) cell — the standard
    // product-analytics matrix. cohort_wk rides a whole-partition window
    // min, so ONE user_id shuffle feeds both the cohort assignment and
    // the per-cell distinct aggregate — no join against a users-sized
    // cohort table (a broadcast of it would cap out at the 8 GB limit
    // long before web scale); week arithmetic in exact integer days
    "q_cohort_retention" -> ((s, dir) => {
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
      events(s, dir)
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .withColumn("cohort_wk", min(col("wk")).over(byUser))
        .groupBy(col("cohort_wk"),
          (datediff(col("wk"), col("cohort_wk")) / 7).cast("int")
            .as("weeks_since"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy(col("cohort_wk"), col("weeks_since"))
    }),

    // fixed-width value histogram: bin = floor(value/25) clamped to
    // [0, 19] on BOTH ends (negative values land in bin 0) — one
    // row-local projection + one partial-aggregated groupBy; identical
    // IEEE division/floor on both engines
    "q_value_histogram" -> ((s, dir) =>
      events(s, dir)
        .select(greatest(least(floor(col("value") / 25.0), lit(19.0)),
            lit(0.0))
          .cast("int").as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bin"))),

    // ordered-sequence (funnel) analysis: users whose first view is
    // followed by a click, then a purchase — greedy first-occurrence
    // matching (min ts per step AFTER the previous step), three
    // filter-pushed passes over events joined per step
    "q_funnel" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
      val s1 = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts_us")).as("t_view"))
      val s2 = e.filter(col("event_type") === "click").as("e")
        .join(s1.as("s1"), col("e.user_id") === col("s1.user_id") &&
          col("e.ts_us") > col("s1.t_view"))
        .select(col("e.user_id").as("user_id"), col("e.ts_us"))
        .groupBy("user_id").agg(min(col("ts_us")).as("t_click"))
      val s3 = e.filter(col("event_type") === "purchase").as("e")
        .join(s2.as("s2"), col("e.user_id") === col("s2.user_id") &&
          col("e.ts_us") > col("s2.t_click"))
        .select(col("e.user_id").as("user_id"), col("e.ts_us"))
        .groupBy("user_id").agg(min(col("ts_us")).as("t_purchase"))
      s1.join(s2, "user_id").join(s3, "user_id")
        .select(col("user_id"), col("t_view"), col("t_click"),
          col("t_purchase"))
        .orderBy(col("user_id"))
    }),

    // GROUPING SETS through the SQL-text surface (rollup/cube's general
    // form); GROUPING() flags disambiguate the NULL group keys, and the
    // ORDER BY pins NULLS FIRST explicitly (Spark defaults NULLS FIRST,
    // DuckDB NULLS LAST — an unpinned sort would diverge)
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("gs_customer")
      s.sql(
        """SELECT c_mktsegment, c_nationkey, COUNT(*) AS cnt,
          |GROUPING(c_mktsegment) AS g_seg, GROUPING(c_nationkey) AS g_nat
          |FROM gs_customer
          |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
          |ORDER BY g_seg, g_nat, c_mktsegment NULLS FIRST,
          |  c_nationkey NULLS FIRST""".stripMargin)
    }),

    // navigation window functions: LAG for inter-event gaps (NULL on each
    // user's first event) + NTILE session quartiles, total-ordered by
    // (ts, event_id) so both engines rank identically
    "q_user_gaps" -> ((s, dir) => {
      events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("gap_us",
          col("ts_us") - lag(col("ts_us"), 1).over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("ts_us"), col("event_id"))))
        .withColumn("quartile", ntile(4).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts_us"), col("event_id"))))
        .select(col("user_id"), col("event_id"), col("gap_us"),
          col("quartile"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // LEFT OUTER with real null semantics: segments keep customers with
    // zero orders; COUNT(col) vs COUNT(DISTINCT CASE) pin the null rows
    "q_left_join_nulls" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(
          countDistinct(col("c_custkey")).as("n_customers"),
          count(col("o_orderkey")).as("n_orders"),
          countDistinct(when(col("o_orderkey").isNull, col("c_custkey")))
            .as("n_silent"))
        .orderBy(col("c_mktsegment"))
    }),

    // FULL OUTER join of two sparse hourly aggregates (HAVING >= 3 makes
    // the sides genuinely asymmetric at sf0.01: ~170 hours only on each
    // side) — both null branches and the COALESCE fill are pinned
    "q_full_outer_hours" -> ((s, dir) => {
      val e = events(s, dir)
      def hours(tpe: String) = e.filter(col("event_type") === tpe)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") >= 3)
      val a = hours("signup").alias("a")
      val b = hours("error").alias("b")
      a.join(b, col("a.h") === col("b.h"), "full")
        .select(coalesce(col("a.h"), col("b.h")).as("h"),
          coalesce(col("a.c"), lit(0L)).as("n_signup"),
          coalesce(col("b.c"), lit(0L)).as("n_error"))
        .orderBy(col("h"))
    }),

    // Event-time tumbling window (batch twin of the streaming agg).
    "q_events_hourly" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum2(col("value")).as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("cnt"), col("total_value"))
        .orderBy(col("window_start"), col("event_type"))),

    // Event-time SLIDING window via a RANGE frame over epoch micros:
    // every event sees its user's trailing-hour totals. A numeric RANGE
    // frame includes all peers of the boundary timestamps, so the result
    // is deterministic even when events share a timestamp.
    "q_sliding_value" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
        .rangeBetween(-3600000000L, 0L)
      events(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("tus"), col("value"))
        .select(col("event_id"), col("user_id"),
          sum(dec2(col("value"))).over(w).cast("double")
            .as("trail_1h_value"),
          count(lit(1)).over(w).as("trail_1h_events"))
        .orderBy(col("event_id"))
    }),

    // Daily rollup over the event stream table.
    "q_events_daily" -> ((s, dir) =>
      events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum2(col("value")).as("total_value"))
        .orderBy(col("day"), col("event_type"))),

    // Semi-structured extraction from the props JSON column.
    "q_events_props" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1)
            .cast("int").as("k"))
        .orderBy(col("event_id"))),

    // Anti join: customers with no orders in 1995.
    "q_anti_join" -> ((s, dir) => {
      val ord95 = t(s, dir, "orders").filter(
        col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1996-01-01")))
      t(s, dir, "customer")
        .join(ord95, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey"))
    }),

    // Semi join: lineitems of urgent orders, aggregated per returnflag.
    // LeftSemi keeps the fact scan single-sided (no row duplication) and
    // — with AQE runtime filters — the urgent-orderkey set reaches the
    // lineitem scan as a bloom/IN filter before the join at scale.
    "q_semi_join" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      t(s, dir, "lineitem")
        .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"), sum2(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // AS-OF join: each event picks up the user's most recent order as of
    // the event time (operators/AsofJoin — union + running-last, one
    // shuffle on the key). Right side pre-aggregated to one row per
    // (custkey, date) to pin tie policy; oracle uses DuckDB's NATIVE
    // ASOF JOIN — an independent algorithm agreeing on every row.
    "q_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("last_orderkey"))
        .withColumnRenamed("o_custkey", "user_id")
      graft.operators.AsofJoin.asofJoin(ev, ord,
          key = "user_id", leftTime = "ts", rightTime = "o_orderdate",
          payloadCols = Seq("last_orderkey"))
        .select(col("event_id"), col("user_id"), col("last_orderkey"))
        .orderBy(col("event_id"))
    }),

    // FORWARD as-of: for each purchase, the next error event of the same
    // user at-or-after it (events self-pair — orders live in a different
    // synthetic era). Right side pre-aggregated to one row per (user, ts)
    // to pin ties, like the backward query.
    "q_asof_forward" -> ((s, dir) => {
      val ev = events(s, dir)
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val err = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("err_id"))
      graft.operators.AsofJoin.asofJoin(pur, err,
          key = "user_id", leftTime = "ts", rightTime = "ts",
          payloadCols = Seq("err_id"), direction = "forward")
        .select(col("event_id"), col("user_id"), col("err_id"))
        .orderBy(col("event_id"))
    }),

    // NEAREST as-of: the error event closest in time to each purchase,
    // ties to backward; distance compared in exact integer microseconds
    // on both engines (unix_micros ↔ epoch_us)
    "q_asof_nearest" -> ((s, dir) => {
      val ev = events(s, dir)
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val err = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("err_id"))
      graft.operators.AsofJoin.asofJoin(pur, err,
          key = "user_id", leftTime = "ts", rightTime = "ts",
          payloadCols = Seq("err_id"), direction = "nearest")
        .select(col("event_id"), col("user_id"), col("err_id"))
        .orderBy(col("event_id"))
    }),

    // Range join: events within 1 hour AFTER each purchase by the same
    // user (operators/RangeJoin — bucketed equi-join + exact filter, never
    // a nested-loop plan). Oracle is DuckDB's plain range-predicate join
    // (its optimizer runs an IEJoin — again an independent algorithm).
    // Events self-join: the orders table lives in a different synthetic
    // era (1995-2001) than events (2024), so cross-table windows are empty.
    "q_range_join" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("win_start"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("win_end"))
      graft.operators.RangeJoin.pointInInterval(ev, purchases,
          key = "user_id", pointCol = "ts",
          startCol = "win_start", endCol = "win_end",
          bucketSeconds = 3600L)
        .filter(col("event_id") =!= col("purchase_id"))
        .select(col("purchase_id"), col("event_id"))
        .pin()
        .orderBy(col("purchase_id"), col("event_id"))
    }),

    // Two-phase salted aggregation (operators/Skew): hot event_type keys
    // spread over 32 salt buckets in phase 1; results must equal the plain
    // GROUP BY (the oracle IS the plain GROUP BY) — pins correctness of
    // the skew-mitigation shape through the driver gate.
    "q_skew_salted_agg" -> ((s, dir) =>
      graft.operators.Skew.saltedAgg(
          events(s, dir), Seq("event_type"), saltBuckets = 32,
          partial = Seq(count(lit(1)).as("c"),
            sum(dec2(col("value"))).as("v")),
          final_ = Seq(sum(col("c")).as("cnt"),
            sum(col("v")).cast("double").as("total_value")))
        .orderBy(col("event_type"))),

    // TPC-H Q2 flavor (no partsupp table in this schema, so lineitem
    // prices stand in for supply cost): cheapest EUROPE supplier per
    // part — argmin-per-group over a star join as ONE aggregation via
    // min(struct(price, suppkey)) (lexicographic struct min = min price,
    // tie -> min suppkey): no second join back, no window; dims
    // broadcast, fact partial-aggregates.
    "q2_min_cost_supplier" -> ((s, dir) => {
      val eurSupp = t(s, dir, "supplier")
        .join(t(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region").filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"))
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          dec2(col("l_extendedprice")).as("price"))
        .join(broadcast(eurSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(min(struct(col("price"), col("l_suppkey"))).as("best"))
        .select(col("l_partkey"),
          col("best.l_suppkey").as("best_supp"),
          col("best.price").cast("double").as("min_price"))
        .orderBy(col("l_partkey")).limit(100)
    }),

    // Salted JOIN twin of q_skew_salted_agg (operators/Skew.saltedJoin):
    // the broadcast-inapplicable skew shape — fact rows carry a salt, the
    // dimension replicates across every salt value, so one flooding key
    // spreads over saltBuckets shuffle partitions. Results must equal the
    // plain equi-join (the oracle IS the plain join + GROUP BY).
    "q_skew_salted_join" -> ((s, dir) => {
      val fact = t(s, dir, "lineitem")
        .select(col("l_suppkey").as("suppkey"),
          col("l_extendedprice"), col("l_discount"))
      val dim = t(s, dir, "supplier")
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      graft.operators.Skew.saltedJoin(fact, dim, "suppkey",
          saltBuckets = 16)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          sum4(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
        .orderBy(col("s_nationkey"))
    }),

    // Exact distributed percentiles. Scale note: Spark's percentile
    // aggregates a distinct-value→count histogram per group, so state is
    // bounded by the value DOMAIN (2-decimal quantized here), not row
    // count. Interpolated results are pinned to the 1e-3 grid both
    // engines agree on (midpoints of 2-decimal values).
    "q_percentiles" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          expr("CAST(CAST(percentile(value, 0.5) AS DECIMAL(18,3)) AS DOUBLE)")
            .as("p50"),
          expr("CAST(CAST(percentile(value, 0.9) AS DECIMAL(18,3)) AS DOUBLE)")
            .as("p90"))
        .orderBy(col("event_type"))),

    // SQL-text entry path (spark.sql over registered views) — Q7-style
    // nation-pair volume. Same Catalyst plan machinery as the DataFrame
    // API; included to pin the SQL surface.
    "q7_nation_volume" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      s.sql(
        """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          |  year(l_shipdate) AS l_year,
          |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
          |    AS DOUBLE) AS revenue
          |FROM g_supplier JOIN g_lineitem ON s_suppkey = l_suppkey
          |JOIN g_orders ON o_orderkey = l_orderkey
          |JOIN g_customer ON c_custkey = o_custkey
          |JOIN g_nation n1 ON s_nationkey = n1.n_nationkey
          |JOIN g_nation n2 ON c_nationkey = n2.n_nationkey
          |WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
          |    OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
          |  AND l_shipdate >= TIMESTAMP '1995-01-01'
          |  AND l_shipdate < TIMESTAMP '1997-01-01'
          |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
          |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
    }),

    // Scalar subquery: orders above the global average price.
    "q_scalar_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders_ss")
      s.sql(
        """SELECT o_orderstatus, COUNT(*) AS n_above FROM g_orders_ss
          |WHERE o_totalprice > (
          |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    / CAST(COUNT(*) AS DOUBLE) FROM g_orders_ss)
          |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }),

    // Conditional aggregation (pivot shape via CASE).
    "q_conditional_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(when(col("l_discount") > 0.05, 1)).as("hi_disc"),
          count(when(col("l_discount") <= 0.05, 1)).as("lo_disc"),
          sum2(when(col("l_quantity") >= 25, col("l_extendedprice"))
            .otherwise(lit(0.0))).as("bulk_price"))
        .orderBy(col("l_returnflag"))),

    // Batch session-gap analysis (window lag + running sum) — the batch
    // twin of StreamingPipelines.sessionize, oracle-checkable end to end.
    // All time math in integral microseconds so Spark (µs timestamps) and
    // DuckDB (ns) agree bit-for-bit.
    "q_sessionize_batch" -> ((s, dir) => {
      val gapUs = 30L * 60 * 1000000
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
      val e = events(s, dir)
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("prev_tus", lag(col("tus"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_tus").isNull ||
            col("tus") - col("prev_tus") > gapUs, 1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      e.groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"),
          sum2(col("value")).as("total_value"),
          min(col("tus")).as("session_start_us"),
          max(col("tus")).as("session_end_us"))
        .orderBy(col("user_id"), col("sess_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE) AS avg_qty,
        |COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |AND o_orderdate < TIMESTAMP '1998-03-15'
        |AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |AND o_orderdate < TIMESTAMP '1996-04-01'
        |AND EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |AND r_name = 'ASIA'
        |AND o_orderdate >= TIMESTAMP '1996-01-01'
        |AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_revenue_forecast" ->
      """SELECT CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |AND l_shipdate < TIMESTAMP '1998-01-01'
        |AND l_discount >= 0.05 AND l_discount <= 0.07
        |AND l_quantity < 24""".stripMargin,
    "q_top_customers_window" ->
      """SELECT n_name, c_name, total_spent, rk FROM (
        |SELECT n_name, c_name,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
        |ROW_NUMBER() OVER (PARTITION BY n_name
        |  ORDER BY SUM(CAST(o_totalprice AS DECIMAL(18,2))) DESC, c_name) AS rk
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name, c_name) sub
        |WHERE rk <= 3 ORDER BY n_name, rk""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |COUNT(DISTINCT l_partkey) AS distinct_parts,
        |COUNT(DISTINCT l_suppkey) AS distinct_supps,
        |COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_setop_except" ->
      """SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |ORDER BY custkey""".stripMargin,
    "q_setop_except_all" ->
      """WITH ex AS (
        |  SELECT o_custkey AS custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-01-01'
        |  EXCEPT ALL
        |  SELECT o_custkey AS custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT custkey, COUNT(*) AS multiplicity FROM ex
        |GROUP BY custkey ORDER BY custkey""".stripMargin,
    "q_setop_intersect_all" ->
      """WITH ia AS (
        |  SELECT o_custkey AS custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-01-01'
        |  INTERSECT ALL
        |  SELECT o_custkey AS custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT custkey, COUNT(*) AS multiplicity FROM ia
        |GROUP BY custkey ORDER BY custkey""".stripMargin,
    "q_setop_intersect" ->
      """SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |ORDER BY custkey""".stripMargin,
    "q_orders_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q_brand_volume" ->
      """SELECT p_brand, COUNT(*) AS cnt,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_rollup_flags" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_cube_flags" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_pivot_events" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |COUNT(*) FILTER (event_type = 'view') AS n_view,
        |COUNT(*) FILTER (event_type = 'click') AS n_click,
        |COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
        |COUNT(*) FILTER (event_type = 'signup') AS n_signup,
        |COUNT(*) FILTER (event_type = 'error') AS n_error
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q_running_total" ->
      """SELECT o_custkey, o_orderdate, o_orderkey,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  AS run_total
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_above_avg_orders" ->
      """SELECT o_orderstatus, COUNT(*) AS n_above
        |FROM orders o JOIN (
        |  SELECT o_orderstatus AS st,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE) AS avg_p
        |  FROM orders GROUP BY o_orderstatus) a ON o.o_orderstatus = a.st
        |WHERE o.o_totalprice > a.avg_p
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_sliding_value" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus, value
        |  FROM events)
        |SELECT event_id, user_id,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |  PARTITION BY user_id ORDER BY tus
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  AS trail_1h_value,
        |COUNT(*) OVER (
        |  PARTITION BY user_id ORDER BY tus
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |  AS trail_1h_events
        |FROM e ORDER BY event_id""".stripMargin,
    // same Monday-based week truncation, exact integer day arithmetic
    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
        |c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e
        |  GROUP BY user_id)
        |SELECT c.cohort_wk,
        |  CAST((e.wk - c.cohort_wk) // 7 AS INTEGER) AS weeks_since,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
        |FROM e JOIN c ON e.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_value_histogram" ->
      """SELECT CAST(GREATEST(LEAST(FLOOR(value / 25.0), 19.0), 0.0)
        |    AS INTEGER) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_funnel" ->
      """WITH s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t_view
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |    AND epoch_us(e.ts) > s1.t_view
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |    AND epoch_us(e.ts) > s2.t_click
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT user_id, t_view, t_click, t_purchase
        |FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "q_grouping_sets" ->
      """SELECT c_mktsegment, c_nationkey, COUNT(*) AS cnt,
        |GROUPING(c_mktsegment) AS g_seg, GROUPING(c_nationkey) AS g_nat
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        |ORDER BY g_seg, g_nat, c_mktsegment NULLS FIRST,
        |  c_nationkey NULLS FIRST""".stripMargin,
    "q_user_gaps" ->
      """SELECT user_id, event_id,
        |epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |  ORDER BY epoch_us(ts), event_id) AS gap_us,
        |ntile(4) OVER (PARTITION BY user_id
        |  ORDER BY epoch_us(ts), event_id) AS quartile
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_left_join_nulls" ->
      """SELECT c_mktsegment,
        |COUNT(DISTINCT c_custkey) AS n_customers,
        |COUNT(o_orderkey) AS n_orders,
        |COUNT(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END)
        |  AS n_silent
        |FROM customer c LEFT JOIN orders o ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_full_outer_hours" ->
      """WITH a AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c
        |  FROM events WHERE event_type = 'signup'
        |  GROUP BY 1 HAVING COUNT(*) >= 3),
        |b AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c
        |  FROM events WHERE event_type = 'error'
        |  GROUP BY 1 HAVING COUNT(*) >= 3)
        |SELECT COALESCE(a.h, b.h) AS h, COALESCE(a.c, 0) AS n_signup,
        |COALESCE(b.c, 0) AS n_error
        |FROM a FULL OUTER JOIN b ON a.h = b.h ORDER BY h""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |COUNT(*) AS cnt,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, COUNT(*) AS cnt,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_props" ->
      """SELECT event_id,
        |CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_asof_join" ->
      """WITH ord AS (SELECT o_custkey, o_orderdate,
        |  MAX(o_orderkey) AS last_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, o.last_orderkey
        |FROM events e ASOF LEFT JOIN ord o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    // DuckDB ASOF with ts <= ts picks the smallest right time >= left —
    // the forward direction
    "q_asof_forward" ->
      """WITH pur AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |err AS (SELECT user_id, ts, MAX(event_id) AS err_id FROM events
        |  WHERE event_type = 'error' GROUP BY user_id, ts)
        |SELECT p.event_id, p.user_id, e.err_id
        |FROM pur p ASOF LEFT JOIN err e
        |  ON p.user_id = e.user_id AND p.ts <= e.ts
        |ORDER BY p.event_id""".stripMargin,
    // both directions via two ASOF joins, closest by exact integer
    // microseconds (epoch_us), ties to backward — mirrors the engine
    "q_asof_nearest" ->
      """WITH pur AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |err AS (SELECT user_id, ts, MAX(event_id) AS err_id FROM events
        |  WHERE event_type = 'error' GROUP BY user_id, ts),
        |f AS (SELECT p.event_id, e.err_id AS f_id, e.ts AS f_ts
        |  FROM pur p ASOF LEFT JOIN err e
        |    ON p.user_id = e.user_id AND p.ts <= e.ts),
        |b AS (SELECT p.event_id, e.err_id AS b_id, e.ts AS b_ts
        |  FROM pur p ASOF LEFT JOIN err e
        |    ON p.user_id = e.user_id AND p.ts >= e.ts)
        |SELECT p.event_id, p.user_id,
        |  CASE WHEN f.f_id IS NULL THEN b.b_id
        |       WHEN b.b_id IS NULL THEN f.f_id
        |       WHEN epoch_us(f.f_ts) - epoch_us(p.ts) <
        |            epoch_us(p.ts) - epoch_us(b.b_ts) THEN f.f_id
        |       ELSE b.b_id END AS err_id
        |FROM pur p
        |LEFT JOIN f ON f.event_id = p.event_id
        |LEFT JOIN b ON b.event_id = p.event_id
        |ORDER BY p.event_id""".stripMargin,
    "q_range_join" ->
      """SELECT p.event_id AS purchase_id, e.event_id
        |FROM events e JOIN events p ON e.user_id = p.user_id
        |  AND p.event_type = 'purchase'
        |  AND e.ts >= p.ts AND e.ts < p.ts + INTERVAL 1 HOUR
        |  AND e.event_id <> p.event_id
        |ORDER BY purchase_id, e.event_id""".stripMargin,
    "q_skew_salted_agg" ->
      """SELECT event_type, COUNT(*) AS cnt,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // min-then-tie-break recomputed as two grouped steps (the struct-min
    // trick is Spark-side; the result is identical)
    "q2_min_cost_supplier" ->
      """WITH up AS (SELECT l_partkey, l_suppkey,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |    AND r_name = 'EUROPE'),
        |m AS (SELECT l_partkey, MIN(price) AS min_price FROM up
        |  GROUP BY l_partkey)
        |SELECT up.l_partkey, MIN(up.l_suppkey) AS best_supp,
        |  CAST(m.min_price AS DOUBLE) AS min_price
        |FROM up JOIN m ON up.l_partkey = m.l_partkey
        |  AND up.price = m.min_price
        |GROUP BY up.l_partkey, m.min_price
        |ORDER BY up.l_partkey LIMIT 100""".stripMargin,
    "q_skew_salted_join" ->
      """SELECT s_nationkey, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type,
        |  CAST(CAST(quantile_cont(value, 0.5) AS DECIMAL(18,3)) AS DOUBLE)
        |    AS p50,
        |  CAST(CAST(quantile_cont(value, 0.9) AS DECIMAL(18,3)) AS DOUBLE)
        |    AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS revenue
        |FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
        |    OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
        |  AND l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderstatus, COUNT(*) AS n_above FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_conditional_agg" ->
      """SELECT l_returnflag,
        |COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS hi_disc,
        |COUNT(CASE WHEN l_discount <= 0.05 THEN 1 END) AS lo_disc,
        |CAST(SUM(CAST(CASE WHEN l_quantity >= 25 THEN l_extendedprice
        |  ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS bulk_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_semi_join" ->
      """SELECT l_returnflag, COUNT(*) AS cnt,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "q_sessionize_batch" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS tus,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_tus
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, value, tus,
        |    SUM(CASE WHEN prev_tus IS NULL
        |      OR tus - prev_tus > 1800000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY tus, event_id
        |            ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM e)
        |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  MIN(tus) AS session_start_us, MAX(tus) AS session_end_us
        |FROM s GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""".stripMargin
  )
}
