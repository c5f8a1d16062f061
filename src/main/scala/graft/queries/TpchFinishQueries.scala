package graft.queries

import org.apache.spark.sql.functions._

/** The remaining TPC-H query shapes expressible over the driver's reduced
  * star schema (TESTDATA.md) — Q8/Q10/Q13/Q14/Q15/Q17/Q18/Q19/Q22 flavors,
  * completing the relational sweep started in [[AnalyticsQueries]] (Q1–Q7).
  *
  * Not representable on this schema (and therefore intentionally absent):
  * Q9/Q11/Q16/Q20 need `partsupp`, Q12 needs `l_shipmode`/`l_receiptdate`,
  * Q21 needs `l_commitdate`, and Q22's phone-prefix filter is replaced by a
  * nation-key cut (the anti-join + scalar-subquery shape is what matters).
  *
  * Scale notes (100 TB design):
  *   - every dimension join (`part`, `supplier`, `customer`, `nation`,
  *     `region`) is `broadcast` — the lineitem/orders facts shuffle only on
  *     their own group keys;
  *   - Q17's per-part average and Q18's per-order quantity sum are
  *     partial-aggregated before their one exchange (fact shuffles on the
  *     *aggregated* key, 1 row per part/order, not per lineitem);
  *   - Q15/Q22 scalar thresholds are 1-row broadcast joins, never collects;
  *   - top-k outputs are `orderBy.limit` → TakeOrderedAndProject.
  *
  * Determinism follows the Q.scala contract: exact decimal sums, one final
  * double op, total ORDER BY.
  */
object TpchFinishQueries {
  import Q._

  val all: Map[String, QueryFn] = Map(
    // Q8: national market share inside a region for one part type. Two
    // nation joins (customer side fixes the region, supplier side names the
    // share), conditional/total exact-decimal sums, one double division.
    "q8_market_share" -> ((s, dir) => {
      val part = t(s, dir, "part").filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      val region = t(s, dir, "region").filter(col("r_name") === "EUROPE")
        .select(col("r_regionkey"))
      val custNation = t(s, dir, "nation")
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
      val suppNation = t(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("sn_name"))
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val supp = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
        .join(broadcast(region), col("cn_region") === col("r_regionkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum4(when(col("sn_name") === "NATION_8", vol).otherwise(lit(0)))
          / sum4(vol)).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // Q10: top-20 customers by returned-item revenue in a quarter.
    "q10_returned_items" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1996-04-01")))
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum4(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q13: distribution of customers by order count — left join preserving
    // zero-order customers, then a second tiny aggregation.
    "q13_customer_distribution" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      t(s, dir, "customer").select(col("c_custkey"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q14: promo revenue share in one month — two conditional exact sums,
    // then ONE mirrored double expression (100.0*num/den, left-assoc).
    "q14_promo_revenue" -> ((s, dir) => {
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-09-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-10-01")))
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum4(when(col("p_type") === "PROMO", vol).otherwise(lit(0)))
            .as("promo_revenue"),
          sum4(vol).as("total_revenue"))
        .select(col("promo_revenue"), col("total_revenue"),
          (lit(100.0) * col("promo_revenue") / col("total_revenue"))
            .as("promo_pct"))
    }),

    // Q15: supplier(s) achieving the quarter's max revenue. The threshold
    // is an exact-decimal max carried on a 1-row broadcast (no collect);
    // equality is decided in decimal, doubles only in the output.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-04-01")))
        .groupBy(col("l_suppkey"))
        .agg(sum(dec4(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("rev_dec"))
      val mx = rev.agg(max(col("rev_dec")).as("mx"))
      rev.join(broadcast(mx), col("rev_dec") === col("mx"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev_dec").cast("double").as("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // Q17: revenue from small-quantity lineitems of one brand, against a
    // per-part average-quantity threshold. The average is partial-aggregated
    // to 1 row per part before its exchange; the threshold compare
    // (0.2*avg) is a single mirrored double op.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val pq = li.groupBy(col("l_partkey").as("pk"))
        .agg((sum(dec2(col("l_quantity"))).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"))
      li.join(broadcast(t(s, dir, "part").filter(col("p_brand") === "Brand#23")),
          col("l_partkey") === col("p_partkey"))
        .join(pq, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((sum(dec2(col("l_extendedprice"))).cast("double") / lit(7.0))
          .as("avg_yearly"))
    }),

    // Q18: large-volume orders. The HAVING sum is computed once per order
    // (partial-agg before the exchange) and reused as the output column —
    // no second lineitem pass.
    "q18_large_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(dec2(col("l_quantity"))).as("sum_qty_dec"))
        .filter(col("sum_qty_dec") > 150)
      big.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("sum_qty_dec").cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Q19: bracketed OR-of-ANDs join predicate (brand × size × quantity),
    // pushed into a broadcast hash join's residual condition.
    "q19_bracket_revenue" -> ((s, dir) => {
      val part = t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val bracket =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#15" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30))
      t(s, dir, "lineitem")
        .join(broadcast(part), col("l_partkey") === col("p_partkey") && bracket)
        .agg(sum4(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
    }),

    // Q22 flavor: above-average-balance customers with no recent orders —
    // scalar-subquery threshold (1-row broadcast) + anti join, grouped by
    // nation key (the reduced schema has no phone column).
    "q22_idle_customers" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg((sum(dec2(col("c_acctbal"))).cast("double") /
          count(lit(1)).cast("double")).as("ab"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1999-01-01")))
        .select(col("o_custkey"))
      cust.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("ab"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), sum2(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("c_nationkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q8_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |CAST(SUM(CAST(CASE WHEN sn.n_name='NATION_8'
        |  THEN l_extendedprice*(1-l_discount) ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
        | / CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |  AS mkt_share
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
        |GROUP BY year(o_orderdate) ORDER BY o_year""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |AND o_orderdate >= TIMESTAMP '1996-01-01'
        |AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q13_customer_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) sub
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT
        |CAST(SUM(CAST(CASE WHEN p_type='PROMO'
        |  THEN l_extendedprice*(1-l_discount) ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
        |  AS promo_revenue,
        |CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |  AS total_revenue,
        |100.0 * CAST(SUM(CAST(CASE WHEN p_type='PROMO'
        |  THEN l_extendedprice*(1-l_discount) ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
        | / CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |  AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q17_small_qty_revenue" ->
      """WITH pq AS (
        |  SELECT l_partkey AS pk,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |  AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |JOIN pq ON pk = l_partkey
        |WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * avg_qty""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |CAST(sum_qty_dec AS DOUBLE) AS sum_qty
        |FROM (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_dec
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150) big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q19_bracket_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |  AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand='Brand#12' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand='Brand#23' AND p_size BETWEEN 1 AND 25
        |    AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand='Brand#15' AND p_size BETWEEN 1 AND 35
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q22_idle_customers" ->
      """SELECT c_nationkey, COUNT(*) AS numcust,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE)
        |  FROM customer WHERE c_acctbal > 0)
        |AND NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  )
}
