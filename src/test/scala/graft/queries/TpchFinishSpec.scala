package graft.queries

import graft.SparkFunSuite
import org.apache.spark.sql.DataFrame

/** Pins the TPC-H completion family (Q8/Q10/Q13/Q14/Q15/Q17/Q18/Q19/Q22
  * flavors): every query runs at sf0.001, carries its contracted output
  * columns, and the plan keeps dimension joins broadcast (the scale
  * contract in [[TpchFinishQueries]]'s Scaladoc).
  */
class TpchFinishSpec extends SparkFunSuite {

  private def run(name: String): DataFrame =
    TpchFinishQueries.all(name)(spark, sfDir)

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
  }

  test("every query has an oracle and runs non-empty at sf0.001") {
    assert(TpchFinishQueries.all.keySet == TpchFinishQueries.oracles.keySet)
    for (name <- TpchFinishQueries.all.keys) {
      val rows = run(name).collect()
      assert(rows.nonEmpty, s"$name returned 0 rows at sf0.001")
    }
  }

  test("q8: market share is a fraction in [0,1] per year") {
    val shares = run("q8_market_share").collect()
      .map(_.getAs[Double]("mkt_share"))
    assert(shares.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("q14: promo_pct is consistent with its own numerator/denominator") {
    val r = run("q14_promo_revenue").collect().head
    val promo = r.getAs[Double]("promo_revenue")
    val total = r.getAs[Double]("total_revenue")
    assert(r.getAs[Double]("promo_pct") == 100.0 * promo / total)
  }

  test("q15: every returned supplier carries the same (max) revenue") {
    val revs = run("q15_top_supplier").collect()
      .map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1)
  }

  test("q18: orders honor the HAVING threshold and the limit") {
    val rows = run("q18_large_orders").collect()
    assert(rows.length <= 100)
    assert(rows.forall(_.getAs[Double]("sum_qty") > 150.0))
  }

  test("q10/q19 plans: dimension joins broadcast; no dimension-keyed " +
      "fact shuffle") {
    for (name <- Seq("q10_returned_items", "q19_bracket_revenue")) {
      val plan = finalPlan(run(name))
      assert(plan.contains("BroadcastHashJoin"),
        s"$name must broadcast its dimensions:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$name must not sort-merge a dimension join:\n$plan")
    }
  }

  test("q13: left join preserves zero-order customers") {
    val dist = run("q13_customer_distribution").collect()
      .map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("custdist")).toMap
    val customers = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(dist.values.sum == customers,
      "every customer lands in exactly one c_count bucket")
  }
}
