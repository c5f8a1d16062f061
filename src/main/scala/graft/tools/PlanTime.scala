package graft.tools

import org.apache.spark.sql.SparkSession

/** Splits one named query's wall time into construction / analysis+
  * optimization+physical planning / first execution (codegen + run) /
  * steady-state re-execution — pinpoints driver-side planning or Janino
  * compile cost that JobProfile's per-job view reports only as "gaps".
  *
  * Usage: `runMain graft.tools.PlanTime <name> [sfDir] [codegen]`
  * (codegen = "off" disables whole-stage codegen for an A/B.)
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    if (args.lift(2).contains("off"))
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    // untimed full warmup rep (JIT, fixtures)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { rep =>
      var t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tCons = ms(t0)
      t0 = System.nanoTime()
      df.queryExecution.executedPlan
      val tPlan = ms(t0)
      t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val tExec = ms(t0)
      println(f"[plantime] $name rep$rep construct=${tCons}%8.1fms " +
        f"plan=${tPlan}%8.1fms exec=${tExec}%8.1fms")
    }
    spark.stop()
  }
}
