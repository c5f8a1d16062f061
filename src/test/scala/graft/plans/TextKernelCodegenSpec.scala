package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkFunSuite
import graft.functions.{TextFunctions => TF}

/** CODEGEN_ONLY pins for the round-16 string-kernel expressions
  * ([[MainContent]], [[RobotsEval]]) — the round-10/11 trap: a
  * template Janino rejects makes Spark silently run interpreted
  * (~2×) under a green suite unless fallback is disabled. */
class TextKernelCodegenSpec extends SparkFunSuite {

  private def withCodegenOnly[T](body: => T): T = {
    val s = spark
    val prevFactory = s.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = s.conf.getOption("spark.sql.codegen.fallback")
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    s.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally {
      prevFactory.fold(s.conf.unset("spark.sql.codegen.factoryMode"))(
        v => s.conf.set("spark.sql.codegen.factoryMode", v))
      prevFallback.fold(s.conf.unset("spark.sql.codegen.fallback"))(
        v => s.conf.set("spark.sql.codegen.fallback", v))
    }
  }

  test("main_content and robots_eval codegen under CODEGEN_ONLY " +
      "and match their kernels on a nullable column") {
    val s = spark
    import s.implicits._
    withCodegenOnly {
      val html = "<nav><a>Home</a></nav><p>six real words live " +
        "here now</p>"
      val rows = Seq(Some(html), None).toDF("h")
        .select(explode(array(TF.mainContent(col("h"), 3))).as("m"))
        .select(col("m.text"), col("m.n_kept")).collect()
      assert(rows.length == 2)
      assert(rows(0).getString(0) == "six real words live here now")
      assert(rows(0).getInt(1) == 1)
      assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
      val robots = "User-agent: *\nDisallow: /x\n"
      val r = Seq((robots, "ccbot", "/x/1"), (null, "ccbot", "/x/1"))
        .toDF("r", "a", "p")
        .select(explode(array(
          TF.robotsEval(col("r"), col("a"), col("p")))).as("v"))
        .select(col("v.allowed"), col("v.matched_rule")).collect()
      assert(r(0).getBoolean(0) == false &&
        r(0).getString(1) == "disallow:/x")
      assert(r(1).isNullAt(0))
      // parity with the bare kernels
      val k = MainContentKernel.extract(UTF8String.fromString(html), 3)
      assert(k.getUTF8String(0).toString ==
        "six real words live here now")
    }
  }
}
