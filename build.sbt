ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "byteconvertavrospark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run inherits the parent's raw stdout: without this, sbt routes
// the child's stdout through its logger and prefixes every line with
// "[info] " — which breaks any consumer expecting a bare JSON line from
// graft.Bench (the driver's per-line json.loads fails on the prefix).
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
) ++ sys.env.get("SPARK_JVM_OPTS").map(_.split(" ").filter(_.nonEmpty).toSeq)
  .getOrElse(Seq(
    // Fixed-size heap with in-place eden reuse (ParallelGC): the round-4
    // box faults FRESH anonymous pages at ~64 MB/s (hypervisor-level;
    // warm pages run at normal GB/s). G1's region cycling touches new
    // pages continuously on a large heap — measured 10-40x slowdowns on
    // allocation-heavy queries (avro_key_decode 3.3 -> 46 s). ParallelGC
    // reuses the same eden address range every cycle, so pages fault
    // once and stay warm; a fixed Xms=Xmx prevents uncommit/re-fault.
    // (Round-1-3 boxes had normal fault speed: 24g G1 was fine there —
    // see BENCH_NOTES "Round-4 box" for the measurements.)
    "-XX:+UseParallelGC",
    s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "6g")}",
    s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "6g")}",
  ))

// The bench/verify contract is "exactly one stdout JSON line"; sbt
// otherwise appends "[success] Total time: ..." AFTER the forked
// process output, so any consumer parsing the LAST line gets sbt
// noise instead of the result (BENCH_r01-r04 all record parsed:null).
Global / showSuccess := false
