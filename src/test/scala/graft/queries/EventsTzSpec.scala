package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Pins the round-6 advice fix: `Q.events` must yield the SAME instants
  * whatever the session timezone is. The broken form
  * (`to_utc_timestamp(ntz, 'UTC')`) implicitly cast NTZ→TIMESTAMP through
  * the session tz first and then applied a no-op shift — correct only
  * because the driver JVM happened to run UTC. */
class EventsTzSpec extends SparkFunSuite {

  test("Q.events instants are session-timezone independent (NTZ reinterpret)") {
    val s = spark
    def micros(): Seq[Long] =
      Q.events(s, sfDir)
        .select(expr("unix_micros(ts)").as("m"))
        .orderBy(col("m")).limit(5).collect().map(_.getLong(0)).toSeq
    val tzConf = "spark.sql.session.timeZone"
    val orig = s.conf.get(tzConf)
    val underUtc = micros()
    try {
      s.conf.set(tzConf, "America/Los_Angeles")
      assert(micros() == underUtc,
        "event instants shifted with the session timezone")
      s.conf.set(tzConf, "Asia/Tokyo")
      assert(micros() == underUtc)
    } finally s.conf.set(tzConf, orig)
  }
}
