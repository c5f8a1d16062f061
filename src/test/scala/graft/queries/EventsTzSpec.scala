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

  test("NTZ reinterpret is exact ACROSS DST transitions (round-7 review: " +
      "cast-then-shift-back was off by the zone delta in the gap/overlap)") {
    val s = spark
    import s.implicits._
    // wall times straddling the US fall-back (2025-11-02 02:00 PT) and
    // spring-forward (2025-03-09 02:00 PT) — the ambiguous/skipped hours.
    // NTZ inputs are built with tz-FREE wall arithmetic (timestampadd of
    // a micros count onto the NTZ epoch) — a string→NTZ cast is itself
    // session-resolved for the skipped hour, which would test the
    // fixture, not the reinterpretation
    val walls = Seq(
      "2025-11-02T01:30:00", "2025-11-02T02:30:00", "2025-11-02T09:00:00",
      "2025-03-09T02:30:00", "2025-03-09T03:30:00", "2025-03-09T10:00:00")
    val expect = walls.map(w =>
      java.time.LocalDateTime.parse(w)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L)
    val df = expect.toDF("m")
      .select(expr("timestampadd(MICROSECOND, m, " +
        "TIMESTAMP_NTZ '1970-01-01 00:00:00')").as("ts"))
    // the exact reinterpretation expression Q.events uses (field
    // decomposition — the only form TzSemanticsSpec measures zone-free)
    def micros(tz: String): Seq[Long] = {
      val conf = "spark.sql.session.timeZone"
      val orig = s.conf.get(conf)
      s.conf.set(conf, tz)
      try df.select(expr(
          "unix_micros(timestamp_micros(" +
            "unix_date(cast(ts as date)) * 86400000000L" +
            " + (date_part('HOUR', ts) * 3600" +
            " + date_part('MINUTE', ts) * 60) * 1000000L" +
            " + cast(date_part('SECOND', ts) * 1000000 as long)))"))
        .collect().map(_.getLong(0)).toSeq
      finally s.conf.set(conf, orig)
    }
    val utc = micros("UTC")
    assert(utc == expect, "reinterpret must be the literal wall-as-UTC")
    assert(micros("America/Los_Angeles") == expect,
      "DST-boundary walls must reinterpret identically under LA")
    assert(micros("Australia/Lord_Howe") == expect) // half-hour DST zone
  }
}
