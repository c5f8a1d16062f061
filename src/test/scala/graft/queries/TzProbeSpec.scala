package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Pins the measured Spark 4.1.2 NTZ timezone semantics the `Q.events`
  * reinterpretation relies on (round-7 review): which operations on
  * TIMESTAMP_NTZ are pure wall-clock arithmetic and which secretly
  * resolve through the session zone. The probe value is the US
  * spring-forward SKIPPED hour (2025-03-09 02:30 in LA) — the input on
  * which every zone-resolving path shifts by the DST delta. */
class TzSemanticsSpec extends SparkFunSuite {

  private val SkippedWallMicros = 1741487400000000L // 2025-03-09T02:30Z

  private def evalOne(exprStr: String, tz: String): Any = {
    val s = spark
    import s.implicits._
    val conf = "spark.sql.session.timeZone"
    val orig = s.conf.get(conf)
    s.conf.set(conf, tz)
    try Seq(SkippedWallMicros).toDF("m").selectExpr(exprStr)
      .collect().head.get(0)
    finally s.conf.set(conf, orig)
  }

  private val Ntz =
    "timestampadd(MICROSECOND, m + 123456, " +
      "TIMESTAMP_NTZ '1970-01-01 00:00:00')"

  test("timestampadd on NTZ and field extraction are zone-free; " +
      "timestampdiff on NTZ is session-resolved (the trap)") {
    // construction + string render: zone-free
    for (e <- Seq(s"cast($Ntz as string)", s"unix_date(cast($Ntz as date))",
        s"date_part('HOUR', $Ntz)", s"date_part('SECOND', $Ntz)"))
      assert(evalOne(e, "UTC") == evalOne(e, "America/Los_Angeles"),
        s"expected zone-free: $e")
    // the trap: NTZ-NTZ difference resolves through the session zone —
    // off by the DST hour for the skipped wall time. If a Spark upgrade
    // ever fixes this, this assertion flips and Q.events can simplify.
    val diff = s"timestampdiff(MICROSECOND, " +
      s"TIMESTAMP_NTZ '1970-01-01 00:00:00', $Ntz)"
    assert(evalOne(diff, "UTC") != evalOne(diff, "America/Los_Angeles"),
      "timestampdiff(NTZ, NTZ) became zone-free — simplify Q.events")
    // the decomposition Q.events uses: exact micros, zone-free
    val decomp = s"unix_date(cast($Ntz as date)) * 86400000000L" +
      s" + (date_part('HOUR', $Ntz) * 3600" +
      s" + date_part('MINUTE', $Ntz) * 60) * 1000000L" +
      s" + cast(date_part('SECOND', $Ntz) * 1000000 as long)"
    assert(evalOne(decomp, "UTC") == SkippedWallMicros + 123456L)
    assert(evalOne(decomp, "America/Los_Angeles") ==
      SkippedWallMicros + 123456L)
    assert(evalOne(decomp, "Australia/Lord_Howe") ==
      SkippedWallMicros + 123456L) // half-hour DST zone
  }
}
