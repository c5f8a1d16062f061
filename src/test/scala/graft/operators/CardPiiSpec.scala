package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.functions.{TextFunctions => TF}

/** Payment-card candidate extraction + Luhn validation. */
class CardPiiSpec extends SparkFunSuite {

  /** Scalar Luhn reference. */
  private def luhnRef(s: String): Boolean = {
    val sum = s.reverse.zipWithIndex.map { case (c, i) =>
      val d = c - '0'
      if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
    }.sum
    sum % 10 == 0
  }

  private def luhn(ds: String*): Seq[(String, Boolean)] = {
    val s = spark
    import s.implicits._
    ds.toDF("d")
      .select(col("d"), TF.luhnValid(col("d")).as("v"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSeq
  }

  test("luhnValid matches known numbers and the scalar reference") {
    // 79927398713 is the canonical Luhn example; 4532015112830366 a
    // standard test PAN; off-by-one check digits must flip to invalid
    val cases = Seq("79927398713", "79927398714", "4532015112830366",
      "4532015112830367", "0000000000000", "0000000000001")
    val got = luhn(cases: _*).toMap
    cases.foreach { c =>
      assert(got(c) == luhnRef(c), s"$c: got ${got(c)}")
    }
    assert(got("79927398713") && got("4532015112830366"))
    assert(!got("79927398714") && !got("4532015112830367"))
  }

  test("cardCandidates extracts separator-grouped spans, normalized") {
    val s = spark
    import s.implicits._
    val out = Seq(
      "pay 4532-0151-1283-0366 now",        // 16 with dashes
      "pay 4532 0151 1283 0366 now",        // 16 with spaces
      "id 123456789012 short",              // 12 digits: below gate
      "big 12345678901234567890 run",       // 20 digits: no candidate
      "plain 4532015112830366")             // bare 16
      .toDF("t")
      .select(TF.cardCandidates(col("t")).as("c"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(out(0) == Seq("4532015112830366"))
    assert(out(1) == Seq("4532015112830366"))
    assert(out(2) == Seq.empty)
    assert(out(3) == Seq.empty)
    assert(out(4) == Seq("4532015112830366"))
  }

  test("13 and 19 digit runs pass the gate; 12 and 20 do not") {
    val s = spark
    import s.implicits._
    val out = Seq("1234567890123", "1234567890123456789",
      "123456789012", "12345678901234567890")
      .toDF("t")
      .select(size(TF.cardCandidates(col("t"))).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(1, 1, 0, 0))
  }
}
