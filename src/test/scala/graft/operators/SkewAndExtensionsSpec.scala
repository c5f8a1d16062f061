package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class SkewSpec extends SparkFunSuite {

  test("saltedAgg equals plain aggregation on a skewed key distribution") {
    val s = spark
    import s.implicits._
    // 10k rows, 90% on one hot key
    val df = (1 to 10000).map { i =>
      (if (i % 10 == 0) s"cold_${i % 97}" else "hot", i.toDouble)
    }.toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum($"v").cast("long").as("total"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAgg(df, Seq("k"), 32,
      partial = Seq(count(lit(1)).as("c"), sum($"v").as("sv")),
      final_ = Seq(sum($"c").as("cnt"), sum($"sv").cast("long").as("total")))
      .orderBy("k").collect().toSeq
    assert(plain.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ==
      salted.map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
  }

  test("saltedJoin equals plain inner join") {
    val s = spark
    import s.implicits._
    val fact = (1 to 5000).map(i => (i % 7, i)).toDF("k", "v")
    val dim = (0 until 7).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = fact.join(dim, "k").groupBy("name")
      .agg(count(lit(1)).as("c")).orderBy("name").collect().toSeq
    val salted = Skew.saltedJoin(fact, dim, "k", 8).groupBy("name")
      .agg(count(lit(1)).as("c")).orderBy("name").collect().toSeq
    assert(plain.map(r => (r.getString(0), r.getLong(1))) ==
      salted.map(r => (r.getString(0), r.getLong(1))))
  }
}

class GraftSparkExtensionsSpec extends SparkFunSuite {

  test("functions injected via spark.sql.extensions are callable") {
    // getOrCreate would silently return the suite's shared session (and
    // skip extensions) — clear active/default so a NEW session is built on
    // the same SparkContext with the extensions applied, production-style.
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // NOTE: the string conf `spark.sql.extensions` is STATIC — read from
    // the SparkContext conf at first-session creation, so it can't be
    // tested on a shared context; `withExtensions` is the equivalent
    // builder-level injection point.
    val s2 = SparkSession.builder()
      .withExtensions(new graft.GraftSparkExtensions)
      .getOrCreate()
    try {
      assert(s2 ne prev)
      val n = s2.sql(
        """SELECT graft_jaccard_sorted(
          |  graft_word_shingle_hashes('a b c d', 2),
          |  graft_word_shingle_hashes('a b c d', 2)) AS j""".stripMargin)
        .head.getDouble(0)
      assert(n == 1.0)
      val described = s2.sql("DESCRIBE FUNCTION graft_top_k").collect()
        .map(_.getString(0)).mkString("\n")
      assert(described.contains("graft_top_k"))
    } finally {
      // don't stop (shared SparkContext) — restore the suite session
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
