package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.functions.{TextFunctions => TF}

/** int8 scalar quantization + the round-3 text signals
  * (repetition / occurrence-weighted lang-id). */
class QuantizedSimSpec extends SparkFunSuite {

  private def vecs = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, Array(0.0f, 10.0f, 5.0f)),
      (1L, Array(0.1f, 9.9f, 5.1f)),   // near-twin of 0
      (2L, Array(10.0f, 0.0f, 0.0f)),  // far from 0/1
      (3L, Array(9.8f, 0.3f, 0.2f)))   // near-twin of 2
      .toDF("vec_id", "embedding")
  }

  test("quantizeInt8 maps per-dim min to -128 and max to 127") {
    val (mins, maxs) = Similarity.dimStats(vecs)
    val codes = vecs
      .select(col("vec_id"),
        Similarity.quantizeInt8(col("embedding"), mins, maxs).as("c"))
      .orderBy("vec_id").collect()
      .map(_.getSeq[Int](1).toArray)
    // dim2 range is [0, 5.1] → 5.0 ≈ 250/255 of the span → code 122
    assert(codes(0).sameElements(Array(-128, 127, 122)))
    assert(codes(2).sameElements(Array(127, -128, -128)))
    assert(codes.flatten.forall(c => c >= -128 && c <= 127))
  }

  test("constant dimension quantizes to -128 everywhere") {
    val s = spark
    import s.implicits._
    val const = Seq((0L, Array(1.0f, 7.7f)), (1L, Array(2.0f, 7.7f)))
      .toDF("vec_id", "embedding")
    val (mins, maxs) = Similarity.dimStats(const)
    val codes = const.select(
        Similarity.quantizeInt8(col("embedding"), mins, maxs).as("c"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(_(1) == -128))
  }

  test("int8TopK ranks the near-twin first, ties broken by id") {
    val hits = Similarity.int8TopK(vecs, vecs.filter(col("vec_id") === 0), 3)
      .collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
    assert(hits.head == (1, 1L)) // twin wins
    assert(hits.map(_._1).toSeq == Seq(1, 2, 3))
  }

  test("int8 dot score matches a hand-computed integer dot product") {
    val (mins, maxs) = Similarity.dimStats(vecs)
    val byId = vecs.select(col("vec_id"),
        Similarity.quantizeInt8(col("embedding"), mins, maxs).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val expect = byId(0L).zip(byId(1L)).map { case (a, b) => a.toLong * b }.sum
    val score = Similarity.int8TopK(vecs, vecs.filter(col("vec_id") === 0), 1)
      .collect().head.getAs[Long]("score")
    assert(score == expect)
  }

  test("quantization error is bounded by half a step on random vectors") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val data = (0 until 200).map(i =>
      (i.toLong, Array.fill(16)((rnd.nextFloat() - 0.5f) * 20f)))
    val df = data.toDF("vec_id", "embedding")
    val (mins, maxs) = Similarity.dimStats(df)
    val step = mins.zip(maxs).map { case (mn, mx) => (mx - mn) / 255.0 }
    val byId = df.select(col("vec_id"),
        Similarity.quantizeInt8(col("embedding"), mins, maxs).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    data.foreach { case (id, vec) =>
      val codes = byId(id)
      vec.zipWithIndex.foreach { case (x, d) =>
        val code = codes(d)
        assert(code >= -128 && code <= 127)
        val reconstructed = mins(d) + (code + 128) * step(d)
        assert(math.abs(x.toDouble - reconstructed) <= step(d) / 2 + 1e-9,
          s"vec $id dim $d: x=$x reconstructed=$reconstructed step=${step(d)}")
      }
    }
  }

  test("repetition signals on a hand-checked token stream") {
    val s = spark
    import s.implicits._
    // "a b a b" → bigrams (a b, b a, a b): top 2/3, dup 1/3, distinct 2/4
    val one = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val toks = one.select(TF.normTokens(col("text")).as("toks"))
    val bigrams = toks.select(
      explode(transform(sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ", slice(col("toks"), i, lit(2))))).as("bg"))
      .groupBy("bg").count().collect().map(r => r.getString(0) -> r.getLong(1))
    assert(bigrams.toMap == Map("a b" -> 2L, "b a" -> 1L))
  }

  test("occurrence-weighted lang evidence counts repeats; ties pick greatest lang") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the the le chien"), // en 2 vs fr 1 → en
      (2L, "the le"),           // en 1 = fr 1 → tie → fr (greatest lang)
      (3L, "xyzzy plugh"),      // no markers → score 0 → und
      (4L, "我有一个想法，这是真的")) // zh via marker-CHARACTER evidence
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TF.langEvidenceFromTokens(col("text"), TF.normTokens(col("text")))
          .as("ev"))
      .select(col("doc_id"),
        when(col("ev.score") > 0, col("ev.lang")).otherwise(lit("und"))
          .as("lang"),
        col("ev.score"))
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getInt(2)))
    // "我有一个想法，这是真的": markers 我,有,这,是,的 → 5 char hits
    assert(out.toSeq == Seq(("en", 2), ("fr", 1), ("und", 0), ("zh", 5)))
  }
}
