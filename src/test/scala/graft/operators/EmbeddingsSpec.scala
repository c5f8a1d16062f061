package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Deterministic power-iteration dominant direction. */
class EmbeddingsSpec extends SparkFunSuite {

  test("dominantDirection recovers a planted dominant axis (cosine " +
      "> 0.99) and fixes the global sign to a positive leading component") {
    val s = spark
    import s.implicits._
    // planted direction d ∝ (3, -1, 2, 0.5); coefficients swamp the
    // deterministic pseudo-noise, so the top eigenvector ≈ d
    val d = Array(3.0, -1.0, 2.0, 0.5)
    val rows = (0 until 400).map { i =>
      val a = (i % 21) - 10.0 // coefficients in [-10, 10]
      val v = d.indices.map(p =>
        (a * d(p) + 0.01 * (((i * 31 + p * 17) % 7) - 3)).toFloat).toArray
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Embeddings.dominantDirection(df, "embedding", iters = 3)
      .orderBy("pos").collect().map(_.getLong(1).toDouble)
    val dot = got.zip(d).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) /
      (math.sqrt(got.map(x => x * x).sum) * math.sqrt(d.map(x => x * x).sum))
    assert(cos > 0.99, s"cosine to planted axis was $cos")
    // sign rule: the largest-|component| entry is positive
    val lead = got.indices.minBy(i => (-math.abs(got(i)), i))
    assert(got(lead) > 0)
  }

  test("dominantDirection is bit-identical under corpus repartitioning") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val a = Embeddings.dominantDirection(emb, "embedding")
      .orderBy("pos").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val b = Embeddings.dominantDirection(emb.repartition(13), "embedding")
      .orderBy("pos").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(a == b)
    assert(a.length == 64 && a.exists(_._2 != 0L))
  }

  test("removeDominant strips most of the planted-axis mass and never " +
      "increases a vector's norm beyond the truncation quantum") {
    val s = spark
    import s.implicits._
    val d = Array(3.0, -1.0, 2.0, 0.5)
    val rows = (0 until 400).map { i =>
      val a = (i % 21) - 10.0
      val v = d.indices.map(p =>
        (a * d(p) + 0.01 * (((i * 31 + p * 17) % 7) - 3)).toFloat).toArray
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val dir = Embeddings.dominantDirection(df, "embedding", iters = 3)
      .orderBy("pos").collect().map(_.getLong(1))
    val out = Embeddings.removeDominant(df, "embedding", "vec_id", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    assert(out.length == 400)
    // corpus-wide: the dominant axis holds almost all the mass here
    val before = out.map(_._3).sum.toDouble
    val after = out.map(_._4).sum.toDouble
    assert(after < before * 0.01,
      s"planted-axis corpus should deflate: $after vs $before")
    // per-vector: projection removal cannot grow the norm past the
    // truncation quantum (coeff/adj truncate by ≤ 1 unit per component)
    out.foreach { case (id, _, b, a) =>
      assert(a <= b + d.length * 4L, s"vec $id grew: $a vs $b")
    }
    // exact invariance under repartition
    val again = Embeddings.removeDominant(df.repartition(7), "embedding",
        "vec_id", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("topDirections: recovers both planted axes in variance order, " +
      "near-orthogonal, and k=1 equals dominantDirection") {
    val s = spark
    import s.implicits._
    // two orthogonal planted axes, axis A with ~3x the coefficient
    // spread of axis B, plus deterministic pseudo-noise
    val da = Array(3.0, -1.0, 2.0, 0.5)
    val db = Array(1.0, 3.0, 0.0, 0.0) // ⟨da, db⟩ = 0
    val rows = (0 until 600).map { i =>
      val a = ((i % 21) - 10.0) * 3.0
      val b = ((i * 7 % 17) - 8.0)
      val v = da.indices.map(p =>
        (a * da(p) + b * db(p) +
          0.01 * (((i * 31 + p * 17) % 7) - 3)).toFloat).toArray
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Embeddings.topDirections(df, "embedding", k = 2, iters = 3)
      .orderBy("k", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(got.length == 8)
    val d1 = got.filter(_._1 == 1).sortBy(_._2).map(_._3.toDouble)
    val d2 = got.filter(_._1 == 2).sortBy(_._2).map(_._3.toDouble)
    def cosTo(v: Array[Double], axis: Array[Double]): Double = {
      val dot = v.zip(axis).map { case (x, y) => x * y }.sum
      math.abs(dot) / (math.sqrt(v.map(x => x * x).sum) *
        math.sqrt(axis.map(x => x * x).sum))
    }
    assert(cosTo(d1, da) > 0.99, s"level 1 missed axis A: ${cosTo(d1, da)}")
    assert(cosTo(d2, db) > 0.99, s"level 2 missed axis B: ${cosTo(d2, db)}")
    // successive directions near-orthogonal (deflation zeroes d1-mass)
    assert(cosTo(d1, d2) < 0.05, s"directions not orthogonal: ${cosTo(d1, d2)}")
    // k=1 is exactly dominantDirection
    val k1 = Embeddings.topDirections(df, "embedding", k = 1, iters = 3)
      .orderBy("pos").collect().map(_.getLong(2)).toSeq
    val dom = Embeddings.dominantDirection(df, "embedding", iters = 3)
      .orderBy("pos").collect().map(_.getLong(1)).toSeq
    assert(k1 == dom)
    // bit-identical under repartitioning (the whole chain is exact)
    val again = Embeddings.topDirections(df.repartition(11), "embedding",
        k = 2, iters = 3)
      .orderBy("k", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == again.toSeq)
  }

  test("removeDirections: removing both planted axes strips essentially " +
      "all mass; k=1 equals removeDominant; repartition-invariant") {
    val s = spark
    import s.implicits._
    val da = Array(3.0, -1.0, 2.0, 0.5)
    val db = Array(1.0, 3.0, 0.0, 0.0)
    val rows = (0 until 600).map { i =>
      val a = ((i % 21) - 10.0) * 3.0
      val b = ((i * 7 % 17) - 8.0)
      val v = da.indices.map(p =>
        (a * da(p) + b * db(p) +
          0.01 * (((i * 31 + p * 17) % 7) - 3)).toFloat).toArray
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val byK = Embeddings.topDirections(df, "embedding", k = 2, iters = 3)
      .collect().groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getLong(2)))
    val out = Embeddings.removeDirections(df, "embedding", "vec_id", byK)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.length == 600)
    val before = out.map(_._4).sum.toDouble
    val after = out.map(_._5).sum.toDouble
    assert(after < before * 0.001,
      s"both planted axes removed should leave only noise: $after " +
        s"vs $before")
    // k=1 degenerates to removeDominant exactly
    val one = Embeddings.removeDirections(df, "embedding", "vec_id",
        byK.take(1))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    val dom = Embeddings.removeDominant(df, "embedding", "vec_id",
        byK.head)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(one == dom)
    // exact invariance under repartition
    val again = Embeddings.removeDirections(df.repartition(7),
        "embedding", "vec_id", byK)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("dominantDirection fails loudly on a degenerate corpus " +
      "(every vector equals the mean)") {
    val s = spark
    import s.implicits._
    val df = (0 until 8).map(i =>
      (i.toLong, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val thrown = intercept[IllegalArgumentException] {
      Embeddings.dominantDirection(df, "embedding").collect()
    }
    assert(thrown.getMessage.contains("collapsed to zero"))
  }
}
