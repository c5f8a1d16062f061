package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class SketchesSpec extends SparkFunSuite {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("kmvTokenDistinct: estimate tracks the exact distinct count, " +
      "small groups fall back to exact, partitioning-independent") {
    val out = Sketches.kmvTokenDistinct(docs, "lang", "text", k = 128)
      .collect()
      .map(r => r.getAs[String]("lang") -> (r.getAs[Long]("n_hashes"),
        r.getAs[Long]("kth_min"), r.getAs[Long]("est_distinct"))).toMap
    val exact = docs
      .select(col("lang"),
        explode(graft.functions.TextFunctions.normTokens(col("text")))
          .as("t"))
      .groupBy("lang").agg(countDistinct(col("t")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (lang, d) =>
      val (n, _, est) = out(lang)
      if (d < 128) {
        // small-set fallback (STRICTLY below k: a group with exactly k
        // hashes takes the estimator): the sketch IS the exact count
        // (modulo hash collisions, absent at this scale)
        assert(n == d && est == d, s"$lang: exact path $est vs $d")
      } else {
        assert(n == 128L)
        val err = math.abs(est - d).toDouble / d
        // KMV relative error ~ 1/sqrt(k-1) ≈ 0.089; allow 3 sigma
        assert(err < 0.27, s"$lang: est $est vs exact $d (err $err)")
      }
    }
    // boundary: a group with EXACTLY k distinct hashes takes the
    // estimator path, not the exact fallback
    locally {
      val s2 = spark
      import s2.implicits._
      val atK = (1 to 128).map(i => ("g", s"tok$i")).toDF("g", "text")
      val row = Sketches.kmvTokenDistinct(atK, "g", "text", k = 128)
        .head()
      assert(row.getAs[Long]("n_hashes") == 128L)
      assert(row.getAs[Long]("est_distinct") ==
        127L * Sketches.M / row.getAs[Long]("kth_min"))
    }
    // deterministic under repartition (mergeable partial aggregates)
    val again = Sketches.kmvTokenDistinct(docs.repartition(7), "lang",
        "text", k = 128)
      .collect()
      .map(r => r.getAs[String]("lang") -> (r.getAs[Long]("n_hashes"),
        r.getAs[Long]("kth_min"), r.getAs[Long]("est_distinct"))).toMap
    assert(again == out)
  }

  test("groupShingleJaccard: hand-checked overlap; zero-overlap pairs " +
      "omitted; counts are distinct-set sizes") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "g1", "a b c d"),   // shingles: "a b c", "b c d"
      (2L, "g2", "b c d e"),   // shingles: "b c d", "c d e"
      (3L, "g2", "b c d e"),   // duplicate doc: must not double-count
      (4L, "g3", "x y z"))     // disjoint
      .toDF("doc_id", "g", "text")
    val out = Sketches.groupShingleJaccard(d, "g", "text", shingleK = 3)
      .collect()
      .map(r => ((r.getAs[String]("g_a"), r.getAs[String]("g_b")),
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_inter"), r.getAs[Double]("jaccard")))).toMap
    assert(out.keySet == Set(("g1", "g2")),
      "zero-overlap pairs must be omitted")
    assert(out(("g1", "g2")) == ((2L, 2L, 1L, 1.0 / 3.0)))
  }

  test("incrementalNew: corpus re-crawls dropped, within-delta dups " +
      "collapse to the smallest id, updates survive") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "alpha"),          // re-crawl of corpus doc -> dropped
      (11L, "gamma"),          // new -> survives
      (12L, "gamma"),          // within-delta dup -> folds into 11
      (13L, "beta"),           // re-crawl -> dropped
      (14L, "delta"))          // new -> survives
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNew(corpus, delta, "text", "doc_id")
      .collect()
      .map(r => r.getAs[Long]("survivor_id") -> r.getAs[Long]("n_copies"))
      .toMap
    assert(out == Map(11L -> 2L, 14L -> 1L))
  }

  test("corpus_source_sim oracle precondition: word-3-shingle hashes are " +
      "injective over the sf0.01 shingle population") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val sh = docs.select(explode(
      graft.functions.TextFunctions.wordShingles(col("text"), 3)).as("s"))
    val nStrings = sh.select(countDistinct(col("s"))).head.getLong(0)
    val hs = docs.select(explode(
      graft.functions.TextFunctions.wordShingleHashes(col("text"), 3))
      .as("h"))
    val nHashes = hs.select(countDistinct(col("h"))).head.getLong(0)
    assert(nStrings == nHashes,
      "hash collisions would desync the shingle-string oracle")
  }

  test("empty-doc shingle contract: the native kernels emit EMPTY sets " +
      "for empty/punctuation-only text (the oracle SQL's explicit " +
      "empty branch mirrors this)") {
    val s = spark
    import s.implicits._
    val out = Seq("", "   ", "!!! ...", "real text with several words here")
      .toDF("text")
      .select(
        size(graft.functions.TextFunctions
          .wordShingleHashes(col("text"), 3)).as("nw"),
        size(graft.functions.TextFunctions
          .charNgramHashes(col("text"), 5)).as("nc"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(out(0) == ((0, 0)) && out(1) == ((0, 0)) && out(2) == ((0, 0)))
    assert(out(3)._1 > 0 && out(3)._2 > 0)
  }

  test("scramble: bijective over sampled fingerprints and spreads tiny " +
      "inputs away from zero") {
    val s = spark
    import s.implicits._
    val fps = (0L until 4096L).map(i => i * 536870923L % Sketches.M)
    val out = fps.toDF("fp")
      .select(Sketches.scramble(col("fp")).as("h"))
      .collect().map(_.getLong(0))
    assert(out.distinct.length == fps.length, "scramble must be injective")
    assert(out.forall(h => h >= 0 && h < Sketches.M))
    // the smallest raw fingerprints (single chars ~ 100) must not stay
    // clustered at the bottom of the hash space
    val tiny = Seq(97L, 98L, 99L, 48L, 57L).toDF("fp")
      .select(Sketches.scramble(col("fp")).as("h"))
      .collect().map(_.getLong(0))
    assert(tiny.forall(_ > Sketches.M / 1000))
  }

  test("CountMin: estimates dominate exact counts, are exact absent " +
      "collisions, and shard sketches merge by addition") {
    val s = spark
    import s.implicits._
    import graft.functions.{TextFunctions => TF}
    val (depth, width) = (4, 64)
    def grid(df: org.apache.spark.sql.DataFrame): Array[Long] = df
      .select(explode(TF.normTokens(col("text"))).as("tok"))
      .select(TF.fingerprintPolyRaw(col("tok")).as("fp"))
      .select(Sketches.cmsPositions(col("fp"), depth, width).as("ps"))
      .agg(Sketches.cmsAgg(col("ps"), depth, width).as("cms"))
      .head().getSeq[Long](0).toArray
    val full = grid(docs)
    assert(full.length == depth * width)
    // grand total per depth row == total token occurrences
    val nToks = docs.select(explode(TF.normTokens(col("text"))))
      .count()
    (0 until depth).foreach { i =>
      assert(full.slice(i * width, (i + 1) * width).sum == nToks)
    }
    // merge law: sketch(A) + sketch(B) == sketch(A ∪ B), elementwise
    val a = grid(docs.filter(col("doc_id") % 2 === 0))
    val b = grid(docs.filter(col("doc_id") % 2 =!= 0))
    assert(a.zip(b).map { case (x, y) => x + y }.sameElements(full))
    // point estimates dominate exact counts; exact when no depth row
    // collides (check via a tiny 3-token corpus where width >> vocab)
    val tiny = Seq((1L, "alpha beta alpha"), (2L, "beta gamma alpha"))
      .toDF("doc_id", "text")
    val tinyGrid = grid(tiny)
    val est = Seq("alpha", "beta", "gamma").toDF("tok")
      .select(col("tok"),
        Sketches.cmsPositions(TF.fingerprintPolyRaw(col("tok")),
          depth, width).as("ps"))
      .select(col("tok"), Sketches.cmsEstimate(
        typedLit(tinyGrid.toSeq), col("ps"), depth, width).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") == 3L && est("beta") == 2L && est("gamma") == 1L)
  }

  test("binHistogram + quantilesFromHistogram reproduce the batch " +
      "histQuantiles estimates; invariant under repartitioning") {
    val s = spark
    import s.implicits._
    val vals = Seq(5L, 7L, 17L, 23L, 31L, 42L, 64L, 88L, 99L, 100L, 3L)
    val df = vals.toDF("v").repartition(5)
    val ps = Seq(10, 25, 50, 75, 90)
    val got = df
      .agg(Sketches.binHistogram(col("v"), 10L).as("hist"))
      .select(explode(
        Sketches.quantilesFromHistogram(col("hist"), 10L, ps)).as("q"))
      .select(col("q.p"), col("q.est_lo"), col("q.est_hi"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val want = Sketches.histQuantiles(df, "v", 10L, ps)
      .collect()
      .map(r => (r.getAs[Int]("p"), r.getAs[Long]("est_lo"),
        r.getAs[Long]("est_hi")))
      .sortBy(_._1).toSeq
    assert(got == want)
  }

  test("quantilesFromHistogram over an EMPTY histogram (all-null input) " +
      "yields NULL bounds, never sentinel arithmetic") {
    val s = spark
    import s.implicits._
    val df = Seq[Option[Long]](None, None).toDF("v")
    val row = df
      .agg(Sketches.binHistogram(col("v"), 10L).as("hist"))
      .select(explode(
        Sketches.quantilesFromHistogram(col("hist"), 10L, Seq(50))).as("q"))
      .select(col("q.p"), col("q.est_lo"), col("q.est_hi"))
      .head()
    assert(row.getInt(0) == 50 && row.isNullAt(1) && row.isNullAt(2))
  }

  test("binHistogram fails loudly past maxBins instead of silently " +
      "truncating the tail") {
    val s = spark
    import s.implicits._
    val df = (0L until 100L).toDF("v")
    val thrown = intercept[Exception] {
      df.agg(Sketches.binHistogram(col("v"), 1L, maxBins = 8)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(thrown).exists(_.getMessage != null) &&
      causes(thrown).exists(t => t.getMessage != null &&
        t.getMessage.contains("maxBins")), thrown.toString)
  }
}
