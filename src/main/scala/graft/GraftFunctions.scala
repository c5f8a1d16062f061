package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.plans._

/** SQL registration for the engine's native expressions — makes every
  * custom kernel available to `spark.sql(...)` users, completing the API
  * surface next to the Column-level wrappers in `graft.functions.*`:
  *
  * {{{
  *   graft.GraftFunctions.register(spark)
  *   spark.sql("SELECT graft_top_k(score, id, 5) FROM t GROUP BY q")
  * }}}
  */
object GraftFunctions {

  /** The wikitext kernel folded into a Catalyst expression tree —
    * identical steps to `TextFunctions.wikitextStrip` (one shared
    * step list, no drift) so SQL callers get the same plaintext. */
  private[graft] def wikitextStripExpr(in: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Literal,
      RegExpReplace, StringReplace, StringTrim}
    StringTrim(graft.functions.TextFunctions.WikitextSteps.foldLeft(in) {
      case (c, ("re", p, r)) =>
        RegExpReplace(c, Literal(p), Literal(r))
      case (c, (_, f, t)) =>
        StringReplace(c, Literal(f), Literal(t))
    })
  }

  private def intArg(e: Expression, name: String): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_top_k",
      es => TopKByScore(es(0), es(1), intArg(es(2), "k")), "built-in")
    reg.createOrReplaceTempFunction("graft_misra_gries",
      es => MisraGriesSketch(es(0), intArg(es(1), "k")), "built-in")
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      es => BloomBitsetAgg(es(0), intArg(es(1), "log2Bits")), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      es => MinHashSignature(es(0), intArg(es(1), "numHashes")), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash64",
      es => SimHash64(es(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_word_shingle_hashes",
      es => ShingleHashes(es(0), intArg(es(1), "k"), byChar = false),
      "built-in")
    reg.createOrReplaceTempFunction("graft_char_ngram_hashes",
      es => ShingleHashes(es(0), intArg(es(1), "n"), byChar = true),
      "built-in")
    reg.createOrReplaceTempFunction("graft_jaccard_sorted",
      es => JaccardSortedSets(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_hyperplane_sig",
      es => HyperplaneSignature(es(0), intArg(es(1), "nBits"),
        intArg(es(2), "seed").toLong), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine_sim",
      es => CosineSimilarity(es(0), es(1)), "built-in")
    // graft_from_avro(bytes, writerSchema[, expectedId[, readerSchema]])
    // — 4th arg enables reader-schema evolution (defaults/aliases/
    // promotions via Avro schema resolution)
    reg.createOrReplaceTempFunction("graft_from_avro",
      es => AvroDecodeFixed(es(0), stringArg(es(1), "schemaJson"),
        if (es.length > 2) intArg(es(2), "expectedSchemaId") else -1,
        permissive = false,
        readerSchemaJson =
          if (es.length > 3) Some(stringArg(es(3), "readerSchemaJson"))
          else None),
      "built-in")
    reg.createOrReplaceTempFunction("graft_to_avro",
      es => AvroEncodeFixed(es(0), stringArg(es(1), "schemaJson")),
      "built-in")
    reg.createOrReplaceTempFunction("graft_nearest_centroids",
      es => NearestCentroids(es(0), longArrayArg(es(1), "centIds"),
        vecArrayArg(es(2), "centVecs"), intArg(es(3), "take")), "built-in")
    reg.createOrReplaceTempFunction("graft_poly_fingerprint",
      es => PolyFingerprint(es(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_nfc",
      es => NfcNormalize(es(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_fix_mojibake",
      es => FixMojibake(es(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_wikitext_strip",
      es => GraftFunctions.wikitextStripExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_text_signals",
      es => TextSignals(es(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_unigram_score",
      es => UnigramScore(es(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_greedy_segment",
      es => GreedySegment(es(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_byte_bpe_stats",
      es => ByteBpeStats(es(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_lz4_compress",
      es => Lz4Compress(es(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_lz4_decompress",
      es => Lz4Decompress(es(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_bigram_stats",
      es => BigramStats(es(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_dup_ngram_coverage",
      es => DupNgramCoverage(es(0), intArg(es(1), "n")), "built-in")
    reg.createOrReplaceTempFunction("graft_cms_agg",
      es => CountMinAgg(es(0), intArg(es(1), "depth"),
        intArg(es(2), "width")).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("graft_sign_project",
      es => SignProject(es(0), intArg(es(1), "outDim"),
        if (es.length > 2) intArg(es(2), "seed").toLong else 0L),
      "built-in")
    // media header parsers: Column-composition kernels (pure built-ins)
    // exposed to SQL by expanding the composition over the argument
    reg.createOrReplaceTempFunction("graft_sniff_kind",
      es => colExpr(graft.operators.Multimodal.sniffKind(bridged(es(0)))),
      "built-in")
    reg.createOrReplaceTempFunction("graft_media_dims",
      es => colExpr(graft.operators.Multimodal.mediaDims(bridged(es(0)))),
      "built-in")
    reg.createOrReplaceTempFunction("graft_wav_meta",
      es => colExpr(graft.operators.Multimodal.wavMeta(bridged(es(0)))),
      "built-in")
    reg.createOrReplaceTempFunction("graft_flac_meta",
      es => colExpr(graft.operators.Multimodal.flacMeta(bridged(es(0)))),
      "built-in")
    reg.createOrReplaceTempFunction("graft_zstd_compress",
      es => ZstdCompress(es(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_zstd_decompress",
      es => ZstdDecompress(es(0)), "built-in")
    registerOptimizations(spark)
  }

  private[graft] def bridged(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  private[graft] def colExpr(c: org.apache.spark.sql.Column): Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.resolvedExpression(c)

  /** Runtime twin of [[GraftSparkExtensions]]'s `injectOptimizerRule` for
    * sessions built without extensions (the extensions conf is fixed at
    * session build time; `extraOptimizations` is not). Idempotent. */
  def registerOptimizations(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(JaccardLengthPruning))
      spark.experimental.extraOptimizations = cur :+ JaccardLengthPruning
  }

  private[graft] def stringArg(e: Expression, name: String): String = e.eval() match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString
    case s: String => s
    case other => throw new IllegalArgumentException(
      s"$name must be a string literal, got $other")
  }

  /** Foldable `array<integral>` argument → Array[Long] (centroid ids). */
  private[graft] def longArrayArg(e: Expression, name: String): Array[Long] = {
    require(e.foldable, s"$name must be an array literal")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        e.dataType match {
          case org.apache.spark.sql.types.ArrayType(et, _) =>
            (0 until a.numElements()).map(i => a.get(i, et) match {
              case l: Long => l
              case i2: Int => i2.toLong
              case other => throw new IllegalArgumentException(
                s"$name elements must be integers, got $other")
            }).toArray
          case dt => throw new IllegalArgumentException(
            s"$name must be an array, got $dt")
        }
      case other => throw new IllegalArgumentException(
        s"$name must be an array literal, got $other")
    }
  }

  /** Foldable `array<array<numeric>>` argument → centroid matrix. */
  private[graft] def vecArrayArg(e: Expression, name: String)
      : Array[Array[Double]] = {
    require(e.foldable, s"$name must be an array-of-arrays literal")
    (e.eval(), e.dataType) match {
      case (a: org.apache.spark.sql.catalyst.util.ArrayData,
          org.apache.spark.sql.types.ArrayType(
            inner @ org.apache.spark.sql.types.ArrayType(et, _), _)) =>
        (0 until a.numElements()).map { i =>
          val row = a.get(i, inner)
            .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          (0 until row.numElements()).map(j => row.get(j, et) match {
            case d: Double => d
            case f: Float => f.toDouble
            case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
            case i2: Int => i2.toDouble
            case l: Long => l.toDouble
            case other => throw new IllegalArgumentException(
              s"$name elements must be numeric, got $other")
          }).toArray
        }.toArray
      case (_, dt) => throw new IllegalArgumentException(
        s"$name must be an array-of-arrays literal, got $dt")
    }
  }
}
