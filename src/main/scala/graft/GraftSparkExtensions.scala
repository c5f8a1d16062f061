package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans._

/** SparkSessionExtensions entry point — lets any session pick up the
  * engine's native functions with zero code:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftSparkExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftSparkExtensions) ...
  * }}}
  *
  * Same function set as [[GraftFunctions.register]], injected at session
  * build so SQL/JDBC-only users (thrift server, notebooks) get them too.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "",
      "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_top_k"),
      info("graft_top_k",
        "graft_top_k(score, id, k) - bounded-heap partial top-k aggregate"),
      es => TopKByScore(es(0), es(1), intArg(es(2), "k"))))
    e.injectFunction((FunctionIdentifier("graft_misra_gries"),
      info("graft_misra_gries",
        "graft_misra_gries(term, k) - mergeable frequent-items sketch"),
      es => MisraGriesSketch(es(0), intArg(es(1), "k"))))
    e.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg",
        "graft_bloom_agg(positions, log2Bits) - dense Bloom bitset words"),
      es => BloomBitsetAgg(es(0), intArg(es(1), "log2Bits"))))
    e.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig",
        "graft_minhash_sig(shingles, H) - H-entry minhash signature"),
      es => MinHashSignature(es(0), intArg(es(1), "numHashes"))))
    e.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(shingles) - 64-bit simhash"),
      es => SimHash64(es(0))))
    e.injectFunction((FunctionIdentifier("graft_word_shingle_hashes"),
      info("graft_word_shingle_hashes",
        "graft_word_shingle_hashes(text, k) - hashed k-word shingle set"),
      es => ShingleHashes(es(0), intArg(es(1), "k"), byChar = false)))
    e.injectFunction((FunctionIdentifier("graft_char_ngram_hashes"),
      info("graft_char_ngram_hashes",
        "graft_char_ngram_hashes(text, n) - hashed char n-gram set"),
      es => ShingleHashes(es(0), intArg(es(1), "n"), byChar = true)))
    e.injectFunction((FunctionIdentifier("graft_jaccard_sorted"),
      info("graft_jaccard_sorted",
        "graft_jaccard_sorted(a, b) - exact jaccard of sorted bigint sets"),
      es => JaccardSortedSets(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("graft_hyperplane_sig"),
      info("graft_hyperplane_sig",
        "graft_hyperplane_sig(vec, nBits, seed) - sign-bit LSH signature"),
      es => HyperplaneSignature(es(0), intArg(es(1), "nBits"),
        intArg(es(2), "seed").toLong)))
    e.injectFunction((FunctionIdentifier("graft_nearest_centroids"),
      info("graft_nearest_centroids",
        "graft_nearest_centroids(vec, centIds, centVecs, take) - ids of " +
          "the take nearest centroids (row-local, centroids from literals)"),
      es => NearestCentroids(es(0), GraftFunctions.longArrayArg(es(1),
        "centIds"), GraftFunctions.vecArrayArg(es(2), "centVecs"),
        intArg(es(3), "take"))))
    e.injectFunction((FunctionIdentifier("graft_from_avro"),
      info("graft_from_avro",
        "graft_from_avro(bytes, writerSchema[, expectedId[, readerSchema]])" +
          " - typed fixed-schema decode; 4-arg form applies reader-schema" +
          " evolution"),
      es => AvroDecodeFixed(es(0), GraftFunctions.stringArg(es(1),
        "schemaJson"),
        if (es.length > 2) intArg(es(2), "expectedSchemaId") else -1,
        permissive = false,
        readerSchemaJson =
          if (es.length > 3)
            Some(GraftFunctions.stringArg(es(3), "readerSchemaJson"))
          else None)))
    e.injectFunction((FunctionIdentifier("graft_to_avro"),
      info("graft_to_avro",
        "graft_to_avro(struct, schema) - typed fixed-schema Avro encode"),
      es => AvroEncodeFixed(es(0), GraftFunctions.stringArg(es(1),
        "schemaJson"))))
    e.injectFunction((FunctionIdentifier("graft_poly_fingerprint"),
      info("graft_poly_fingerprint",
        "graft_poly_fingerprint(normText) - portable Karp-Rabin fingerprint"),
      es => PolyFingerprint(es(0))))
    e.injectFunction((FunctionIdentifier("graft_nfc"),
      info("graft_nfc",
        "graft_nfc(text) - Unicode NFC canonical composition"),
      es => NfcNormalize(es(0))))
    e.injectFunction((FunctionIdentifier("graft_fix_mojibake"),
      info("graft_fix_mojibake",
        "graft_fix_mojibake(text) - reverse UTF-8-as-Latin-1 mojibake"),
      es => FixMojibake(es(0))))
    e.injectFunction((FunctionIdentifier("graft_wikitext_strip"),
      info("graft_wikitext_strip",
        "graft_wikitext_strip(wikitext) - wikitext to plaintext " +
          "(templates/tables/refs/links/quotes/headings)"),
      es => GraftFunctions.wikitextStripExpr(es(0))))
    e.injectFunction((FunctionIdentifier("graft_text_signals"),
      info("graft_text_signals",
        "graft_text_signals(text) - one-pass per-document profile struct"),
      es => TextSignals(es(0))))
    e.injectFunction((FunctionIdentifier("graft_unigram_score"),
      info("graft_unigram_score",
        "graft_unigram_score(text) - unigram-LM Viterbi segmentation " +
          "totals (uni_total, n_pieces, score_fp)"),
      es => UnigramScore(es(0))))
    e.injectFunction((FunctionIdentifier("graft_greedy_segment"),
      info("graft_greedy_segment",
        "graft_greedy_segment(text) - greedy maximal-munch " +
          "segmentation totals (wp_pieces, wp_score_fp, wp_unknown)"),
      es => GreedySegment(es(0))))
    e.injectFunction((FunctionIdentifier("graft_bigram_stats"),
      info("graft_bigram_stats",
        "graft_bigram_stats(text) - row-local bigram repetition stats"),
      es => BigramStats(es(0))))
    e.injectFunction((FunctionIdentifier("graft_sniff_kind"),
      info("graft_sniff_kind",
        "graft_sniff_kind(blob) - magic-byte media-kind dispatch"),
      es => GraftFunctions.colExpr(
        graft.operators.Multimodal.sniffKind(GraftFunctions.bridged(es(0))))))
    e.injectFunction((FunctionIdentifier("graft_media_dims"),
      info("graft_media_dims",
        "graft_media_dims(blob) - (width, height) from PNG/GIF/JPEG headers"),
      es => GraftFunctions.colExpr(
        graft.operators.Multimodal.mediaDims(GraftFunctions.bridged(es(0))))))
    e.injectFunction((FunctionIdentifier("graft_wav_meta"),
      info("graft_wav_meta",
        "graft_wav_meta(blob) - WAV/RIFF audio metadata struct"),
      es => GraftFunctions.colExpr(
        graft.operators.Multimodal.wavMeta(GraftFunctions.bridged(es(0))))))
    e.injectFunction((FunctionIdentifier("graft_flac_meta"),
      info("graft_flac_meta",
        "graft_flac_meta(blob) - FLAC STREAMINFO metadata struct"),
      es => GraftFunctions.colExpr(
        graft.operators.Multimodal.flacMeta(GraftFunctions.bridged(es(0))))))
    e.injectFunction((FunctionIdentifier("graft_zstd_compress"),
      info("graft_zstd_compress",
        "graft_zstd_compress(blob) - one compressed RFC 8878 zstd frame"),
      es => ZstdCompress(es(0))))
    e.injectFunction((FunctionIdentifier("graft_zstd_decompress"),
      info("graft_zstd_decompress",
        "graft_zstd_decompress(blob) - decompress a zstd stream " +
          "(dict-aware), NULL on violation"),
      es => ZstdDecompress(es(0))))
    e.injectFunction((FunctionIdentifier("graft_lz4_compress"),
      info("graft_lz4_compress",
        "graft_lz4_compress(blob) - one LZ4 frame (64 KiB blocks, " +
          "XXH32 checksums)"),
      es => Lz4Compress(es(0))))
    e.injectFunction((FunctionIdentifier("graft_lz4_decompress"),
      info("graft_lz4_decompress",
        "graft_lz4_decompress(blob) - decompress an LZ4 frame " +
          "stream, NULL on violation"),
      es => Lz4Decompress(es(0))))
    e.injectFunction((FunctionIdentifier("graft_byte_bpe_stats"),
      info("graft_byte_bpe_stats",
        "graft_byte_bpe_stats(text) - byte-level BPE totals " +
          "(n_bytes, n_subwords, n_pretokens)"),
      es => ByteBpeStats(es(0))))
    e.injectOptimizerRule(_ => JaccardLengthPruning)
  }
}
