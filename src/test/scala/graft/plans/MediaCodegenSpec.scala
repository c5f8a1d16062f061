package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.operators.Multimodal

/** Pins that every media expression COMPILES — evaluated under
  * `spark.sql.codegen.factoryMode=CODEGEN_ONLY` with whole-stage
  * fallback disabled, so generated-code that Janino rejects fails the
  * suite instead of silently falling back to interpreted eval (the
  * round-10 MediaAudit defect: the shared template assigned
  * `ev.isNull` on a NON-nullable expression — a coalesced child makes
  * `isNull` the literal "false", not an lvalue — and every audit plan
  * quietly ran interpreted, 2× slower, under a green suite). */
class MediaCodegenSpec extends SparkFunSuite {

  private def withCodegenOnly[T](body: => T): T = {
    val s = spark
    val prevFactory = s.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = s.conf.getOption("spark.sql.codegen.fallback")
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    s.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally {
      prevFactory.fold(s.conf.unset("spark.sql.codegen.factoryMode"))(
        v => s.conf.set("spark.sql.codegen.factoryMode", v))
      prevFallback.fold(s.conf.unset("spark.sql.codegen.fallback"))(
        v => s.conf.set("spark.sql.codegen.fallback", v))
    }
  }

  // non-foldable blobs (derived from range ids) so constant folding
  // cannot evaluate the kernels at plan time and dodge codegen
  private def blobs = spark.range(4).select(col("id").as("doc_id"),
    unhex(lpad(hex(col("id")), 6, "0")).as("blob"))

  test("every media expression codegens under CODEGEN_ONLY, nullable " +
      "child — the round-10 struct family AND the round-11 " +
      "array-kernel family") {
    withCodegenOnly {
      val fns: Seq[(String, org.apache.spark.sql.Column => org.apache
          .spark.sql.Column)] = Seq(
        "png" -> Multimodal.pngFeaturesCol,
        "gif" -> Multimodal.gifFeaturesCol,
        "jpeg" -> Multimodal.jpegFeaturesCol,
        "audit" -> Multimodal.mediaAuditCol,
        "any_raster" -> Multimodal.anyRasterCol,
        "wav_any" -> graft.plans.MediaExprs.wavAnyDepthCol,
        "wav16" -> graft.plans.MediaExprs.wav16Col,
        "flac" -> graft.plans.MediaExprs.flacCol,
        "any_audio" -> graft.plans.MediaExprs.anyAudioCol,
        "wav_windows" -> (graft.plans.MediaExprs.wavWindowsCol(_, 25)),
        "flac_windows" -> (graft.plans.MediaExprs.flacWindowsCol(_, 25)),
        "bmp" -> graft.plans.MediaExprs.bmpCol,
        "bmp_patches" -> (graft.plans.MediaExprs.bmpPatchesCol(_, 2)),
        "mp4_meta" -> graft.plans.MediaExprs.mp4MetaCol,
        "mp4_tracks" -> graft.plans.MediaExprs.mp4TracksCol,
        "mp4_sync_ranges" -> graft.plans.MediaExprs.mp4SyncRangesCol,
        "mp3_meta" -> graft.plans.MediaExprs.mp3MetaCol,
        "byte_stats" -> graft.plans.MediaExprs.byteStatsCol,
        "webp_meta" -> graft.plans.MediaExprs.webpMetaCol,
        "gif_meta" -> graft.plans.MediaExprs.gifMetaCol,
        "png_meta" -> graft.plans.MediaExprs.pngMetaCol,
        "avif_meta" -> graft.plans.MediaExprs.avifMetaCol,
        "ogg_meta" -> graft.plans.MediaExprs.oggMetaCol,
        "exif_meta" -> graft.plans.MediaExprs.exifMetaCol,
        "id3_text" -> graft.plans.MediaExprs.id3TextCol,
        "zip_entries" -> graft.plans.MediaExprs.zipEntriesCol,
        "warc_records" -> graft.plans.MediaExprs.warcRecordsCol,
        "tar_entries" -> graft.plans.MediaExprs.tarEntriesCol,
        "tar_entry_ranges" -> graft.plans.MediaExprs.tarEntryRangesCol,
        "gzip_member" -> graft.plans.MediaExprs.gzipMemberCol,
        "gzip_members" -> graft.plans.MediaExprs.gzipMembersCol,
        "warc_gz_records" -> graft.plans.MediaExprs.warcGzRecordsCol,
        "zstd_frames" -> graft.plans.MediaExprs.zstdFramesCol,
        "zstd_compress" -> graft.plans.MediaExprs.zstdCompressCol,
        "zstd_decompress" -> graft.plans.MediaExprs.zstdDecompressCol,
        "lz4_compress" -> graft.plans.MediaExprs.lz4CompressCol,
        "lz4_decompress" -> graft.plans.MediaExprs.lz4DecompressCol,
        "warc_zst_records" -> graft.plans.MediaExprs.warcZstRecordsCol,
        "warc_http_bodies" -> graft.plans.MediaExprs.warcHttpBodiesCol,
        "warc_zst_http_bodies" ->
          graft.plans.MediaExprs.warcZstHttpBodiesCol,
        "lz4_frames" -> graft.plans.MediaExprs.lz4FramesCol,
        "pdf_pages" -> graft.plans.MediaExprs.pdfPagesCol,
        "pdf_meta" -> graft.plans.MediaExprs.pdfMetaCol,
        "snappy_decode" -> graft.plans.MediaExprs.snappyCol,
        "kafka_batches" -> graft.plans.MediaExprs.kafkaBatchesCol,
        "kafka_records" -> graft.plans.MediaExprs.kafkaRecordsCol,
        "bz2_members" -> graft.plans.MediaExprs.bz2MembersCol,
        "wiki_pages" -> graft.plans.MediaExprs.wikiPagesCol,
        "xz_members" -> graft.plans.MediaExprs.xzMembersCol,
        "tar_xz_entries" -> graft.plans.MediaExprs.tarXzEntriesCol,
        "tf_records" -> graft.plans.MediaExprs.tfRecordsCol,
        "cbor_to_json" -> graft.plans.MediaExprs.cborToJsonCol,
        "tar_gz_entries" -> graft.plans.MediaExprs.tarGzEntriesCol,
        "tar_bz2_entries" -> graft.plans.MediaExprs.tarBz2EntriesCol,
        "arrow_rows" -> ((b: org.apache.spark.sql.Column) =>
          graft.plans.ArrowExprs.arrowRowsCol(b,
            Seq("id" -> "long", "name" -> "string"))),
        "proto_decode" -> ((b: org.apache.spark.sql.Column) =>
          graft.plans.ProtoExprs.protoDecodeCol(b,
            graft.operators.ProtoDecode.Spec(Seq(
              graft.operators.ProtoDecode.Field(1, "a",
                graft.operators.ProtoDecode.PVarint),
              graft.operators.ProtoDecode.Field(2, "s",
                graft.operators.ProtoDecode.PString))))),
        "proto_decode_confluent" -> ((b: org.apache.spark.sql.Column) =>
          graft.plans.ProtoExprs.protoDecodeCol(b,
            graft.operators.ProtoDecode.Spec(Seq(
              graft.operators.ProtoDecode.Field(1, "a",
                graft.operators.ProtoDecode.PVarint))),
            confluent = true)))
      for ((name, f) <- fns) {
        // junk blobs: structs NULL / arrays empty, audit gives a
        // verdict — the point is the collect not throwing under
        // CODEGEN_ONLY (and with a NON-nullable coalesced child, the
        // shape that broke MediaAudit in round 10)
        val got = blobs.select(f(col("blob")).as("v")).collect()
        assert(got.length == 4, name)
        val got2 = blobs.select(f(coalesce(col("blob"),
          lit(Array.emptyByteArray))).as("v")).collect()
        assert(got2.length == 4, s"$name (non-nullable child)")
      }
    }
  }

  test("media expressions codegen with a NON-nullable child (the " +
      "coalesced-blob production shape that broke MediaAudit)") {
    withCodegenOnly {
      // coalesce(blob, empty) is non-nullable → MediaAudit declares
      // nullable=false → ev.isNull is the literal "false"; the round-10
      // template emitted `false = …;` here and Janino refused
      val audited = blobs.select(Multimodal.mediaAuditCol(
        coalesce(col("blob"), lit(Array.emptyByteArray))).as("v"))
        .select(col("v.kind"), col("v.ok"), col("v.reason"))
        .collect()
      assert(audited.length == 4)
      assert(audited.forall(r => !r.getBoolean(1) &&
        r.getString(2) == "unknown_format"))
      // and the production caller end-to-end (extractDecodeAudit is
      // exactly this shape)
      assert(Multimodal.extractDecodeAudit(blobs, "doc_id")
        .collect().length == 4)
      // rasters under the same non-nullable child: they stay nullable
      // (undecodable → NULL) and must also compile
      val n = blobs.select(Multimodal.pngFeaturesCol(
        coalesce(col("blob"), lit(Array.emptyByteArray))).as("v"))
        .filter(col("v").isNull).count()
      assert(n == 4)
    }
  }

  test("audit results are identical between codegen and interpreted " +
      "eval on a real mixed corpus") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .limit(64).select(col("doc_id"),
        sha2(col("text"), 256).cast("binary").as("blob"))
    val expected = Multimodal.extractDecodeAudit(df, "doc_id")
      .collect().map(r => (r.doc_id, r.kind, r.ok, r.reason)).sortBy(_._1)
    val got = withCodegenOnly {
      Multimodal.extractDecodeAudit(df, "doc_id")
        .collect().map(r => (r.doc_id, r.kind, r.ok, r.reason)).sortBy(_._1)
    }
    assert(got.toSeq == expected.toSeq)
  }
}
