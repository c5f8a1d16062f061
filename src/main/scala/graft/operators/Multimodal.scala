package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (builder mandate).
  *
  * Media payloads are opaque `binary` columns + typed metadata, processed
  * by batch-shaped per-partition extractors. The DECODE step itself is a
  * deterministic STUB (this container ships no image/audio codecs — see the
  * builder prompt); everything Spark-side is real: schema, null handling,
  * partition-parallel batch iteration, feature vector shape, and the
  * downstream joins/aggregations. Swapping [[FeatureExtractor.decodeStub]]
  * for a JNI/codec call changes no plan shape.
  */
object Multimodal {

  /** Typed metadata carried next to every blob. */
  val MetaCols: Seq[String] = Seq("n_bytes", "content_sha", "kind")

  /** Attach an opaque blob + metadata view of a text column (the testdata
    * has no true media column; utf-8 bytes stand in as the payload while
    * keeping every byte-level operation real). Media-kind sniffing uses
    * magic-byte dispatch exactly as a real decoder front-end would. */
  def withBlob(df: DataFrame, textCol: String): DataFrame =
    withBlobMeta(df.withColumn("blob", encode(col(textCol), "utf-8")))

  /** Attach metadata to an existing binary `blob` column (real media
    * payloads enter here). */
  def withBlobMeta(df: DataFrame): DataFrame =
    df.withColumn("n_bytes", octet_length(col("blob")))
      .withColumn("content_sha", sha2(col("blob"), 256))
      .withColumn("kind", sniffKind(col("blob")))

  /** Magic-byte media-kind dispatch, exactly as a decoder front-end would
    * route payloads to codecs (PNG signature starts 0x89 P N G; JPEG is
    * 0xFFD8FF; RIFF containers carry WAV/AVI/WebP). */
  def sniffKind(blob: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(substring(blob, 1, 4) ===
      lit(Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47)), "png")
      .when(substring(blob, 1, 3) ===
        lit(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte)), "jpeg")
      .when(substring(blob, 1, 4) === lit("RIFF".getBytes), "riff")
      .otherwise("bin")

  final case class BlobRow(doc_id: Long, blob: Array[Byte])
  final case class FeatureRow(doc_id: Long, n_bytes: Int, mean_byte: Double,
      features: Array[Float])

  object FeatureExtractor {
    val FeatureDim = 8

    /** STUB decode/feature-extract for one payload. Deterministic byte
      * statistics stand in for a real `decode → resize → embed` kernel;
      * the (batch-in, batch-out) shape is what a codec integration keeps. */
    def decodeStub(bytes: Array[Byte]): (Double, Array[Float]) = {
      if (bytes.isEmpty) return (0.0, new Array[Float](FeatureDim))
      var sum = 0L
      val hist = new Array[Long](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b
        hist(b % FeatureDim) += 1
        i += 1
      }
      val feats = new Array[Float](FeatureDim)
      i = 0
      while (i < FeatureDim) {
        feats(i) = hist(i).toFloat / bytes.length; i += 1
      }
      (sum.toDouble / bytes.length, feats)
    }
  }

  final case class ChunkRow(doc_id: Long, chunk_index: Int, offset: Int,
      chunk: Array[Byte])

  /** Frame/segment sampling over an opaque media blob: deterministically
    * sample `nChunks` fixed-size chunks at evenly spaced offsets (the
    * video-frame-sampling access pattern — decode only the sampled
    * offsets, never the whole payload). One output row per sampled chunk,
    * exploded row-locally: no shuffle, columnar-friendly downstream. */
  def sampleChunks(df: DataFrame, idCol: String, blobCol: String = "blob",
      chunkSize: Int = 64, nChunks: Int = 4): Dataset[ChunkRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(blobCol).as("blob"))
      .as[BlobRow]
      .flatMap { r =>
        val bytes = if (r.blob == null) Array.emptyByteArray else r.blob
        if (bytes.isEmpty) Iterator.empty
        else {
          val n = math.min(nChunks, math.max(1, bytes.length / chunkSize))
          val stride = math.max(1, (bytes.length - chunkSize) / math.max(1, n - 1))
          (0 until n).iterator.map { i =>
            val off = math.min(i * stride, math.max(0, bytes.length - 1))
            val end = math.min(off + chunkSize, bytes.length)
            ChunkRow(r.doc_id, i, off,
              java.util.Arrays.copyOfRange(bytes, off, end))
          }
        }
      }
  }

  /** Per-partition batch feature extraction: one extractor instance per
    * partition (where a codec would allocate its native context once),
    * streaming iterator-to-iterator — no partition materialization. */
  def extractFeatures(df: DataFrame, idCol: String,
      blobCol: String = "blob"): Dataset[FeatureRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(blobCol).as("blob"))
      .as[BlobRow]
      .mapPartitions { rows =>
        // per-partition init happens here (native codec handle, model, …)
        rows.map { r =>
          val bytes = if (r.blob == null) Array.emptyByteArray else r.blob
          val (mean, feats) = FeatureExtractor.decodeStub(bytes)
          FeatureRow(r.doc_id, bytes.length, mean, feats)
        }
      }
  }
}
