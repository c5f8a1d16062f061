package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import graft.operators.{ProtoDecode, TfRecord}

/** TFRecord shard export (round 14) — the sink side of the
  * `source_tfrecord*` ingest path: one `.tfrecord` file per non-empty
  * partition, one CRC-framed `tf.train.Example` per row (text as a
  * bytes feature, doc_id/n_chars as an int64-list feature), streamed
  * record-by-record executor-side. TensorFlow's `TFRecordDataset`
  * reads the shards directly; the repo reads them back through its
  * own golden-pinned framing walk + nested proto decode. */
object TfRecordShards {

  /** One framed Example for (id, text, nChars). */
  def exampleRecord(id: Long, text: String, nChars: Long)
      : Array[Byte] =
    TfRecord.write(Seq(ProtoDecode.Writer.tfExample(
      ("text", text), ("ids", Seq(id, nChars)),
      ("f", Seq.empty[Float]))))

  def writeExampleShards(df: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text",
      nCharsCol: String = "n_chars"): Unit = {
    val rows = df.select(df(idCol).cast("long"),
      df(textCol).cast("string"), df(nCharsCol).cast("long"))
    rows.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      if (it.hasNext) {
        val part = org.apache.spark.TaskContext.get().partitionId()
        val p = new Path(path,
          f"part-$part%05d-${java.util.UUID.randomUUID()}.tfrecord")
        val fs = p.getFileSystem(
          new org.apache.hadoop.conf.Configuration())
        val out = fs.create(p, true)
        try it.foreach { r =>
          val rec = exampleRecord(r.getLong(0),
            Option(r.getString(1)).getOrElse(""), r.getLong(2))
          out.write(rec)
        } finally out.close()
      }
    }
  }
}
