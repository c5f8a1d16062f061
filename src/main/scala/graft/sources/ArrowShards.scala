package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.operators.ArrowWrite
import graft.operators.ArrowWrite._

/** Arrow IPC shard export (round 14) — the sink side of the
  * [[graft.operators.ArrowIpc]] reader: one `.arrows` stream file per
  * non-empty partition, record batches of `batchRows` streamed
  * executor-side (a partition never materializes in memory), schema
  * derived from the DataFrame. pyarrow / polars / duckdb load the
  * shards directly; the repo reads them back through the
  * `graft_arrow_rows` expression. The 100 TB story: the shard count
  * follows the upstream partitioning, each file an independent
  * sequential stream — the standard layout for feeding GPU loaders. */
object ArrowShards {

  /** Spark type → writer type; integral types widen to int64 (Arrow
    * readers see the exact values; the repo's own reader outputs long
    * for every int width anyway). */
  def atypeOf(dt: DataType): AType = dt match {
    case LongType | IntegerType | ShortType | ByteType => ALong
    case DoubleType => ADouble
    case FloatType => AFloat
    case StringType => AString
    case BooleanType => ABool
    case ArrayType(et, _) => AList(atypeOf(et))
    case StructType(fields) =>
      AStruct(fields.toSeq.map(f => f.name -> atypeOf(f.dataType)))
    case MapType(kt, vt, _) => AMap(atypeOf(kt), atypeOf(vt))
    case other => throw new IllegalArgumentException(
      s"unsupported Arrow export type $other")
  }

  /** Spark cell → writer cell: Rows become field Seqs, maps become
    * key-SORTED entry pairs (map iteration order is engine-internal —
    * sorting makes the written stream deterministic), Seqs recurse. */
  private def cellOf(v: Any): Any = v match {
    case null => null
    case r: org.apache.spark.sql.Row =>
      r.toSeq.map(cellOf).toIndexedSeq
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, vv) => (cellOf(k), cellOf(vv)) }
        .sortBy(_._1.toString).toIndexedSeq
    case s: scala.collection.Seq[_] => s.map(cellOf).toIndexedSeq
    case other => other
  }

  /** @param codec    `"zstd"` compresses every body buffer (the spec's
    *                  per-buffer framing through the repo's own RFC
    *                  8878 encoder); null = uncompressed
    * @param dictCols  string columns to dictionary-encode (int32
    *                  indices + initial/delta DictionaryBatches) —
    *                  the low-cardinality-label export shape */
  def writeArrowShards(df: DataFrame, path: String,
      batchRows: Int = 8192, codec: String = null,
      dictCols: Set[String] = Set.empty): Unit = {
    require(batchRows > 0, "batchRows must be positive")
    val schema = df.schema
    val atypes: Seq[(String, AType)] =
      schema.fields.toSeq.map { f =>
        val t = atypeOf(f.dataType)
        if (!dictCols.contains(f.name)) f.name -> t
        else {
          require(t == AString,
            s"dictionary column ${f.name} must be a string column")
          f.name -> ADictString
        }
      }
    val nCols = schema.fields.length
    df.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      if (it.hasNext) {
        val part = org.apache.spark.TaskContext.get().partitionId()
        val p = new Path(path,
          f"part-$part%05d-${java.util.UUID.randomUUID()}.arrows")
        val fs = p.getFileSystem(
          new org.apache.hadoop.conf.Configuration())
        val out = fs.create(p, true)
        val w = new ArrowWrite.StreamWriter(out, atypes, codec)
        val bufs = Array.fill(nCols)(
          Vector.newBuilder[Any])
        var n = 0
        def flush(): Unit = if (n > 0) {
          w.addBatch(atypes.zipWithIndex.map { case ((name, t), i) =>
            ACol(name, t, bufs(i).result())
          })
          bufs.indices.foreach(i => bufs(i) = Vector.newBuilder[Any])
          n = 0
        }
        it.foreach { r =>
          var i = 0
          while (i < nCols) {
            bufs(i) += cellOf(r.get(i))
            i += 1
          }
          n += 1
          if (n >= batchRows) flush()
        }
        flush()
        w.close()
      }
    }
  }
}
