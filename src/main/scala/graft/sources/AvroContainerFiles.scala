package graft.sources

import scala.collection.JavaConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro OBJECT CONTAINER FILES (`.avro` — magic `Obj1`, writer schema
  * in the header, sync-marked blocks) as a batch source AND sink — the
  * at-rest sibling of the engine's Confluent-framed wire format
  * (`avro/WireFormat.scala` decodes the per-message framing; this reads
  * the file format the same ecosystems archive to). No connector jar is
  * shipped in this environment, so the reader/writer sit directly on
  * avro-core (already a compile-time dependency of the decode kernel).
  *
  * Type surface (fail-loud, documented): Spark
  * long/int/double/float/boolean/string/binary columns map to the
  * matching Avro primitives; nullable columns become `union(null, T)`.
  * Anything richer (nested structs, arrays, decimals) is rejected at
  * write/read time — the engine's rich-Avro path is the wire-format
  * decoder with its full codec ([[graft.avro.AvroJsonCodec]]); this
  * source is the flat-relation archive format.
  *
  * Scale shape: the WRITER emits one container file per partition
  * (executor-side, streaming row-by-row through the Avro encoder — no
  * partition materialization); the READER parallelizes per file via
  * the built-in `binaryFile` source and decodes blocks inside
  * `flatMap` (row-local; a production reader would additionally split
  * big files on sync markers — per-file parallelism is the honest
  * first cut and matches how these archives are laid out: many
  * partition-sized files). */
object AvroContainerFiles {

  /** Spark schema → Avro record schema (primitive surface only). */
  def avroSchemaFor(schema: StructType, name: String = "row"): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"AvroContainerFiles supports flat primitive columns only; " +
            s"column '${f.name}' is $other")
      }
      val s = if (f.nullable)
        Schema.createUnion(java.util.Arrays.asList(
          Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, s, null, null)
    }
    Schema.createRecord(name, null, "graft", false,
      java.util.Arrays.asList(fields: _*))
  }

  /** Avro record schema → Spark schema (the inverse surface). */
  def sparkSchemaFor(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"expected a record schema, got ${schema.getType}")
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (t, nullable) = f.schema().getType match {
        case Schema.Type.UNION =>
          val ts = f.schema().getTypes.asScala
          require(ts.size == 2 &&
            ts.exists(_.getType == Schema.Type.NULL),
            s"field '${f.name}': only union(null, T) is supported")
          (ts.find(_.getType != Schema.Type.NULL).get.getType, true)
        case other => (other, false)
      }
      val dt = t match {
        case Schema.Type.LONG => LongType
        case Schema.Type.INT => IntegerType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.FLOAT => FloatType
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.STRING => StringType
        case Schema.Type.BYTES => BinaryType
        case other => throw new IllegalArgumentException(
          s"field '${f.name}': unsupported Avro type $other")
      }
      StructField(f.name, dt, nullable)
    })
  }

  /** Write `df` as Avro container files under `path`, one file per
    * partition (empty partitions emit nothing). */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val avroJson = avroSchemaFor(schema).toString
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val avroSchema = new Schema.Parser().parse(avroJson)
        val part = TaskContext.get().partitionId()
        val p = new Path(path,
          f"part-$part%05d-${java.util.UUID.randomUUID()}.avro")
        // executor-side default Hadoop conf (Configuration is not
        // serializable; the default resolves local/HDFS schemes — the
        // same assumption binaryFile makes on the read side)
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = fs.create(p, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avroSchema))
        w.create(avroSchema, out)
        try {
          rows.foreach { row =>
            val rec = new GenericData.Record(avroSchema)
            var i = 0
            while (i < schema.length) {
              val v = row.get(i) match {
                case null => null
                case s: String => s
                case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
                case x => x
              }
              rec.put(i, v)
              i += 1
            }
            w.append(rec)
          }
        } finally w.close() // closes the stream, flushes the last block
      }
    }
  }

  /** Read every `*.avro` container file under `path` back into a
    * DataFrame. The writer schema comes from the FIRST file's header
    * (one small driver-side header read); every file's own header
    * schema drives its decode (Avro handles block codecs and sync
    * markers), and a file whose columns disagree fails loud. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val base = new Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(base).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    require(files.nonEmpty, s"no .avro container files under $path")
    val headerSchema = {
      val in = fs.open(files.head)
      try {
        val ds = new DataFileStream[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        val s = ds.getSchema
        ds.close()
        s
      } finally in.close()
    }
    val schema = sparkSchemaFor(headerSchema)
    val n = schema.length
    val binary = spark.read.format("binaryFile")
      .load(s"$path/*.avro")
      .select("content")
    val rows = binary.rdd.flatMap { r =>
      val bytes = r.getAs[Array[Byte]]("content")
      val ds = new DataFileStream[GenericRecord](
        new java.io.ByteArrayInputStream(bytes),
        new GenericDatumReader[GenericRecord]())
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      try {
        while (ds.hasNext) {
          val rec = ds.next()
          val vals = new Array[Any](n)
          var i = 0
          while (i < n) {
            vals(i) = rec.get(i) match {
              case null => null
              case u: org.apache.avro.util.Utf8 => u.toString
              case s: String => s
              case bb: java.nio.ByteBuffer =>
                val a = new Array[Byte](bb.remaining()); bb.get(a); a
              case x => x
            }
            i += 1
          }
          out += Row.fromSeq(vals.toSeq)
        }
      } finally ds.close()
      out
    }
    spark.createDataFrame(rows, schema)
  }
}
