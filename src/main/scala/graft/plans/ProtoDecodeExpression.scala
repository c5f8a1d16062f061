package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.ProtoDecode
import graft.operators.ProtoDecode.{PBytes, PDouble, PFixed32, PFixed64, PFloat, PMessage, PPackedFloat, PPackedVarint, PRepeatedMessage, PRepeatedString, PSint, PString, PVarint, Spec}

/** `proto_decode(blob)` → a typed struct per the caller's field spec
  * (the [[AvroDecodeExpression]] discipline for the other Kafka value
  * format): schema-driven protobuf decode as a native expression —
  * whole-stage codegen keeps the surrounding operator fused and pays
  * one virtual call per row via `addReferenceObj`. Null input → null
  * struct (tombstone passthrough); wire violations → null struct
  * (PERMISSIVE — a corrupt record must not kill the batch). With
  * `confluent = true` the Confluent envelope (magic 0 + schema id +
  * message indexes) is stripped first and surfaced as leading
  * `schema_id`/`msg_index` columns. */
case class ProtoDecodeStruct(child: Expression, spec: Spec,
    confluent: Boolean) extends UnaryExpression {

  private def fieldType(t: ProtoDecode.PType): DataType = t match {
    case PVarint | PSint | PFixed64 | PFixed32 => LongType
    case PDouble | PFloat => DoubleType
    case PString => StringType
    case PBytes => BinaryType
    case PPackedVarint => ArrayType(LongType, containsNull = false)
    case PPackedFloat => ArrayType(DoubleType, containsNull = false)
    case PRepeatedString => ArrayType(StringType, containsNull = false)
    case PMessage(sub) => structOf(sub)
    case PRepeatedMessage(sub) =>
      ArrayType(structOf(sub), containsNull = false)
  }

  private def structOf(s: Spec): StructType = StructType(
    s.fields.map(f =>
      StructField(f.name, fieldType(f.ptype), nullable = true)))

  override def dataType: DataType = StructType(
    (if (confluent)
      Seq(StructField("schema_id", LongType, nullable = false),
        StructField("msg_index", LongType, nullable = false))
    else Nil) ++
      spec.fields.map(f =>
        StructField(f.name, fieldType(f.ptype), nullable = true)))

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val (head, off) =
      if (confluent) ProtoDecode.confluentEnvelope(b) match {
        case Some((id, idxs, o)) =>
          (Seq[Any](id.toLong, idxs.head.toLong), o)
        case None => return null
      }
      else (Nil, 0)
    ProtoDecode.decode(b, off, b.length, spec) match {
      case Some(vals) =>
        InternalRow.fromSeq(head ++
          vals.toSeq.zip(spec.fields).map { case (v, f) =>
            convert(v, f.ptype)
          })
      case None => null
    }
  }

  /** Type-directed JVM→Catalyst conversion (recursive for nested
    * messages — the decode layer stays Spark-free). */
  private def convert(v: Any, t: ProtoDecode.PType): Any =
    if (v == null) null
    else t match {
      case PString => UTF8String.fromString(v.asInstanceOf[String])
      case PPackedVarint =>
        new GenericArrayData(v.asInstanceOf[Seq[Long]].toArray[Any])
      case PPackedFloat =>
        new GenericArrayData(v.asInstanceOf[Seq[Double]].toArray[Any])
      case PRepeatedString =>
        new GenericArrayData(v.asInstanceOf[Seq[String]]
          .map(UTF8String.fromString).toArray[Any])
      case PMessage(sub) => rowOf(v.asInstanceOf[Array[Any]], sub)
      case PRepeatedMessage(sub) =>
        new GenericArrayData(v.asInstanceOf[Seq[Array[Any]]]
          .map(rowOf(_, sub)).toArray[Any])
      case _ => v
    }

  private def rowOf(vals: Array[Any], s: Spec): InternalRow =
    InternalRow.fromSeq(vals.toSeq.zip(s.fields).map { case (v, f) =>
      convert(v, f.ptype)
    })

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("protoDecode", this,
      classOf[ProtoDecodeStruct].getName)
    // nullable is hardcoded true (a corrupt record yields a null
    // struct), so ev.isNull is always an lvalue here — the
    // MediaDecodeExpression discipline
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
        $self.nullSafeEval($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ProtoDecodeStruct = copy(child = newChild)
  override def prettyName: String = "graft_proto_decode"
}

object ProtoExprs {
  def protoDecodeCol(blob: Column, spec: Spec,
      confluent: Boolean = false): Column =
    ColumnBridge.column(ProtoDecodeStruct(
      ColumnBridge.expression(blob), spec, confluent))
}
