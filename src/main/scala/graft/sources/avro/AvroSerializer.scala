package graft.sources.avro

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst schema/rows → Avro schema/records, the write-side mirror of
  * [[AvroSchemaConverter]]/[[AvroDeserializer]]. Nullable columns become
  * `["null", T]` unions; structs/arrays/maps recurse; converters are
  * built once per writer, not per row.
  */
object AvroSerializer {

  /** StructType → Avro record schema. Nested record names derive from the
    * field path so they stay unique within the file schema.
    */
  def toAvroSchema(st: StructType, name: String = "topLevelRecord",
      namespace: String = "graft"): Schema = {
    val rec = Schema.createRecord(name, null, namespace, false)
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, fieldSchema(f.dataType, f.nullable, s"${name}_${f.name}"),
        null, null)
    }
    rec.setFields(fields.toSeq.asJava)
    rec
  }

  private def fieldSchema(dt: DataType, nullable: Boolean, path: String): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType =>
        org.apache.avro.LogicalTypes.date()
          .addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        org.apache.avro.LogicalTypes.timestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType =>
        // session-independent wall-clock time: Avro's local-timestamp
        // logical type (Avro 1.10+), micros since epoch-as-local
        org.apache.avro.LogicalTypes.localTimestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
      case d: DecimalType =>
        org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      case s: StructType => toAvroSchema(s, path)
      case ArrayType(et, containsNull) =>
        Schema.createArray(fieldSchema(et, containsNull, s"${path}_item"))
      case MapType(StringType, vt, valueContainsNull) =>
        Schema.createMap(fieldSchema(vt, valueContainsNull, s"${path}_value"))
      case other =>
        throw new UnsupportedOperationException(s"avro write: unsupported type $other")
    }
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
  }

  /** Converter for one Catalyst value (as stored in InternalRow/ArrayData)
    * into the Avro runtime value for `schema`.
    */
  private def valueConverter(dt: DataType, schema: Schema): Any => Any = {
    val target = if (schema.getType == Schema.Type.UNION)
      schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else schema
    dt match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType |
           DateType | TimestampType | TimestampNTZType => identity
      case ShortType => v => v.asInstanceOf[Short].toInt
      case ByteType => v => v.asInstanceOf[Byte].toInt
      case StringType => v => v.asInstanceOf[UTF8String].toString
      case BinaryType => v => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case _: DecimalType =>
        val conv = new org.apache.avro.Conversions.DecimalConversion
        v => conv.toBytes(
          v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal,
          target, target.getLogicalType)
      case st: StructType =>
        val conv = rowConverter(st, target)
        v => conv(v.asInstanceOf[InternalRow])
      case ArrayType(et, _) =>
        val elem = valueConverter(et, target.getElementType)
        v => {
          val arr = v.asInstanceOf[ArrayData]
          val out = new java.util.ArrayList[Any](arr.numElements())
          var i = 0
          while (i < arr.numElements()) {
            out.add(if (arr.isNullAt(i)) null else elem(arr.get(i, et)))
            i += 1
          }
          out
        }
      case MapType(StringType, vt, _) =>
        val value = valueConverter(vt, target.getValueType)
        v => {
          val m = v.asInstanceOf[MapData]
          val keys = m.keyArray()
          val vals = m.valueArray()
          val out = new java.util.HashMap[String, Any](m.numElements())
          var i = 0
          while (i < m.numElements()) {
            out.put(keys.getUTF8String(i).toString,
              if (vals.isNullAt(i)) null else value(vals.get(i, vt)))
            i += 1
          }
          out
        }
      case other =>
        throw new UnsupportedOperationException(s"avro write: unsupported type $other")
    }
  }

  /** InternalRow → GenericRecord for a record schema. */
  def rowConverter(st: StructType, schema: Schema): InternalRow => GenericRecord = {
    val fields = st.fields.zipWithIndex.map { case (f, i) =>
      (i, f.dataType, valueConverter(f.dataType, schema.getFields.get(i).schema()))
    }
    row => {
      val rec = new GenericData.Record(schema)
      fields.foreach { case (i, dt, conv) =>
        rec.put(i, if (row.isNullAt(i)) null else conv(row.get(i, dt)))
      }
      rec
    }
  }
}
