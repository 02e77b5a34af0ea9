package graft.sources.avro

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.Schema.Type._
import org.apache.avro.generic.{GenericEnumSymbol, GenericFixed, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro `GenericRecord` → Catalyst `InternalRow`, built once per split as a
  * tree of per-field closures (no per-row reflection, no per-row schema
  * walks). The decode itself replaces the reference's avsc `'data'`-event
  * row loop (`/root/reference/src/index.js:363-370`).
  */
object AvroDeserializer {

  /** Converter for a top-level record. Required fields absent from the
    * (possibly pruned/overridden) Avro schema yield null columns.
    */
  def rowConverter(avro: Schema, catalyst: StructType): GenericRecord => InternalRow = {
    require(avro.getType == RECORD, s"expected record, got ${avro.getType}")
    val fieldConverters: Array[GenericRecord => Any] =
      catalyst.fields.map { sf =>
        Option(avro.getField(sf.name)) match {
          case None => (_: GenericRecord) => null
          case Some(af) =>
            val pos = af.pos()
            val conv = converter(af.schema(), sf.dataType)
            (r: GenericRecord) => conv(r.get(pos))
        }
      }
    (rec: GenericRecord) => {
      val n = fieldConverters.length
      val out = new Array[Any](n)
      var i = 0
      while (i < n) { out(i) = fieldConverters(i)(rec); i += 1 }
      new GenericInternalRow(out)
    }
  }

  /** Converter for one Avro value of schema `s` into Catalyst type `dt`. */
  def converter(s: Schema, dt: DataType): Any => Any = (s.getType, dt) match {
    case (UNION, _) =>
      val nonNull = s.getTypes.asScala.filter(_.getType != NULL).toSeq
      nonNull match {
        case Seq(only) =>
          val inner = converter(only, dt)
          v => if (v == null) null else inner(v)
        case many if many.map(_.getType).toSet == Set(INT, LONG) =>
          { case null => null; case n: Number => n.longValue() }
        case many if many.map(_.getType).toSet == Set(FLOAT, DOUBLE) =>
          { case null => null; case n: Number => n.doubleValue() }
        case many =>
          // Mixed union decoded as a member struct (see
          // AvroSchemaConverter.unionToSqlType): resolve the runtime value
          // to its union branch, convert with that branch's converter, and
          // emit a row with only that member set.
          val st = dt.asInstanceOf[StructType]
          val branchConvs: Array[Any => Any] = many.zipWithIndex.map {
            case (b, i) => converter(b, st.fields(i).dataType)
          }.toArray
          // resolveUnion needs the union WITHOUT the null branch removed —
          // build one of just the non-null members so indexes line up.
          val nonNullUnion = Schema.createUnion(many.asJava)
          val generic = org.apache.avro.generic.GenericData.get()
          v => if (v == null) null
          else {
            val i = generic.resolveUnion(nonNullUnion, v)
            val out = new Array[Any](branchConvs.length)
            out(i) = branchConvs(i)(v)
            new GenericInternalRow(out)
          }
      }
    case (NULL, _) => _ => null
    case (BOOLEAN, BooleanType) => identity
    case (INT, IntegerType) => identity
    case (INT, DateType) => identity // logical date = days since epoch, same as Catalyst
    case (LONG, LongType) => identity
    case (LONG, TimestampType) =>
      s.getLogicalType match {
        case _: LogicalTypes.TimestampMicros => identity
        case _ => v => v.asInstanceOf[Long] * 1000L // millis → micros
      }
    case (LONG, TimestampNTZType) =>
      s.getLogicalType match {
        case _: LogicalTypes.LocalTimestampMicros => identity
        case _ => v => v.asInstanceOf[Long] * 1000L // millis → micros
      }
    case (FLOAT, FloatType) => identity
    case (DOUBLE, DoubleType) => identity
    case (STRING | ENUM, StringType) =>
      {
        case u: Utf8 => UTF8String.fromBytes(u.getBytes, 0, u.getByteLength)
        case e: GenericEnumSymbol[_] => UTF8String.fromString(e.toString)
        case other => UTF8String.fromString(other.toString)
      }
    case (BYTES, BinaryType) =>
      v => {
        val bb = v.asInstanceOf[ByteBuffer]
        val bytes = new Array[Byte](bb.remaining())
        bb.duplicate().get(bytes)
        bytes
      }
    case (FIXED, BinaryType) => v => v.asInstanceOf[GenericFixed].bytes().clone()
    case (BYTES | FIXED, d: DecimalType) =>
      val conv = new org.apache.avro.Conversions.DecimalConversion
      v => {
        val lt = s.getLogicalType.asInstanceOf[LogicalTypes.Decimal]
        val bd = v match {
          case bb: ByteBuffer => conv.fromBytes(bb, s, lt)
          case f: GenericFixed => conv.fromFixed(f, s, lt)
        }
        org.apache.spark.sql.types.Decimal(bd, d.precision, d.scale)
      }
    case (RECORD, st: StructType) =>
      val conv = rowConverter(s, st)
      v => conv(v.asInstanceOf[GenericRecord])
    case (ARRAY, ArrayType(elemType, _)) =>
      val elemConv = converter(s.getElementType, elemType)
      v => {
        val in = v.asInstanceOf[java.util.Collection[Any]]
        val out = new Array[Any](in.size())
        val it = in.iterator()
        var i = 0
        while (it.hasNext) { out(i) = elemConv(it.next()); i += 1 }
        new GenericArrayData(out)
      }
    case (MAP, MapType(StringType, valueType, _)) =>
      val valConv = converter(s.getValueType, valueType)
      v => {
        val in = v.asInstanceOf[java.util.Map[Any, Any]]
        val keys = new Array[Any](in.size())
        val vals = new Array[Any](in.size())
        val it = in.entrySet().iterator()
        var i = 0
        while (it.hasNext) {
          val e = it.next()
          keys(i) = UTF8String.fromString(e.getKey.toString)
          vals(i) = valConv(e.getValue)
          i += 1
        }
        ArrayBasedMapData(keys, vals)
      }
    case (at, ct) =>
      throw new UnsupportedOperationException(s"cannot convert Avro $at to Catalyst $ct")
  }
}
