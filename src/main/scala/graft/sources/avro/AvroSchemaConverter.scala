package graft.sources.avro

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.Schema.Type._
import org.apache.spark.sql.types._

/** Avro schema → Catalyst schema, plus reader-schema pruning.
  *
  * Mirrors the reference's data-model mapping (SURVEY §1.2/§1.5): nullable
  * unions `["null", T]` become nullable columns, records/arrays/maps become
  * StructType/ArrayType/MapType, enums/fixed become string/binary. The
  * reference's JS `Number` precision loss on large longs
  * (`/root/reference/README.md:26-27`) is deliberately NOT reproduced —
  * LongType is exact.
  */
object AvroSchemaConverter {

  final case class SchemaType(dataType: DataType, nullable: Boolean)

  def toSqlType(schema: Schema): SchemaType = schema.getType match {
    case BOOLEAN => SchemaType(BooleanType, nullable = false)
    case INT =>
      schema.getLogicalType match {
        case _: LogicalTypes.Date => SchemaType(DateType, nullable = false)
        case _ => SchemaType(IntegerType, nullable = false)
      }
    case LONG =>
      schema.getLogicalType match {
        case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
          SchemaType(TimestampType, nullable = false)
        case _: LogicalTypes.LocalTimestampMillis | _: LogicalTypes.LocalTimestampMicros =>
          SchemaType(TimestampNTZType, nullable = false)
        case _ => SchemaType(LongType, nullable = false)
      }
    case FLOAT => SchemaType(FloatType, nullable = false)
    case DOUBLE => SchemaType(DoubleType, nullable = false)
    case STRING | ENUM => SchemaType(StringType, nullable = false)
    case BYTES | FIXED =>
      schema.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          SchemaType(DecimalType(d.getPrecision, d.getScale), nullable = false)
        case _ => SchemaType(BinaryType, nullable = false)
      }
    case NULL => SchemaType(NullType, nullable = true)
    case RECORD =>
      val fields = schema.getFields.asScala.map { f =>
        val st = toSqlType(f.schema())
        StructField(f.name(), st.dataType, st.nullable)
      }
      SchemaType(StructType(fields.toArray), nullable = false)
    case ARRAY =>
      val st = toSqlType(schema.getElementType)
      SchemaType(ArrayType(st.dataType, containsNull = st.nullable), nullable = false)
    case MAP =>
      val st = toSqlType(schema.getValueType)
      SchemaType(MapType(StringType, st.dataType, valueContainsNull = st.nullable),
        nullable = false)
    case UNION => unionToSqlType(schema)
    case other => throw new UnsupportedOperationException(s"Avro type $other")
  }

  private def unionToSqlType(schema: Schema): SchemaType = {
    val branches = schema.getTypes.asScala.toSeq
    val nonNull = branches.filter(_.getType != NULL)
    val nullable = nonNull.size < branches.size
    nonNull match {
      case Seq(only) =>
        toSqlType(only).copy(nullable = nullable)
      case many if many.map(_.getType).toSet == Set(INT, LONG) =>
        SchemaType(LongType, nullable)
      case many if many.map(_.getType).toSet == Set(FLOAT, DOUBLE) =>
        SchemaType(DoubleType, nullable)
      case many =>
        // Genuinely mixed union (e.g. ["string","long","null"]): decode as
        // a member struct `struct<member0: T0, member1: T1, …>` with
        // exactly one non-null member per value — the same mapping
        // spark-avro uses, covering the full avsc union lattice the
        // reference accepts (`/root/reference/src/index.js:335-352`
        // delegates to avsc). Every member is nullable by construction.
        val fields = many.zipWithIndex.map { case (b, i) =>
          StructField(s"member$i", toSqlType(b).dataType, nullable = true)
        }
        SchemaType(StructType(fields.toArray), nullable)
    }
  }

  def toStructType(schema: Schema): StructType =
    toSqlType(schema).dataType match {
      case s: StructType => s
      case other =>
        throw new IllegalArgumentException(s"top-level Avro schema must be a record, got $other")
    }

  /** Reader-schema projection: restrict a writer record schema to `names`
    * (in that order). This is the reference's `filteredSchema`
    * (`/root/reference/src/index.js:39-51`) done the Avro-native way — the
    * decoder *skips* dropped fields, it doesn't decode-then-drop.
    */
  def prune(writer: Schema, names: Seq[String]): Schema = {
    require(writer.getType == RECORD, s"cannot prune non-record schema ${writer.getType}")
    val fields = names.flatMap(n => Option(writer.getField(n)))
      .map(f => new Schema.Field(f, f.schema()))
    val rec = Schema.createRecord(
      writer.getName, writer.getDoc, writer.getNamespace, writer.isError)
    rec.setFields(fields.asJava)
    rec
  }
}
