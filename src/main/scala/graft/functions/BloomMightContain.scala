package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter, shipped to the
  * executors as part of the expression (the serialized filter rides the
  * task closure exactly once per task, the deserialized bitset is cached
  * per instance).
  *
  * This is the probe half of a semi-join reduction
  * ([[graft.ops.BloomJoin]]): when the build side of a join is too big to
  * broadcast as an exact key set but its KEYS fit a few-MB bitset, a
  * bloom prefilter on the probe side cuts the probe shuffle to
  * (matching ∪ false-positive) rows before the real join runs. False
  * positives only cost shuffled bytes — the join itself removes them, so
  * the composed result is exactly the plain join (which is what the
  * oracle asserts).
  *
  * Uses Spark's public `org.apache.spark.util.sketch.BloomFilter`
  * (the same sketch `DataFrameStatFunctions.bloomFilter` builds), so
  * build and probe agree on the hash family. Long keys only — the `put`
  * side inserts longs, and a mixed-type probe would silently hash
  * differently instead of failing.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with SketchCodegen {

  override def prettyName: String = "graft_bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral key, got ${t.sql}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any = {
    val key = input match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case s: java.lang.Short => s.longValue()
      case b: java.lang.Byte => b.longValue()
    }
    java.lang.Boolean.valueOf(bloom.mightContainLong(key))
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
