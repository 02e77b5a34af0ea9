package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL quantile sketch as STORABLE binary columns — the quantile member
  * of the mergeable-sketch family next to the HLL distinct sketches
  * ([[graft.ops.DistinctSketch]]) and the Misra–Gries [[HeavyHitters]].
  *
  * Why a sketch COLUMN instead of `percentile_approx`: the sketch is a
  * value you can store. A pipeline materializes per-(partition, day)
  * sketches once; any later question — any rollup level, any day range,
  * any quantile — is answered by unioning stored sketch bytes, never by
  * re-scanning raw rows. KLL union is lossless w.r.t. the parts'
  * guarantees and the normalized-rank error is ~1.65%/~0.87% at
  * k=200/400 (Karnin–Lang–Liberty 2016; the DataSketches
  * implementation), independent of input size.
  */
object KllSketch {
  def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Per-group KLL sketch of a double column → binary sketch image. */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"KLL k out of range: $k")

  override def prettyName: String = "graft_kll_sketch"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double column, got ${t.sql}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    // heapify returns a read-only view for some images; merging into a
    // fresh writable instance keeps the buffer updatable either way
    val sk = KllDoublesSketch.newHeapInstance(k)
    sk.merge(KllSketch.heapify(bytes))
    sk
  }

  override def withNewMutableAggBufferOffset(offset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
}

/** Union of stored KLL sketch images (binary column) → merged image —
  * the re-aggregation step over already-materialized sketches, the KLL
  * analogue of `hll_union_agg`.
  */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def prettyName: String = "graft_kll_merge"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got ${t.sql}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(KllSketch.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val sk = KllDoublesSketch.newHeapInstance(k)
    sk.merge(KllSketch.heapify(bytes))
    sk
  }

  override def withNewMutableAggBufferOffset(offset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
}

/** Quantile extraction from a stored KLL image: bytes → array<double>
  * of the requested normalized ranks (inclusive criterion). Runs on the
  * merged, group-bounded relation — never per raw row — so the
  * interpreted eval costs nothing measurable.
  */
case class KllQuantiles(child: Expression, ps: Seq[Double])
  extends UnaryExpression with CodegenFallback {

  require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
    s"quantile ranks must be in [0,1]: $ps")

  override def prettyName: String = "graft_kll_quantiles"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val sk = KllSketch.heapify(input.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null
    else new GenericArrayData(ps.map(sk.getQuantile).toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)
}
