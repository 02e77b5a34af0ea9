package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union, UpdateSketch}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches (Apache DataSketches) as STORABLE mergeable binary
  * columns — the SET-OPERATION member of the sketch family. HLL answers
  * "how many distinct"; theta additionally answers INTERSECTION and
  * DIFFERENCE over stored sketches ("users who did A and B", "users who
  * did A but never B") without re-scanning raw rows — HLL fundamentally
  * cannot intersect (inclusion-exclusion over unions explodes the
  * error; theta intersects the retained hash sets directly).
  *
  * A theta sketch is a bottom-k set of 64-bit item hashes (k = 2^lgK
  * nominal entries), so union/intersection/a-not-b are plain set ops on
  * the retained hashes with a tracked sampling threshold θ. Below k
  * distinct items the sketch is EXACT; above, relative error is
  * ~1/sqrt(k) (~1.6% at lgK=12). Hashing is seeded murmur with the
  * library's fixed default seed and retention is order-independent
  * (bottom-k of a fixed permutation — the same principle as
  * [[BottomK]]), so estimates are deterministic for fixed data: the
  * oracle can hash gate booleans built from them.
  *
  * Buffer discipline: updates accumulate in a heap `UpdateSketch`,
  * merges fold compacted images through a `Union`; both stay bounded by
  * k entries per partial aggregate regardless of input size.
  */
object ThetaSketch {
  /** Mutable aggregation buffer: an update sketch for raw items plus a
    * union for incoming partials, folded together at read points.
    */
  final class Buffer(lgK: Int) {
    private val union: Union =
      SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    private var scratch: UpdateSketch = _

    private def ensure(): UpdateSketch = {
      if (scratch == null) {
        scratch = UpdateSketch.builder().setLogNominalEntries(lgK).build()
      }
      scratch
    }
    def updateLong(v: Long): Unit = ensure().update(v)
    def updateString(v: String): Unit = ensure().update(v)
    def updateDouble(v: Double): Unit = ensure().update(v)
    private def flush(): Unit = if (scratch != null) {
      union.union(scratch.compact()); scratch = null
    }
    def compact(): CompactSketch = { flush(); union.getResult }
    def mergeFrom(other: Buffer): Unit = union.union(other.compact())
    def mergeImage(bytes: Array[Byte]): Unit =
      union.union(Sketches.wrapSketch(Memory.wrap(bytes)))
  }

  def heapify(bytes: Array[Byte]): CompactSketch =
    Sketches.wrapSketch(Memory.wrap(bytes)).compact()
}

private[functions] trait ThetaAggBase
  extends TypedImperativeAggregate[ThetaSketch.Buffer] {
  def lgK: Int
  require(lgK >= 4 && lgK <= 26, s"theta lgK out of range: $lgK")

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): ThetaSketch.Buffer =
    new ThetaSketch.Buffer(lgK)
  override def merge(buf: ThetaSketch.Buffer,
      other: ThetaSketch.Buffer): ThetaSketch.Buffer = {
    buf.mergeFrom(other); buf
  }
  override def eval(buf: ThetaSketch.Buffer): Any = buf.compact().toByteArray
  override def serialize(buf: ThetaSketch.Buffer): Array[Byte] =
    buf.compact().toByteArray
  override def deserialize(bytes: Array[Byte]): ThetaSketch.Buffer = {
    val buf = new ThetaSketch.Buffer(lgK)
    buf.mergeImage(bytes)
    buf
  }
}

/** Per-group theta sketch of a long/string/double column → binary image. */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def prettyName: String = "graft_theta_sketch"
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType | DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires long/int/string/double, got ${t.sql}")
  }

  override def update(buf: ThetaSketch.Buffer,
      input: InternalRow): ThetaSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buf.updateLong(v.asInstanceOf[Long])
      case IntegerType => buf.updateLong(v.asInstanceOf[Int].toLong)
      case StringType => buf.updateString(v.asInstanceOf[UTF8String].toString)
      case DoubleType => buf.updateDouble(v.asInstanceOf[Double])
      case _ => ()
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** Union of stored theta images — re-aggregate per-(group, part)
  * sketches to any coarser rollup from bytes alone.
  */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def prettyName: String = "graft_theta_union"
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary sketch images, got ${t.sql}")
  }

  override def update(buf: ThetaSketch.Buffer,
      input: InternalRow): ThetaSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.mergeImage(v.asInstanceOf[Array[Byte]])
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = newChildren.head)
}

/** Distinct-count estimate from a stored theta image. */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_theta_estimate"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch image, got ${t.sql}")
  }

  override protected def nullSafeEval(bytes: Any): Any =
    ThetaSketch.heapify(bytes.asInstanceOf[Array[Byte]]).getEstimate

  override protected def withNewChildInternal(
      newChild: Expression): ThetaEstimate = copy(child = newChild)
}

/** Set-operation estimate over two stored theta images: `intersect` ∩ or
  * `anotb` (A \ B). Probe-scale only (runs on per-group sketch rows, a
  * handful of KB each), hence `CodegenFallback` — same posture as
  * [[KllQuantiles]] and [[CountMinEstimate]].
  */
case class ThetaSetEstimate(left: Expression, right: Expression, op: String)
  extends BinaryExpression with CodegenFallback {

  require(op == "intersect" || op == "anotb", s"unknown theta op: $op")

  override def prettyName: String = s"graft_theta_$op"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two binary sketch images, got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = ThetaSketch.heapify(a.asInstanceOf[Array[Byte]])
    val sb = ThetaSketch.heapify(b.asInstanceOf[Array[Byte]])
    if (op == "intersect") {
      val ix = SetOperation.builder().buildIntersection()
      ix.intersect(sa); ix.intersect(sb)
      ix.getResult.getEstimate
    } else {
      SetOperation.builder().buildANotB().aNotB(sa, sb).getEstimate
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSetEstimate =
    copy(left = newLeft, right = newRight)
}
