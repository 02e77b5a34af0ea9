package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min frequency sketch (Cormode–Muthukrishnan 2005) as STORABLE
  * mergeable binary columns — the point-frequency member of the sketch
  * family next to HLL distincts ([[graft.ops.DistinctSketch]]), KLL
  * quantiles ([[KllSketchAgg]]) and Misra–Gries heavy hitters
  * ([[HeavyHitters]]).
  *
  * Where Misra–Gries answers "which items are frequent" with k counters,
  * Count-Min answers "how often does THIS item occur" for ANY item in
  * fixed d×w space: est(x) = min over d rows of counter[h_r(x)], with
  *   exact ≤ est ≤ exact + 2N/w   (per row, w.p. 1 − 2^−d over rows;
  * the min over d=4 rows makes the upper bound reliable in practice).
  * Estimates never undercount — the property the oracle gate checks.
  *
  * The sketch is a plain d×w long matrix; merge is element-wise addition
  * (exact, lossless w.r.t. the parts' guarantees), so per-(source, day)
  * sketches stored once answer any later rollup by summing bytes —
  * store-once / re-aggregate-forever, like the other sketch columns.
  *
  * Hash rows are `MurmurHash3.stringHash(item, seed_r)` — deterministic
  * for fixed data (no per-run randomness), so the estimates and the gate
  * booleans are stable values an oracle can hash.
  *
  * Wire format: int d, int w, then d·w longs (row-major).
  */
object CountMin {
  def rowIndex(item: String, row: Int, w: Int): Int =
    math.floorMod(MurmurHash3.stringHash(item, 0x9E3779B9 * (row + 1)), w)

  def serialize(d: Int, w: Int, counts: Array[Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(8 + counts.length * 8)
    val out = new DataOutputStream(bytes)
    out.writeInt(d); out.writeInt(w)
    counts.foreach(out.writeLong)
    out.flush()
    bytes.toByteArray
  }

  /** Returns (d, w, counts). */
  def deserialize(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = in.readInt(); val w = in.readInt()
    val counts = Array.fill(d * w)(in.readLong())
    (d, w, counts)
  }

  def estimate(bytes: Array[Byte], item: String): Long = {
    val (d, w, counts) = deserialize(bytes)
    (0 until d).map(r => counts(r * w + rowIndex(item, r, w))).min
  }
}

/** Per-group Count-Min sketch over a `array<string>` items column (each
  * element counts once) → binary sketch image.
  */
case class CountMinAgg(
    child: Expression,
    w: Int = 2048,
    d: Int = 4,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(w > 0 && d > 0 && d <= 16, s"bad CM dims: w=$w d=$d")

  override def prettyName: String = "graft_cm_sketch"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val item = arr.getUTF8String(i).toString
          var r = 0
          while (r < d) {
            buf(r * w + CountMin.rowIndex(item, r, w)) += 1L
            r += 1
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = CountMin.serialize(d, w, buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CountMin.serialize(d, w, buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val (dd, ww, counts) = CountMin.deserialize(bytes)
    require(dd == d && ww == w, s"CM dim mismatch: got ${dd}x$ww want ${d}x$w")
    counts
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

/** Union of stored Count-Min images (element-wise add) — re-aggregate
  * per-(group, part) sketches to any coarser rollup without touching raw
  * rows. All inputs must share (d, w).
  */
case class CountMinMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[(Int, Int, Array[Long])]] {

  override def prettyName: String = "graft_cm_merge"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary sketch images, got ${t.sql}")
  }

  override def createAggregationBuffer(): Option[(Int, Int, Array[Long])] = None

  private def add(buf: Option[(Int, Int, Array[Long])], d: Int, w: Int,
      counts: Array[Long]): Option[(Int, Int, Array[Long])] = buf match {
    case None => Some((d, w, counts.clone()))
    case Some((bd, bw, bc)) =>
      require(bd == d && bw == w, s"CM dim mismatch: ${bd}x$bw vs ${d}x$w")
      var i = 0
      while (i < bc.length) { bc(i) += counts(i); i += 1 }
      buf
  }

  override def update(buf: Option[(Int, Int, Array[Long])],
      input: InternalRow): Option[(Int, Int, Array[Long])] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val (d, w, counts) = CountMin.deserialize(v.asInstanceOf[Array[Byte]])
      add(buf, d, w, counts)
    }
  }

  override def merge(buf: Option[(Int, Int, Array[Long])],
      other: Option[(Int, Int, Array[Long])]): Option[(Int, Int, Array[Long])] =
    other match {
      case None => buf
      case Some((d, w, counts)) => add(buf, d, w, counts)
    }

  /** Empty merge (no non-null inputs) yields an empty 1×1 sketch rather
    * than null, keeping the column non-nullable like the other sketches.
    */
  override def eval(buf: Option[(Int, Int, Array[Long])]): Any = buf match {
    case None => CountMin.serialize(1, 1, Array(0L))
    case Some((d, w, counts)) => CountMin.serialize(d, w, counts)
  }

  override def serialize(buf: Option[(Int, Int, Array[Long])]): Array[Byte] =
    buf match {
      case None => Array.emptyByteArray
      case Some((d, w, counts)) => CountMin.serialize(d, w, counts)
    }
  override def deserialize(bytes: Array[Byte]): Option[(Int, Int, Array[Long])] =
    if (bytes.isEmpty) None else Some(CountMin.deserialize(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): CountMinMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinMergeAgg =
    copy(child = newChildren.head)
}

/** Point-frequency estimate from a stored sketch image: min over the d
  * hash rows. Runs on probe-sized relations (a handful of items against
  * a 1-row broadcast sketch), so `CodegenFallback` is fine — this is
  * never the corpus-scan hot path (same posture as [[KllQuantiles]]).
  */
case class CountMinEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_cm_estimate"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary sketch, string item), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(sketch: Any, item: Any): Any =
    CountMin.estimate(sketch.asInstanceOf[Array[Byte]],
      item.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}
