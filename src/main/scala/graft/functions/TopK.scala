package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Top-k selection by score as a `TypedImperativeAggregate`: keeps the k
  * best `(score, payload)` pairs per group with HARD-BOUNDED state — the
  * ranking complement of [[BottomK]] (which selects by a hash permutation
  * for sampling; this selects by a live measure for leaderboards).
  *
  * The window spelling — `row_number() OVER (PARTITION BY g ORDER BY
  * score DESC) <= k` — materializes and sorts EVERY row of the hottest
  * group to keep k of them: a whale group (one event type with 10^9
  * distinct users at 100 TB) pays a 10^9-row sort for a 5-row answer.
  * Here per-partial state is a k-entry heap: O(log k) per row, partials
  * combine map-side, and the shuffle carries at most k pairs per
  * (partition, group) no matter how hot the group.
  *
  * Ordering is total and deterministic: higher score wins; equal scores
  * break toward the SMALLER payload (so the result is reproducible
  * across partitionings and engines — the same property every other
  * graft selection op guarantees). Scores are exact longs, not doubles:
  * float scores summed in engine-dependent order can reorder near-ties
  * and make cross-engine top-k membership a coin flip, so callers rank
  * on counts/integer measures (or pre-rounded fixed-point).
  *
  * Output: `array<struct<score:long, payload:long>>` ordered best-first
  * (score descending, payload ascending).
  */
case class TopK(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  require(k > 0, s"k must be positive, got $k")

  override def prettyName: String = "graft_top_k"
  override def children: Seq[Expression] = Seq(score, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, payload.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, p) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (long score, long payload), got (${s.sql}, ${p.sql})")
    }

  // "Better" = higher score, then smaller payload. The queue dequeues its
  // maximum, so order by badness: head is the worst survivor and a new
  // pair enters iff it is better (lt) than the head once the heap is full.
  private def byBadness: Ordering[(Long, Long)] =
    Ordering.fromLessThan[(Long, Long)] { (a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty(byBadness)

  private def offer(buf: mutable.PriorityQueue[(Long, Long)],
      pair: (Long, Long)): Unit = {
    if (buf.size < k) buf.enqueue(pair)
    else if (byBadness.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      offer(buf, (s.asInstanceOf[Long], p.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)]):
      mutable.PriorityQueue[(Long, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any =
    new GenericArrayData(
      buf.toSeq.sorted(byBadness).map { case (s, p) =>
        InternalRow(s, p)
      }.toArray[Any])

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, p) => out.writeLong(s); out.writeLong(p) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]):
      mutable.PriorityQueue[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ => buf.enqueue((in.readLong(), in.readLong())) }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopK =
    copy(score = newChildren(0), payload = newChildren(1))
}
