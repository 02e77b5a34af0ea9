package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k selection as a `TypedImperativeAggregate`: keeps the k
  * smallest `(sortKey, payload)` pairs with HARD-BOUNDED state — the
  * scale-safe alternative to `row_number() OVER (PARTITION BY g ORDER BY
  * sortKey) <= k`, whose window sort materializes and sorts EVERY row of
  * the hottest group (a whale domain with 10^8 documents) to keep k of
  * them.
  *
  * Here per-partial state is a k-entry max-heap: update is O(log k) per
  * row, partials combine map-side like any aggregate, and the shuffle
  * carries at most k pairs per partition regardless of group size — the
  * same bounded-buffer discipline as [[HeavyHitters]] and the funnel's
  * stage-prefix state.
  *
  * With `sortKey = md5(id)` this is a DETERMINISTIC uniform sample
  * without replacement (same md5-threshold idea as
  * [[graft.ops.TextAnalysis.stratifiedSample]], but with an exact count
  * k instead of an expected rate): reproducible across retries,
  * repartitionings, and engines, which is what makes a sampled corpus
  * versionable. Ties (impossible for md5-of-distinct-ids, but the
  * contract is total) break by the smaller payload.
  *
  * Output: `array<long>` of the k payloads ordered by (sortKey, payload)
  * ascending.
  */
case class BottomK(
    sortKey: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(String, Long)]] {

  require(k > 0, s"k must be positive, got $k")

  override def prettyName: String = "graft_bottom_k"
  override def children: Seq[Expression] = Seq(sortKey, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (sortKey.dataType, payload.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, p) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string sortKey, long payload), got (${s.sql}, ${p.sql})")
    }

  // Max-heap on (key, payload): head is the current worst survivor, so a
  // new pair enters iff it beats the head once the heap is full.
  private def heapOrdering: Ordering[(String, Long)] = Ordering.Tuple2

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, Long)] =
    mutable.PriorityQueue.empty(heapOrdering)

  private def offer(buf: mutable.PriorityQueue[(String, Long)],
      pair: (String, Long)): Unit = {
    if (buf.size < k) buf.enqueue(pair)
    else if (heapOrdering.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
  }

  override def update(buf: mutable.PriorityQueue[(String, Long)],
      input: InternalRow): mutable.PriorityQueue[(String, Long)] = {
    val s = sortKey.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      offer(buf, (s.asInstanceOf[UTF8String].toString, p.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(String, Long)],
      other: mutable.PriorityQueue[(String, Long)]):
      mutable.PriorityQueue[(String, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(String, Long)]): Any =
    new GenericArrayData(
      buf.toSeq.sorted(heapOrdering).map(_._2).toArray)

  override def serialize(buf: mutable.PriorityQueue[(String, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, p) =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(p)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]):
      mutable.PriorityQueue[(String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.enqueue((new String(b, "UTF-8"), in.readLong()))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BottomK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomK =
    copy(sortKey = newChildren(0), payload = newChildren(1))
}
