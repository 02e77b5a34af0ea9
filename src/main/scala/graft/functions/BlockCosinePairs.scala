package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All qualifying cosine pairs between two VECTOR BLOCKS — the per-task
  * kernel of the blocked exact all-pairs similarity join
  * ([[graft.ops.Similarity.nearDupPairsBlocked]]).
  *
  * Inputs: two `array<struct<id: long, vec: array<float>, nrm: double>>`
  * blocks plus a `sameBlock` boolean. Output:
  * `array<struct<a_id: long, b_id: long, cos: double>>` — every pair
  * whose round-4 cosine meets `threshold`, ids ordered `a_id < b_id`.
  * `sameBlock = true` walks only the upper triangle (each unordered pair
  * once); `sameBlock = false` walks the full rectangle (the blocks are
  * disjoint id sets, so every combination is a distinct pair).
  *
  * Why an eval-mode kernel and not per-pair Catalyst expressions: the
  * brute-force formulation evaluates one codegen'd [[DotProduct]] per
  * ORDERED pair through a nested-loop join — each evaluation re-walks
  * `UnsafeArrayData` element accessors and re-checks null bits, and the
  * join condition itself re-evaluates per row-pair. Here each block's
  * vectors are unpacked ONCE per task into primitive `float[]` and the
  * n²/B² inner loop is plain JVM code the JIT vectorizes; `sameBlock`
  * triangles also halve the pair count the id-inequality join condition
  * could only discard after the fact. `CodegenFallback` is fine — the
  * expression is evaluated once per BLOCK-PAIR row (B(B+1)/2 rows
  * total), never per vector pair; all the per-pair work is inside this
  * compiled loop.
  *
  * Arithmetic is bit-identical to the formulation it replaces (and to
  * the DuckDB oracle): products widen float→double and accumulate
  * left-to-right in dimension order ([[DotProduct]]'s fold), the raw
  * cosine is `dot / (a_nrm * b_nrm)` with the norms computed ONCE per
  * row upstream (`sqrt(dot(v, v))`, carried in the block struct), and
  * rounding is Spark `round(x, 4)` semantics (`BigDecimal.valueOf(x)
  * .setScale(4, HALF_UP)`), evaluated only on the sliver that survives
  * the sound raw-value over-approximation `raw >= t - 5e-5` (a
  * BigDecimal per candidate pair would dominate the whole scan —
  * measured 2x on the brute-force bench, same trick here). A row with a
  * null/absent vector, a null element, or a dimension mismatch against
  * a partner simply produces no pairs — exactly the null-condition
  * behavior of the join formulation.
  */
case class BlockCosinePairs(aBlock: Expression, bBlock: Expression,
    sameBlock: Expression, threshold: Double)
  extends TernaryExpression with CodegenFallback {

  override def prettyName: String = "graft_block_cosine_pairs"
  override def first: Expression = aBlock
  override def second: Expression = bBlock
  override def third: Expression = sameBlock
  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("b_id", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)

  private def blockOk(t: DataType): Boolean = t match {
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _),
      StructField(_, ArrayType(FloatType, _), _, _),
      StructField(_, DoubleType, _, _))), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (blockOk(aBlock.dataType) && blockOk(bBlock.dataType) &&
        sameBlock.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<struct<long, array<float>, double>> " +
        s"blocks and a boolean, got (${aBlock.dataType.sql}, " +
        s"${bBlock.dataType.sql}, ${sameBlock.dataType.sql})")

  /** Unpack a block into primitive arrays once per evaluation. A row
    * with a null id/vec/nrm or a null vector element gets `vecs(i) =
    * null` and is skipped by the pair loop (the join-condition
    * null-out behavior of the formulation this replaces).
    */
  private def unpack(block: ArrayData):
      (Array[Long], Array[Array[Float]], Array[Double]) = {
    val n = block.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Float]](n)
    val nrms = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (!block.isNullAt(i)) {
        val row = block.getStruct(i, 3)
        if (!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2)) {
          val arr = row.getArray(1)
          val d = arr.numElements()
          var ok = true
          val v = new Array[Float](d)
          var k = 0
          while (k < d && ok) {
            if (arr.isNullAt(k)) ok = false
            else { v(k) = arr.getFloat(k); k += 1 }
          }
          if (ok) {
            ids(i) = row.getLong(0)
            vecs(i) = v
            nrms(i) = row.getDouble(2)
          }
        }
      }
      i += 1
    }
    (ids, vecs, nrms)
  }

  override def eval(input: InternalRow): Any = {
    val aV = aBlock.eval(input)
    val bV = bBlock.eval(input)
    val sV = sameBlock.eval(input)
    if (aV == null || bV == null || sV == null) return new GenericArrayData(Array.empty[Any])
    val same = sV.asInstanceOf[Boolean]
    val (aIds, aVecs, aNrms) = unpack(aV.asInstanceOf[ArrayData])
    val (bIds, bVecs, bNrms) =
      if (same) (aIds, aVecs, aNrms) else unpack(bV.asInstanceOf[ArrayData])
    // Anything whose raw cosine could still round UP to the threshold
    // survives the cheap test; the exact HALF_UP rounding runs only on
    // that sliver.
    val rawGate = threshold - 0.00005
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < aVecs.length) {
      val av = aVecs(i)
      if (av != null) {
        val an = aNrms(i)
        val aid = aIds(i)
        var j = if (same) i + 1 else 0
        while (j < bVecs.length) {
          val bv = bVecs(j)
          if ((bv ne null) && bv.length == av.length) {
            var s = 0.0
            var k = 0
            while (k < av.length) {
              s += av(k).toDouble * bv(k).toDouble
              k += 1
            }
            val raw = s / (an * bNrms(j))
            if (raw >= rawGate) {
              val cos = java.math.BigDecimal.valueOf(raw)
                .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
              if (cos >= threshold) {
                val bid = bIds(j)
                val lo = if (aid < bid) aid else bid
                val hi = if (aid < bid) bid else aid
                out += new GenericInternalRow(
                  Array[Any](lo, hi, cos))
              }
            }
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BlockCosinePairs =
    copy(aBlock = newFirst, bBlock = newSecond, sameBlock = newThird)
}
