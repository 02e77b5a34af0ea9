package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Range-bucket assignment against a broadcast sorted splitter array —
  * the per-row kernel of [[graft.ops.Ranking.globalRank]]'s TeraSort
  * composition.
  *
  * Returns the number of splitters `(v_j, i_j)` (sorted ascending,
  * lexicographic) that the row `(value, id)` has passed, where "passed"
  * means `value > v_j || (value == v_j && id >= i_j)` — i.e. the row's
  * range index in 0..P-1. Identical semantics to the higher-order
  * `aggregate(typedlit(splitters), …)` fold it replaces, but:
  *
  *  - O(log P) per row instead of O(P): at cluster scale P is 10³–10⁴
  *    and the fold put 10⁴ expression ops on every row of the scan;
  *    a binary search is ~13 compares;
  *  - whole-stage-codegen'd tight loop over two primitive long[]
  *    (higher-order functions are CodegenFallback — every row boxed
  *    through the interpreter).
  *
  * The splitter arrays are expression-embedded constants (ordinary
  * `Seq[Long]` for structural equality/canonicalization), identical in
  * every job by construction — the cross-job-misalignment hazard that
  * rules out `repartitionByRange` (see globalRank's scaladoc) cannot
  * recur here.
  */
case class SplitterBucket(value: Expression, id: Expression,
    splitV: Seq[Long], splitI: Seq[Long]) extends BinaryExpression {

  require(splitV.length == splitI.length && splitV.nonEmpty,
    "splitter value/id arrays must be equal-length and non-empty")

  override def left: Expression = value
  override def right: Expression = id
  override def prettyName: String = "graft_splitter_bucket"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType == LongType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"${value.dataType.sql}, ${id.dataType.sql}")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SplitterBucket =
    copy(value = newLeft, id = newRight)

  @transient private lazy val vArr: Array[Long] = splitV.toArray
  @transient private lazy val iArr: Array[Long] = splitI.toArray

  override def nullSafeEval(v: Any, i: Any): Any = {
    val vl = v.asInstanceOf[Long]
    val il = i.asInstanceOf[Long]
    var lo = 0
    var hi = vArr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      // passed(mid): value > v_mid || (value == v_mid && id >= i_mid)
      if (vArr(mid) < vl || (vArr(mid) == vl && iArr(mid) <= il)) lo = mid + 1
      else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("splitV", vArr, "long[]")
    val iRef = ctx.addReferenceObj("splitI", iArr, "long[]")
    nullSafeCodeGen(ctx, ev, (v, i) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $vRef.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($vRef[$mid] < $v || ($vRef[$mid] == $v && $iRef[$mid] <= $i)) {
         |    $lo = $mid + 1;
         |  } else {
         |    $hi = $mid;
         |  }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })
  }
}
