package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou/Douze/Schmid, PAMI'11): a vector
  * splits into `m` subvectors of `dsub` dims; each subvector is replaced
  * by the index of its nearest centroid in that subspace's `k`-entry
  * codebook. 64 float dims at m=8 → 8 small ints: ~32× memory/IO
  * reduction versus the 4× of int8 scalar quantization
  * ([[graft.ops.Similarity.quantize8]]), at correspondingly coarser
  * distances — the standard third rung of the embedding-compression
  * ladder (float → int8 → PQ).
  *
  * The flat codebook layout is `[(sub·k + c)·dsub + j]`. Both kernels are
  * pure projections (map-side at any scale) and ride [[SketchCodegen]]
  * so the enclosing projection stays whole-stage-codegen'd.
  */
private[graft] trait PqKernel extends UnaryExpression with SketchCodegen {
  def codebook: Array[Float]
  def m: Int
  def k: Int
  def dsub: Int
  require(m > 0 && k > 0 && dsub > 0, s"bad PQ shape m=$m k=$k dsub=$dsub")
  require(codebook.length == m * k * dsub,
    s"codebook length ${codebook.length} != m*k*dsub = ${m * k * dsub}")
}

/** vector (array<float|double>, length m·dsub) → array<int> of `m`
  * centroid codes, each the argmin-L2 centroid of its subspace (ties →
  * lowest index). Null if the vector is null, has a null element, or has
  * the wrong length.
  */
case class PqEncode(child: Expression, codebook: Array[Float],
    m: Int, k: Int, dsub: Int) extends PqKernel {

  override def prettyName: String = "graft_pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.sql}")
  }

  // lazy: dataType is only legal on a RESOLVED child, and copy() runs
  // during analysis on unresolved ones
  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub) return null
    val codes = new Array[Any](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = (sub * k + c) * dsub
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val i = sub * dsub + j
          if (v.isNullAt(i)) return null
          val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          val diff = x - codebook(base + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(sub) = best
      sub += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** query vector → its ADC lookup table: element `sub·k + c` is the dot
  * product of the query's `sub`-subvector with centroid `c` of that
  * subspace. Computed ONCE per query row (the broadcast side); scoring a
  * corpus code then costs `m` array lookups ([[AdcDot]]) instead of a
  * reconstruct + full-dimension dot — the asymmetric-distance
  * arrangement every production PQ index uses.
  */
case class AdcTable(child: Expression, codebook: Array[Float],
    m: Int, k: Int, dsub: Int) extends PqKernel {

  override def prettyName: String = "graft_pq_adc_table"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.sql}")
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub) return null
    val out = new Array[Any](m * k)
    var sub = 0
    while (sub < m) {
      var c = 0
      while (c < k) {
        val base = (sub * k + c) * dsub
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val i = sub * dsub + j
          if (v.isNullAt(i)) return null
          val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          d += x * codebook(base + j)
          j += 1
        }
        out(sub * k + c) = d
        c += 1
      }
      sub += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): AdcTable =
    copy(child = newChild)
}

/** Σ_sub table[sub·k + codes[sub]] — the per-pair half of asymmetric
  * distance: `m` lookups against the query's [[AdcTable]] (or against a
  * model-constant table, e.g. per-centroid squared norms for the
  * reconstructed-vector norm). Inline codegen'd loop, same contract as
  * [[DotProduct]] (null on null element or shape mismatch).
  */
case class AdcLookupSum(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(k > 0, s"k must be positive, got $k")

  override def prettyName: String = "graft_pq_adc_sum"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int> codes, array<double> table), " +
          s"got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val table = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (table.numElements() != m * k) return null
    var sum = 0.0
    var sub = 0
    while (sub < m) {
      if (codes.isNullAt(sub)) return null
      val c = codes.getInt(sub)
      if (c < 0 || c >= k) return null
      sum += table.getDouble(sub * k + c)
      sub += 1
    }
    sum
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, table) => {
      val sub = ctx.freshName("sub")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val sum = ctx.freshName("sum")
      s"""
         |final int $m = $codes.numElements();
         |if ($table.numElements() != $m * $k) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $sub = 0; $sub < $m; $sub++) {
         |    if ($codes.isNullAt($sub)) { ${ev.isNull} = true; break; }
         |    final int $c = $codes.getInt($sub);
         |    if ($c < 0 || $c >= $k) { ${ev.isNull} = true; break; }
         |    $sum += $table.getDouble($sub * $k + $c);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookupSum =
    copy(left = newLeft, right = newRight)
}

/** array<int> of `m` codes → the reconstructed array<float> (each
  * subspace's centroid, concatenated) — the approximation every
  * asymmetric-distance computation scores against. Null for null input,
  * wrong length, or an out-of-range code.
  */
case class PqDecode(child: Expression, codebook: Array[Float],
    m: Int, k: Int, dsub: Int) extends PqKernel {

  override def prettyName: String = "graft_pq_decode"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> codes, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    if (codes.numElements() != m) return null
    val out = new Array[Any](m * dsub)
    var sub = 0
    while (sub < m) {
      if (codes.isNullAt(sub)) return null
      val c = codes.getInt(sub)
      if (c < 0 || c >= k) return null
      val base = (sub * k + c) * dsub
      var j = 0
      while (j < dsub) {
        out(sub * dsub + j) = codebook(base + j)
        j += 1
      }
      sub += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqDecode =
    copy(child = newChild)
}
