package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment as ONE native codegen'd kernel:
  * `NearestCentroid(vec, centroidsLiteral)` returns
  * `struct<cell:int, d2:double>` — the 0-based index of the nearest
  * centroid (squared L2, first-minimum tie-break so assignment is
  * deterministic on any engine/partitioning) and that minimum distance².
  *
  * Why a custom Expression (same argument as [[DotProduct]]): the
  * expression-level formula it replaces —
  * `transform(centroids, c => aggregate(zip_with(vec, c, ...), 0.0, _+_))`
  * consumed by `array_min` twice plus `array_position` — runs on Spark's
  * CodegenFallback higher-order-function path, paying ~3·k·dim boxed
  * interpreter lambda invocations PER ROW. For Lloyd's k-means the
  * assignment step is the entire inner loop, so the interpreter overhead
  * dominated the FLOPs by ~100× (16 s for 3 iterations over a 2,000×64
  * table). This kernel compiles to a tight primitive double loop inside
  * whole-stage codegen and computes cell AND d2 in a single evaluation.
  *
  * The centroid table arrives as a foldable `array<array<double>>`
  * literal — k·dim doubles of plan metadata, the same "model state rides
  * the plan" posture as the PQ codebooks ([[PqEncode]]) — and is
  * extracted ONCE into a primitive `double[][]` that codegen references
  * directly (no per-row ArrayData unpacking of the model).
  *
  * Semantics are bit-identical to the HOF formula: elements widen to
  * double, (x−y)² accumulates left-to-right per centroid, centroids are
  * scanned in order with a strict `<` comparison (first minimum wins ≡
  * `array_position(ds, array_min(ds))`). A null vector, null element, or
  * dimension mismatch yields NULL.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_nearest_centroid"

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("d2", DoubleType, nullable = false)))

  override def nullable: Boolean = true

  private def vecElemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(v, _), ArrayType(ArrayType(DoubleType, _), _))
          if (v == FloatType || v == DoubleType) && right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, foldable " +
          s"array<array<double>>), got ${left.dataType.sql} and " +
          s"${right.dataType.sql}")
    }

  /** The centroid model, unpacked once per task from the foldable
    * literal; shipped to executors inside the serialized plan.
    */
  @transient private lazy val cents: Array[Array[Double]] = {
    val ad = right.eval().asInstanceOf[ArrayData]
    require(ad != null && ad.numElements() > 0,
      s"$prettyName needs a non-empty centroid table")
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val isF = vecElemType == FloatType
    var best = Double.MaxValue
    var bi = -1
    var c = 0
    while (c < cents.length) {
      val cen = cents(c)
      if (cen.length != n) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        val xv = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
        val d = xv - cen(i)
        s += d * d
        i += 1
      }
      if (s < best) { best = s; bi = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](bi, best))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val cen = ctx.freshName("cen")
      val get =
        if (vecElemType == FloatType) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |double $best = Double.MAX_VALUE;
         |int $bi = -1;
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  final double[] $cen = $centsRef[$c];
         |  if ($cen.length != $n) { ${ev.isNull} = true; break; }
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $d = $get - $cen[$i];
         |    $s += $d * $d;
         |  }
         |  if (${ev.isNull}) break;
         |  if ($s < $best) { $best = $s; $bi = $c; }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ Integer.valueOf($bi), Double.valueOf($best) });
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}
