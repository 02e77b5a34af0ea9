package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word `width`-gram shingles of a token array, in first-
  * occurrence order; token arrays shorter than `width` collapse to one
  * whole-document shingle.
  *
  * Semantically identical to the expression-level formula
  * `when(size(toks) >= n, array_distinct(transform(sequence(0, size-n),
  * i -> concat_ws(' ', slice(toks, i+1, n))))).otherwise(array(
  * concat_ws(' ', toks)))` (mirrored by the DuckDB oracles); implemented
  * natively because the HOF chain allocates a slice array + concat per
  * window per row in the interpreter, which dominates the shingling
  * pipelines (MinHash, n-gram Jaccard) at scale. One pass, one
  * StringBuilder, LinkedHashSet dedup (= array_distinct's first-occurrence
  * order). Pure projection: map-side at any scale.
  */
case class WordShingles(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {

  require(width > 0, s"width must be positive, got $width")

  override def prettyName: String = "graft_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val out = new java.util.LinkedHashSet[String]()
    // concat_ws semantics: null tokens are skipped, not rendered.
    def join(from: Int, len: Int): String = {
      val sb = new java.lang.StringBuilder()
      var j = 0
      var appended = 0
      while (j < len) {
        if (!toks.isNullAt(from + j)) {
          if (appended > 0) sb.append(' ')
          sb.append(toks.getUTF8String(from + j).toString)
          appended += 1
        }
        j += 1
      }
      sb.toString
    }
    if (n >= width) {
      var i = 0
      while (i <= n - width) {
        out.add(join(i, width))
        i += 1
      }
    } else {
      out.add(join(0, n))
    }
    val arr = new Array[AnyRef](out.size())
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
