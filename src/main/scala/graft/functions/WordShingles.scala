package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
    extends UnaryExpression with SketchCodegen {

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

/** One-pass repetition statistics over a token array:
  * `(n_tokens, n_distinct_tokens, n_bigrams, n_distinct_bigrams)`, where
  * bigrams are adjacent-token pairs joined with a single space (exactly
  * `transform(sequence(0, n-2), i -> concat_ws(' ', slice(toks, i+1, 2)))`
  * and distinctness is string-value equality (exactly `array_distinct`).
  *
  * The HOF formula it replaces is quadratic per document in the
  * interpreter — `slice` copies a sub-array per position and the lambda
  * frames are boxed per element — which made the repetition-ratio query
  * (a pure projection) the slowest line in the round-1 bench (12.6 s at
  * sf0.1). This kernel walks the tokens once, maintaining two hash sets;
  * the ratio arithmetic stays in the Column layer so the DuckDB oracle
  * formula is unchanged.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with SketchCodegen {

  override def prettyName: String = "graft_repetition_stats"

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val tokSet = new java.util.HashSet[String]()
    var i = 0
    while (i < n) {
      // null tokens count toward size (like `size`) and dedup as one
      // value (like `array_distinct`); HashSet accepts null directly
      tokSet.add(if (toks.isNullAt(i)) null else toks.getUTF8String(i).toString)
      i += 1
    }
    var nBigrams = 0L
    val bigramSet = new java.util.HashSet[String]()
    if (n >= 2) {
      nBigrams = n - 1L
      i = 0
      while (i < n - 1) {
        // concat_ws semantics: null members are skipped, not rendered
        val sb = new java.lang.StringBuilder()
        var appended = 0
        var j = i
        while (j <= i + 1) {
          if (!toks.isNullAt(j)) {
            if (appended > 0) sb.append(' ')
            sb.append(toks.getUTF8String(j).toString)
            appended += 1
          }
          j += 1
        }
        bigramSet.add(sb.toString)
        i += 1
      }
    }
    InternalRow(n.toLong, tokSet.size.toLong, nBigrams, bigramSet.size.toLong)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}
