package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence counts of a fixed set of literal markers in one pass over
  * the text: element i is the number of NON-OVERLAPPING left-to-right
  * matches of `markers(i)` — exactly the count the
  * `(len(t) − len(replace(t, m, ''))) / len(m)` trick produces, so the
  * DuckDB oracle formula is unchanged.
  *
  * Replaces a chain of `regexp_replace` calls (one compiled-regex pass
  * per marker per row — the dominant cost of char-profile language ID
  * at corpus scale) with plain sub-array scans, inside whole-stage
  * codegen via [[SketchCodegen]].
  */
case class MarkerCounts(child: Expression, markers: Seq[String])
    extends UnaryExpression with SketchCodegen {

  require(markers.nonEmpty, "MarkerCounts needs at least one marker")
  require(markers.forall(_.nonEmpty), "markers must be non-empty strings")

  override def prettyName: String = "graft_marker_counts"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  @transient private lazy val markerBytes: Array[Array[Byte]] =
    markers.map(_.getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].getBytes
    val out = new Array[Any](markerBytes.length)
    var m = 0
    while (m < markerBytes.length) {
      val pat = markerBytes(m)
      var count = 0L
      var i = 0
      val limit = text.length - pat.length
      while (i <= limit) {
        var j = 0
        while (j < pat.length && text(i + j) == pat(j)) j += 1
        if (j == pat.length) { count += 1; i += pat.length } // non-overlapping
        else i += 1
      }
      out(m) = count
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerCounts =
    copy(child = newChild)
}
