package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Perceptual-hash kernels for the multimodal family: 64-bit dHash
  * (difference hash, the standard LAION-style image-dedup sketch) over
  * an 8×9 grayscale grid — bit (r,c) is set iff grid cell (r,c) is
  * brighter than its right neighbour (r,c+1), 8 rows × 8 comparisons =
  * 64 bits. Near-dup detection downstream is [[graft.ops.Dedup]]'s
  * banded Hamming join (4×16-bit bands, lossless for Hamming ≤ 3) —
  * the identical plan shape as simhash64Pairs, never all-pairs.
  */
private[graft] object PhashUtil {

  final val Rows = 8
  final val Cols = 9 // 9 columns -> 8 horizontal differences per row

  /** dHash bits from per-cell integer (sum, count) pairs. The
    * brightness compare is done on CROSS-MULTIPLIED INTEGER sums
    * (sumA·cntB > sumB·cntA ⇔ meanA > meanB exactly), so the hash is
    * engine-agnostic — no floating-point mean ever exists to round
    * differently in Spark and DuckDB. Overflow-safe for payloads below
    * ~2^26 bytes (255·L·(L/72) ≪ 2^63).
    */
  def bitsFromCells(sums: Array[Long], cnts: Array[Long]): Long = {
    var out = 0L
    var r = 0
    while (r < Rows) {
      var c = 0
      while (c < Cols - 1) {
        val k = r * Cols + c
        if (sums(k) * cnts(k + 1) > sums(k + 1) * cnts(k)) {
          out |= 1L << (r * (Cols - 1) + c)
        }
        c += 1
      }
      r += 1
    }
    out
  }

  /** Box-filter a byte stream into the 72 cells: cell k covers bytes
    * [⌊kL/72⌋, ⌊(k+1)L/72⌋) — the 1-D "resize" of the deterministic
    * stub decode (the DuckDB oracle rebuilds the same windows from the
    * source text's codepoints; ASCII corpus ⇒ byte == codepoint, the
    * media_meta convention).
    */
  def cellsFromBytes(bytes: Array[Byte]): (Array[Long], Array[Long]) = {
    val n = Rows * Cols
    val sums = new Array[Long](n)
    val cnts = new Array[Long](n)
    val len = bytes.length.toLong
    var k = 0
    while (k < n) {
      val from = (k * len / n).toInt
      val to = ((k + 1) * len / n).toInt
      cnts(k) = (to - from).toLong
      var i = from
      var s = 0L
      while (i < to) { s += bytes(i) & 0xff; i += 1 }
      sums(k) = s
      k += 1
    }
    (sums, cnts)
  }

  /** Box-filter REAL decoded pixels into the same 8×9 grid: cell (r,c)
    * averages the image rectangle [⌊r·H/8⌋,⌊(r+1)·H/8⌋) ×
    * [⌊c·W/9⌋,⌊(c+1)·W/9⌋) in 8-bit luma (ITU-R BT.601 integer
    * weights 77/150/29, /256 — integer arithmetic end to end).
    */
  def cellsFromImage(img: java.awt.image.BufferedImage): (Array[Long], Array[Long]) = {
    val n = Rows * Cols
    val sums = new Array[Long](n)
    val cnts = new Array[Long](n)
    val w = img.getWidth
    val h = img.getHeight
    var r = 0
    while (r < Rows) {
      val y0 = r * h / Rows
      val y1 = (r + 1) * h / Rows
      var c = 0
      while (c < Cols) {
        val x0 = c * w / Cols
        val x1 = (c + 1) * w / Cols
        val k = r * Cols + c
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            val luma = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
              29 * (rgb & 0xff)) >> 8
            s += luma
            x += 1
          }
          y += 1
        }
        sums(k) = s
        cnts(k) = (y1 - y0).toLong * (x1 - x0)
        c += 1
      }
      r += 1
    }
    (sums, cnts)
  }
}

/** 64-bit dHash of an opaque binary payload via the DETERMINISTIC stub
  * decode (byte stream box-filtered into the 8×9 grid) — the
  * oracle-gated spelling: DuckDB rebuilds the identical grid from the
  * source text. Pure projection, no shuffle; codegen via the shared
  * [[SketchCodegen]] kernel bridge.
  */
case class DHash64(child: Expression) extends UnaryExpression with SketchCodegen {

  override def prettyName: String = "graft_dhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary payload, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val (sums, cnts) = PhashUtil.cellsFromBytes(bytes)
    PhashUtil.bitsFromCells(sums, cnts)
  }

  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}

/** 64-bit dHash of a REAL image payload: javax.imageio decode (pure
  * JRE — PNG/JPEG/BMP/GIF), 8×9 grayscale box-downsample, same bit
  * rule as [[DHash64]]. Returns null for payloads that don't decode
  * (flagged rows, never task failures — the
  * [[graft.ops.Multimodal.ImageCodec]] contract). Not oracle-gated
  * (DuckDB can't decode images); pinned by MultimodalSpec on
  * synthesized PNGs instead, including the
  * brightness/contrast-invariance the perceptual contract promises.
  */
case class DHashImage64(child: Expression) extends UnaryExpression with SketchCodegen {

  override def prettyName: String = "graft_dhash_image64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary payload, got ${t.sql}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val img =
      try Option(javax.imageio.ImageIO.read(stream))
      catch { case scala.util.control.NonFatal(_) => None }
      finally {
        try stream.close()
        catch { case _: java.io.IOException => () }
      }
    img match {
      case Some(i) if i.getWidth >= PhashUtil.Cols && i.getHeight >= PhashUtil.Rows =>
        val (sums, cnts) = PhashUtil.cellsFromImage(i)
        PhashUtil.bitsFromCells(sums, cnts)
      case _ => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): DHashImage64 =
    copy(child = newChild)
}
