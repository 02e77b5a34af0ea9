package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass sketch expressions. Each replaces an equivalent
  * higher-order-function formula (kept beside it in the ops layer for
  * differential testing) whose per-element interpreter overhead dominates
  * at corpus scale; each is a pure projection (map-side at any scale) and
  * bit-identical to its formula, so the DuckDB oracles are unchanged.
  */
private[graft] object SketchUtil {
  def md5(): MessageDigest = MessageDigest.getInstance("MD5")

  private val tlMd5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Per-thread reused digest, already reset. MessageDigest is not
    * thread-safe and `getInstance` is a measurable per-row allocation in
    * hot sketch loops — a ThreadLocal makes the kernels safe regardless of
    * how the enclosing expression instance is shared across tasks.
    */
  def threadMd5(): MessageDigest = {
    val md = tlMd5.get()
    md.reset()
    md
  }

  def hexDigit(b: Int): Char = "0123456789abcdef".charAt(b & 0xf)

  def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      sb.append(hexDigit((bytes(i) >> 4) & 0xf)).append(hexDigit(bytes(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  /** Unsigned byte compare == lowercase-hex lexicographic compare. */
  def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }
}

/** Whole-stage-codegen adapter for the unary sketch kernels.
  *
  * The kernels' cost is digest/loop work inside an ordinary JVM method —
  * regenerating that logic as Janino source would win nothing — but
  * `CodegenFallback` is the wrong wrapper for them: it boxes the incoming
  * row, re-enters the interpreted `eval` path per row, and (worse) makes
  * every PARENT expression around the node interpreted too. This trait
  * instead emits a direct call to the kernel on the already-evaluated
  * child value, so the enclosing Project stays one fused
  * whole-stage-codegen loop and only the kernel body itself runs as
  * ordinary (JIT-compiled) JVM code.
  *
  * A kernel may return null for a non-null input (e.g. an empty shingle
  * set has no MinHash); implementors must declare `nullable = true` in
  * that case.
  */
private[graft] trait SketchCodegen extends UnaryExpression {

  /** Public entry point for generated code: the interpreted kernel. */
  final def evalInput(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("kernel", this)
    val childGen = child.genCode(ctx)
    val res = ctx.freshName("kernelRes")
    val javaType = CodeGenerator.javaType(dataType)
    val boxedType = CodeGenerator.boxedType(dataType)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        if (!${childGen.isNull}) {
          Object $res = $kernel.evalInput(${childGen.value});
          if ($res != null) {
            ${ev.isNull} = false;
            ${ev.value} = ($boxedType) $res;
          }
        }""")
  }
}

/** Sign-random-projection LSH bucket id: bit j of the result is the sign
  * of Σ_d (±1)_{j,d} · v_d, with the hyperplane sign (±1)_{j,d} = high bit
  * of the first hex nibble of md5("j_d").
  *
  * Equivalent formula (see Similarity.lshBucketHof): `aggregate(transform(
  * sequence(0, bits-1), j -> when(Σ > 0, 2^j).otherwise(0)), 0, +)`.
  * The formula re-derives every plane sign with an md5 call per (row, j,
  * d) — pure constants — plus HOF interpretation; here the sign matrix is
  * computed once per task and each row costs bits×dims fused
  * multiply-adds.
  */
case class LshBucket(child: Expression, bits: Int)
    extends UnaryExpression with SketchCodegen {

  require(bits > 0 && bits < 63, s"bits must be in [1,62], got $bits")

  override def prettyName: String = "graft_lsh_bucket"
  override def dataType: DataType = LongType
  // null for a non-null input when any vector element is null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.sql}")
  }

  @transient private var signs: Array[Array[Double]] = _
  @transient private var signDims: Int = -1

  private def signMatrix(dims: Int): Array[Array[Double]] = {
    if (signDims != dims) {
      val md = SketchUtil.md5()
      signs = Array.tabulate(bits) { j =>
        Array.tabulate(dims) { d =>
          md.reset()
          val digest = md.digest(s"${j}_$d".getBytes("UTF-8"))
          // first hex char = high nibble of byte 0; '8'..'f' ⇔ nibble ≥ 8
          if (((digest(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
        }
      }
      signDims = dims
    }
    signs
  }

  private val isFloat = () => child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val m = signMatrix(n)
    val fl = isFloat()
    var bucket = 0L
    var j = 0
    while (j < bits) {
      val row = m(j)
      var sum = 0.0
      var d = 0
      while (d < n) {
        if (!v.isNullAt(d)) {
          val x = if (fl) v.getFloat(d).toDouble else v.getDouble(d)
          sum += x * row(d)
        } else return null
        d += 1
      }
      if (sum > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

/** 16-bit SimHash over a token array: bit j set iff the ±1-weighted count
  * of tokens whose md5 hex char j is ≥ '8' is positive.
  *
  * Equivalent formula (Dedup.simhash16Hof) computes md5 per token once
  * per BIT (16×) through interpreted lambdas; this node digests each
  * token once and updates all 16 bit-sums in that pass.
  */
case class SimHash16(child: Expression) extends UnaryExpression with SketchCodegen {

  override def prettyName: String = "graft_simhash16"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val sums = new Array[Long](16)
    val md = SketchUtil.threadMd5()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        md.reset()
        val digest = md.digest(toks.getUTF8String(i).getBytes)
        var j = 0
        while (j < 16) {
          // hex char j = (j even ? high : low) nibble of byte j/2
          val nib = if ((j & 1) == 0) (digest(j >> 1) >> 4) & 0xf
                    else digest(j >> 1) & 0xf
          sums(j) += (if (nib >= 8) 1L else -1L)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 16) {
      if (sums(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array — the production-width variant of
  * [[SimHash16]] (16 bits saturate on small-vocabulary corpora: at
  * sf0.01 the 16-bit sketch collides 555 doc pairs at Hamming 0, while
  * 64 bits leave only the one true duplicate pair).
  *
  * Bit j (0..63) draws from md5 hex char j/2, bit j%2 of the nibble —
  * two independent bits per hex char across all 32 chars, one digest per
  * token. Sign convention matches SimHash16: bit set iff the ±1-weighted
  * token count is strictly positive. Bit 63 makes the result negative
  * (signed long) — harmless, both engines shift arithmetically and mask.
  */
case class SimHash64(child: Expression) extends UnaryExpression with SketchCodegen {

  override def prettyName: String = "graft_simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val sums = new Array[Long](64)
    val md = SketchUtil.threadMd5()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        md.reset()
        val digest = md.digest(toks.getUTF8String(i).getBytes)
        var j = 0
        while (j < 64) {
          val c = j >> 1 // hex char index 0..31
          val nib = if ((c & 1) == 0) (digest(c >> 1) >> 4) & 0xf
                    else digest(c >> 1) & 0xf
          sums(j) += (if (((nib >> (j & 1)) & 1) == 1) 1L else -1L)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (sums(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03): the
  * DISTINCT set of per-window minima over a sliding window of `w`
  * consecutive char-`k`-gram md5s, returned as a sorted hex array.
  * [[RollingMinHash]] is the single-window degenerate case; winnowing
  * keeps ~2/(w+1) of all gram hashes while guaranteeing any shared
  * substring of length ≥ k+w−1 contributes at least one COMMON
  * fingerprint to both documents — the density/recall contract that makes
  * it the standard local-overlap (plagiarism-style) detector. Downstream,
  * overlap detection is explode + equi-join on the fingerprint — the same
  * skew-safe bucket-join shape as the shingle join, at winnowed density.
  *
  * Value-set semantics: the distinct window-min VALUES are emitted
  * (positions discarded), which is engine-order-independent and lets the
  * DuckDB oracle mirror the construction exactly.
  *
  * Texts shorter than `k` collapse to one whole-text fingerprint; gram
  * counts smaller than `w` use a single window over all grams.
  */
case class WinnowedFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with SketchCodegen {

  require(k > 0 && w > 0, s"k and w must be positive, got k=$k w=$w")

  override def prettyName: String = "graft_winnow"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val n = text.numChars()
    val md = SketchUtil.threadMd5()
    if (n < k) {
      return new GenericArrayData(
        Array[Any](UTF8String.fromString(SketchUtil.hex(md.digest(text.getBytes)))))
    }
    val nGrams = n - k + 1
    val hashes = new Array[Array[Byte]](nGrams)
    val bytes = text.getBytes
    val ascii = bytes.length == n
    var i = 0
    while (i < nGrams) {
      md.reset()
      if (ascii) md.update(bytes, i, k)
      else md.update(text.substringSQL(i + 1, k).getBytes)
      hashes(i) = md.digest()
      i += 1
    }
    // sliding-window minima via monotonic deque: O(nGrams) total
    val winW = math.min(w, nGrams)
    val deque = new java.util.ArrayDeque[Int]()
    val out = new java.util.TreeSet[String]()
    i = 0
    while (i < nGrams) {
      while (!deque.isEmpty && !SketchUtil.less(hashes(deque.peekLast()), hashes(i)))
        deque.pollLast() // drop ≥ current from the back (ties keep either — value-set semantics)
      deque.addLast(i)
      if (deque.peekFirst() <= i - winW) deque.pollFirst()
      if (i >= winW - 1) out.add(SketchUtil.hex(hashes(deque.peekFirst())))
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowedFingerprints =
    copy(child = newChild)
}

/** Rolling fingerprint: minimum md5 over all `width`-character substrings
  * of the text (whole text when shorter) — the 1-hash degenerate MinHash
  * of character shingles used for winnowing-style dedup.
  *
  * Equivalent formula (TextAnalysis.rollingMinHof):
  * `array_min(transform(sequence(0, len-w), i -> md5(substr(text, i+1,
  * w))))`, which allocates a substring + interpreted lambda frame per
  * position; this node walks the char windows once.
  */
case class RollingMinHash(child: Expression, width: Int)
    extends UnaryExpression with SketchCodegen {

  require(width > 0, s"width must be positive, got $width")

  override def prettyName: String = "graft_rolling_min"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val n = text.numChars()
    val md = SketchUtil.threadMd5()
    var min: Array[Byte] = null
    if (n < width) {
      min = md.digest(text.getBytes)
    } else {
      val bytes = text.getBytes
      if (bytes.length == n) {
        // ASCII fast path: char windows == byte windows, so slide directly
        // over the byte array and digest into two reusable 16-byte buffers
        // (zero allocation per gram; the naive path costs a UTF8String
        // substring + its byte copy + a fresh digest array per position).
        var best = new Array[Byte](16)
        var cur = new Array[Byte](16)
        var first = true
        var i = 0
        while (i <= n - width) {
          md.reset()
          md.update(bytes, i, width)
          md.digest(cur, 0, 16)
          if (first || SketchUtil.less(cur, best)) {
            val t = best; best = cur; cur = t
            first = false
          }
          i += 1
        }
        min = best
      } else {
        var i = 0
        while (i <= n - width) {
          md.reset()
          val d = md.digest(text.substringSQL(i + 1, width).getBytes)
          if (min == null || SketchUtil.less(d, min)) min = d
          i += 1
        }
      }
    }
    UTF8String.fromString(SketchUtil.hex(min))
  }

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

/** Whitespace tokenizer: the maximal runs of non-space bytes of a string,
  * as `array<string>` — exactly `filter(split(text, " +"), t -> t <> '')`
  * (the regex splits on 0x20 runs only, and the filter drops the empty
  * edge pieces, leaving precisely the non-space runs; differential-tested
  * against that formula).
  *
  * Why native: EVERY text operator starts from tokens, and the HOF
  * formula's `filter` is CodegenFallback — one fallback expression
  * blacklists its whole projection from whole-stage codegen, so the
  * tokenize step was silently dragging shingling/minhash/entropy
  * projections out of codegen. Byte-level scan (a UTF-8 continuation
  * byte can never equal 0x20, so the scan is multi-byte-safe); token
  * slices wrap the copied byte array without further copies.
  */
case class WsTokens(child: Expression)
    extends UnaryExpression with SketchCodegen {

  override def prettyName: String = "graft_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < n) {
      while (i < n && bytes(i) == 0x20) i += 1
      val start = i
      while (i < n && bytes(i) != 0x20) i += 1
      if (i > start) out.add(UTF8String.fromBytes(bytes, start, i - start))
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

/** Adjacent-token pairs joined with a single space — exactly
  * `zip_with(slice(toks, 1, n-1), slice(toks, 2, n-1),
  * (a, b) -> concat_ws(' ', a, b))` (the BPE merge-candidate step;
  * differential-tested against that formula). Native so the pair
  * projection stays inside whole-stage codegen (zip_with/slice are
  * CodegenFallback) and skips the two slice copies per row.
  */
case class AdjacentPairs(child: Expression)
    extends UnaryExpression with SketchCodegen {

  override def prettyName: String = "graft_pairs"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n <= 1) return new GenericArrayData(new Array[AnyRef](0))
    val out = new Array[AnyRef](n - 1)
    var i = 0
    while (i < n - 1) {
      // concat_ws semantics: null parts are skipped, not rendered
      val a = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      val b = if (toks.isNullAt(i + 1)) null else toks.getUTF8String(i + 1)
      val s =
        if (a == null && b == null) UTF8String.EMPTY_UTF8
        else if (a == null) b
        else if (b == null) a
        else UTF8String.concat(a, UTF8String.fromString(" "), b)
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): AdjacentPairs =
    copy(child = newChild)
}

/** Count of tokens contained in a fixed word set — exactly
  * `size(filter(toks, t -> t.isin(words)))` (differential-tested).
  * Native for the same codegen-blacklist reason as [[AdjacentPairs]]:
  * this term sits inside the quality-gate projection that fronts every
  * corpus-cleaning pass.
  */
case class TokenSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression with SketchCodegen {

  override def prettyName: String = "graft_token_set_count"
  override def dataType: DataType = LongType

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i) && set.contains(toks.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCount =
    copy(child = newChild)
}
