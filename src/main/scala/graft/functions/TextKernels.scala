package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text kernels replacing the hot regexp formulations.
  *
  * Measured motivation (AbQ72, sf1, 50k docs × ~300 chars = 15 MB): one
  * `regexp_replace` chain costs ~1.7 s WALL across 32 threads — ~50
  * core-seconds, i.e. ~1.7 µs/char of Matcher/StringBuffer/UTF8String↔
  * String conversion overhead — for work a byte scan does in ~0.05
  * core-seconds. The tokenizer (`split` + HOF filter) is the same story
  * and sits under dozens of queries (shingles, BM25, quality, langid…).
  *
  * Each kernel is BIT-IDENTICAL to the column formulation it replaces —
  * `TextKernelsSpec` proves equality against the original expressions on
  * adversarial and random inputs, and the DuckDB oracles (which still
  * state the regex semantics) stay green:
  *
  *  - case mapping delegates to `UTF8String.toLowerCase` (exactly
  *    Spark's `lower()`), so Unicode one-offs (Kelvin sign → k, …)
  *    cannot diverge; the scans after it are pure ASCII-byte classes, and
  *    UTF-8 continuation bytes (≥ 0x80) are never in [a-z0-9] — so
  *    byte-runs equal char-runs for every class used here;
  *  - Java's `\s` without UNICODE_CHARACTER_CLASS is exactly
  *    [ \t\n\x0B\f\r] — ASCII-only, mirrored literally;
  *  - codepoint counts come from skipping continuation bytes, matching
  *    `length()` = UTF8String.numChars.
  */
object TextKernelsImpl {

  @inline private def isAlnum(c: Byte): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  @inline private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'

  /** tokens: filter(split(lower(text), "[^a-z0-9]+"), len > 0) —
    * maximal [a-z0-9] byte runs of the lowercased text, in order. */
  def tokens(t: UTF8String): GenericArrayData = {
    val b = t.toLowerCase.getBytes
    val n = b.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var i = 0
    while (i < n) {
      if (isAlnum(b(i))) {
        var j = i + 1
        while (j < n && isAlnum(b(j))) j += 1
        val tok = new Array[Byte](j - i)
        System.arraycopy(b, i, tok, 0, j - i)
        out += UTF8String.fromBytes(tok)
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** punctRatio: codepoints outside [a-zA-Z0-9\s] / codepoints (0.0 when
    * empty). The raw (un-lowered) text, matching the original. */
  def punctRatio(t: UTF8String): Double = {
    val b = t.getBytes
    var total = 0
    var punct = 0
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if ((c & 0xc0) != 0x80) { // lead byte → one codepoint
        total += 1
        val inClass = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || isWs(c)
        if (!inClass) punct += 1 // multi-byte leads are ≥ 0xC0 → here
      }
      i += 1
    }
    if (total == 0) 0.0 else punct.toDouble / total
  }

  /** normalize: trim(regexp_replace(regexp_replace(lower(text),
    * "[^a-z0-9 ]+", " "), " +", " ")) — every maximal run of
    * non-[a-z0-9] chars (spaces included) becomes one interior space. */
  def normalize(t: UTF8String): UTF8String = {
    val b = t.toLowerCase.getBytes
    val n = b.length
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = b(i)
      if (isAlnum(c)) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = c; o += 1
      } else pendingSpace = true // any other byte joins the space run
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  private val HexDigits = "0123456789abcdef".getBytes

  /** fingerprint: md5(trim(regexp_replace(lower(text), "\\s+", " "))) —
    * \s runs collapse to one interior space, then lowercase-hex md5. */
  def fingerprint(t: UTF8String): UTF8String = {
    val b = t.toLowerCase.getBytes
    val n = b.length
    val norm = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = b(i)
      if (isWs(c)) pendingSpace = true
      else {
        if (pendingSpace && o > 0) { norm(o) = ' '; o += 1 }
        pendingSpace = false
        norm(o) = c; o += 1
      }
      i += 1
    }
    val d = XHash.Md5.get().digest(java.util.Arrays.copyOf(norm, o))
    val hex = new Array[Byte](32)
    i = 0
    while (i < 16) {
      hex(2 * i) = HexDigits((d(i) & 0xf0) >>> 4)
      hex(2 * i + 1) = HexDigits(d(i) & 0x0f)
      i += 1
    }
    UTF8String.fromBytes(hex)
  }
}

/** Shared scaffolding: a unary string-input kernel expression whose eval
  * and codegen both route through one TextKernelsImpl static. */
abstract class TextKernel extends UnaryExpression {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.simpleString}")
  }
  /** TextKernelsImpl method name (also the SQL-visible prettyName). */
  protected def impl: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernelsImpl.$impl($a);")
}

case class TokensKernel(child: Expression) extends TextKernel {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override protected def impl: String = "tokens"
  override protected def nullSafeEval(v: Any): Any =
    TextKernelsImpl.tokens(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "tokens_k"
}

case class PunctRatioKernel(child: Expression) extends TextKernel {
  override def dataType: DataType = DoubleType
  override protected def impl: String = "punctRatio"
  override protected def nullSafeEval(v: Any): Any =
    TextKernelsImpl.punctRatio(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "punct_ratio_k"
}

case class NormalizeTextKernel(child: Expression) extends TextKernel {
  override def dataType: DataType = StringType
  override protected def impl: String = "normalize"
  override protected def nullSafeEval(v: Any): Any =
    TextKernelsImpl.normalize(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "normalize_k"
}

case class FingerprintKernel(child: Expression) extends TextKernel {
  override def dataType: DataType = StringType
  override protected def impl: String = "fingerprint"
  override protected def nullSafeEval(v: Any): Any =
    TextKernelsImpl.fingerprint(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "fingerprint_k"
}

object TextKernels {
  def tokens(text: Column): Column =
    ColumnBridge.column(TokensKernel(ColumnBridge.expression(text)))
  /** DRIVER-SIDE twin of the `tokens` column kernel — same
    * TextKernelsImpl.tokens byte-run pass, so a query-literal term set
    * built on the driver can never desynchronize from the corpus-side
    * tokenization (r14 advice: BM25's pre-explode membership filter
    * hand-rolled `toLowerCase.split` in parallel with the kernel; any
    * future divergence would silently drop tf rows while the qterms
    * join still matched). One tokenizer, both sides —
    * `TextKernelsSpec` pins local/column agreement. */
  def tokensLocal(text: String): Seq[String] =
    TextKernelsImpl.tokens(UTF8String.fromString(text))
      .array.toSeq.map(_.toString)
  def punctRatio(text: Column): Column =
    ColumnBridge.column(PunctRatioKernel(ColumnBridge.expression(text)))
  def normalize(text: Column): Column =
    ColumnBridge.column(NormalizeTextKernel(ColumnBridge.expression(text)))
  def fingerprint(text: Column): Column =
    ColumnBridge.column(FingerprintKernel(ColumnBridge.expression(text)))
}
