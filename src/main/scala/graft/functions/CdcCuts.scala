package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking boundaries (Rabin-Karp rolling hash), the
  * FastCDC-style dedup primitive for training corpora: chunk edges follow
  * CONTENT, not offsets, so an insertion early in a document shifts no
  * downstream chunk identity — byte-offset chunking would invalidate
  * every subsequent chunk hash.
  *
  * Emits the 1-indexed cut positions p (w ≤ p < length) where the
  * polynomial hash of the w-char window ending at p satisfies
  * h ≡ 0 (mod mask). Maintained as a rolling update
  * h ← (h·B + c_in − c_out·B^w) mod M — O(n) per document and, because
  * the arithmetic is exact integer math, identical to the O(n·w) Horner
  * re-computation the DuckDB oracle runs (q47). Eval-only expression
  * (CodegenFallback): sequential carry makes this a poor whole-stage
  * codegen citizen, and one virtual call per DOCUMENT is noise next to
  * the per-character loop inside.
  */
case class CdcCuts(child: Expression) extends UnaryExpression with CodegenFallback {

  private val W = 16
  private val B = 257L
  private val M = 1048573L // prime < 2^20; B*M < 2^63, no overflow
  private val Mask = 64L
  private lazy val bw: Long = { // B^W mod M
    var r = 1L; var i = 0
    while (i < W) { r = r * B % M; i += 1 }
    r
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_cuts requires STRING input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    // code POINTS, not UTF-16 units: DuckDB's unicode()/substr/length are
    // codepoint-based, so a non-BMP char (one codepoint, two Java chars)
    // must advance positions and hashes exactly once in both engines
    val cp = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cp.length
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (n >= W) {
      var h = 0L
      var i = 0
      while (i < W) { h = (h * B + cp(i)) % M; i += 1 }
      // i is now the 0-indexed position AFTER the first window; 1-indexed
      // window end p = i. Cuts allowed at w <= p < n (never after the
      // final char — the tail is always its own chunk).
      var p = W
      if (h % Mask == 0L && p < n) cuts += p
      while (p < n) {
        val cIn = cp(p).toLong
        val cOut = cp(p - W).toLong
        h = ((h * B + cIn - cOut * bw % M) % M + M) % M
        p += 1
        if (h % Mask == 0L && p < n) cuts += p
      }
    }
    new GenericArrayData(cuts.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "cdc_cuts"
}

object CdcCuts {
  def apply(c: Column): Column = ColumnBridge.column(CdcCuts(ColumnBridge.expression(c)))
}
