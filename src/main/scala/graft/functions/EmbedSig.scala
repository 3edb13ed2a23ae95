package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[EmbedSig]] — a top-level object so Scala emits
  * static forwarders that generated Java (Janino) can call directly.
  *
  * One imperative pass replaces the staged HOF pipeline of
  * `TextEmbed.withEmbedFromTokens`: the old shape evaluated, PER ROW, a
  * `transform(sequence(0, dim-1))` whose body FILTERED the whole bucket
  * array per output dimension — O(dim · tokens) interpreted lambda calls
  * plus an md5 → hex-string → conv(…,16,10) → cast chain per token. This
  * kernel is O(tokens + dim) with the 60-bit hash taken straight from the
  * digest bytes (first 15 hex chars ≡ bytes 0..6 plus the high nibble of
  * byte 7 — same value `conv(substring(md5(t),1,15),16,10)` parses).
  *
  * BIT-IDENTICAL to the HOF pipeline and to `TextEmbed.embedScala` (the
  * TextEmbedSpec equality test is the proof):
  *  - bucket accumulation sums ±1.0 — small integers in double, exact
  *    regardless of order, so interleaving token/prefix is safe;
  *  - v[i] = signum(s)·√|s| and the norm accumulate in index order 0..dim,
  *    matching both the HOF's aggregate fold and embedScala's loops;
  *  - null tokens are dropped (the HOF's `!isin` filter yields null →
  *    filtered), empty tokens are KEPT (ditto), stopwords dropped.
  */
object EmbedSigKernel {
  private val StopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    TextEmbed.Stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  private def addToken(signed: Array[Double],
                       digest: java.security.MessageDigest,
                       bytes: Array[Byte], dim: Int): Unit = {
    val h = XHash.md5Prefix60(digest.digest(bytes)) // digest() resets
    val sign = if (((h >> 8) & 1L) == 1L) 1.0 else -1.0
    signed((h % dim).toInt) += sign
  }

  def compute(toks: ArrayData, dim: Int): ArrayData = {
    val n = toks.numElements()
    val signed = new Array[Double](dim)
    val digest = XHash.Md5.get()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        if (!StopSet.contains(t)) {
          val b = t.getBytes
          addToken(signed, digest, b, dim)
          // 5-char prefix feature; substring counts chars like substring()
          if (t.numChars() > 5) addToken(signed, digest, t.substring(0, 5).getBytes, dim)
          else addToken(signed, digest, b, dim)
        }
      }
      i += 1
    }
    val v = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      val s = signed(j)
      v(j) = math.signum(s) * math.sqrt(math.abs(s))
      j += 1
    }
    var sq = 0.0
    j = 0
    while (j < dim) { sq += v(j) * v(j); j += 1 }
    val norm = math.sqrt(sq)
    if (norm != 0.0) {
      j = 0
      while (j < dim) { v(j) = v(j) / norm; j += 1 }
    }
    new GenericArrayData(v)
  }
}

/** embed_sig(toks, dim): the deterministic signed-feature-hashing text
  * embedding (TextEmbed's contract) as ONE codegen'd expression — see
  * [[EmbedSigKernel]] for the semantics and the bit-identity argument.
  */
case class EmbedSig(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    EmbedSigKernel.compute(v.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.EmbedSigKernel.compute($a, $dim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "embed_sig"
}
