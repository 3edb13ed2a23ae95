package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Fused shingle hasher: tokens → DISTINCT 60-bit hashes of the n-gram
  * shingles, in one pass. Replaces the 4-operator interpreted pipeline
  * array_distinct(transform(sequence(...), i → array_join(slice(toks,i,n))))
  * + transform(·, md5-prefix) that allocated two intermediate string
  * arrays per row. Hash semantics are EXACTLY XHash.hash60 of the
  * space-joined shingle (md5 of UTF-8 bytes, first 15 hex chars), so the
  * DuckDB oracles hold unchanged; distinctness is by hash value, which
  * matches list_distinct-then-hash up to md5 collisions (~n²/2^61).
  *
  * eval-only expression (MessageDigest doesn't belong in generated Java
  * fragments); the parent projection stays codegen'd via CodegenFallback.
  */
case class ShingleHash60(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash60 requires ARRAY<STRING>, got ${dt.simpleString}")
  }

  private def hash60(bytes: Array[Byte]): Long =
    XHash.md5Prefix60(XHash.Md5.get().digest(bytes))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val t = arr.numElements()
    if (t < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= t - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (arr.isNullAt(i + j)) return null
        if (j > 0) sb.append(' ')
        sb.append(arr.getUTF8String(i + j).toString)
        j += 1
      }
      seen.add(hash60(sb.toString.getBytes("UTF-8")))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "shingle_hash60"
}

object ShingleHash60 {
  def apply(toks: Column, n: Int): Column =
    ColumnBridge.column(ShingleHash60(ColumnBridge.expression(toks), n))
}
