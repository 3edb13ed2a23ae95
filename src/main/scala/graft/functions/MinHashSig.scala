package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Fused MinHash signature kernel: all n permutations
  * min_i((a_j·h_i + b_j) mod p) computed in ONE pass over the hashed
  * shingle array. The HOF formulation (n × array_min(transform(...)))
  * re-walks the array once per permutation through interpreted lambdas —
  * the dominant cost of the LSH dedup queries at bench scale. Formula and
  * constants are identical (p = 2^31−1; XHash.permParams), so the DuckDB
  * oracles hold unchanged.
  *
  * Null semantics: null array → null; null element → null (mirrors
  * array_min over a transform that would yield null).
  */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression {

  private val P = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<BIGINT>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val p = (as(j) * h + bs(j)) % P
        if (p < mins(j)) mins(j) = p
        j += 1
      }
      i += 1
    }
    if (n == 0) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aArr = ctx.addReferenceObj("as", as.toArray, "long[]")
    val bArr = ctx.addReferenceObj("bs", bs.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val mins = ctx.freshName("mins"); val h = ctx.freshName("h"); val p = ctx.freshName("p")
      s"""
         |int $n = $c.numElements();
         |int $k = $aArr.length;
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $h = $c.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $p = ($aArr[$j] * $h + $bArr[$j]) % ${P}L;
         |      if ($p < $mins[$j]) $mins[$j] = $p;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** Column wrapper: signature array for the standard n permutations. */
  def apply(h31: Column, nPerms: Int): Column = {
    val perms = XHash.permParams(nPerms)
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(h31), perms.map(_._1), perms.map(_._2)))
  }
}
