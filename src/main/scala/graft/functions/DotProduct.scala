package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions.lit

/** Codegen'd vector kernels (SURVEY.md §7.3's "custom Expression with
  * doGenCode — the only perf-critical one").
  *
  * The HOF formulation (zip_with + aggregate) is semantically right but
  * evaluates one interpreted lambda call per element — the dominant cost
  * in k-NN joins (millions of pairs × dim). These expressions run one
  * fused primitive loop per pair over Tungsten ArrayData with zero boxing,
  * and produce BIT-IDENTICAL results to VectorOps' HOF versions (same
  * left-to-right double accumulation, same float→double widening), so the
  * DuckDB oracles hold unchanged.
  *
  * Null semantics mirror the HOF versions: null array, mismatched
  * lengths, or a null element → null result.
  */
abstract class VectorKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  protected def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** java source fragment reading element i of `arr` as double */
  protected def getJ(arr: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double)$arr.getFloat($i)" else s"$arr.getDouble($i)"

  protected def hasNulls(a: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }
}

/** dot(a, b) = Σ a_i * b_i, left-to-right. */
case class DotProduct(left: Expression, right: Expression) extends VectorKernel {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements() || hasNulls(a, n) || hasNulls(b, n)) return null
    var sum = 0.0
    var i = 0
    while (i < n) { sum += get(a, i, leftIsFloat) * get(b, i, rightIsFloat); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ${getJ(a, i, leftIsFloat)} * ${getJ(b, i, rightIsFloat)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "dot_f32"
}

/** cosine(a, b) = Σab / (√Σaa · √Σbb) — one fused pass computes all three
  * accumulators (the HOF version takes three passes; values identical
  * because the accumulators are independent and each is sequential). */
case class CosineSim(left: Expression, right: Expression) extends VectorKernel {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements() || hasNulls(a, n) || hasNulls(b, n)) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, leftIsFloat); val y = get(b, i, rightIsFloat)
      ab += x * y; aa += x * x; bb += y * y; i += 1
    }
    // HOF formulation is Divide(dot, norm*norm), and non-ANSI Divide
    // returns NULL on a 0.0 divisor — a zero-norm vector must yield null
    // here too, not 0/0 = NaN (NaN sorts FIRST in a descending top-k,
    // null last; the bit-identity contract covers the degenerate case)
    val denom = math.sqrt(aa) * math.sqrt(bb)
    if (denom == 0.0) null else ab / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ab = ctx.freshName("ab"); val aa = ctx.freshName("aa"); val bb = ctx.freshName("bb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = ${getJ(a, i, leftIsFloat)};
         |    double $y = ${getJ(b, i, rightIsFloat)};
         |    $ab += $x * $y; $aa += $x * $x; $bb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    double $denom = java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb);
         |    if ($denom == 0.0D) { ${ev.isNull} = true; } else { ${ev.value} = $ab / $denom; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_f32"
}

/** sign_pack(vec, off): a 32-bit binary-quantization code word — bit i
  * set when vec[off + i] > 0 (q94's 1-bit-per-dim codes). On dense
  * in-range arrays, bit-identical to the aggregate-HOF formulation it
  * replaces (Σ 2^i over positive dims: distinct powers of two sum
  * exactly in double before the BIGINT cast) but one codegen'd loop
  * instead of 32 interpreted lambda steps per row — the measured
  * dominant cost of q94. DEGENERATE inputs diverge from the HOF: the
  * old CASE treated a null/missing element as contributing 0, while
  * sign_pack returns NULL for a null array, a null element, or an array
  * shorter than off+32 (VectorKernel semantics) — and TopKAgg's
  * null-skip then drops that row from the Hamming scan. q94's
  * embeddings are dense 64-dim (TextEmbed emits no nulls; dim checked
  * at insert), so the difference is unreachable there; any new caller
  * with sparse vectors must pre-coalesce.
  */
case class SignPack(child: Expression, off: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${other.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (off + 32 > a.numElements()) return null
    var bits = 0L
    var i = 0
    while (i < 32) {
      val j = off + i
      if (a.isNullAt(j)) return null
      val x = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
      if (x > 0.0) bits |= (1L << i)
      i += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val bits = ctx.freshName("bits")
      val x = ctx.freshName("x")
      val getX =
        if (isFloat) s"(double)$a.getFloat($off + $i)" else s"$a.getDouble($off + $i)"
      s"""
         |if ($off + 32 > $a.numElements()) { ${ev.isNull} = true; } else {
         |  long $bits = 0L;
         |  for (int $i = 0; $i < 32; $i++) {
         |    if ($a.isNullAt($off + $i)) { ${ev.isNull} = true; break; }
         |    double $x = $getX;
         |    if ($x > 0.0D) { $bits |= (1L << $i); }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $bits; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "sign_pack"
}

/** sqdist(a, b) = Σ (a_i − b_i)², left-to-right — the exact fold of
  * aggregate(zip_with(a, b, (x,y) → (x−y)·(x−y)), 0.0, acc + t), fused
  * into one codegen'd loop (the k-means probe/assignment distance). */
case class SqDist(left: Expression, right: Expression) extends VectorKernel {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements() || hasNulls(a, n) || hasNulls(b, n)) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      val t = get(a, i, leftIsFloat) - get(b, i, rightIsFloat)
      sum += t * t; i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val t = ctx.freshName("t")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $t = ${getJ(a, i, leftIsFloat)} - ${getJ(b, i, rightIsFloat)};
         |    $sum += $t * $t;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "sqdist_f32"
}

object VectorKernels {
  /** Column wrappers (fast path; bit-identical to VectorOps.dot/cosine). */
  def dotFast(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sqDistFast(a: Column, b: Column): Column =
    ColumnBridge.column(SqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def cosineFast(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Fast dot against a driver-side query vector. */
  def dotFast(a: Column, q: Array[Double]): Column = dotFast(a, lit(q))

  /** 32-bit sign-quantization code word starting at `off` (see SignPack). */
  def signPack(vec: Column, off: Int): Column =
    ColumnBridge.column(SignPack(ColumnBridge.expression(vec), off))

  /** Register as SQL functions (`SELECT dot_f32(a, b)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f32", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_f32", exprs => CosineSim(exprs(0), exprs(1)), "built-in")
  }
}
