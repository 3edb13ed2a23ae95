package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static helpers for the k-means assignment kernel (top-level object →
  * static forwarders callable from generated Java). */
object CellArgMinImpl {

  /** Spark's `round(x, 6)`: string-based BigDecimal (valueOf), HALF_UP —
    * NOT scala.BigDecimal(d), which is the exact binary value and can
    * round differently on ties. Non-finite passes through unchanged,
    * exactly like Spark's Round (BigDecimal.valueOf THROWS on NaN/Inf —
    * surfaced by the KmeansKernelSpec non-finite case, ADVICE r10). */
  @inline def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Σ(a_i − b_i)² in index order — the exact fold of
    * aggregate(zip_with(a, b, (x,y) → (x−y)·(x−y)), 0.0, acc + t). */
  def sqdist(a: ArrayData, b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < b.length) { val t = a.getDouble(i) - b(i); s += t * t; i += 1 }
    s
  }

  /** argmin over the centroid matrix with first-min tiebreak (the
    * array_position contract): returns (dist6, cell) as an InternalRow.
    * Per-centroid value = round6(sqdist / scale), matching the staged
    * `dists` array the HOF formulation built. */
  def assign(vec: ArrayData, matrix: Array[Array[Double]], cells: Array[Long],
             scale: Double): InternalRow = {
    var best = Double.PositiveInfinity
    var bestIdx = -1
    var k = 0
    while (k < matrix.length) {
      // dim-mismatched centroid → null dists entry in the HOF form,
      // which array_min skipped; skip it here too (unreachable when the
      // V4 dim check holds).
      // NaN edge (also unreachable — the trainer feeds ×1e6-quantized
      // FINITE inputs): with all-NaN distances the HOF form returned
      // (NaN, first cell) via array_min/array_position, whereas the
      // strict `v < best` below never updates and yields a NULL struct.
      // NULL-on-no-finite-min is the kernel's intended semantics — a row
      // whose distances are all undefined has no assignment — so the
      // bit-identity claim is scoped to finite inputs (KmeansKernelSpec
      // pins the non-finite behavior; writing that spec also surfaced
      // that the unguarded round6 THREW on NaN — now it passes
      // non-finite through like Spark's Round).
      if (vec.numElements() == matrix(k).length) {
        val v = round6(sqdist(vec, matrix(k)) / scale)
        if (v < best) { best = v; bestIdx = k } // strict: FIRST min wins
      }
      k += 1
    }
    if (bestIdx < 0) null
    else new GenericInternalRow(Array[Any](best, cells(bestIdx)))
  }
}

/** cell_argmin(vec): one codegen'd pass replacing assignCells' HOF tree
  * (`transform(typedLit(matrix), cv → round(aggregate(zip_with(…)))…)` +
  * array_min + array_position) — that shape evaluates k·(2·dim)
  * interpreted lambda calls per row, which the adaptive nlist (n/250
  * cells) turned into the dominant trainer cost. Bit-identical by
  * construction: same index-order fold, Spark Round semantics, first-min
  * tiebreak in centroid-matrix order (KmeansKernelSpec + byte-equal
  * family dumps at both gate scales are the proof).
  */
case class CellArgMin(child: Expression, matrix: Array[Array[Double]],
                      cells: Array[Long], scale: Double)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("dist6", DoubleType, nullable = false),
    StructField("cell", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    CellArgMinImpl.assign(v.asInstanceOf[ArrayData], matrix, cells, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("matrix", matrix, "double[][]")
    val cRef = ctx.addReferenceObj("cells", cells, "long[]")
    // assign() returns null for a no-finite-min row (all-NaN / no
    // dim-matched centroid); the generated code must surface that as
    // SQL NULL — without the isNull assignment the interpreted path
    // returned NULL while codegen NPE'd downstream (r11 review)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CellArgMinImpl.assign($a, $mRef, $cRef, $scale); " +
        s"${ev.isNull} = ${ev.value} == null;")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "cell_argmin"

  // the matrix is part of the expression identity (Array equality is
  // reference-based, which breaks plan canonicalization) — compare by value
  override def equals(o: Any): Boolean = o match {
    case CellArgMin(c, m, cs, s) =>
      c == child && s == scale && cs.sameElements(cells) &&
        m.length == matrix.length && m.indices.forall(i => m(i).sameElements(matrix(i)))
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.lang.Double.valueOf(scale),
      Integer.valueOf(matrix.length), Integer.valueOf(cells.length))
}
