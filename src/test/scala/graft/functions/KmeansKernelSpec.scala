package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._

/** Bit-identity proof for the k-means kernels: CellArgMin (assignment)
  * and SqDist (probe distance) must equal the HOF formulations they
  * replaced — same index-order fold, Spark Round semantics
  * (BigDecimal.valueOf, HALF_UP), first-min tiebreak in matrix order —
  * on seeded random vectors including exact-tie and duplicate-centroid
  * cases. The q67/q73/q85/q88/q12 oracles still state the HOF
  * semantics, so this equality keeps the gates green.
  */
class KmeansKernelSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val rnd = new scala.util.Random(20260814L)
  private def qvec(): Seq[Double] =
    Seq.fill(dim)(math.floor(rnd.nextDouble() * 2e6 - 1e6 + 0.5)) // ×1e6-quantized ints

  private val cents: Seq[(Long, Seq[Double])] = {
    val base = Seq.tabulate(7)(i => i.toLong * 2 -> qvec())
    base :+ (99L -> base(3)._2) // duplicate centroid → exact tie, first wins
  }
  private val vecs: Seq[(Long, Seq[Double])] =
    Seq.tabulate(300)(i => i.toLong -> (if (i % 17 == 0) cents(i % 8)._2 else qvec()))

  private val scale = 1e12

  test("CellArgMin == transform/array_min/array_position HOF assignment") {
    val df = vecs.toDF("vec_id", "qv")
    val kernel = graft.vector.IvfKMeans.assignCells(df, "qv", cents, scale)
      .select(col("vec_id"), col("cell"), col("dist6"))
    val matrix = cents.map(_._2)
    val cells = cents.map(_._1)
    val hof = df.withColumn("dists", transform(typedLit(matrix), cv =>
        round(
          aggregate(
            zip_with(col("qv").cast("array<double>"), cv,
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, t) => acc + t) / lit(scale),
          6)))
      .withColumn("dist6", array_min(col("dists")))
      .withColumn("cell",
        element_at(typedLit(cells), expr("array_position(dists, dist6)").cast("int")))
      .select(col("vec_id"), col("cell"), col("dist6"))
    val k = kernel.orderBy("vec_id").collect()
    val h = hof.orderBy("vec_id").collect()
    k.zip(h).foreach { case (a, b) =>
      assert(a === b, s"assignment diverged: kernel=$a hof=$b")
    }
  }

  test("SqDist == aggregate(zip_with) squared-distance fold") {
    val pairs = Seq.tabulate(200)(i => (i.toLong, qvec(), qvec()))
    val df = pairs.toDF("id", "a", "b")
    val rows = df.select(
      VectorKernels.sqDistFast(col("a"), col("b")).as("k"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, t) => acc + t).as("h")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("CellArgMin on non-finite distances returns NULL struct (intended)") {
    // All-NaN distances: the retired HOF returned (NaN, first cell); the
    // kernel's strict `v < best` never updates → NULL assignment. Scoped
    // divergence, unreachable with the trainer's quantized finite inputs —
    // pinned here so the intent is explicit (ADVICE r10).
    val nanVec = ArrayData.toArrayData(Array.fill(dim)(Double.NaN))
    val matrix = cents.map(_._2.toArray).toArray
    val cells = cents.map(_._1).toArray
    assert(CellArgMinImpl.assign(nanVec, matrix, cells, scale) === null)
    // a single finite-distance centroid still wins over NaN siblings
    val fin = vecs(1)._2.toArray
    val mixed = Array(Array.fill(dim)(Double.NaN), fin)
    val got = CellArgMinImpl.assign(ArrayData.toArrayData(fin), mixed,
      Array(7L, 9L), scale)
    assert(got !== null)
    assert(got.getLong(1) === 9L)
    assert(got.getDouble(0) === 0.0)
  }

  test("CellArgMin CODEGEN path surfaces the no-finite-min case as SQL NULL (r11)") {
    // the interpreted path returned NULL while the generated code left
    // ev.isNull false and NPE'd downstream — drive the expression through
    // a real (whole-stage-codegen) plan with a NaN row mixed in
    val rows = Seq(
      (1L, Seq.fill(dim)(Double.NaN)),
      (2L, vecs(1)._2)
    ).toDF("vec_id", "qv")
    val got = graft.vector.IvfKMeans.assignCells(rows, "qv", cents, scale)
      .select(col("vec_id"), col("cell"))
      .orderBy("vec_id").collect()
    assert(got(0).isNullAt(1), "all-NaN row must assign to NULL, not crash")
    assert(!got(1).isNullAt(1), "finite row still assigns")
  }

  test("round6 matches Spark's round(x, 6) on adversarial doubles") {
    val xs = Seq(0.1234565, 0.12345649999, 1.0 / 3.0, 2.5e-7, -0.1234565,
      123456.789012345, 1e-13, 0.9999995) ++ Seq.fill(200)(rnd.nextDouble())
    val sparkRounded = xs.toDF("x").select(round(col("x"), 6)).collect().map(_.getDouble(0))
    xs.zip(sparkRounded).foreach { case (x, expect) =>
      assert(CellArgMinImpl.round6(x) === expect, s"round6($x)")
    }
  }
}
