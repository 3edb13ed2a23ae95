package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("fast kernels are bit-identical to the HOF versions on real float vectors") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val a = e.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val pairs = a.join(b, $"ia" < $"ib")
    val diff = pairs.select(
      VectorOps.dot($"va", $"vb").as("slow_dot"),
      VectorKernels.dotFast($"va", $"vb").as("fast_dot"),
      VectorOps.cosine($"va", $"vb").as("slow_cos"),
      VectorKernels.cosineFast($"va", $"vb").as("fast_cos"))
      .filter($"slow_dot" =!= $"fast_dot" || $"slow_cos" =!= $"fast_cos")
    assert(diff.count() === 0) // bitwise equality, not tolerance
  }

  test("null semantics mirror HOFs: dim mismatch and null elements → null") {
    val df = Seq(1).toDF("x")
    val mism = df.select(VectorKernels.dotFast(
      typedLit(Array(1.0, 2.0)), typedLit(Array(1.0, 2.0, 3.0))))
    assert(mism.head().isNullAt(0))
    val withNull = df.select(VectorKernels.dotFast(
      typedLit(Seq[java.lang.Double](1.0, null)), typedLit(Seq[java.lang.Double](1.0, 2.0))))
    assert(withNull.head().isNullAt(0))
  }

  test("zero-norm vector → null, matching the HOF's non-ANSI Divide (not NaN)") {
    val zero = typedLit(Array(0.0, 0.0, 0.0))
    val v = typedLit(Array(1.0, 2.0, 3.0))
    val df = Seq(1).toDF("x")
    // HOF formulation: Divide by 0.0 → NULL in default mode
    assert(df.select(VectorOps.cosine(zero, v)).head().isNullAt(0))
    // kernel must agree — NaN would sort FIRST in a descending top-k
    assert(df.select(VectorKernels.cosineFast(zero, v)).head().isNullAt(0))
    assert(df.select(VectorKernels.cosineFast(v, zero)).head().isNullAt(0))
    // dot of a zero vector is still 0.0, not null
    assert(df.select(VectorKernels.dotFast(zero, v)).head().getDouble(0) === 0.0)
  }

  test("mixed float/double inputs widen like the HOF cast") {
    val f = typedLit(Array(0.1f, 0.2f, 0.3f))
    val d = typedLit(Array(0.5, 0.25, 0.125))
    val got = Seq(1).toDF("x").select(
      VectorKernels.dotFast(f, d).as("fast"),
      VectorOps.dot(f, d).as("slow")).head()
    assert(got.getDouble(0) === got.getDouble(1))
  }

  test("SQL registration: dot_f32 / cosine_f32 callable from spark.sql") {
    VectorKernels.register(spark)
    val v = spark.sql("SELECT cosine_f32(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-15)
  }

  test("kernels participate in whole-stage codegen (no fallback)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = e.select(VectorKernels.cosineFast($"embedding", $"embedding").as("c"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen stage; the Project
    // holding cosine_f32 must carry it (a fallback would strip it)
    assert(plan.contains("*(1) Project [cosine_f32"), plan)
  }
}
