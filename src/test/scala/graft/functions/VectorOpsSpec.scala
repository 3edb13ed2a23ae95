package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.cast("double")).head().getDouble(0)

  test("dot product") {
    val c = VectorOps.dot(typedLit(Array(1.0, 2.0, 3.0)), typedLit(Array(4.0, 5.0, 6.0)))
    assert(one(c) === 32.0)
  }

  test("cosine: self-similarity is 1, orthogonal is 0") {
    val v = typedLit(Array(0.5, -0.25, 2.0))
    assert(math.abs(one(VectorOps.cosine(v, v)) - 1.0) < 1e-12)
    val a = typedLit(Array(1.0, 0.0))
    val b = typedLit(Array(0.0, 3.0))
    assert(one(VectorOps.cosine(a, b)) === 0.0)
  }

  test("cosine symmetry on float arrays") {
    val a = typedLit(Array(0.1f, 0.7f, -0.3f))
    val b = typedLit(Array(0.9f, -0.2f, 0.4f))
    assert(one(VectorOps.cosine(a, b)) === one(VectorOps.cosine(b, a)))
  }

  test("l2Normalize: unit norm; zero vector stays zero") {
    val n = one(VectorOps.normL2(VectorOps.l2Normalize(typedLit(Array(3.0, 4.0)))))
    assert(math.abs(n - 1.0) < 1e-12)
    val z = Seq(1).toDF("x")
      .select(VectorOps.l2Normalize(typedLit(Array(0.0, 0.0))).as("v"))
      .head().getSeq[Double](0)
    assert(z === Seq(0.0, 0.0))
  }

  test("distSq") {
    assert(one(VectorOps.distSq(typedLit(Array(1.0, 2.0)), typedLit(Array(4.0, 6.0)))) === 25.0)
  }
}
