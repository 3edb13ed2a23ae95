package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.ArrayAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge

class KernelRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def hofDf = {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(3.0f, 2.0f, 1.0f))).toDF("a", "b")
    df.select(VectorOps.dot($"a", $"b").as("d"),
              VectorOps.cosine($"a", $"b").as("c"),
              VectorOps.normL2($"a").as("n"))
  }

  test("rule fuses HOF dot/norm/cosine into kernel expressions") {
    val before = hofDf.queryExecution.analyzed
    assert(before.expressions.flatMap(_.collect { case x: ArrayAggregate => x }).nonEmpty)
    val after = KernelRewrite(before)
    val dots = after.expressions.flatMap(_.collect { case x: DotProduct => x })
    val coss = after.expressions.flatMap(_.collect { case x: CosineSim => x })
    assert(coss.size === 1) // the whole cosine tree fused into ONE kernel
    assert(dots.size === 2) // plain dot + normL2's sum-of-squares as dot(a,a)
    assert(after.expressions.flatMap(_.collect { case x: ArrayAggregate => x }).isEmpty)
  }

  test("rewritten plan executes and is bit-identical to the HOF plan") {
    val hof = hofDf.collect()
    val rewritten = ColumnBridge
      .ofRows(spark, KernelRewrite(hofDf.queryExecution.analyzed)).collect()
    hof.zip(rewritten).foreach { case (h, r) =>
      (0 until 3).foreach { i =>
        assert(java.lang.Double.doubleToLongBits(h.getDouble(i)) ===
               java.lang.Double.doubleToLongBits(r.getDouble(i)))
      }
    }
  }

  test("non-matching aggregates are left alone") {
    // a different merge lambda (acc + 2*v) must NOT rewrite
    import org.apache.spark.sql.functions._
    val df = Seq(Array(1.0, 2.0)).toDF("a")
      .select(aggregate($"a", lit(0.0), (acc, v) => acc + v * 2.0).as("s"))
    val after = KernelRewrite(df.queryExecution.analyzed)
    assert(after.expressions.flatMap(_.collect { case x: DotProduct => x }).isEmpty)
    assert(after.expressions.flatMap(_.collect { case x: ArrayAggregate => x }).nonEmpty)
  }
}
