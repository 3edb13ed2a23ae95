package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSim, DotProduct, KernelRewrite}

/** SparkSessionExtensions entry point: makes the engine's custom Catalyst
  * expressions available to ANY session (SQL included) via
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or spark.sql.extensions=graft.GraftExtensions
  *
  * Ships the scalar kernels as SQL functions plus the `KernelRewrite`
  * optimizer rule that turns `VectorOps`' declarative HOF formulations
  * into those kernels automatically (a pure cost rewrite — bit-identical
  * results, pinned by `KernelRewriteSpec`). No custom SparkStrategy ships:
  * all relational operators map to built-ins (exact top-k already plans as
  * TakeOrderedAndProject; the IVF path is a query shape, not a plan
  * rewrite), per SURVEY.md §7.3.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    def binary(name: String, mk: (Expression, Expression) => Expression)
        (args: Seq[Expression]): Expression = {
      // a clear arity error instead of IndexOutOfBoundsException from
      // deep inside analysis (r11 review)
      require(args.length == 2,
        s"$name expects exactly 2 arguments (vecA, vecB), got ${args.length}")
      mk(args(0), args(1))
    }
    e.injectFunction((
      FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_f32"),
      binary("dot_f32", DotProduct.apply) _))
    e.injectFunction((
      FunctionIdentifier("cosine_f32"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_f32"),
      binary("cosine_f32", CosineSim.apply) _))
    e.injectOptimizerRule(_ => KernelRewrite)
  }
}
