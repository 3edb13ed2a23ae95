package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSim, DotProduct}

/** SparkSessionExtensions entry point: makes the engine's custom Catalyst
  * expressions available to ANY session (SQL included) via
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or spark.sql.extensions=graft.GraftExtensions
  *
  * Per SURVEY.md §7.3 the only Catalyst-level custom work the reference's
  * semantics justify are these scalar kernels — all relational operators
  * map to built-ins, so no custom Rule/SparkStrategy ships by default
  * (exact top-k already plans as TakeOrderedAndProject; the IVF path is a
  * query shape, not a plan rewrite).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_f32"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_f32"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_f32"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
  }
}
