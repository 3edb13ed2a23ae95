package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrites the declarative HOF vector math of
  * `VectorOps` into the fused codegen kernels of `DotProduct`/`CosineSim`.
  *
  * Users write the Spark-idiomatic formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`); this rule swaps in the
  * one-pass primitive loop, which is bit-identical by construction (same
  * left-to-right double accumulation, same float→double widening — pinned
  * by `DotProductSpec`), so it is a pure physical-cost rewrite, exactly
  * what a Catalyst optimizer rule may do. Three shapes:
  *
  *   1. dot:    aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (s,v) => s+v)  → dot_f32(a, b)
  *   2. norm²:  aggregate(a, 0.0, (s,x) => s + x*x)                         → dot_f32(a, a)
  *   3. cosine: dot_f32(a,b) / (sqrt(dot_f32(a,a)) * sqrt(dot_f32(b,b)))    → cosine_f32(a, b)
  *
  * (3) matches the OUTPUT of (1)+(2), so a single bottom-up expression
  * transform fuses the full `VectorOps.cosine` tree in one pass. Registered
  * via `GraftExtensions.injectOptimizerRule` — part of the operator
  * optimization fixpoint, so it composes with cast simplification etc.
  */
object KernelRewrite extends Rule[LogicalPlan] {

  private def isVec(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** `asD` wraps inputs in a cast to array<double>; the kernels widen
    * float elements themselves, so the cast (a per-row array copy) can go. */
  private def strip(e: Expression): Expression = e match {
    case Cast(c, ArrayType(DoubleType, _), _, _) if isVec(c.dataType) => c
    case other => other
  }

  private def sameVar(a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    a.exprId == b.exprId

  /** finish lambda of functions.aggregate's 3-arg form: x => x */
  private def identityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      sameVar(v, arg)
    case _ => false
  }

  private object ZeroD {
    def unapply(e: Expression): Boolean = e match {
      case Literal(v, DoubleType) => v == 0.0
      case _ => false
    }
  }

  /** aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (s,v) => s+v) */
  private object DotShape {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                Seq(xa: NamedLambdaVariable, ya: NamedLambdaVariable), _)),
            ZeroD(),
            LambdaFunction(Add(s: NamedLambdaVariable, v: NamedLambdaVariable, _),
              Seq(sa: NamedLambdaVariable, va: NamedLambdaVariable), _),
            finish)
          if sameVar(x, xa) && sameVar(y, ya) && sameVar(s, sa) && sameVar(v, va) &&
            identityFinish(finish) && isVec(strip(a).dataType) && isVec(strip(b).dataType) =>
        Some((strip(a), strip(b)))
      case _ => None
    }
  }

  /** aggregate(a, 0.0, (s,x) => s + x*x) — normL2 without the sqrt */
  private object SumSqShape {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayAggregate(a, ZeroD(),
            LambdaFunction(
              Add(s: NamedLambdaVariable,
                Multiply(x1: NamedLambdaVariable, x2: NamedLambdaVariable, _), _),
              Seq(sa: NamedLambdaVariable, xa: NamedLambdaVariable), _),
            finish)
          if sameVar(s, sa) && sameVar(x1, xa) && sameVar(x2, xa) &&
            identityFinish(finish) && isVec(strip(a).dataType) =>
        Some(strip(a))
      case _ => None
    }
  }

  // one bottom-up pass per plan node (transformAllExpressions +
  // per-expression transformUp would redo the full subtree rewrite at
  // every enclosing node — quadratic for nothing)
  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p => p.transformExpressionsUp {
      case DotShape(a, b) => DotProduct(a, b)
      case SumSqShape(a) => DotProduct(a, a)
      case Divide(DotProduct(a1, b1),
            Multiply(Sqrt(DotProduct(a2, a3)), Sqrt(DotProduct(b2, b3)), _), _)
          if a1.semanticEquals(a2) && a1.semanticEquals(a3) &&
            b1.semanticEquals(b2) && b1.semanticEquals(b3) =>
        CosineSim(a1, b1)
    }
  }
}
