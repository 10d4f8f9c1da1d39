package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.DotProduct

/** Optimizer rule: rewrite the portable higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the fused codegen'd [[graft.functions.DotProduct]] expression.
  *
  * The HOF form ([[graft.ops.VectorOps.dotHof]]) is the semantic
  * definition any Spark user can write, but it allocates an
  * intermediate zipped array per row and evaluates two lambdas per
  * element; the fused expression is one tight loop inside
  * WholeStageCodegen. Both fold left-to-right over the same element
  * order and IEEE addition of two terms is commutative, so the
  * rewrite is bitwise result-preserving — which is what licenses an
  * optimizer rule rather than an API: users keep writing the
  * portable form and every session with [[graft.GraftExtensions]]
  * (or `experimental.extraOptimizations`) gets the fused plan.
  *
  * The guards are deliberately narrow: double-literal zero, a
  * multiply of exactly the two zip-lambda variables, an add of
  * exactly the two merge-lambda variables, an identity finish
  * lambda, and array<float|double> inputs — anything else is left
  * untouched.
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def vectorTyped(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  private def sameVars(l: Expression, r: Expression,
                       a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    (l, r) match {
      case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
        Set(x.exprId, y.exprId) == Set(a.exprId, b.exprId)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(ml, mr, _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          zero @ Literal(_, DoubleType),
          LambdaFunction(Add(al, ar, _),
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
        if zero.value == 0.0 &&
          sameVars(ml, mr, x, y) && sameVars(al, ar, acc, el) &&
          fin.exprId == fv.exprId &&
          vectorTyped(a) && vectorTyped(b) =>
        DotProduct(a, b)
    }
}
