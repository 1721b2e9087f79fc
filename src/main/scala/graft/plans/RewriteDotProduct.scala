package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: recognizes the composable dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * (optionally with element-wise double casts via transform) and replaces it
  * with the native codegen'd [[DotProduct]] expression. Higher-order
  * functions evaluate interpreted (CodegenFallback), so users writing the
  * idiomatic composable form silently pay ~30× on O(n²) similarity joins;
  * after this rule they get the fused loop for free. Semantics are
  * identical: left-to-right double accumulation from 0.0.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  /** transform(v, x -> cast(x as double)) over a float/double array ⇒ v
    * (DotProduct casts per element itself). */
  private def stripDoubleCast(e: Expression): Option[Expression] = e match {
    case ArrayTransform(child,
        LambdaFunction(Cast(v: NamedLambdaVariable, DoubleType, _, _), Seq(arg: NamedLambdaVariable), _))
        if v.exprId == arg.exprId && isFloatOrDoubleArray(child) =>
      Some(child)
    case _ if isFloatOrDoubleArray(e) => Some(e)
    case _ => None
  }

  private def isFloatOrDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(0.0, DoubleType), DoubleType, _, _) => true
    case _ => false
  }

  /** (x, y) -> x * y with both lambda args used once, either order. */
  private def isPairwiseMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      Set(x.exprId, y.exprId) == Set(a.exprId, b.exprId)
    case _ => false
  }

  /** (acc, v) -> acc + v (either operand order). */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      Set(x.exprId, y.exprId) == Set(a.exprId, b.exprId)
    case _ => false
  }

  /** finish lambda is identity. */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(l, r, mul), zero, merge, finish)
          if isZero(zero) && isPairwiseMultiply(mul) && isSumMerge(merge) &&
            isIdentity(finish) =>
        (stripDoubleCast(l), stripDoubleCast(r)) match {
          case (Some(a), Some(b)) => DotProduct(a, b)
          case _ => ArrayAggregate(ZipWith(l, r, mul), zero, merge, finish)
        }
    }
}
