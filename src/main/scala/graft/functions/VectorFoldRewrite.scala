package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the portable higher-order-function
  * formulation of embedding arithmetic into the native codegen'd
  * expressions.
  *
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d,
  * (acc, v) -> acc + v)` is the formulation any Spark user (or SQL
  * port from another engine) writes for a dot product — and it runs
  * as an interpreted `CodegenFallback` with an intermediate array per
  * row. This rule recognizes that exact fold (and its `transform`
  * twin for the squared norm) over `array<float>` columns and
  * replaces it with [[VectorExpressions.DotProductF]] /
  * [[VectorExpressions.Norm2F]], which are bit-identical by
  * construction (left-to-right double accumulation — the equivalence
  * the `VectorExpressionsSpec` property test pins) and stay inside
  * whole-stage codegen.
  *
  * Conservative by design: any deviation — different zero, non-sum
  * merge, non-identity finish, non-float arrays (the fold also
  * accepts doubles; the native expression does not), or a
  * nullable-element array type (a null element nulls the whole fold;
  * the native loop would read it as 0.0f) — leaves the expression
  * untouched. Length-mismatched inputs are safe to rewrite because
  * [[VectorExpressions.DotProductF]] mirrors the fold's
  * NULL-on-ragged semantics.
  *
  * Install via `spark.sql.extensions=graft.GraftExtensions` or
  * `spark.experimental.extraOptimizations`.
  */
object VectorFoldRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, containsNull) => !containsNull
    case _ => false
  }

  /** body is `cast(v as double)` of exactly the lambda variable `v`. */
  private def doubleOf(e: Expression, v: NamedExpression): Boolean = e match {
    case Cast(c, DoubleType, _, _) => c.semanticEquals(v)
    case _ => false
  }

  private def isZeroD(e: Expression): Boolean = e match {
    case Literal(z: Double, DoubleType) => z == 0.0
    case _ => false
  }

  /** merge lambda is `(acc, v) -> acc + v` (in that argument order). */
  private def isSum(merge: Expression): Boolean = merge match {
    case LambdaFunction(Add(a, x, _), Seq(acc, el), _) =>
      a.semanticEquals(acc) && x.semanticEquals(el)
    case _ => false
  }

  /** finish lambda is the identity. */
  private def isIdentity(finish: Expression): Boolean = finish match {
    case LambdaFunction(body, Seq(acc), _) => body.semanticEquals(acc)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r, LambdaFunction(Multiply(a, b, _), Seq(x, y), _)),
          zero, merge, finish)
        if isFloatArray(l) && isFloatArray(r) &&
           doubleOf(a, x) && doubleOf(b, y) &&
           isZeroD(zero) && isSum(merge) && isIdentity(finish) =>
      VectorExpressions.DotProductF(l, r)

    case ArrayAggregate(
          ArrayTransform(l, LambdaFunction(Multiply(a, b, _), Seq(x), _)),
          zero, merge, finish)
        if isFloatArray(l) &&
           doubleOf(a, x) && doubleOf(b, x) &&
           isZeroD(zero) && isSum(merge) && isIdentity(finish) =>
      VectorExpressions.Norm2F(l)
  }
}
