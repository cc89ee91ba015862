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
  * Conservative by design: any deviation — different zero (including
  * a -0.0 literal: the native accumulator starts at +0.0, and an
  * empty array folded from -0.0 yields -0.0 — bit-distinct), non-sum
  * merge, non-identity finish, or non-float arrays (the fold also
  * accepts doubles; the native expression does not) — leaves the
  * expression untouched. Nullable-ELEMENT arrays DO rewrite: the
  * native expressions return NULL on a null element, bit-matching
  * the fold (a null product nulls the running sum) — rejecting
  * containsNull would make the rule dead on the most common real
  * schemas (SQL DDL `array<float>` and optional-element parquet
  * lists both default containsNull=true). Length-mismatched inputs are safe to rewrite because
  * [[VectorExpressions.DotProductF]] mirrors the fold's
  * NULL-on-ragged semantics.
  *
  * Install via `spark.sql.extensions=graft.GraftExtensions` or
  * `spark.experimental.extraOptimizations`.
  */
object VectorFoldRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true // null elements NULL-propagate natively too
    case _ => false
  }

  /** body is `cast(v as double)` of exactly the lambda variable `v`. */
  private def doubleOf(e: Expression, v: NamedExpression): Boolean = e match {
    case Cast(c, DoubleType, _, _) => c.semanticEquals(v)
    case _ => false
  }

  private def isZeroD(e: Expression): Boolean = e match {
    // bit-exact POSITIVE zero only: -0.0 == 0.0 is true in double
    // comparison, but fold(-0.0) over an empty array returns -0.0
    // while the native accumulator returns +0.0
    case Literal(z: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(z) == 0L
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
