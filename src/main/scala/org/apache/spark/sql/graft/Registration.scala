package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.errors.QueryCompilationErrors

/** Arity-checked expression builders shared by the two registration
  * paths ([[graft.GraftExtensions]] for `spark.sql.extensions`,
  * [[FunctionBridge.registerAll]] for an already-built session). A
  * SQL call with the wrong argument count gets the standard
  * WRONG_NUM_ARGS analysis error naming the function — not an
  * `IndexOutOfBoundsException` out of `exprs(1)`. Lives in the
  * bridge namespace because `QueryCompilationErrors` is
  * `private[sql]` (same rationale as [[FunctionBridge]]).
  */
object Registration {

  private def checked(name: String, expected: Int)(exprs: Seq[Expression]): Seq[Expression] = {
    if (exprs.length != expected)
      throw QueryCompilationErrors.wrongNumArgsError(name, Seq(expected), exprs.length)
    exprs
  }

  def dotF(exprs: Seq[Expression]): Expression = {
    val e = checked("dot_f", 2)(exprs)
    graft.functions.VectorExpressions.DotProductF(e(0), e(1))
  }

  def norm2F(exprs: Seq[Expression]): Expression = {
    val e = checked("norm2_f", 1)(exprs)
    graft.functions.VectorExpressions.Norm2F(e.head)
  }

  def jaroWinkler(exprs: Seq[Expression]): Expression = {
    val e = checked("jaro_winkler", 2)(exprs)
    graft.functions.StringSimilarity.JaroWinklerSim(e(0), e(1))
  }

  def nfcNormalize(exprs: Seq[Expression]): Expression = {
    val e = checked("nfc_normalize", 1)(exprs)
    graft.functions.TextNormalize.NfcNormalize(e.head)
  }
}
