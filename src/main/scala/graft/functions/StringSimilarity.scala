package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Jaro-Winkler string similarity — the record-linkage scorer
  * Spark has no built-in for (it ships levenshtein only). Same
  * extension rationale as [[VectorExpressions]]: a tight per-row
  * two-pointer loop is `doGenCode` territory, and the codegen'd form
  * is one static call, no UDF serialization, no codegen-stage break.
  *
  * Semantics are pinned to the classic Winkler variant so the DuckDB
  * oracle (`jaro_winkler_similarity`) can hash-match, each rule
  * verified against it empirically:
  *  - match window = max(|a|,|b|)/2 − 1 (floor, min 0);
  *  - transpositions = (mismatched matched positions) / 2, FLOORED
  *    (probed: 'abcdef'/'bcadef' → 0.9444…, the floored value);
  *  - either side empty → 0 (probed: ''/'' is 0, not 1);
  *  - prefix bonus only when jaro > 0.7, prefix capped at 4,
  *    scale 0.1.
  * Comparison is by UTF-16 code unit — identical to DuckDB's
  * byte/codepoint comparison on ASCII, the corpus contract; document
  * before relying on it for astral-plane text. */
object StringSimilarity {

  /** Classic Jaro similarity. Static so generated code can call it. */
  def jaro(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val matchedA = new Array[Boolean](la)
    val matchedB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!matchedB(j) && a.charAt(i) == b.charAt(j)) {
          matchedA(i) = true
          matchedB(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (matchedA(i)) {
        while (!matchedB(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val trans = (t / 2).toDouble // floored, matching the oracle
    (md / la + md / lb + (md - trans) / md) / 3.0
  }

  /** Winkler boost over [[jaro]]: common-prefix bonus (≤ 4 chars,
    * scale 0.1), applied only above the classic 0.7 gate. */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(a.length, b.length))
    while (l < max && a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  case class JaroWinklerSim(left: Expression, right: Expression) extends BinaryExpression
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
    override def dataType: DataType = DoubleType
    // see NfcNormalize: NULL literals coerce to NULL results, and
    // collated string columns (`_: StringType`) are accepted
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(StringType, StringType)
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"jaro_winkler expects (string, string), got (${l.simpleString}, ${r.simpleString})")
      }

    override def nullSafeEval(a: Any, b: Any): Any =
      jaroWinkler(a.toString, b.toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.StringSimilarity.jaroWinkler($a.toString(), $b.toString());")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  import org.apache.spark.sql.graft.ColumnBridge.{toCol, toExpr}

  def jaro_winkler(a: Column, b: Column): Column =
    toCol(JaroWinklerSim(toExpr(a), toExpr(b)))
}
