package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization — the canonical-composition
  * kernel Spark has no built-in for, and the first step of the
  * standard web-corpus cleaning stage (ftfy/CCNet-style): the same
  * visible text arrives both precomposed (U+00E9) and decomposed
  * (U+0065 U+0301), and every downstream exact/dedup/shingle operator
  * treats those as different bytes unless a normalization pass runs
  * first.
  *
  * Same extension rationale as [[StringSimilarity]]: a per-row
  * JDK-library call is `doGenCode` territory — the generated form is
  * one static invoke, no UDF serialization, no codegen-stage break,
  * so a normalization-first pipeline keeps its whole-stage span.
  *
  * Cross-engine contract (verified empirically vs DuckDB's
  * utf8proc-backed `nfc_normalize`): canonical composition for the
  * BMP sequences the corpus can contain is identical between
  * `java.text.Normalizer` and utf8proc — both implement Unicode NFC;
  * divergence is only possible for characters newer than the older
  * of the two Unicode tables, which deterministic test data cannot
  * produce. Pure-ASCII input (the dominant case) short-circuits on a
  * raw byte scan — no decode, no allocation; only non-ASCII input
  * reaches the normalizer's quick-check.
  */
object TextNormalize {

  /** NFC-normalize one value. Static so generated code can call it.
    * Pure-ASCII input short-circuits on a raw byte scan (ASCII is
    * always NFC) — no decode, no allocation, the dominant-corpus
    * case. Non-ASCII input pays one decode for the normalizer's
    * quick-check, and only actually-unnormalized strings allocate a
    * normalized copy. */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    while (i < n && s.getByte(i) >= 0) i += 1
    if (i == n) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  case class NfcNormalize(child: Expression) extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
    override def dataType: DataType = StringType
    // ImplicitCastInputTypes + a `_: StringType` match: a NULL
    // literal coerces and returns NULL like every string built-in,
    // and a COLLATED string column (Spark 4: StringType with a
    // non-zero collationId never equals the StringType stable
    // identifier) is accepted — NFC is collation-independent
    override def inputTypes = // inferred: AbstractDataType is private[sql]
      Seq(StringType)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got ${t.simpleString}")
    }

    override def nullSafeEval(s: Any): Any = nfc(s.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextNormalize.nfc($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  import org.apache.spark.sql.graft.ColumnBridge.{toCol, toExpr}

  def nfc_normalize(c: Column): Column = toCol(NfcNormalize(toExpr(c)))
}
