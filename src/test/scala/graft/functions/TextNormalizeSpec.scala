package graft.functions

import graft.SparkSpec
import graft.text.TextOps
import org.apache.spark.sql.functions._
import TextNormalize.nfc_normalize

/** NFC normalization expression + the [[TextOps.normalizeText]]
  * cleaning stage built on it. The composition expectations were
  * probed against DuckDB's `nfc_normalize` (utf8proc) during
  * development; the declared `q_normalize_text` oracle re-checks
  * them per round. All non-ASCII is spelled as unicode escapes so
  * the source survives any editor/linter byte-mangling.
  */
class TextNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val composedE = "\u00E9"       // precomposed e-acute
  private val decomposedE = "e\u0301"    // e + COMBINING ACUTE

  test("nfc composes decomposed sequences and is idempotent on NFC input") {
    val df = Seq(
      "Caf" + decomposedE,               // composes to Caf<e-acute>
      "Caf" + composedE,                 // already NFC: unchanged
      "A\u030AB",                        // A + combining ring above
      "plain ascii").toDF("s")
    val out = df.select(nfc_normalize(col("s")).as("n")).as[String].collect()
    assert(out(0) == "Caf" + composedE)
    assert(out(1) == "Caf" + composedE)
    assert(out(2) == "\u00C5B")          // LATIN CAPITAL A WITH RING
    assert(out(3) == "plain ascii")
    // both spellings byte-identical after normalization: the dedup premise
    assert(out(0) == out(1))
  }

  test("expression matches the static kernel and propagates null") {
    val inputs = Seq("x" + decomposedE + "y", "", "no change")
    val viaExpr = inputs.toDF("s").select(nfc_normalize(col("s"))).as[String].collect()
    val direct = inputs.map(s =>
      TextNormalize.nfc(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString)
    assert(viaExpr.toSeq == direct)
    val n = Seq(Option.empty[String]).toDF("s").select(nfc_normalize(col("s"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("built-in-convention coercion: numerics cast to string, arrays reject") {
    // ImplicitCastInputTypes: an int coerces to its string rendering
    // (the upper()/lower() convention); NULL literal yields NULL
    val ok = Seq(1).toDF("s").select(nfc_normalize(col("s"))).collect().head
    assert(ok.getString(0) == "1")
    val err = intercept[Exception] {
      Seq(Tuple1(Seq(1))).toDF("s").select(nfc_normalize(col("s"))).collect()
    }
    assert(err.getMessage.contains("nfc_normalize") ||
           err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("SQL registration works and wrong arity is an analysis error, not an index error") {
    org.apache.spark.sql.graft.FunctionBridge.registerAll(spark)
    // NOTE: Spark's chr() is mod-256 ASCII (chr(769) = \u0001), unlike
    // DuckDB's codepoint chr \u2014 pass the codepoint via the literal
    val got = spark.sql("SELECT nfc_normalize('Caf' || 'e\u0301')")
      .as[String].collect()(0)
    assert(got == "Caf" + composedE)
    val err = intercept[Exception] { spark.sql("SELECT nfc_normalize()").collect() }
    assert(!err.isInstanceOf[IndexOutOfBoundsException])
    assert(err.getMessage.toLowerCase.contains("nfc_normalize"))
  }

  test("normalizeText deletes controls, collapses unicode whitespace, trims") {
    val docs = Seq(
      (1L, "Caf" + decomposedE + "\ta\r\nb"),     // compose + collapse
      (2L, " x\u0001y "),                   // controls deleted, trimmed
      (3L, "a\u00A0\u2003 b"),                    // NBSP+EM-space run -> one space
      (4L, "\u000B\u000C"),                       // VT/FF are control-deleted
      (5L, "")).toDF("doc_id", "text")
    val out = TextOps.normalizeText(docs).orderBy("doc_id").as[(Long, String)].collect()
    assert(out(0)._2 == "Caf" + composedE + " a b")
    assert(out(1)._2 == "xy")
    assert(out(2)._2 == "a b")
    assert(out(3)._2 == "")
    assert(out(4)._2 == "")
  }

  test("normalizeText propagates null text as null clean") {
    val docs = Seq((1L, Option.empty[String]), (2L, Some("ok"))).toDF("doc_id", "text")
    val out = TextOps.normalizeText(docs).orderBy("doc_id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getString(1) == "ok")
  }
}
