package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import StringSimilarity.jaro_winkler

/** Jaro-Winkler expression: classic-variant semantics pinned to the
  * values the DuckDB oracle produces (each probed directly against
  * `jaro_winkler_similarity` during development), plus codegen /
  * interpreted parity.
  */
class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  // (a, b, expected) — expectations are DuckDB jaro_winkler_similarity outputs
  private val vectors = Seq(
    ("martha", "marhta", 0.9611111111111111),     // transpositions + prefix bonus
    ("dixon", "dicksonx", 0.8133333333333332),    // unequal lengths
    ("jellyfish", "smellyfish", 0.8962962962962964), // no common prefix → no bonus
    ("crate", "trace", 0.7333333333333333),       // jaro > 0.7 but prefix 0
    ("abcdzzzz", "abcdyyyy", 0.6666666666666666), // jaro ≤ 0.7 → gate blocks bonus
    ("abcdef", "bcadef", 0.9444444444444445),     // odd t → FLOORED transpositions
    ("aaaaaaaab", "aaaaaaaac", 0.9555555555555556), // prefix capped at 4
    ("ab", "ba", 0.0),                            // window 0 → no matches
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("", "", 0.0))                                // empties are 0, not 1

  test("jaroWinkler matches the oracle's classic-variant values") {
    for ((a, b, want) <- vectors) {
      val got = StringSimilarity.jaroWinkler(a, b)
      assert(math.abs(got - want) < 1e-12, s"($a, $b): got $got want $want")
      // symmetry
      assert(StringSimilarity.jaroWinkler(b, a) == got)
    }
  }

  test("expression evaluates identically under codegen and interpretation") {
    val df = vectors.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val viaExpr = df.select(jaro_winkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0)).toSeq
    assert(viaExpr == vectors.map { case (a, b, _) => StringSimilarity.jaroWinkler(a, b) })
    // null propagation
    val n = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(jaro_winkler(col("a"), col("b"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("built-in-convention argument coercion: numerics cast, arrays reject") {
    // ImplicitCastInputTypes (the levenshtein convention): numeric
    // args coerce to their string rendering instead of failing
    // analysis, and a NULL literal yields NULL instead of
    // DATATYPE_MISMATCH
    val r = Seq((11, 11)).toDF("a", "b")
      .select(jaro_winkler(col("a"), col("b"))).collect().head
    assert(r.getDouble(0) == 1.0)
    val n = Seq("abc").toDF("s")
      .select(jaro_winkler(lit(null), col("s"))).collect().head
    assert(n.isNullAt(0))
    // a genuinely un-coercible type still rejects loudly
    val err = intercept[Exception] {
      Seq(Tuple1(Seq(1))).toDF("a").select(jaro_winkler(col("a"), col("a"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string") ||
           err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
