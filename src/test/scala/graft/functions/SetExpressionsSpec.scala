package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The sorted-merge intersection kernel and its locally-enforced
  * input contract. The kernel assumes sorted-distinct arrays; under
  * `spark.graft.strictSortedArrays=true` (read at column-construction
  * time) the contract is ASSERTED per row instead of assumed, so a
  * producer refactor that stops sorting fails loudly in test mode
  * rather than silently returning wrong counts in release mode.
  */
class SetExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def withStrict[T](body: => T): T = {
    spark.conf.set(SetExpressions.StrictSortedConf, "true")
    try body finally spark.conf.unset(SetExpressions.StrictSortedConf)
  }

  private def icount = SetExpressions.sorted_intersect_count(col("a"), col("b")).as("c")

  test("strict and release kernels agree with the set-intersection oracle on valid input") {
    val df = Seq(
      (Array(1L, 3L, 7L, 9L), Array(3L, 4L, 9L)),
      (Array.empty[Long], Array(1L)),
      (Array(5L), Array(5L)),
      (Array(-9L, 0L, 2L), Array(-9L, 0L, 2L))
    ).toDF("a", "b")
    val release = df.select(icount).as[Int].collect().toSeq
    val strict = withStrict(df.select(icount).as[Int].collect().toSeq)
    val oracle = df.as[(Array[Long], Array[Long])].collect()
      .map { case (a, b) => a.toSet.intersect(b.toSet).size }.toSeq
    assert(release == oracle && strict == oracle)
  }

  test("strict mode rejects a deliberately unsorted input") {
    val df = Seq((Array(3L, 1L), Array(1L, 2L))).toDF("a", "b").coalesce(1)
    val e = intercept[Throwable] { withStrict(df.select(icount).collect()) }
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("sorted-distinct contract"),
      s"expected the contract violation to surface, got: $messages")
  }

  test("strict mode rejects duplicates too (sorted-DISTINCT, not merely sorted)") {
    val df = Seq((Array(1L, 1L, 2L), Array(1L, 2L))).toDF("a", "b").coalesce(1)
    val e = intercept[Throwable] { withStrict(df.select(icount).collect()) }
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("sorted-distinct contract"),
      s"expected the contract violation to surface, got: $messages")
  }

  test("strict mode rejects null ELEMENTS (the third contract clause)") {
    // [null, 5] is the trap case: getLong reads the null slot as 0,
    // 0 < 5 PASSES the ascending check, and the release kernel counts
    // a phantom 0 match against the right side's 0 — strict mode must
    // reject it, not bless it
    val df = Seq((Array[java.lang.Long](null, 5L), Array[java.lang.Long](0L, 5L)))
      .toDF("a", "b").coalesce(1)
    val e = intercept[Throwable] { withStrict(df.select(icount).collect()) }
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("no-null-elements"),
      s"expected the null-element violation to surface, got: $messages")
  }

  test("the flag is plan-build-time: release columns carry strict=false, strict columns true") {
    import org.apache.spark.sql.graft.ColumnBridge.toExpr
    def strictFlag(c: org.apache.spark.sql.Column): Boolean =
      toExpr(c).collectFirst {
        case SetExpressions.SortedIntersectCount(_, _, s) => s
      }.get
    assert(!strictFlag(SetExpressions.sorted_intersect_count(col("a"), col("b"))))
    assert(withStrict(strictFlag(SetExpressions.sorted_intersect_count(col("a"), col("b")))))
  }

  test("a malformed strict-flag value throws at column construction, never silently disarms") {
    // r12 hardening: the r11 catch-all swallowed a bad conf value
    // into strict=false — a suite believing strict mode was on would
    // have been running the unchecked kernel
    spark.conf.set(SetExpressions.StrictSortedConf, "definitely-not-a-boolean")
    try {
      intercept[IllegalArgumentException] {
        SetExpressions.sorted_intersect_count(col("a"), col("b"))
      }
    } finally spark.conf.unset(SetExpressions.StrictSortedConf)
  }

  test("the real producer upholds the contract: jaccard prefix plan runs green under strict mode") {
    val docs = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog"),
      (2L, "en", "the quick brown fox jumped over the lazy dog"),
      (3L, "en", "entirely different content with no overlap at all"),
      (4L, "en", "the quick brown fox jumps over the lazy dog")
    ).map { case (id, lg, t) => (id, lg, t, t.length.toLong) }
      .toDF("doc_id", "lang", "text", "n_chars")
    val strictPairs = withStrict(
      graft.text.Dedup.jaccardNearDupPairs(docs, threshold = 0.8).collect().toSet)
    val releasePairs =
      graft.text.Dedup.jaccardNearDupPairs(docs, threshold = 0.8).collect().toSet
    assert(strictPairs == releasePairs && strictPairs.nonEmpty)
  }
}
