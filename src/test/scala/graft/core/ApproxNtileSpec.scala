package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextOps

/** The scale-safe (approx cut-point) variants of the exact-ntile
  * family must (a) agree with the exact path wherever that agreement
  * is well-defined — distinct values, bucket-divisible counts — and
  * (b) plan with NO partition-less window, the single-hot-task shape
  * the exact path exists to verify at test scale. */
class ApproxNtileSpec extends SparkSpec {

  /** Window nodes with an empty partitionSpec = a global sort through
    * one task: the 100-TB anti-shape the approx paths must not plan. */
  private def globalWindows(df: DataFrame): Seq[Window] =
    df.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty => w
    }

  private def anyWindows(df: DataFrame): Seq[Window] =
    df.queryExecution.optimizedPlan.collect { case w: Window => w }

  // --- equiDepthHistogram -------------------------------------------------

  private lazy val histDf = {
    import spark.implicits._
    // 100 distinct values, shuffled deterministically, N % nBuckets == 0:
    // the regime where cut-point bucketing and exact ntile provably agree.
    val vals = (1 to 100).map(i => ((i * 37) % 101).toDouble -> i.toLong)
    vals.toDF("v", "id")
  }

  test("equiDepthHistogram: approx path equals exact path on distinct values") {
    val exact = Ops.equiDepthHistogram(histDf, "v", "id", nBuckets = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSet
    val approx = Ops.equiDepthHistogram(histDf, "v", "id", nBuckets = 5, relErr = 1e-4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSet
    assert(approx === exact)
  }

  test("equiDepthHistogram: approx plan has no partition-less window; exact does") {
    assert(globalWindows(Ops.equiDepthHistogram(histDf, "v", "id", 5, relErr = 0.01)).isEmpty)
    assert(globalWindows(Ops.equiDepthHistogram(histDf, "v", "id", 5)).nonEmpty)
  }

  test("equiDepthHistogram: approx ties share a bucket; counts stay complete") {
    import spark.implicits._
    // 50 copies of one value + 50 distinct: the documented divergence —
    // exact splits the tie run across buckets, approx keeps it whole.
    val skew = (Seq.fill(50)(7.0) ++ (100 to 149).map(_.toDouble))
      .zipWithIndex.map { case (v, i) => (v, i.toLong) }
    val df = skew.toDF("v", "id")
    val rows = Ops.equiDepthHistogram(df, "v", "id", 4, relErr = 0.01).collect()
    assert(rows.map(_.getLong(3)).sum === 100L)            // nothing dropped
    val tieBuckets = Ops.equiDepthHistogram(df, "v", "id", 4, relErr = 0.01)
      .filter(col("lo") <= 7.0 && col("hi") >= 7.0).collect()
    assert(tieBuckets.length === 1)                        // tie run is whole
  }

  // --- rfmSegments --------------------------------------------------------

  private lazy val rfmEvents = {
    import spark.implicits._
    // 60 users; user u has u events (distinct frequency), last event at a
    // distinct hour, and a distinct monetary sum — all three metrics are
    // tie-free, so exact ntile and cut-point bucketing must agree.
    val rows = for {
      u <- 1 to 60
      k <- 1 to u
    } yield (u.toLong,
             (u * 3600L + k) * 1000000000L,               // ns since epoch
             u * 1.0 + k * 0.01)
    rows.toDF("user_id", "ts", "value")
  }

  test("rfmSegments: approx path equals exact path on tie-free metrics") {
    val exact = Ops.rfmSegments(rfmEvents, nSegments = 5)
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val approx = Ops.rfmSegments(rfmEvents, nSegments = 5, relErr = 1e-4)
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(approx === exact)
  }

  test("rfmSegments: approx plan has no window at all") {
    assert(anyWindows(Ops.rfmSegments(rfmEvents, 5, relErr = 0.01)).isEmpty)
    assert(globalWindows(Ops.rfmSegments(rfmEvents, 5)).nonEmpty)
  }

  // --- qualityNtile -------------------------------------------------------

  private lazy val qualityDocs = {
    import spark.implicits._
    // Token count strictly increasing per doc within each language →
    // strictly monotone quality blend (n/100 and mean-length terms move
    // together below the caps) → tie-free within every lang partition.
    val rows = for {
      (lang, base) <- Seq("en" -> 0, "de" -> 1000)
      i <- 1 to 30
    } yield ((base + i).toLong, Seq.fill(i + 2)("word").mkString(" "), lang)
    rows.toDF("doc_id", "text", "lang")
  }

  test("qualityNtile: approx path equals exact path on tie-free quality") {
    val exact = TextOps.qualityNtile(qualityDocs, n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val approx = TextOps.qualityNtile(qualityDocs, n = 5, relErr = 1e-4)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(approx === exact)
  }

  test("qualityNtile: approx plan has no window; tile 1 is best quality") {
    assert(anyWindows(TextOps.qualityNtile(qualityDocs, 5, relErr = 0.01)).isEmpty)
    val rows = TextOps.qualityNtile(qualityDocs, 5, relErr = 0.01)
      .filter(col("lang") === "en").collect()
      .map(r => (r.getDouble(2), r.getLong(3)))
    val bestTile = rows.maxBy(_._1)._2
    val worstTile = rows.minBy(_._1)._2
    assert(bestTile === 1L)
    assert(worstTile === 5L)
  }
}
