package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Logistic-regression trainer: driver-reference equality (same math,
  * same standardization, same update rule), separable-data accuracy,
  * and the degenerate edges a curation pipeline will hit.
  */
class LearnSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: identical batch GD on standardized
    * features — the equality oracle for the distributed trainer. */
  private def refTrain(rows: Seq[(Array[Double], Double)], iters: Int,
                       lr: Double, l2: Double): (Array[Double], Double) = {
    val d = rows.head._1.length
    val n = rows.length
    val mu = Array.tabulate(d)(i => rows.map(_._1(i)).sum / n)
    val sd = Array.tabulate(d) { i =>
      val v = rows.map(r => math.pow(r._1(i) - mu(i), 2)).sum / n
      val s = math.sqrt(v); if (s == 0.0) 1.0 else s
    }
    val xh = rows.map { case (x, y) =>
      (Array.tabulate(d)(i => (x(i) - mu(i)) / sd(i)), y) }
    var w = Array.fill(d)(0.0)
    var b = 0.0
    for (_ <- 1 to iters) {
      val g = Array.fill(d + 1)(0.0)
      xh.foreach { case (x, y) =>
        val p = 1.0 / (1.0 + math.exp(-(x.zip(w).map(t => t._1 * t._2).sum + b)))
        for (i <- 0 until d) g(i) += (p - y) * x(i)
        g(d) += p - y
      }
      for (i <- 0 until d) w(i) -= lr * (g(i) / n + l2 * w(i))
      b -= lr * g(d) / n
    }
    (w, b)
  }

  test("trainLogistic matches the driver reference on random data") {
    val rnd = new Random(11)
    val rows = Seq.fill(200)((Array(rnd.nextDouble() * 4 - 2, rnd.nextDouble() * 10), 0.0))
      .map { case (x, _) => (x, if (2 * x(0) - 0.3 * x(1) + rnd.nextGaussian() * 0.3 > 0) 1.0 else 0.0) }
    val df = rows.map { case (x, y) => (x(0), x(1), y) }.toDF("f1", "f2", "label")
    val m = Learn.trainLogistic(df, Seq("f1", "f2"), "label", iters = 40, learningRate = 0.5, l2 = 0.01)
    val (rw, rb) = refTrain(rows, 40, 0.5, 0.01)
    m.weights.zip(rw).foreach { case (a, b2) =>
      assert(math.abs(a - b2) < 1e-8, s"weights diverge: ${m.weights.toSeq} vs ${rw.toSeq}") }
    assert(math.abs(m.bias - rb) < 1e-8)
    // the separating direction is learned: f1 positive, f2 negative
    assert(m.weights(0) > 0 && m.weights(1) < 0, m.weights.toString)
    // scoring classifies the training set well (separable + noise)
    val acc = Learn.scoreLogistic(df, m)
      .select(when((col("prob") > 0.5) === (col("label") > 0.5), 1.0).otherwise(0.0).as("ok"))
      .agg(avg(col("ok"))).collect()(0).getDouble(0)
    assert(acc > 0.9, s"accuracy $acc")
  }

  test("degenerate inputs: constant features and one-class labels") {
    val df = Seq((1.0, 5.0, 1.0), (2.0, 5.0, 1.0), (3.0, 5.0, 1.0))
      .toDF("f1", "f2", "label")
    val m = Learn.trainLogistic(df, Seq("f1", "f2"), "label", iters = 30)
    // constant feature: standardizes to 0, weight stays 0, no NaN
    assert(m.weights(1) == 0.0 && !m.weights.exists(_.isNaN) && !m.bias.isNaN)
    // all-ones labels push the intercept positive (p -> 1)
    assert(m.bias > 0)
    val p = Learn.scoreLogistic(df, m).select("prob").collect().map(_.getDouble(0))
    assert(p.forall(v => v > 0.5 && v <= 1.0), p.toSeq.toString)
    intercept[IllegalArgumentException](
      Learn.trainLogistic(df.limit(0), Seq("f1"), "label"))
  }

  test("linearScore is the log-odds of scoreLogistic") {
    val df = Seq((10.0, 1.0), (100.0, 0.0), (55.0, 1.0)).toDF("f1", "label")
    val m = Learn.LogisticModel(Seq("f1"), Seq(0.7), 0.1, Seq(50.0), Seq(25.0))
    val rows = Learn.scoreLogistic(df, m)
      .withColumn("z", Learn.linearScore(m)).collect()
    rows.foreach { r =>
      val z = r.getAs[Double]("z")
      val p = r.getAs[Double]("prob")
      assert(math.abs(p - 1.0 / (1.0 + math.exp(-z))) < 1e-12)
      assert((p > 0.5) == (z > 0.0)) // the driver-checked keep contract
    }
  }

  test("null features or labels reject loudly (no silently-wrong model)") {
    // a left-joined label frame: one unlabeled row, one null feature
    val nullLabel = Seq((1.0, 2.0, Some(1.0)), (2.0, 1.0, None))
      .toDF("f1", "f2", "label")
    val e1 = intercept[IllegalArgumentException](
      Learn.trainLogistic(nullLabel, Seq("f1", "f2"), "label"))
    assert(e1.getMessage.contains("1 row(s)"), e1.getMessage)
    val nullFeature = Seq((Some(1.0), 2.0, 1.0), (None, 1.0, 0.0))
      .toDF("f1", "f2", "label")
    intercept[IllegalArgumentException](
      Learn.trainLogistic(nullFeature, Seq("f1", "f2"), "label"))
    // non-numeric strings cast to null -> same rejection
    val nonNumeric = Seq(("1.0", 1.0), ("oops", 0.0)).toDF("f1", "label")
    intercept[IllegalArgumentException](
      Learn.trainLogistic(nonNumeric, Seq("f1"), "label"))
    // NaN/Inf are NOT null — without their own gate a single 0/0
    // ratio feature poisons every mean/gradient into an all-NaN
    // model with no error (the silent failure the gate promises to
    // prevent)
    val nanFeature = Seq((Double.NaN, 1.0), (1.0, 0.0)).toDF("f1", "label")
    intercept[IllegalArgumentException](
      Learn.trainLogistic(nanFeature, Seq("f1"), "label"))
    val infFeature = Seq((Double.PositiveInfinity, 1.0), (1.0, 0.0)).toDF("f1", "label")
    intercept[IllegalArgumentException](
      Learn.trainLogistic(infFeature, Seq("f1"), "label"))
    val nanLabel = Seq((1.0, Double.NaN), (2.0, 0.0)).toDF("f1", "label")
    intercept[IllegalArgumentException](
      Learn.trainLogistic(nanLabel, Seq("f1"), "label"))
  }

  /** Driver-side isotonic reference via the minimax characterization
    * f(i) = max_{j<=i} min_{k>=i} avg(j..k) over the present-bin
    * sequence — the engine-independent form the declared query's
    * DuckDB oracle also computes. */
  private def refIsotonic(binned: Seq[(Long, Long, Long)]): Seq[Double] = {
    def avg(j: Int, k: Int): Double = {
      val s = binned.slice(j, k + 1)
      s.map(_._3).sum.toDouble / s.map(_._2).sum.toDouble
    }
    binned.indices.map { i =>
      (0 to i).map(j => (i until binned.length).map(k => avg(j, k)).min).max
    }
  }

  test("isotonicFit matches the minimax reference and is monotone on random data") {
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new Random(seed)
      // noisy monotone-ish label so some bins violate and pool
      val rows = (0 until 400).map { _ =>
        val s = rnd.nextDouble() * 10.0 - 5.0
        val p = 1.0 / (1.0 + math.exp(-s))
        (s, if (rnd.nextDouble() < p) 1 else 0)
      }
      val df = rows.toDF("score", "label")
      val m = Learn.isotonicFit(df, "score", "label", nBins = 6)
      // replicate the documented bin arithmetic exactly
      val lo = rows.map(_._1).min
      val hi = rows.map(_._1).max
      val expBinned = rows
        .groupBy(r => math.min(math.floor((r._1 - lo) * 6.0 / (hi - lo)), 5.0).toLong)
        .toSeq.sortBy(_._1)
        .map { case (b, rs) => (b, rs.length.toLong, rs.map(_._2.toLong).sum) }
      assert(m.bins.map(b => (b.bin, b.n, b.pos)) == expBinned,
        s"seed $seed: bin counts diverged")
      val expCal = refIsotonic(expBinned)
      assert(m.bins.map(_.calibrated) == expCal,
        s"seed $seed: PAV diverged from the minimax reference")
      assert(m.bins.map(_.calibrated).sliding(2).forall(p =>
        p.length < 2 || p(0) <= p(1)), s"seed $seed: calibration not monotone")
      assert(m.bins.map(b => (b.bin, b.rate)) ==
        expBinned.map(t => (t._1, t._3.toDouble / t._2.toDouble)))
    }
  }

  test("applyCalibration: per-bin lookup, gap fill-down, range clamp, null passthrough") {
    // two well-separated score clumps with nBins = 8 → middle bins
    // empty at fit time; labels make the low clump rate 0, high 1
    val fit = ((0 until 20).map(i => (0.0 + i * 0.01, 0)) ++
               (0 until 20).map(i => (10.0 + i * 0.01, 1))).toDF("score", "label")
    val m = Learn.isotonicFit(fit, "score", "label", nBins = 8)
    assert(m.bins.length == 2, s"expected 2 present bins, got ${m.bins}")
    val lowCal = m.bins.head.calibrated
    val highCal = m.bins.last.calibrated
    assert(lowCal == 0.0 && highCal == 1.0)
    val applied = Learn.applyCalibration(
      Seq(("in_low", Some(0.05)), ("mid_gap", Some(5.0)),
          ("below", Some(-100.0)), ("above", Some(100.0)),
          ("nul", None), ("nan", Some(Double.NaN)))
        .toDF("tag", "score"), m, "score")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2)))).toMap
    assert(applied("in_low") == lowCal)
    // a score in an empty training bin takes the nearest LOWER
    // present bin (right-continuous step function)
    assert(applied("mid_gap") == lowCal)
    assert(applied("below") == lowCal, "below-range must clamp to the first bin")
    assert(applied("above") == highCal, "above-range must clamp to the last bin")
    assert(applied("nul") == null && applied("nan") == null)
  }

  test("isotonicFit degenerate and invalid inputs") {
    // all-equal scores: one bin, rate = calibrated = overall mean
    val flat = Seq((1.5, 1), (1.5, 0), (1.5, 1), (1.5, 1)).toDF("score", "label")
    val m = Learn.isotonicFit(flat, "score", "label", nBins = 8)
    assert(m.bins == Seq(Learn.CalibrationBin(0L, 4L, 3L, 0.75, 0.75)))
    // applying the degenerate model is a constant function
    val got = Learn.applyCalibration(Seq(0.0, 99.0).toDF("score"), m, "score")
      .select("calibrated").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(0.75, 0.75))
    // loud rejects: NaN score, out-of-{0,1} label, null label, empty
    intercept[IllegalArgumentException](Learn.isotonicFit(
      Seq((Double.NaN, 1), (1.0, 0)).toDF("score", "label"), "score", "label"))
    intercept[IllegalArgumentException](Learn.isotonicFit(
      Seq((1.0, 2), (2.0, 0)).toDF("score", "label"), "score", "label"))
    intercept[IllegalArgumentException](Learn.isotonicFit(
      Seq((1.0, Some(1)), (2.0, None)).toDF("score", "label"), "score", "label"))
    intercept[IllegalArgumentException](Learn.isotonicFit(
      flat.limit(0), "score", "label"))
    intercept[IllegalArgumentException](Learn.isotonicFit(
      flat, "score", "label", nBins = 0))
  }
}
