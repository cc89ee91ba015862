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
}
