package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training primitives for curation-stage classifiers.
  *
  * The modern curation pipeline scores every document with a small
  * quality classifier (trained on a few thousand labeled examples)
  * and keeps the top slice — the FineWeb-Edu / DCLM recipe. The
  * trainer here is deliberately minimal: batch-gradient logistic
  * regression over a handful of numeric features (the
  * `TextOps.qualityScore` blend components, readability stats,
  * language scores), with every training round ONE partial-aggregated
  * pass that ships d+2 doubles to the driver — no parameter server,
  * no MLlib dependency, nothing the engine does not already provide.
  */
object Learn {

  /** Trained model: per-feature weights (in input order), intercept,
    * and the standardization constants baked in at training time so
    * scoring applies the SAME transform. */
  final case class LogisticModel(features: Seq[String], weights: Seq[Double],
                                 bias: Double, means: Seq[Double], stds: Seq[Double]) {
    require(features.length == weights.length &&
      features.length == means.length && features.length == stds.length)
  }

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Batch-gradient logistic regression.
    *
    * Every iteration is one aggregation over the training frame:
    * per-row probability p = σ(w·x̂ + b) on STANDARDIZED features
    * (x̂ = (x−μ)/σ, computed in a single prior pass — without it
    * plain GD needs a per-feature learning rate), then d+1 gradient
    * sums (Σ(p−y)·x̂ᵢ and Σ(p−y)) plus the log-loss, all shipped to
    * the driver as ONE row of doubles. The weight update runs on the
    * driver; weights re-enter the next round's plan as literals, so
    * the whole round stays inside whole-stage codegen.
    *
    * Scale shape: `iters` corpus passes. A quality classifier trains
    * on a LABELED set — thousands to millions of rows, not the
    * corpus — so the passes are cheap; when training data is truly
    * huge, sample it upstream (the quantizer-training discipline).
    * Scoring the full corpus ([[scoreLogistic]]) is the
    * zero-shuffle, one-pass side.
    *
    * Degenerate labels (all 0 or all 1) still converge toward the
    * intercept-only solution; constant features get σ = 1 to avoid a
    * division by zero and contribute nothing (weight stays 0 —
    * gradient of a zero column is zero). */
  def trainLogistic(df: DataFrame, featureCols: Seq[String], labelCol: String,
                    iters: Int = 100, learningRate: Double = 0.5,
                    l2: Double = 0.0): LogisticModel = {
    require(featureCols.nonEmpty, "need at least one feature column")
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(learningRate > 0, s"need learningRate > 0, got $learningRate")
    require(l2 >= 0, s"need l2 >= 0, got $l2")
    val d = featureCols.length

    // one standardization pass: means, stds, n (constant cols → σ=1)
    val statCols = featureCols.flatMap { c =>
      Seq(avg(col(c).cast("double")).as(s"mu_$c"),
          coalesce(stddev_pop(col(c).cast("double")), lit(0.0)).as(s"sd_$c"))
    } :+ count(lit(1)).as("n")
    val stats = df.agg(statCols.head, statCols.tail: _*).collect()(0)
    val n = stats.getAs[Long]("n")
    require(n > 0, "cannot train on an empty frame")
    val means = featureCols.map(c => stats.getAs[Double](s"mu_$c"))
    val stds = featureCols.map { c =>
      val s = stats.getAs[Double](s"sd_$c"); if (s == 0.0) 1.0 else s
    }

    val y = col(labelCol).cast("double")
    val xhat = featureCols.zipWithIndex.map { case (c, i) =>
      (col(c).cast("double") - lit(means(i))) / lit(stds(i))
    }

    var w = Array.fill(d)(0.0)
    var b = 0.0
    var iter = 0
    while (iter < iters) {
      val z = xhat.zip(w).map { case (x, wi) => x * lit(wi) }
        .foldLeft(lit(b): Column)(_ + _)
      val p = sigmoid(z)
      val gradCols = xhat.zipWithIndex.map { case (x, i) =>
        sum((p - y) * x).as(s"g_$i")
      } :+ sum(p - y).as("g_b")
      val g = df.agg(gradCols.head, gradCols.tail: _*).collect()(0)
      w = Array.tabulate(d)(i =>
        w(i) - learningRate * (g.getAs[Double](s"g_$i") / n + l2 * w(i)))
      b -= learningRate * g.getAs[Double]("g_b") / n
      iter += 1
    }
    LogisticModel(featureCols, w.toSeq, b, means, stds)
  }

  /** Apply a trained model: adds `probCol` = σ(w·x̂ + b) — a pure
    * per-row projection, zero shuffle, the corpus-scoring pass of the
    * quality-filter recipe (follow with a threshold filter or
    * `TextOps.qualityNtile`-style slicing). */
  def scoreLogistic(df: DataFrame, model: LogisticModel,
                    probCol: String = "prob"): DataFrame = {
    val z = model.features.zipWithIndex.map { case (c, i) =>
      ((col(c).cast("double") - lit(model.means(i))) / lit(model.stds(i))) *
        lit(model.weights(i))
    }.foldLeft(lit(model.bias): Column)(_ + _)
    df.withColumn(probCol, sigmoid(z))
  }
}
