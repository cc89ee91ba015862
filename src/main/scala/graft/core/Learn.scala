package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed training primitives for curation-stage classifiers.
  *
  * The modern curation pipeline scores every document with a small
  * quality classifier (trained on a few thousand labeled examples)
  * and keeps the top slice — the FineWeb-Edu / DCLM recipe. The
  * trainer here is deliberately minimal: batch-gradient logistic
  * regression over a handful of numeric features (the
  * `TextOps.qualityScore` blend components, readability stats,
  * language scores), with every training round ONE partial-aggregated
  * pass that ships d+1 doubles to the driver — no parameter server,
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
    * sums (Σ(p−y)·x̂ᵢ and Σ(p−y)) shipped to the driver as ONE row
    * of doubles. The weight update runs on the driver; weights
    * re-enter the next round's plan as literals, so the whole round
    * stays inside whole-stage codegen.
    *
    * Scale shape: the raw (features, label) projection is PERSISTED
    * once and the caller's upstream lineage executes exactly ONCE —
    * the standardization stats are the cache's first (filling)
    * action, and each of the `iters` rounds re-reads the cached
    * narrow columns, standardizing with d multiply/divides per row
    * (a feature-join pipeline would otherwise re-execute per round,
    * the exact re-run cost the graph loops' materializeCount exists
    * to prevent). A quality classifier
    * trains on a LABELED set — thousands to millions of rows, not the
    * corpus — so the cached passes are cheap; when training data is
    * truly huge, sample it upstream (the quantizer-training
    * discipline). Scoring the full corpus ([[scoreLogistic]]) is the
    * zero-shuffle, one-pass side.
    *
    * Null features or labels REJECT loudly (IllegalArgumentException,
    * the connectedComponents/pageRank contract): sum() would silently
    * skip null rows while n counts them — every gradient divided by
    * the wrong n, and a row with ONE null feature excluded from ALL
    * feature gradients — a silently-wrong model, the worst failure
    * mode a trainer can have.
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

    // ONE upstream execution (r13 review — the caller's lineage may
    // be an expensive feature join, and the previous shape ran it
    // twice: once under the stats aggregate over raw df, once
    // filling the standardized cache): persist the narrow RAW
    // (features, label) projection; the standardization pass is its
    // FIRST action (filling the cache), and every gradient scan then
    // standardizes with d multiply/divides per row over cached
    // columns — arithmetic over the cache, never a second upstream
    // run, and the gradient values are the bit-identical expressions.
    val raw = df.select(
      featureCols.zipWithIndex.map { case (c, i) =>
        col(c).cast("double").as(s"r_$i")
      } :+ col(labelCol).cast("double").as("y"): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // one standardization pass: means, stds, n, null count
      // (constant cols → σ=1; ANY null/NaN/Inf feature/label → reject:
      // NaN is NOT null, so an isNull-only gate would let a single 0/0
      // ratio feature poison every mean/gradient into NaN and return
      // the silently-wrong all-NaN model this gate exists to prevent)
      def bad(x: Column): Column =
        x.isNull || isnan(x) || x === Double.PositiveInfinity ||
          x === Double.NegativeInfinity
      val anyNull = ((0 until d).map(i => bad(col(s"r_$i"))) :+
        bad(col("y"))).reduce(_ || _)
      val statCols = (0 until d).flatMap { i =>
        Seq(avg(col(s"r_$i")).as(s"mu_$i"),
            coalesce(stddev_pop(col(s"r_$i")), lit(0.0)).as(s"sd_$i"))
      } ++ Seq(count(lit(1)).as("n"),
               sum(when(anyNull, 1L).otherwise(0L)).as("n_bad"))
      val stats = raw.agg(statCols.head, statCols.tail: _*).collect()(0)
      val n = stats.getAs[Long]("n")
      require(n > 0, "cannot train on an empty frame")
      val nBad = stats.getAs[Long]("n_bad")
      if (nBad > 0)
        throw new IllegalArgumentException(
          s"trainLogistic: $nBad row(s) have a null or non-numeric value in " +
            s"${featureCols.mkString("[", ", ", "]")} or '$labelCol' — sum() would " +
            "silently skip them while n counts them (a silently-wrong model); " +
            "fix or filter the training input")
      val means = (0 until d).map(i => stats.getAs[Double](s"mu_$i")).toSeq
      val stds = (0 until d).map { i =>
        val s = stats.getAs[Double](s"sd_$i"); if (s == 0.0) 1.0 else s
      }.toSeq

      val y = col("y")
      val xhat = (0 until d).map(i =>
        (col(s"r_$i") - lit(means(i))) / lit(stds(i)))
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
        val g = raw.agg(gradCols.head, gradCols.tail: _*).collect()(0)
        w = Array.tabulate(d)(i =>
          w(i) - learningRate * (g.getAs[Double](s"g_$i") / n + l2 * w(i)))
        b -= learningRate * g.getAs[Double]("g_b") / n
        iter += 1
      }
      LogisticModel(featureCols, w.toSeq, b, means, stds)
    } finally raw.unpersist(blocking = false)
  }

  /** The model's affine score z = Σ wᵢ·(xᵢ−μᵢ)/σᵢ + b as a Column —
    * a pure per-row projection. Every operation is an IEEE
    * correctly-rounded mult/add/div applied in one FIXED left-to-
    * right order, so z is BIT-deterministic across engines (unlike
    * σ(z), whose exp goes through libm) — the property the
    * driver-checked scoring query relies on. */
  def linearScore(model: LogisticModel): Column =
    model.features.zipWithIndex.map { case (c, i) =>
      ((col(c).cast("double") - lit(model.means(i))) / lit(model.stds(i))) *
        lit(model.weights(i))
    }.foldLeft(lit(model.bias): Column)(_ + _)

  /** Apply a trained model: adds `probCol` = σ(w·x̂ + b) — a pure
    * per-row projection, zero shuffle, the corpus-scoring pass of the
    * quality-filter recipe (follow with a threshold filter or
    * `TextOps.qualityNtile`-style slicing). */
  def scoreLogistic(df: DataFrame, model: LogisticModel,
                    probCol: String = "prob"): DataFrame =
    df.withColumn(probCol, sigmoid(linearScore(model)))

  /** One calibration bin: its id, the exact row/positive counts it
    * aggregated, the raw positive rate, and the isotonic-calibrated
    * probability (non-decreasing in bin id). */
  final case class CalibrationBin(bin: Long, n: Long, pos: Long,
                                  rate: Double, calibrated: Double)

  /** Fitted isotonic calibration: equi-width binning constants plus
    * the per-bin table (present bins only, ascending). Apply with
    * [[applyCalibration]]; inspect/declare with
    * [[calibrationTable]]. */
  final case class IsotonicModel(lo: Double, hi: Double, nBins: Int,
                                 bins: Seq[CalibrationBin]) {
    require(nBins >= 1 && bins.nonEmpty)
  }

  /** Isotonic (PAV) probability calibration of a classifier score —
    * the step [[trainLogistic]]'s raw log-odds need before a
    * production quality filter can threshold on probabilities (the
    * FineWeb-Edu recipe bins by score and keeps calibrated slices).
    *
    * Fit = ONE stats pass (score min/max, loud null/NaN reject — the
    * trainer's silently-wrong-model contract) + ONE partial-
    * aggregable groupBy over `nBins` equi-width score bins shipping
    * ≤ nBins narrow rows to the driver, where pool-adjacent-
    * violators runs on the gated bin table (the connected-components
    * local-solve discipline: driver work bounded by a constant, not
    * the corpus). Corpus cost is two scans — at 100 TB the binning
    * aggregate is map-side-combined to nBins rows per task.
    *
    * Numeric contract (what makes the declared query hash-match a
    * SQL oracle): bin counts are exact integers; every reported rate
    * is ONE correctly-rounded double division of those integers; the
    * PAV pooled value for a run [j..k] is (Σpos)/(Σn) computed the
    * same way — and because weighted isotonic regression satisfies
    * the minimax characterization f(i) = max_{j≤i} min_{k≥i}
    * avg(j,k) and double rounding is monotone, the driver PAV below
    * is bit-identical to an engine-independent min/max over interval
    * averages. Empty bins are simply absent (PAV runs over the
    * present-bin sequence).
    *
    * `labelCol` must be 0/1 (integer-exact positives); scores with
    * null/NaN/±Inf reject loudly. All-equal scores land in bin 0. */
  def isotonicFit(df: DataFrame, scoreCol: String, labelCol: String,
                  nBins: Int = 10): IsotonicModel = {
    require(nBins >= 1 && nBins <= 100000,
      s"need 1 <= nBins <= 100000 (the driver solves the gated bin table), got $nBins")
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("long")
    def bad(x: Column): Column =
      x.isNull || isnan(x) || x === Double.PositiveInfinity ||
        x === Double.NegativeInfinity
    val stats = df.agg(
      min(s).as("lo"), max(s).as("hi"), count(lit(1)).as("n"),
      sum(when(bad(s) || y.isNull || (y =!= 0L && y =!= 1L), 1L)
        .otherwise(0L)).as("n_bad")).collect()(0)
    require(stats.getAs[Long]("n") > 0, "cannot calibrate on an empty frame")
    val nBad = stats.getAs[Long]("n_bad")
    if (nBad > 0)
      throw new IllegalArgumentException(
        s"isotonicFit: $nBad row(s) have a null/non-finite '$scoreCol' or a " +
          s"'$labelCol' outside {0, 1} — they would silently skew every bin " +
          "rate; fix or filter the input")
    val lo = stats.getAs[Double]("lo")
    val hi = stats.getAs[Double]("hi")
    // bin = min(floor((s − lo)·nBins / (hi − lo)), nBins−1): the
    // q_histogram equi-width form, every op IEEE correctly-rounded in
    // a fixed order so the assignment is engine-independent; s = hi
    // lands in the last bin, an all-equal column in bin 0
    val bin =
      if (hi == lo) lit(0L)
      else least(floor((s - lit(lo)) * lit(nBins.toDouble) / lit(hi - lo)),
        lit((nBins - 1).toLong))
    val grouped = df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"), sum(y).as("pos"))
      .collect().map(r =>
        (r.getAs[Long]("bin"), r.getAs[Long]("n"), r.getAs[Long]("pos")))
      .sortBy(_._1)
    // PAV over the present-bin sequence: pool while the previous
    // run's rate exceeds the next's. Pooled value = ONE double
    // division of the exact pooled integers (the minimax-equality
    // contract above).
    case class Run(lastBin: Int, n: Long, pos: Long) {
      def value: Double = pos.toDouble / n.toDouble
    }
    val runs = scala.collection.mutable.ArrayBuffer.empty[Run]
    val members = scala.collection.mutable.ArrayBuffer.empty[Int] // run idx per bin
    for (((_, n, pos), i) <- grouped.zipWithIndex) {
      runs += Run(i, n, pos)
      while (runs.length >= 2 &&
             runs(runs.length - 2).value > runs.last.value) {
        val b = runs.remove(runs.length - 1)
        val a = runs.remove(runs.length - 1)
        runs += Run(b.lastBin, a.n + b.n, a.pos + b.pos)
      }
    }
    for ((r, ri) <- runs.zipWithIndex; _ <- members.length to r.lastBin)
      members += ri
    val binsOut = grouped.zipWithIndex.map { case ((b, n, pos), i) =>
      CalibrationBin(b, n, pos, pos.toDouble / n.toDouble,
        runs(members(i)).value)
    }.toSeq
    IsotonicModel(lo, hi, nBins, binsOut)
  }

  /** The fitted calibration as a frame — (bin, n, pos, rate,
    * calibrated), one row per PRESENT bin — the reliability-diagram
    * table and the declared-query surface of [[isotonicFit]]. */
  def calibrationTable(spark: org.apache.spark.sql.SparkSession,
                       model: IsotonicModel): DataFrame = {
    import spark.implicits._
    model.bins.map(b => (b.bin, b.n, b.pos, b.rate, b.calibrated))
      .toDF("bin", "n", "pos", "rate", "calibrated")
  }

  /** Apply a fitted calibration: adds `probCol` = the isotonic
    * probability of the row's score — a pure per-row projection
    * (bin arithmetic + one literal-array lookup), zero shuffle, the
    * same scoring shape as [[scoreLogistic]]. Scores outside the
    * training range clamp to the edge bins; scores landing in a bin
    * that was EMPTY at fit time take the nearest lower present bin's
    * value (the isotonic step function is right-continuous), or the
    * first present bin's below it. Null/NaN scores get a null
    * probability (scoring is permissive where fitting is strict —
    * a corpus row must not kill the scoring pass). */
  def applyCalibration(df: DataFrame, model: IsotonicModel,
                       scoreCol: String, probCol: String = "calibrated"): DataFrame = {
    // fill the gated bin axis once on the driver: value per bin id =
    // nearest present bin at-or-below, else the first present bin
    val byBin = model.bins.map(b => b.bin -> b.calibrated).toMap
    val filled = new Array[Double](model.nBins)
    var cur = model.bins.head.calibrated
    for (i <- 0 until model.nBins) {
      cur = byBin.getOrElse(i.toLong, cur)
      filled(i) = cur
    }
    val s = col(scoreCol).cast("double")
    // ±Inf clamps to the edge bins BEFORE the floor arithmetic —
    // floor(±Infinity) has no integer value to give
    val sClamped = greatest(lit(model.lo), least(lit(model.hi), s))
    val bin =
      if (model.hi == model.lo) lit(0L)
      else least(
        floor((sClamped - lit(model.lo)) * lit(model.nBins.toDouble) /
          lit(model.hi - model.lo)),
        lit((model.nBins - 1).toLong))
    df.withColumn(probCol,
      when(s.isNull || isnan(s), lit(null).cast("double"))
        .otherwise(element_at(lit(filled), (bin + 1L).cast("int"))))
  }
}
