package graft.echem

import java.util.Locale

/** The reference's electrochemistry figure
  * (`dags/my_dag.py:172-183`: matplotlib scatter of (φ, σₑ), red
  * dotted deg-1 fit, capacitance/PZC annotations, material title)
  * re-expressed as a DEPENDENCY-FREE deterministic SVG string.
  *
  * Declared divergence, vector for raster: the engine has no
  * matplotlib and must not take on native imaging dependencies, so
  * the artifact is an SVG with the same curves, labels, and
  * annotation text — byte-deterministic for a given input (every
  * number formats through Locale.ROOT), which makes the figure
  * GOLDEN-testable where a PNG raster would be toolkit-dependent.
  * Rendering is pure string assembly on the driver over the final,
  * already-aggregated handful of points — the terminal human-facing
  * artifact, same as the reference's `plt.savefig`.
  */
object Figure {

  private val W = 500.0
  private val H = 300.0
  // plot box (matplotlib-ish margins for the 5x3in reference figure)
  private val X0 = 72.0
  private val X1 = 484.0
  private val Y0 = 34.0 // top
  private val Y1 = 252.0 // bottom

  private def fmt(v: Double, digits: Int): String =
    String.format(Locale.ROOT, s"%.${digits}f", Double.box(v))

  /** XML-escape free text (the material title comes from a filename
    * that may carry '&'/'<' — unescaped it breaks the whole SVG). */
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** σₑ-vs-φ figure for one material.
    *
    * @param title       material key (the reference's filename title)
    * @param points      (pot, rhoe) series, any order; ≥ 2 distinct pots
    * @param pzc         annotated PZC, V vs SHE
    * @param capacitance annotated + drawn fit slope, µF/cm²
    * @return complete standalone SVG document
    */
  def echemSvg(title: String, points: Seq[(Double, Double)],
               pzc: Double, capacitance: Double): String = {
    require(points.nonEmpty, "echemSvg needs at least one point")
    val xs = points.map(_._1)
    val ys = points.map(_._2)
    // fit intercept from the drawn slope: b = ȳ − m·x̄ (the same
    // least-squares line the reference draws via np.polyfit)
    val xbar = xs.sum / xs.length
    val ybar = ys.sum / ys.length
    val b = ybar - capacitance * xbar

    def padRange(lo: Double, hi: Double): (Double, Double) = {
      val span = if (hi - lo > 0) hi - lo else math.max(math.abs(hi), 1.0)
      (lo - 0.08 * span, hi + 0.08 * span)
    }
    val (xLo, xHi) = padRange(xs.min, xs.max)
    val fitYs = Seq(capacitance * xLo + b, capacitance * xHi + b)
    val (yLo, yHi) = padRange(math.min(ys.min, fitYs.min), math.max(ys.max, fitYs.max))

    def sx(x: Double): Double = X0 + (x - xLo) / (xHi - xLo) * (X1 - X0)
    def sy(y: Double): Double = Y1 - (y - yLo) / (yHi - yLo) * (Y1 - Y0)

    def ticks(lo: Double, hi: Double): Seq[Double] = {
      val rawStep = (hi - lo) / 4.0
      val mag = math.pow(10, math.floor(math.log10(rawStep)))
      val step = Seq(1.0, 2.0, 2.5, 5.0, 10.0).map(_ * mag).find(_ >= rawStep).get
      val first = math.ceil(lo / step) * step
      Iterator.iterate(first)(_ + step).takeWhile(_ <= hi + 1e-12).toSeq
    }
    // smallest decimal count that round-trips every tick (a 2.5-step
    // family needs one MORE digit than its magnitude suggests: %.0f
    // would label the 2.5 tick "3")
    def tickDigits(ts: Seq[Double]): Int =
      if (ts.isEmpty) 2
      else (0 to 6).find { d =>
        ts.forall(t => math.abs(fmt(t, d).toDouble - t) < 1e-9 * math.max(1.0, math.abs(t)))
      }.getOrElse(6)

    val xT = ticks(xLo, xHi)
    val yT = ticks(yLo, yHi)
    val xd = tickDigits(xT)
    val yd = tickDigits(yT)

    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 ${W.toInt} ${H.toInt}" font-family="sans-serif">\n"""
    sb ++= s"""<rect width="${W.toInt}" height="${H.toInt}" fill="white"/>\n"""
    // axes box
    sb ++= s"""<rect x="${fmt(X0, 1)}" y="${fmt(Y0, 1)}" width="${fmt(X1 - X0, 1)}" height="${fmt(Y1 - Y0, 1)}" fill="none" stroke="black" stroke-width="1"/>\n"""
    // ticks + labels (labelsize 13 in the reference)
    xT.foreach { t =>
      val x = fmt(sx(t), 1)
      sb ++= s"""<line x1="$x" y1="${fmt(Y1, 1)}" x2="$x" y2="${fmt(Y1 + 5, 1)}" stroke="black"/>\n"""
      sb ++= s"""<text x="$x" y="${fmt(Y1 + 18, 1)}" font-size="13" text-anchor="middle">${fmt(t, xd)}</text>\n"""
    }
    yT.foreach { t =>
      val y = fmt(sy(t), 1)
      sb ++= s"""<line x1="${fmt(X0 - 5, 1)}" y1="$y" x2="${fmt(X0, 1)}" y2="$y" stroke="black"/>\n"""
      sb ++= s"""<text x="${fmt(X0 - 8, 1)}" y="$y" font-size="13" text-anchor="end" dominant-baseline="middle">${fmt(t, yd)}</text>\n"""
    }
    // axis labels (fontsize 14) + title (13), the reference's text
    sb ++= s"""<text x="${fmt((X0 + X1) / 2, 1)}" y="${fmt(H - 6, 1)}" font-size="14" text-anchor="middle">&#x3C6; (V vs. SHE)</text>\n"""
    sb ++= s"""<text x="14" y="${fmt((Y0 + Y1) / 2, 1)}" font-size="14" text-anchor="middle" transform="rotate(-90 14 ${fmt((Y0 + Y1) / 2, 1)})">&#x3C3;&#x2091; (&#xB5;C/cm&#xB2;)</text>\n"""
    sb ++= s"""<text x="${fmt((X0 + X1) / 2, 1)}" y="${fmt(Y0 - 10, 1)}" font-size="13" text-anchor="middle">${esc(title)}</text>\n"""
    // red dotted fit line (':' c='r')
    sb ++= s"""<line x1="${fmt(sx(xLo), 1)}" y1="${fmt(sy(capacitance * xLo + b), 1)}" x2="${fmt(sx(xHi), 1)}" y2="${fmt(sy(capacitance * xHi + b), 1)}" stroke="red" stroke-width="1.5" stroke-dasharray="2,4"/>\n"""
    // black circles ('o' c='k'), sorted for determinism
    points.sortBy(p => (p._1, p._2)).foreach { case (x, y) =>
      sb ++= s"""<circle cx="${fmt(sx(x), 1)}" cy="${fmt(sy(y), 1)}" r="4" fill="black"/>\n"""
    }
    // annotations at axes-fraction (0.1, 0.9) and (0.1, 0.8), red 12pt
    def axesFrac(fx: Double, fy: Double): (Double, Double) =
      (X0 + fx * (X1 - X0), Y1 - fy * (Y1 - Y0))
    val (ax1, ay1) = axesFrac(0.1, 0.9)
    val (ax2, ay2) = axesFrac(0.1, 0.8)
    sb ++= s"""<text x="${fmt(ax1, 1)}" y="${fmt(ay1, 1)}" font-size="12" fill="red">Capacitance: ${fmt(capacitance, 2)} &#xB5;F/cm&#xB2;</text>\n"""
    sb ++= s"""<text x="${fmt(ax2, 1)}" y="${fmt(ay2, 1)}" font-size="12" fill="red">PZC: ${fmt(pzc, 3)} V vs. SHE</text>\n"""
    sb ++= "</svg>\n"
    sb.toString
  }
}
