package graft.echem

import org.scalatest.funsuite.AnyFunSuite

/** The SVG electrochemistry figure — structural parity with the
  * reference's matplotlib plot (`dags/my_dag.py:172-183`) and the
  * byte-determinism that makes the artifact golden-testable.
  */
class FigureSpec extends AnyFunSuite {

  private val pts = Seq((-0.5, -3.2), (0.1, 0.4), (0.7, 4.1))

  test("figure carries the reference plot's elements") {
    val svg = Figure.echemSvg("mp-1-111-0", pts, pzc = 0.123456, capacitance = 6.789)
    // one black circle per point
    assert("<circle ".r.findAllIn(svg).length == 3)
    assert(svg.contains("fill=\"black\""))
    // red dotted fit line
    assert(svg.contains("stroke=\"red\"") && svg.contains("stroke-dasharray"))
    // the reference's exact annotation formats: %.2f capacitance, %.3f pzc
    assert(svg.contains("Capacitance: 6.79"), svg)
    assert(svg.contains("PZC: 0.123 V vs. SHE"), svg)
    // axis labels and title
    assert(svg.contains("(V vs. SHE)") && svg.contains("C/cm"))
    assert(svg.contains("mp-1-111-0"))
  }

  test("figure is byte-deterministic and locale-independent") {
    val a = Figure.echemSvg("m", pts, 0.1, 2.0)
    val b = Figure.echemSvg("m", pts, 0.1, 2.0)
    assert(a == b)
    // numbers must use '.' decimals regardless of default locale
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY) // uses ','
      assert(Figure.echemSvg("m", pts, 0.1, 2.0) == a)
    } finally java.util.Locale.setDefault(prev)
  }

  test("2.5-step tick family labels carry the needed decimal digit") {
    // y data 0..7 with padding selects the 2.5 step; %.0f would
    // mislabel the 2.5 tick as "3"
    val svg = Figure.echemSvg("m", Seq((0.0, 0.0), (0.5, 3.5), (1.0, 7.0)), 0.0, 7.0)
    assert(svg.contains(">2.5<"), svg)
    assert(!svg.contains(">3<"), svg)
  }

  test("title is XML-escaped") {
    val svg = Figure.echemSvg("a&b<c", pts, 0.1, 2.0)
    assert(svg.contains("a&amp;b&lt;c"))
    assert(!svg.contains("a&b<c"))
  }

  test("all marks land inside the plot box") {
    val svg = Figure.echemSvg("m", pts, 0.1, 6.0)
    val circles = """cx="([0-9.]+)" cy="([0-9.]+)"""".r
      .findAllMatchIn(svg).map(m => (m.group(1).toDouble, m.group(2).toDouble)).toSeq
    assert(circles.nonEmpty)
    circles.foreach { case (cx, cy) =>
      assert(cx >= 72.0 && cx <= 484.0, s"cx $cx outside box")
      assert(cy >= 34.0 && cy <= 252.0, s"cy $cy outside box")
    }
    intercept[IllegalArgumentException](Figure.echemSvg("m", Seq.empty, 0, 0))
  }
}
