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

  test("echemPng: decodable raster twin with the figure's structural pixels") {
    val pts = Seq((0.0, 1.0), (0.5, 4.0), (1.0, 7.0))
    val png = Figure.echemPng("mp-1-111-0", pts, pzc = 0.123, capacitance = 6.0)
    // PNG magic + ImageIO roundtrip at the declared canvas size
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 500 && img.getHeight == 300)
    def rgb(x: Int, y: Int) = img.getRGB(x, y) & 0xFFFFFF
    assert(rgb(2, 2) == 0xFFFFFF, "background is white")
    // the axes box is black at its top-left corner (X0=72, Y0=34)
    assert(rgb(72, 34) == 0x000000, "axes box corner")
    // red pixels exist (fit line + annotations), black point disks exist
    val colors = (0 until 500).flatMap(x => (0 until 300).map(y => rgb(x, y)))
    assert(colors.count(_ == 0xFF0000) > 50, "red fit line / annotations")
    assert(colors.count(_ == 0x000000) > 100, "points + axes + text")
    // byte-deterministic within this JVM
    assert(Figure.echemPng("mp-1-111-0", pts, 0.123, 6.0).toSeq == png.toSeq)
  }

  test("echemPng and echemSvg share geometry: the fit line endpoints agree") {
    // a steep fit pushes the y-range: both artifacts must place the
    // line at the same canvas rows (SVG coords vs raster red pixels)
    val pts = Seq((0.0, 0.0), (1.0, 10.0))
    val svg = Figure.echemSvg("m", pts, 0.5, 10.0)
    val png = Figure.echemPng("m", pts, 0.5, 10.0)
    val line = svg.linesIterator.find(l => l.contains("stroke=\"red\"") && l.contains("<line")).get
    val x1 = "x1=\"([0-9.]+)\"".r.findFirstMatchIn(line).get.group(1).toDouble
    val y1 = "y1=\"([0-9.]+)\"".r.findFirstMatchIn(line).get.group(1).toDouble
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    // a red pixel sits within the dash pattern's reach of the SVG endpoint
    val found = (-6 to 6).exists(dx => (-6 to 6).exists(dy => {
      val (px, py) = (x1.toInt + dx, y1.toInt + dy)
      px >= 0 && px < 500 && py >= 0 && py < 300 &&
        (img.getRGB(px, py) & 0xFFFFFF) == 0xFF0000
    }))
    assert(found, s"no red pixel near SVG fit-line start ($x1, $y1)")
  }

  test("structPng: side-view CPK render with element colors and painter order") {
    val slab = Schemas.Slab("t", "t", 1.0,
      Seq(Seq(4.0, 0, 0), Seq(0, 4.0, 0), Seq(0, 0, 8.0)),
      Seq("V", "O"), Seq(1, 2),
      Seq(Schemas.Atom(0.5, 0.5, 0.25, "V"),
          Schemas.Atom(0.25, 0.5, 0.5, "O"), Schemas.Atom(0.75, 0.5, 0.75, "O")),
      Seq.empty)
    val png = Figure.structPng(slab)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 300 && img.getHeight == 300)
    val colors = (0 until 300).flatMap(x => (0 until 300).map(y => img.getRGB(x, y) & 0xFFFFFF))
    assert(colors.count(_ == 0xFF0D0D) > 50, "O atoms render in CPK red")
    assert(colors.count(_ == 0xA6A6AB) > 50, "V atom renders in CPK silver")
    assert(Figure.structPng(slab).toSeq == png.toSeq, "byte-deterministic")
    intercept[IllegalArgumentException](Figure.structPng(slab.copy(positions = Seq.empty)))
  }

  test("combinedPng: echem base + structure inset at the reference's axes fractions") {
    val pts = Seq((0.0, 1.0), (0.5, 4.0), (1.0, 7.0))
    val echem = Figure.echemPng("m", pts, 0.1, 6.0)
    val slab = Schemas.Slab("t", "t", 1.0,
      Seq(Seq(4.0, 0, 0), Seq(0, 4.0, 0), Seq(0, 0, 8.0)),
      Seq("O"), Seq(1), Seq(Schemas.Atom(0.5, 0.5, 0.5, "O")), Seq.empty)
    val struct = Figure.structPng(slab)
    val png = Figure.combinedPng(echem, struct)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 600 && img.getHeight == 400)
    // the inset rect [0.55, 0.3, 0.4, 0.4] (bottom-origin) holds the O atom's red
    val insetColors = (330 until 570).flatMap(x => (120 until 280).map(y => img.getRGB(x, y) & 0xFFFFFF))
    assert(insetColors.count(_ == 0xFF0D0D) > 20, "structure inset visible in its rect")
    // the base echem image contributes pixels outside the inset (left half)
    val leftNonWhite = (0 until 300).flatMap(x => (0 until 400).map(y => img.getRGB(x, y) & 0xFFFFFF))
      .count(_ != 0xFFFFFF)
    assert(leftNonWhite > 100, "echem base visible")
  }

  test("degenerate spans terminate: ulp-apart points and NaN rejection") {
    // two potentials one ulp apart once hung tick generation forever
    // (first + step rounded back to first); the count-based form
    // must terminate and still emit at least one tick
    val tiny = Seq((1.0, 2.0), (1.0000000000000002, 3.0))
    val svg = Figure.echemSvg("m", tiny, 0.5, 1.0)
    assert(svg.contains("<svg"))
    // a NaN point is rejected loudly (writeReport pre-filters it)
    intercept[IllegalArgumentException] {
      Figure.echemSvg("m", Seq((0.1, Double.NaN), (0.2, 3.0)), 0.5, 1.0)
    }
  }
}
