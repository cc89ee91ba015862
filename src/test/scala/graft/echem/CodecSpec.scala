package graft.echem

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import graft.SparkSpec

/** Golden-fixture tests for the POSCAR codec and JDFTx deck renderer
  * (fixtures copied from the reference's published outputs —
  * SURVEY.md §5 values).
  */
class CodecSpec extends SparkSpec {

  private def slurp(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), StandardCharsets.UTF_8)

  lazy val goldenSlab = PoscarCodec.parse(
    "mp-755394-111-3", slurp(fixturePath("slab_poscars/mp-755394-111-3.poscar")))

  test("POSCAR parse: golden slab geometry (FIXTURES.md A1)") {
    assert(goldenSlab.title == "V10 O20")
    assert(goldenSlab.scale == 1.0)
    assert(goldenSlab.cell(0, 0) == 5.6881524815949263)
    assert(goldenSlab.cell(1, 1) == 4.3557533104979962)
    assert(goldenSlab.nAtoms == 30)
    assert(goldenSlab.counts.sum == 30)
    assert(goldenSlab.positions.count(_.element == "V") == 10)
    assert(goldenSlab.positions.count(_.element == "O") == 20)
  }

  test("POSCAR render/parse roundtrip") {
    val rt = PoscarCodec.parse(goldenSlab.mpKey, PoscarCodec.render(goldenSlab))
    assert(rt.title == goldenSlab.title)
    assert(rt.species == goldenSlab.species)
    assert(rt.counts == goldenSlab.counts)
    assert(rt.lattice.flatten.zip(goldenSlab.lattice.flatten).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(rt.positions.zip(goldenSlab.positions).forall { case (a, b) =>
      math.abs(a.x - b.x) < 1e-12 && math.abs(a.z - b.z) < 1e-12 && a.element == b.element })
  }

  test("distributed POSCAR read (op #3)") {
    val ds = PoscarCodec.read(spark, fixturePath("slab_poscars"))
    val s = ds.collect().head
    assert(s.mpKey == "mp-755394-111-3")
    assert(s.nAtoms == 30)
  }

  test("JDFTx deck render matches golden .in byte-for-byte (op #6)") {
    val golden = slurp(fixturePath("gc_dft/mp-755394-111-3_0.0.in"))
    val rendered = JdftxDeck.render(goldenSlab, 0.0)
    assert(rendered == golden)
  }

  test("deck render: charge formatting matches python repr") {
    val d = JdftxDeck.render(goldenSlab, -0.1)
    assert(d.endsWith("elec-initial-charge -0.1"))
    assert(JdftxDeck.render(goldenSlab, 0.1).endsWith("elec-initial-charge 0.1"))
    // the Java-scientific / Python-plain overlap: f"{0.0005}" is
    // '0.0005' in Python while Double.toString says "5.0E-4"
    assert(JdftxDeck.render(goldenSlab, 0.0005).endsWith("elec-initial-charge 0.0005"))
    assert(JdftxDeck.render(goldenSlab, -0.0005).endsWith("elec-initial-charge -0.0005"))
    // f"{-0.0}" keeps the sign
    assert(JdftxDeck.render(goldenSlab, -0.0).endsWith("elec-initial-charge -0.0"))
    assert(JdftxDeck.render(goldenSlab, 0.0).endsWith("elec-initial-charge 0.0"))
  }

  test("directory scans skip stray files instead of aborting the job") {
    import java.nio.file.{Files, Paths}
    import java.nio.charset.StandardCharsets
    // copy a valid POSCAR next to a README; the scan must parse one
    // row and ignore the other (previously: NumberFormatException
    // killed the whole scan)
    val dir = Files.createTempDirectory("graft-stray").toString
    val src = Paths.get(fixturePath("slab_poscars"))
    val first = Files.list(src).filter(_.toString.endsWith(".poscar")).findFirst().get()
    Files.copy(first, Paths.get(dir, first.getFileName.toString))
    Files.write(Paths.get(dir, "README.txt"),
      "not a poscar\nat all".getBytes(StandardCharsets.UTF_8))
    assert(PoscarCodec.read(spark, dir).collect().length == 1)

    // a .out file with a non-conforming name and an EMPTY log: the
    // name is dropped (null charge) and an empty log yields null
    // metrics — neither aborts under ANSI
    val logDir = Files.createTempDirectory("graft-straylogs").toString
    Files.write(Paths.get(logDir, "weird.out"),
      "no metrics here".getBytes(StandardCharsets.UTF_8))
    // (a fully EMPTY file yields no wholetext row at all — use a
    // crashed-early log with content but zero FillingsUpdate lines)
    Files.write(Paths.get(logDir, "mp-1-111-1_0.0.out"),
      "crashed before any FillingsUpdate\n".getBytes(StandardCharsets.UTF_8))
    val m = JdftxOutParser.metrics(spark, logDir).collect()
    assert(m.length == 1, s"only the conforming filename survives, got ${m.toSeq}")
    assert(m.head.isNullAt(m.head.fieldIndex("mu")),
      "a metric-less log yields null mu, not an element_at abort")
  }

  test("corrupt POSCARs fail as one IAE naming the file, never a bare parse exception") {
    import graft.echem.PoscarCodec.parse
    val good = PoscarCodec.render(goldenSlab)
    // every line-truncation of a valid file: pre-hardening, short
    // files threw ArrayIndexOutOfBounds (NOT an IAE) with no context
    val lines = good.split("\n")
    (0 until lines.length).foreach { n =>
      val e = intercept[IllegalArgumentException](parse("mp-x", lines.take(n).mkString("\n")))
      assert(e.getMessage.startsWith("malformed POSCAR 'mp-x'"), s"trunc$n: ${e.getMessage}")
    }
    // non-numeric scale / lattice / position tokens name the file too
    Seq(good.replaceFirst("1\\.0", "one"),
        good.replaceFirst("direct", "cartesian"),
        good.replaceFirst("(?m)^(\\S+ \\S+) \\S+ ", "$1 ")).foreach { bad =>
      if (bad != good)
        assert(intercept[IllegalArgumentException](parse("mp-x", bad))
          .getMessage.startsWith("malformed POSCAR 'mp-x'"))
    }
    // counts/species length mismatch: pre-hardening species(-1)
    val mismatch = good.split("\n").zipWithIndex.map {
      case (l, 6) => l + " 2"
      case (l, _) => l
    }.mkString("\n")
    assert(intercept[IllegalArgumentException](parse("mp-x", mismatch))
      .getMessage.contains("species but"))
    // Int-wrapping counts: pre-hardening 2e9+2e9 summed NEGATIVE and
    // parsed into a silently ATOM-LESS slab under a billion-atom header
    val overflow = good.split("\n").zipWithIndex.map {
      case (_, 5) => "Pt Cu"
      case (_, 6) => "2000000000 2000000000"
      case (l, _) => l
    }.mkString("\n")
    assert(intercept[IllegalArgumentException](parse("mp-x", overflow))
      .getMessage.contains("atoms but only"))
  }
}
