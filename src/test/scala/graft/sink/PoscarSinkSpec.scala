package graft.sink

import graft.SparkSpec
import graft.echem.PoscarCodec

/** File-per-row sink roundtrip: write → re-read → same structures. */
class PoscarSinkSpec extends SparkSpec {

  test("POSCAR sink writes one file per slab; roundtrip preserves geometry (op #5)") {
    val slabs = PoscarCodec.read(spark, fixturePath("slab_poscars"))
    val out = java.nio.file.Files.createTempDirectory("graft-poscar-sink").toString
    PoscarSink.write(slabs, out)

    val files = new java.io.File(out).listFiles().map(_.getName).sorted
    assert(files.toSeq == Seq("mp-755394-111-3.poscar"))

    val back = PoscarCodec.read(spark, out).collect().head
    val orig = slabs.collect().head
    assert(back.mpKey == orig.mpKey && back.nAtoms == orig.nAtoms)
    assert(math.abs(back.cell(0, 0) - orig.cell(0, 0)) < 1e-12)
  }
}
