package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden parity with CPython 3's `random` module — every expected
  * value below was produced by the stdlib on this exact input
  * (`random.seed(s)` then the listed calls), covering both sample()
  * selection paths and the multi-word big-seed key split.
  */
class PyRandomSpec extends AnyFunSuite {

  private val ids = (1 to 25).map(i => s"mp-$i")
  private val big = (0 until 2000).map(i => f"doc-$i%04d")

  test("getrandbits(32) streams match CPython for small and multi-word seeds") {
    assert((1 to 6).map(_ => new PyRandom(27L).getrandbits(32)).head == 2785274337L)
    val r27 = new PyRandom(27L)
    assert((1 to 6).map(_ => r27.getrandbits(32)) ==
      Seq(2785274337L, 2061077104L, 3012359258L, 1190644202L, 4110485569L, 1228256885L))
    val r20 = new PyRandom(20L)
    assert((1 to 3).map(_ => r20.getrandbits(32)) ==
      Seq(3889692776L, 3104401924L, 2947439163L))
    // 2^40 + 7 needs the little-endian multi-word key split
    val rBig = new PyRandom(BigInt(2).pow(40) + 7)
    assert((1 to 3).map(_ => rBig.getrandbits(32)) ==
      Seq(2635837658L, 3209733218L, 3500038837L))
  }

  test("sample: rejection-set path matches CPython (n=25, k=5 and k=1)") {
    assert(new PyRandom(27L).sample(ids, 5) ==
      Seq("mp-21", "mp-16", "mp-23", "mp-9", "mp-10"))
    // the reference's exact pick-1 shape (`random.seed(20); sample(.., 1)`)
    assert(new PyRandom(20L).sample(ids, 1) == Seq("mp-24"))
  }

  test("sample: pool Fisher-Yates path matches CPython (n=25, k=25)") {
    assert(new PyRandom(27L).sample(ids, 25) == Seq(
      "mp-21", "mp-16", "mp-23", "mp-9", "mp-10", "mp-7", "mp-3", "mp-19",
      "mp-22", "mp-11", "mp-5", "mp-6", "mp-20", "mp-18", "mp-4", "mp-24",
      "mp-8", "mp-2", "mp-14", "mp-13", "mp-15", "mp-1", "mp-12", "mp-17",
      "mp-25"))
  }

  test("sample: large-population draws match CPython") {
    assert(new PyRandom(27L).sample(big, 8) == Seq(
      "doc-1328", "doc-0982", "doc-1436", "doc-0567", "doc-1960",
      "doc-0585", "doc-0402", "doc-0151"))
    assert(new PyRandom(12345L).sample(big, 30).take(10) == Seq(
      "doc-0853", "doc-1500", "doc-0020", "doc-1679", "doc-1690",
      "doc-1644", "doc-0611", "doc-1751", "doc-0754", "doc-1908"))
  }

  test("sample contract: k bounds, empty, and full-population permutation") {
    assert(new PyRandom(1L).sample(ids, 0) == Seq.empty)
    assert(new PyRandom(1L).sample(ids, 25).sorted == ids.sortBy(identity))
    intercept[IllegalArgumentException](new PyRandom(1L).sample(ids, 26))
    intercept[IllegalArgumentException](new PyRandom(1L).sample(ids, -1))
  }
}
