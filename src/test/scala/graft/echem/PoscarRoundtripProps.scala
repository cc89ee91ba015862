package graft.echem

import org.scalacheck.{Gen, Prop, Properties}
import graft.echem.Schemas.{Atom, Slab}

/** ScalaCheck: render∘parse is the identity on arbitrary structures
  * (within float formatting precision) — the codec cannot lose or
  * reorder atoms, species, or lattice rows for ANY input, not just
  * the golden fixtures.
  */
object PoscarRoundtripProps extends Properties("PoscarCodec") {

  private val elementGen = Gen.oneOf("V", "O", "Ti", "Fe", "Na", "Cl")
  private val coordGen = Gen.chooseNum(0.0, 1.0).map(v => math.rint(v * 1e12) / 1e12)
  private val latticeValGen = Gen.chooseNum(-20.0, 20.0).map(v => math.rint(v * 1e10) / 1e10)

  private val slabGen: Gen[Slab] = for {
    nSpecies <- Gen.chooseNum(1, 3)
    species <- Gen.listOfN(nSpecies, elementGen).map(_.distinct).suchThat(_.nonEmpty)
    counts <- Gen.listOfN(species.size, Gen.chooseNum(1, 6))
    lattice <- Gen.listOfN(3, Gen.listOfN(3, latticeValGen))
    coords <- Gen.listOfN(counts.sum, Gen.zip(coordGen, coordGen, coordGen))
  } yield {
    val elements = species.zip(counts).flatMap { case (s, c) => Seq.fill(c)(s) }
    Slab(
      mpKey = "gen-1",
      title = species.mkString(" "),
      scale = 1.0,
      lattice = lattice.map(_.toSeq),
      species = species,
      counts = counts,
      positions = coords.zip(elements).map { case ((x, y, z), e) => Atom(x, y, z, e) },
      fixed = Seq.empty)
  }

  property("render-parse roundtrip preserves structure") = Prop.forAll(slabGen) { s =>
    val rt = PoscarCodec.parse(s.mpKey, PoscarCodec.render(s))
    val latticeOk = rt.lattice.flatten.zip(s.lattice.flatten)
      .forall { case (a, b) => math.abs(a - b) < 1e-9 }
    val atomsOk = rt.positions.size == s.positions.size &&
      rt.positions.zip(s.positions).forall { case (a, b) =>
        math.abs(a.x - b.x) < 1e-9 && math.abs(a.y - b.y) < 1e-9 &&
        math.abs(a.z - b.z) < 1e-9 && a.element == b.element
      }
    (rt.species == s.species) && (rt.counts == s.counts) && latticeOk && atomsOk
  }

  property("deck render emits one ion line per atom for any structure") =
    Prop.forAll(slabGen) { s =>
      val deck = JdftxDeck.render(s, 0.0)
      deck.linesIterator.count(_.startsWith("ion ")) == s.nAtoms
    }
}
