package graft.echem

import org.apache.spark.sql.Dataset
import Schemas.{Atom, Slab}

/** Slab generation (op #24): the 1-bulk → N-slabs fan-out of
  * `SlabGenerator(...).get_slabs(symmetrize=True)`
  * (`dags/my_dag.py:84-99`).
  *
  * SURVEY.md §2e scopes v1 to a *simplified deterministic geometric
  * cut with the same cardinality contract*: for each (bulk, facet)
  * emit `nShifts` slabs, key `{id}-{facet}-{i}`
  * (`dags/my_dag.py:93-95`). Each slab stacks `layers` bulk cells
  * along c, adds vacuum, and rescales fractional z accordingly — a
  * stand-in for the full Miller-plane reorientation, replaceable
  * without touching the pipeline shape.
  *
  * Runs as `Dataset.flatMap` — the fan-out executes inside
  * executors, so a million bulks × facets never touches the driver.
  */
object SlabGen {

  val DefaultLayers = 3
  val DefaultVacuumFrac = 0.4

  def cut(bulk: Slab, facet: String, nShifts: Int,
          layers: Int = DefaultLayers, vacuumFrac: Double = DefaultVacuumFrac): Seq[Slab] = {
    val stack = 1.0 + vacuumFrac // total c in units of (layers · c_bulk)
    val cScale = layers * stack
    val lattice = Seq(
      bulk.lattice(0),
      bulk.lattice(1),
      bulk.lattice(2).map(_ * cScale))
    (0 until nShifts).map { i =>
      val shift = i.toDouble / nShifts // fractional termination shift
      val atoms = for {
        l <- 0 until layers
        a <- bulk.positions
      } yield {
        val zBulk = (a.z + shift) % 1.0
        Atom(a.x, a.y, (l + zBulk) / cScale, a.element)
      }
      Slab(
        mpKey = s"${bulk.mpKey}-$facet-$i",
        title = bulk.title,
        scale = bulk.scale,
        lattice = lattice,
        species = bulk.species,
        counts = bulk.counts.map(_ * layers),
        positions = atoms,
        fixed = Seq.empty)
    }
  }

  /** Distributed fan-out: bulks × facets → slabs. */
  def generate(bulks: Dataset[Slab], facets: Seq[String], nShifts: Int): Dataset[Slab] = {
    import bulks.sparkSession.implicits._
    bulks.flatMap(b => facets.flatMap(f => cut(b, f, nShifts)))
  }
}
