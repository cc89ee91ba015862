package graft.echem

import org.apache.spark.sql.Dataset
import Schemas.{Atom, Slab}

/** Slab generation (op #24): the 1-bulk → N-slabs fan-out of
  * `SlabGenerator(...).get_slabs(symmetrize=True)`
  * (`dags/my_dag.py:84-99`).
  *
  * v2 geometry: the cell is genuinely reoriented to the (hkl) Miller
  * plane before stacking. The in-plane basis comes from the integer
  * scale-factor construction the reference's SlabGenerator uses
  * (pymatgen `core/surface.py`): lattice directions with a zero
  * Miller index lie in the plane directly, and each pair of non-zero
  * indices (m₁ at i₁, m₂ at i₂) contributes the in-plane vector
  * −(lcm/m₁)·eᵢ₁ + (lcm/m₂)·eᵢ₂. The stacking vector is the shortest
  * small-integer lattice combination with a positive component along
  * the plane normal. The bulk is re-expressed in that cell (det(S)
  * bulk cells per oriented cell), stacked `layers` times, vacuum
  * appended, and centered (the reference passes `center_slab=True`).
  *
  * Kept out of scope (documented divergence): pymatgen's primitive
  * reduction (spglib) and `symmetrize=True` termination pruning — the
  * termination dimension here is the deterministic `nShifts` fan-out
  * with the same `{id}-{facet}-{i}` key contract
  * (`dags/my_dag.py:93-95`). For the reference fixture
  * (mp-755394, facet 111) the oriented in-plane cell is already
  * primitive, so the generated lattice matches the reference slab's
  * in-plane geometry exactly (golden-tested on |a|, |b|, γ).
  *
  * Runs as `Dataset.flatMap` — the fan-out executes inside
  * executors, so a million bulks × facets never touches the driver.
  */
object SlabGen {

  val DefaultLayers = 3
  val DefaultVacuumFrac = 0.4

  // ---- tiny fixed-size linear algebra (row-vector convention:
  // cartesian = fractional · B, lattice rows are the cell vectors) ----
  private type M3 = Seq[Seq[Double]]

  private def dot3(u: Seq[Double], v: Seq[Double]): Double =
    u(0) * v(0) + u(1) * v(1) + u(2) * v(2)
  private def norm3(u: Seq[Double]): Double = math.sqrt(dot3(u, u))
  private def det3(m: M3): Double =
    m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
    m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
    m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
  private def inv3(m: M3): M3 = {
    val d = det3(m)
    require(math.abs(d) > 1e-12, "singular lattice")
    val c = Seq(
      Seq(m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1),
          m(0)(2) * m(2)(1) - m(0)(1) * m(2)(2),
          m(0)(1) * m(1)(2) - m(0)(2) * m(1)(1)),
      Seq(m(1)(2) * m(2)(0) - m(1)(0) * m(2)(2),
          m(0)(0) * m(2)(2) - m(0)(2) * m(2)(0),
          m(0)(2) * m(1)(0) - m(0)(0) * m(1)(2)),
      Seq(m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0),
          m(0)(1) * m(2)(0) - m(0)(0) * m(2)(1),
          m(0)(0) * m(1)(1) - m(0)(1) * m(1)(0)))
    c.map(_.map(_ / d))
  }
  private def rowTimes(f: Seq[Double], m: M3): Seq[Double] =
    Seq(f(0) * m(0)(0) + f(1) * m(1)(0) + f(2) * m(2)(0),
        f(0) * m(0)(1) + f(1) * m(1)(1) + f(2) * m(2)(1),
        f(0) * m(0)(2) + f(1) * m(1)(2) + f(2) * m(2)(2))

  private def cross3(u: Seq[Double], v: Seq[Double]): Seq[Double] = Seq(
    u(1) * v(2) - u(2) * v(1), u(2) * v(0) - u(0) * v(2), u(0) * v(1) - u(1) * v(0))

  /** Rigid rotation to the canonical slab frame: a along +x, b in the
    * xy-plane, surface normal along +z. Fractional coordinates are
    * rotation-invariant, and the diagonal-product area the reference
    * uses (`cell[0,0]·cell[1,1]`, dags/my_dag.py:168) becomes exactly
    * |a|·|b|·sin γ — the true in-plane cell area. */
  private def canonicalFrame(m: M3): M3 = {
    val a = m(0); val b = m(1); val c = m(2)
    val ex = a.map(_ / norm3(a))
    val n = cross3(a, b)
    val ez = n.map(_ / norm3(n))
    val ey = cross3(ez, ex)
    Seq(
      Seq(norm3(a), 0.0, 0.0),
      Seq(dot3(b, ex), dot3(b, ey), 0.0),
      Seq(dot3(c, ex), dot3(c, ey), dot3(c, ez)))
  }

  private def gcdInt(a: Int, b: Int): Int = if (b == 0) math.abs(a) else gcdInt(b, a % b)
  private def lcmInt(a: Int, b: Int): Int = math.abs(a / gcdInt(a, b) * b)

  /** Cartesian normal of plane (hkl): the reciprocal-lattice vector
    * h·g₁ + k·g₂ + l·g₃ where aᵢ·gⱼ = δᵢⱼ. */
  private def planeNormal(miller: Seq[Int], lattice: M3): Seq[Double] = {
    // reciprocal rows gⱼ are the columns of B⁻¹, so h·g₁+k·g₂+l·g₃
    // is B⁻¹ applied to (h,k,l) componentwise on its rows
    val binv = inv3(lattice)
    val m = miller.map(_.toDouble)
    (0 until 3).map(d => dot3(binv(d), m))
  }

  /** Integer rows (v₁, v₂, w): two in-plane vectors + the stacking
    * vector, in bulk-lattice coordinates. */
  private[echem] def millerScaleFactors(miller: Seq[Int], lattice: M3): Seq[Seq[Int]] = {
    require(miller.length == 3 && miller.exists(_ != 0), s"bad miller index $miller")
    val eye = Seq(Seq(1, 0, 0), Seq(0, 1, 0), Seq(0, 0, 1))
    val inPlane = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
    miller.zipWithIndex.foreach { case (m, i) => if (m == 0) inPlane += eye(i) }
    val nonZero = miller.zipWithIndex.filter(_._1 != 0)
    if (nonZero.length > 1) {
      val l = nonZero.map(p => math.abs(p._1)).reduce(lcmInt)
      nonZero.combinations(2).foreach { case Seq((m1, i1), (m2, i2)) =>
        if (inPlane.length < 2) {
          val v = Array(0, 0, 0)
          v(i1) = -l / m1
          v(i2) = l / m2
          inPlane += v.toSeq
        }
      }
    }
    require(inPlane.length >= 2, s"could not build in-plane basis for $miller")

    // stacking vector: shortest small-integer combination with a
    // positive projection on the plane normal (deterministic tie-break)
    val n = planeNormal(miller, lattice)
    val nHat = n.map(_ / norm3(n))
    val candidates = for {
      u <- -2 to 2; v <- -2 to 2; w <- -2 to 2
      if u != 0 || v != 0 || w != 0
      combo = Seq(u, v, w)
      cart = rowTimes(combo.map(_.toDouble), lattice)
      proj = dot3(cart, nHat)
      if proj > 1e-8
    } yield (norm3(cart), combo)
    val stacking = candidates.minBy { case (len, c) => (len, c(0), c(1), c(2)) }._2

    val s = Seq(inPlane(0), inPlane(1), stacking)
    // right-handed cell: flip the stacking vector if needed
    if (det3(s.map(_.map(_.toDouble))) < 0) Seq(s(0), s(1), s(2).map(-_)) else s
  }

  /** Re-express the bulk in the (hkl)-oriented cell: returns the new
    * lattice M = S·B and the |det S|·nAtoms atoms with fractional
    * coordinates in the new basis, grouped by species in the bulk's
    * species order. */
  private[echem] def orientedCell(bulk: Slab, miller: Seq[Int]): (M3, Seq[Atom]) = {
    val b = bulk.lattice
    val s = millerScaleFactors(miller, b)
    val sd = s.map(_.map(_.toDouble))
    val m = canonicalFrame(sd.map(row => rowTimes(row, b)))
    val sInv = inv3(sd)
    val nCells = math.round(math.abs(det3(sd))).toInt

    // every bulk translate intersecting the new cell: bounds from the
    // parallelepiped corners (subset sums of the rows of S)
    val corners = (0 to 7).map { mask =>
      (0 until 3).map(d => (0 until 3).map(r => if ((mask & (1 << r)) != 0) s(r)(d) else 0).sum)
    }
    val lo = (0 until 3).map(d => corners.map(_(d)).min - 1)
    val hi = (0 until 3).map(d => corners.map(_(d)).max + 1)

    val eps = 1e-8
    val atoms = for {
      t0 <- lo(0) to hi(0); t1 <- lo(1) to hi(1); t2 <- lo(2) to hi(2)
      a <- bulk.positions
      f = rowTimes(Seq(a.x + t0, a.y + t1, a.z + t2), sInv)
      if f.forall(x => x >= -eps && x < 1.0 - eps)
    } yield Atom(math.max(f(0), 0.0), math.max(f(1), 0.0), math.max(f(2), 0.0), a.element)
    require(atoms.length == nCells * bulk.positions.length,
      s"oriented-cell re-basing kept ${atoms.length} atoms, expected " +
        s"${nCells * bulk.positions.length} (miller=$miller, key=${bulk.mpKey})")

    // POSCAR contract: positions grouped by species in header order
    val spIdx = bulk.species.zipWithIndex.toMap
    (m, atoms.sortBy(a => spIdx(a.element)))
  }

  /** Cut `nShifts` slabs of the (facet) plane: oriented cell stacked
    * `layers` times along its out-of-plane vector, vacuum appended,
    * slab centered in the cell (`center_slab=True` in the reference),
    * terminations enumerated as fractional shifts. Key contract
    * `{id}-{facet}-{i}` (`dags/my_dag.py:93-95`). */
  def cut(bulk: Slab, facet: String, nShifts: Int,
          layers: Int = DefaultLayers, vacuumFrac: Double = DefaultVacuumFrac): Seq[Slab] = {
    val miller = facet.map(_.asDigit)
    val (cell, cellAtoms) = orientedCell(bulk, miller)
    val cScale = layers * (1.0 + vacuumFrac)
    val lattice = Seq(cell(0), cell(1), cell(2).map(_ * cScale))
    val center = vacuumFrac / (2.0 * (1.0 + vacuumFrac)) // fraction of the new c
    val nCells = cellAtoms.length / bulk.positions.length
    (0 until nShifts).map { i =>
      val shift = i.toDouble / nShifts // fractional termination shift
      val atoms = for {
        a <- cellAtoms // species-grouped; layer index varies fastest
        l <- 0 until layers
      } yield {
        val z = (a.z + shift) % 1.0
        Atom(a.x, a.y, (l + z) / cScale + center, a.element)
      }
      Slab(
        mpKey = s"${bulk.mpKey}-$facet-$i",
        title = bulk.title,
        scale = bulk.scale,
        lattice = lattice,
        species = bulk.species,
        counts = bulk.counts.map(_ * layers * nCells),
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
