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
  * The termination dimension comes in two forms: the deterministic
  * `nShifts` fan-out ([[cut]], the same `{id}-{facet}-{i}` key
  * contract, `dags/my_dag.py:93-95`) and the layer-derived
  * enumeration ([[cutTerminations]]) — z-cluster shifts at
  * pymatgen's 0.1 Å tolerance, deduplicated under in-plane
  * translation/inversion/flip. The latter reproduces the reference's
  * slab COUNTS exactly (7 for mp-755394-111, 3 for mp-1393040-111,
  * golden-tested). [[cutSymmetrized]] adds the atom-removal REPAIR
  * step of `symmetrize=True` (erode a polar slab's face until both
  * faces read the same, tolerance-matched; golden-tested against the
  * repaired reference slab's own V10 O20 composition).
  * [[primitiveReduce]] covers the `primitive=True` flag
  * (`dags/my_dag.py:90`): translation-search cell reduction
  * (pymatgen `Structure.get_primitive_structure` re-derived — no
  * spglib), applied to each GENERATED slab after cutting — pymatgen
  * reduces the slab, not the input bulk, so the Miller indices stay
  * defined on the INPUT cell's basis (reducing the bulk first would
  * reinterpret "001" in the reduced basis and cut a different
  * crystallographic plane on any non-primitive input). With vacuum
  * present only IN-PLANE translations survive the search, exactly
  * pymatgen's slab-reduction effect. The reference fixtures' slabs
  * are already minimal, so it is an identity there (golden-tested
  * both ways — identity on the fixtures, k-fold collapse on
  * synthetic supercells).
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

    // POSCAR contract: positions grouped by species — keyed on FIRST
    // appearance, because a legal VASP header may repeat a species in
    // multiple groups ("V O V O", the run-length form cutSymmetrized
    // itself emits). zipWithIndex.toMap would keep each symbol's LAST
    // index and silently interleave the groups the header promises;
    // the callers attach a normalizedHeader-collapsed header that
    // matches this first-appearance grouping exactly.
    val spIdx = bulk.species.distinct.zipWithIndex.toMap
    (m, atoms.sortBy(a => spIdx(a.element)))
  }

  /** Collapse a (possibly repeated-group, "V O V O") species header
    * to first-appearance order with summed counts — the normalized
    * header whose blocks match an element-grouped position list.
    * Identity on the common unique-species header. */
  private[echem] def normalizedHeader(species: Seq[String],
                                      counts: Seq[Int]): (Seq[String], Seq[Int]) = {
    val order = species.distinct
    val totals = species.zip(counts).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    (order, order.map(totals))
  }

  /** Cut `nShifts` slabs of the (facet) plane: oriented cell stacked
    * `layers` times along its out-of-plane vector, vacuum appended,
    * slab centered in the cell (`center_slab=True` in the reference),
    * terminations enumerated as fractional shifts. Key contract
    * `{id}-{facet}-{i}` (`dags/my_dag.py:93-95`). */
  def cut(bulk0: Slab, facet: String, nShifts: Int,
          layers: Int = DefaultLayers, vacuumFrac: Double = DefaultVacuumFrac,
          primitive: Boolean = true): Seq[Slab] = {
    // cut on the INPUT basis — primitive reduction applies to the
    // generated slab below (see the object doc: reducing the bulk
    // first would reinterpret the Miller plane)
    val bulk = bulk0
    val (cell, cellAtoms) = orientedCell(bulk, millerOf(facet))
    // fractional termination shifts, cut plane advancing UPWARD:
    // atoms wrap through (a.z + shift) % 1
    assembleSlabs(bulk, facet, cell, cellAtoms,
      (0 until nShifts).map(_.toDouble / nShifts),
      layers, vacuumFrac, primitive,
      zOf = (az, s) => (az + s) % 1.0)
  }

  /** Miller indices from the 3-digit facet string — STRICTLY decimal
    * digits: `Char.asDigit` is radix-36 ('a' → 10) and '-' → −1, so
    * a typo'd or negative-index facet string would silently cut a
    * DIFFERENT crystallographic plane under the bogus key (r13
    * review). Negative indices need explicit Seq[Int] plumbing, not
    * a string convention. */
  private def millerOf(facet: String): Seq[Int] = {
    require(facet.nonEmpty && facet.forall(c => c >= '0' && c <= '9'),
      s"facet must be decimal digits (e.g. \"111\"), got '$facet'")
    facet.map(_.asDigit)
  }

  /** The ONE slab-assembly body [[cut]] and [[cutTerminations]]
    * share (they forked as near-identical copies and the comments
    * had started to drift — r13 review): oriented-cell layer stack
    * over each fractional shift, vacuum-scaled c, centered z, the
    * normalized species header, and the `{id}-{facet}-{i}` key
    * contract. `zOf` is the one genuine difference: [[cut]] advances
    * the cut plane upward, [[cutTerminations]] exposes the shift
    * line at the top. */
  private def assembleSlabs(bulk: Slab, facet: String,
                            cell: Seq[Seq[Double]], cellAtoms: Seq[Atom],
                            shifts: Seq[Double], layers: Int, vacuumFrac: Double,
                            primitive: Boolean,
                            zOf: (Double, Double) => Double): Seq[Slab] = {
    val cScale = layers * (1.0 + vacuumFrac)
    val lattice = Seq(cell(0), cell(1), cell(2).map(_ * cScale))
    val center = vacuumFrac / (2.0 * (1.0 + vacuumFrac)) // fraction of the new c
    val nCells = cellAtoms.length / bulk.positions.length
    // normalizedHeader: cellAtoms are grouped by FIRST species
    // appearance (orientedCell), so a repeated-group input header
    // must collapse to match — verbatim bulk.species would label
    // the wrong atoms O where the blocks interleave. Loop-invariant:
    // hoisted out of the per-shift loop.
    val (spOrder, spCounts) = normalizedHeader(bulk.species, bulk.counts)
    val raw = shifts.zipWithIndex.map { case (shift, i) =>
      val atoms = for {
        a <- cellAtoms // species-grouped; layer index varies fastest
        l <- 0 until layers
      } yield {
        val z = zOf(a.z, shift)
        Atom(a.x, a.y, (l + z) / cScale + center, a.element)
      }
      Slab(
        mpKey = s"${bulk.mpKey}-$facet-$i",
        title = bulk.title,
        scale = bulk.scale,
        lattice = lattice,
        species = spOrder,
        counts = spCounts.map(_ * layers * nCells),
        positions = atoms,
        fixed = Seq.empty)
    }
    if (primitive) raw.map(primitiveReduce(_)) else raw
  }

  /** Distributed fan-out: bulks × facets → slabs. */
  def generate(bulks: Dataset[Slab], facets: Seq[String], nShifts: Int): Dataset[Slab] = {
    import bulks.sparkSession.implicits._
    bulks.flatMap(b => facets.flatMap(f => cut(b, f, nShifts)))
  }

  // ---- distinct-termination enumeration (the `get_slabs(symmetrize=True)`
  // dimension, reference `dags/my_dag.py:84-92`) ----

  /** Possible termination shifts of an oriented cell: cluster the
    * atoms' fractional z under periodic distance with `tol`
    * (FRACTIONAL units here; callers scale an Ångström tolerance by
    * the cell height), then cut midway between consecutive clusters
    * (pymatgen `SlabGenerator._calculate_possible_shifts`,
    * `core/surface.py` — algorithm re-derived, not ported:
    * single-linkage on a circle is just "split at gaps > tol"). One
    * shift per distinct atomic layer; cutting inside a layer would
    * slice through atoms. */
  private[echem] def possibleShifts(zs: Seq[Double], tol: Double = 0.1): Seq[Double] = {
    require(zs.nonEmpty, "no atoms")
    val wrapped = zs.map(z => z - math.floor(z)).distinct.sorted
    if (wrapped.length == 1) return Seq((wrapped.head + 0.5) % 1.0)
    // circular single-linkage: a boundary wherever the gap to the next
    // z (cyclically) exceeds tol; if no gap does, one cluster remains
    val gaps = wrapped.indices.map { i =>
      val next = if (i == wrapped.length - 1) wrapped.head + 1.0 else wrapped(i + 1)
      (i, next - wrapped(i))
    }
    val boundaries = gaps.filter(_._2 > tol)
    if (boundaries.isEmpty) return Seq((wrapped.head + 0.5) % 1.0)
    // cut in the middle of each inter-cluster gap
    boundaries.map { case (i, gap) => (wrapped(i) + gap / 2.0) % 1.0 }.sorted
  }

  /** Fixed 1e-3 canonicalization grid. Known knife-edge (r13
    * review, accepted): two physically equal terminations reach this
    * via DIFFERENT float paths ((a.z − s1) vs (b.z − s2)), so a
    * value sitting within ~1 ulp of a .0005 grid boundary can round
    * apart and both shifts survive dedup — an extra slab, never a
    * wrong one (each emitted slab's geometry is exact; dedup is a
    * count optimization). An epsilon-clustered canonicalization
    * would close it at the cost of re-deriving the golden 7/3
    * termination counts; the reference fixtures sit far from grid
    * boundaries, and the possibleShifts midpoints put shifts at gap
    * centers, not near atom planes — revisit only if a real input
    * ever shows a duplicated termination. */
  private def round3(v: Double): Double = {
    val r = math.rint(v * 1000.0) / 1000.0
    if (r >= 1.0) r - 1.0 else r
  }

  /** Canonical form of the termination cut at `shift`: coordinates
    * wrapped so the cut plane sits at z=0/1 (z is PINNED — it is the
    * surface), then reduced under the transformations that map one
    * slab onto the same physical slab:
    *  - in-plane lattice translation (anchor each least-frequent-
    *    species atom at the origin, take the lexicographic minimum),
    *  - optional in-plane inversion (x,y) → (−x,−y),
    *  - optional flip (`mirror`): z → −z about the cut — a slab
    *    turned upside down is the same object.
    * Two shifts are duplicate terminations iff some variant of one
    * equals the base form of the other — the subset of pymatgen's
    * StructureMatcher equivalence (`get_slabs` dedup) that a
    * termination shift can actually produce, and enough for count
    * parity with the reference slabs (golden-tested: 7 for
    * mp-755394-111, 3 for mp-1393040-111). */
  private[echem] def canonicalTermination(atoms: Seq[Atom], shift: Double,
                                          mirror: Boolean = false,
                                          invert: Boolean = false): Seq[(String, Double, Double, Double)] = {
    import scala.math.Ordering.Implicits.seqOrdering
    val pts = atoms.map { a =>
      val w0 = (a.z - shift) % 1.0
      val w1 = if (w0 < 0) w0 + 1.0 else w0
      val w = if (mirror) (1.0 - w1) % 1.0 else w1
      (a.element, a.x % 1.0, a.y % 1.0, round3(w))
    }
    val counts = pts.groupBy(_._1).view.mapValues(_.size).toMap
    val anchorSp = counts.keys.minBy(k => (counts(k), k))
    val sign = if (invert) -1.0 else 1.0
    pts.collect { case (el, ax, ay, _) if el == anchorSp =>
      pts.map { case (e, x, y, w) =>
        def wrap(v: Double) = { val m = v % 1.0; if (m < 0) m + 1.0 else m }
        (e, round3(wrap(sign * (x - ax))), round3(wrap(sign * (y - ay))), w)
      }.sorted
    }.min
  }

  /** Symmetric-termination test: the slab reads the same from both
    * faces iff its canonical form is invariant under the flip
    * (optionally composed with in-plane inversion — together the z-
    * projection of pymatgen's Laue-group `is_symmetric` check). Note
    * the reference's `symmetrize=True` REPAIRS asymmetric slabs
    * rather than filtering them (its slab counts match the unfiltered
    * distinct-termination count), so this is exposed as an optional
    * extra, not the default path. */
  private[echem] def isSymmetricTermination(atoms: Seq[Atom], shift: Double): Boolean = {
    val base = canonicalTermination(atoms, shift)
    canonicalTermination(atoms, shift, mirror = true) == base ||
      canonicalTermination(atoms, shift, mirror = true, invert = true) == base
  }

  /** Layer-derived termination fan-out: one slab per DISTINCT atomic
    * termination of the (facet) plane — the engine's analogue of
    * `get_slabs(symmetrize=True)` enumeration (`dags/my_dag.py:84-92`).
    * `tolAngstrom` is pymatgen's `ftol` (0.1 Å default), scaled by
    * the oriented cell's projected height into fractional units.
    * Duplicates collapse under in-plane translation / inversion /
    * flip; `symmetricOnly` further keeps only two-faced-identical
    * slabs. Same `{id}-{facet}-{i}` key contract as [[cut]]; `i` is
    * the ordinal over surviving shifts ascending (the reference's
    * `enumerate(slabs)`, `dags/my_dag.py:93`). */
  def cutTerminations(bulk0: Slab, facet: String, symmetricOnly: Boolean = false,
                      tolAngstrom: Double = 0.1, layers: Int = DefaultLayers,
                      vacuumFrac: Double = DefaultVacuumFrac,
                      primitive: Boolean = true): Seq[Slab] = {
    // cut on the INPUT basis; reduction applies to the generated
    // slabs below (the [[cut]] rationale)
    val bulk = bulk0
    val (cell, cellAtoms) = orientedCell(bulk, millerOf(facet))

    // canonical frame ⇒ the c vector's z-component IS the projected
    // height of the repeat unit along the surface normal
    val heightAngstrom = cell(2)(2) * bulk.scale
    val shifts = possibleShifts(cellAtoms.map(_.z), tolAngstrom / heightAngstrom)
    val seen = scala.collection.mutable.Set.empty[Seq[(String, Double, Double, Double)]]
    val distinct = shifts.filter { s =>
      val base = canonicalTermination(cellAtoms, s)
      val fresh = !seen(base)
      if (fresh) {
        seen += base
        seen += canonicalTermination(cellAtoms, s, invert = true)
        seen += canonicalTermination(cellAtoms, s, mirror = true)
        seen += canonicalTermination(cellAtoms, s, mirror = true, invert = true)
      }
      fresh
    }
    val kept = if (symmetricOnly) distinct.filter(isSymmetricTermination(cellAtoms, _))
               else distinct

    // shift the cut plane to z=1 (top of the repeat unit): atoms at
    // the shift line become the exposed surface
    assembleSlabs(bulk, facet, cell, cellAtoms, kept.sorted,
      layers, vacuumFrac, primitive,
      zOf = (az, s) => { val w = (az - s) % 1.0; if (w < 0) w + 1.0 else w })
  }

  /** Distributed termination fan-out: bulks × facets → distinct
    * terminations (optionally only two-faced-symmetric ones). */
  def generateTerminations(bulks: Dataset[Slab], facets: Seq[String],
                           symmetricOnly: Boolean = false): Dataset[Slab] = {
    import bulks.sparkSession.implicits._
    bulks.flatMap(b => facets.flatMap(f => cutTerminations(b, f, symmetricOnly)))
  }

  // ---- symmetrize REPAIR (the atom-removal step of
  // `get_slabs(symmetrize=True)`, pymatgen
  // `SlabGenerator.nonstoichiometric_symmetrized_slab` — algorithm
  // re-derived from its documented behavior: peel surface layers off a
  // polar slab until both faces read the same, accepting a
  // nonstoichiometric result, discarding slabs that crumble first) ----

  /** Matching tolerances are expressed in ÅNGSTRÖM (the analogue of
    * pymatgen's `symprec`) and converted per-axis to fractional —
    * fractional z of the vacuum-padded cell is ~4× compressed vs the
    * in-plane axes, so ONE fractional tolerance would silently be 4×
    * looser in z. Symmetry-RELATED atoms come from DIFFERENT bulk
    * input atoms whose relaxed coordinates carry independent noise,
    * so exact-grid equality (the termination-dedup trick, where
    * compared atoms share one arithmetic path) cannot see a
    * physically symmetric slab — a tolerance matcher is structural
    * here, not a convenience. Default 0.3 Å: the fixture bulks'
    * relaxed coordinates place symmetry partners up to ~0.2 Å apart
    * (measured), and interatomic distances (≥ ~1.5 Å) still dwarf
    * the tolerance, so matches stay unambiguous. */
  val SymTolAngstrom = 0.3

  /** In-plane integer 2×2 maps probed by the matcher: identity,
    * inversion, axis mirrors, diagonal swaps, and the hexagonal
    * shear family — the lattice-to-itself candidates for the
    * square / rectangular / hexagonal cells surfaces live in.
    * [[metricTransforms]] filters them against the ACTUAL cell. */
  private val InPlaneTransforms: Seq[(Int, Int, Int, Int)] = Seq(
    (1, 0, 0, 1), (-1, 0, 0, -1), (0, 1, 1, 0), (0, -1, -1, 0),
    (1, 0, 0, -1), (-1, 0, 0, 1), (0, 1, -1, 0), (0, -1, 1, 0),
    (-1, 0, 1, 1), (1, 0, -1, -1), (1, 1, 0, -1), (-1, -1, 0, 1),
    (-1, -1, 1, 0), (1, 1, -1, 0), (0, 1, -1, -1), (0, -1, 1, 1))

  /** Geometry of one slab lattice for the matcher: the in-plane maps
    * that PRESERVE THE CELL METRIC (TᵀGT = G for the in-plane Gram
    * matrix — an x↔y swap on a rectangular cell or a hex shear on a
    * square cell is NOT an isometry even though it permutes
    * fractional coordinates, and probing it could report two
    * physically different faces as "the same") plus the per-axis
    * fractional tolerances for `tolAngstrom`. */
  private[echem] final case class SlabFrame(
      transforms: Seq[(Int, Int, Int, Int)],
      tx: Double, ty: Double, tz: Double)

  private[echem] def slabFrame(lattice: Seq[Seq[Double]], scale: Double,
                               tolAngstrom: Double = SymTolAngstrom): SlabFrame = {
    val a = lattice(0).map(_ * scale)
    val b = lattice(1).map(_ * scale)
    val gaa = dot3(a, a); val gab = dot3(a, b); val gbb = dot3(b, b)
    val eps = 1e-6 * math.max(gaa, gbb)
    val ok = InPlaneTransforms.filter { case (t1, t2, t3, t4) =>
      // images of a, b in the map x' = t1·x + t2·y, y' = t3·x + t4·y
      // are a' = t1·a + t3·b and b' = t2·a + t4·b
      val gaa2 = t1 * t1 * gaa + 2.0 * t1 * t3 * gab + t3 * t3 * gbb
      val gbb2 = t2 * t2 * gaa + 2.0 * t2 * t4 * gab + t4 * t4 * gbb
      val gab2 = t1 * t2 * gaa + (t1 * t4 + t2 * t3) * gab + t3 * t4 * gbb
      math.abs(gaa2 - gaa) < eps && math.abs(gbb2 - gbb) < eps &&
        math.abs(gab2 - gab) < eps
    }
    SlabFrame(ok,
      tx = tolAngstrom / norm3(a),
      ty = tolAngstrom / norm3(b),
      tz = tolAngstrom / (lattice(2)(2) * scale))
  }

  private def wrapHalf(v: Double): Double = {
    val m = v % 1.0
    val w = if (m < 0) m + 1.0 else m
    if (w > 0.5) w - 1.0 else w
  }

  /** Does `from`, transformed in-plane by `t` (optionally z-flipped
    * through its own center), land on `onto` within the frame's
    * per-axis tolerances under SOME in-plane translation? Candidate
    * translations anchor the first rarest-species atom of the
    * transformed set onto each same-species, same-height atom of the
    * target — a StructureMatcher-lite: per-atom nearest lookup rather
    * than a full bijection, sound because interatomic distances dwarf
    * the tolerance. Cost is O(|anchors|·n²) per transform with n in
    * the dozens — executor-local arithmetic, invisible next to any
    * shuffle. */
  private def matchesUnder(from: Seq[Atom], onto: Seq[Atom],
                           t: (Int, Int, Int, Int), flip: Boolean,
                           f: SlabFrame): Boolean = {
    if (from.length != onto.length) return false
    if (from.isEmpty) return true
    val fzlo = from.map(_.z).min
    val fzhi = from.map(_.z).max
    val ozlo = onto.map(_.z).min
    val mapped = from.map { a =>
      val z = if (flip) fzhi - a.z else a.z - fzlo
      (a.element, t._1 * a.x + t._2 * a.y, t._3 * a.x + t._4 * a.y, z)
    }
    val orig = onto.map(a => (a.element, a.x, a.y, a.z - ozlo))
    val counts = orig.groupBy(_._1).view.mapValues(_.size).toMap
    if (mapped.groupBy(_._1).view.mapValues(_.size).toMap != counts) return false
    val sp = counts.keys.minBy(k => (counts(k), k))
    val m0 = mapped.find(_._1 == sp).get
    val cands = orig.filter(o => o._1 == sp && math.abs(o._4 - m0._4) < f.tz)
      .map(o => (o._2 - m0._2, o._3 - m0._3))
    cands.exists { case (dx, dy) =>
      mapped.forall { case (e, x, y, z) =>
        orig.exists { case (e2, x2, y2, z2) =>
          e2 == e && math.abs(z2 - z) < f.tz &&
            math.abs(wrapHalf(x + dx - x2)) < f.tx &&
            math.abs(wrapHalf(y + dy - y2)) < f.ty
        }
      }
    }
  }

  /** Both faces of a finite slab read the same: the atom set maps
    * onto itself under the z-flip through its center composed with
    * some metric-preserving in-plane map + translation (the
    * z-projected Laue `is_symmetric` check, tolerance-matched). */
  private[echem] def isSymmetricSlab(atoms: Seq[Atom], f: SlabFrame): Boolean =
    f.transforms.exists(t => matchesUnder(atoms, atoms, t, flip = true, f))

  /** Same physical slab under metric-preserving in-plane map +
    * translation, with or without the upside-down flip — the
    * repaired-slab dedup relation (pymatgen's final StructureMatcher
    * pass). */
  private[echem] def equivalentSlabs(a: Seq[Atom], b: Seq[Atom], f: SlabFrame): Boolean =
    Seq(false, true).exists(fl =>
      f.transforms.exists(t => matchesUnder(a, b, t, fl, f)))

  /** Peel z-layers (clusters within `zTol`, fractional) off ONE face
    * until the slab is two-faced symmetric. `fromTop` selects which
    * face erodes — callers try both and keep each success (they may
    * repair to genuinely different surfaces). Gives up (None) when
    * fewer than `minAtoms` remain: a slab eroded below one repeat
    * unit has crumbled, not symmetrized. */
  private[echem] def symmetrizeAtoms(atoms0: Seq[Atom], zTol: Double,
                                     fromTop: Boolean, minAtoms: Int,
                                     f: SlabFrame): Option[Seq[Atom]] = {
    var atoms = atoms0
    while (atoms.length >= math.max(1, minAtoms)) {
      if (isSymmetricSlab(atoms, f)) return Some(atoms)
      atoms =
        if (fromTop) { val m = atoms.map(_.z).max; atoms.filterNot(_.z >= m - zTol) }
        else { val m = atoms.map(_.z).min; atoms.filterNot(_.z <= m + zTol) }
    }
    None
  }

  /** Symmetrized termination fan-out: [[cutTerminations]] + the
    * REPAIR step — each polar termination erodes from the top and,
    * separately, from the bottom; every symmetric result survives
    * (possibly NONSTOICHIOMETRIC — species counts are recomputed from
    * the remaining atoms and zero-count species drop from the
    * header). Results deduplicate under in-plane map / translation /
    * flip across the whole facet, and the `{id}-{facet}-{i}` key
    * contract reindexes over survivors. Golden-parity: reproduces the
    * reference's `get_slabs(symmetrize=True)` slab COUNTS on both
    * fixtures (7 and 3) AND the repaired reference slab's exact
    * nonstoichiometric composition (mp-755394-111: V10 O20 eroded
    * from a 36-atom stack — the fixture slab file's own header). */
  def cutSymmetrized(bulk: Slab, facet: String, tolAngstrom: Double = 0.1,
                     layers: Int = DefaultLayers,
                     vacuumFrac: Double = DefaultVacuumFrac,
                     symTolAngstrom: Double = SymTolAngstrom,
                     primitive: Boolean = true): Seq[Slab] = {
    val raw = cutTerminations(bulk, facet, symmetricOnly = false,
      tolAngstrom, layers, vacuumFrac, primitive)
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Slab, Seq[Atom])]
    for (s <- raw; top <- Seq(true, false)) {
      val frame = slabFrame(s.lattice, s.scale, symTolAngstrom)
      // erosion layer-cluster width stays at the enumeration ftol —
      // full-cell height in Å = (c·ẑ)·scale; lattice(2) already
      // carries the vacuum scaling from cutTerminations
      val zTol = tolAngstrom / (s.lattice(2)(2) * s.scale)
      val minAtoms = s.positions.length / layers // one repeat unit
      symmetrizeAtoms(s.positions, zTol, top, minAtoms, frame).foreach { atoms =>
        if (!kept.exists { case (_, k) => equivalentSlabs(k, atoms, frame) })
          kept += ((s, atoms))
      }
    }
    kept.toSeq.zipWithIndex.map { case ((s, atoms), i) =>
      // rebuild the species header as the RUN-LENGTH encoding of the
      // (order-preserved) remaining atoms: repeated header groups
      // ("V O V O") survive erosion correctly, where a
      // filter-and-count-all rebuild would count every V in every V
      // group; zero-length groups vanish naturally
      val runs = atoms.foldLeft(Vector.empty[(String, Int)]) { (acc, a) =>
        if (acc.nonEmpty && acc.last._1 == a.element)
          acc.init :+ ((a.element, acc.last._2 + 1))
        else acc :+ ((a.element, 1))
      }
      s.copy(
        mpKey = s"${bulk.mpKey}-$facet-$i",
        positions = atoms,
        species = runs.map(_._1),
        counts = runs.map(_._2))
    }
  }

  /** Distributed symmetrize-repair fan-out: bulks × facets →
    * two-faced-symmetric (possibly nonstoichiometric) slabs. */
  def generateSymmetrized(bulks: Dataset[Slab], facets: Seq[String]): Dataset[Slab] = {
    import bulks.sparkSession.implicits._
    bulks.flatMap(b => facets.flatMap(f => cutSymmetrized(b, f)))
  }

  // ---- primitive-cell reduction (the `primitive=True` dimension of
  // the reference's SlabGenerator, `dags/my_dag.py:90` — pymatgen
  // `Structure.get_primitive_structure` re-derived, no spglib:
  // translation search over same-species site differences + integer
  // lattice reduction) ----

  private def wrapFrac(v: Double): Double = { val m = v % 1.0; if (m < 0) m + 1.0 else m }
  private def periDist1(d: Double): Double = math.abs(d - math.rint(d))

  /** Does translating EVERY atom by `t` (fractional) map the
    * structure onto itself? Per atom: some same-species atom sits at
    * its translated image within `tol` per coordinate (periodic). */
  private def isPureTranslation(atoms: Seq[Atom], t: Seq[Double], tol: Double): Boolean =
    atoms.forall { p =>
      atoms.exists(q => q.element == p.element &&
        periDist1(p.x + t(0) - q.x) < tol &&
        periDist1(p.y + t(1) - q.y) < tol &&
        periDist1(p.z + t(2) - q.z) < tol)
    }

  /** Hermite-style basis of the integer row lattice spanned by
    * `rows` (each length 3): standard column-by-column gcd
    * elimination; returns 3 independent rows, upper-triangular with
    * positive diagonal. The input always contains k·I, so the span
    * has full rank. */
  private[echem] def intLatticeBasis(rows0: Seq[Array[Long]]): Array[Array[Long]] = {
    val rows = rows0.map(_.clone).toArray
    var level = 0
    for (c <- 0 until 3) {
      // gcd-eliminate column c below `level` until one nonzero remains
      var live = true
      while (live) {
        val nz = (level until rows.length).filter(r => rows(r)(c) != 0)
        if (nz.isEmpty) live = false
        else if (nz.length == 1) {
          val r = nz.head
          val tmp = rows(level); rows(level) = rows(r); rows(r) = tmp
          live = false
        } else {
          val pivot = nz.minBy(r => math.abs(rows(r)(c)))
          for (r <- nz if r != pivot) {
            val q = rows(r)(c) / rows(pivot)(c)
            for (d <- 0 until 3) rows(r)(d) -= q * rows(pivot)(d)
          }
        }
      }
      if (rows(level)(c) != 0) {
        if (rows(level)(c) < 0) for (d <- 0 until 3) rows(level)(d) = -rows(level)(d)
        level += 1
      }
    }
    require(level == 3, s"integer lattice rank $level < 3")
    rows.take(3)
  }

  /** Reduce a bulk cell to its primitive cell: search pure
    * translations among same-species site differences (candidates
    * from the least-abundant species — any valid translation must
    * map its sites among themselves), and while one exists, rebuild
    * the cell on the lattice generated by the old cell vectors plus
    * the translation. The new basis comes from integer reduction in
    * units of 1/k (k = the translation's denominator), atoms
    * re-wrap and collapse k-fold, and the loop repeats until no
    * translation survives — each pass shrinks the cell by an integer
    * factor, so it terminates. Already-primitive input returns
    * unchanged (the reference fixtures' case, which is why this was
    * a declared no-op divergence until now; a user feeding a
    * conventional/supercell setting is who notices).
    *
    * `tolFrac` is the per-coordinate periodic match tolerance in
    * fractional units (pymatgen's default site tolerance is loose
    * Ångströms; exact synthetic supercells match at 1e-4). */
  def primitiveReduce(bulk: Slab, tolFrac: Double = 1e-4): Slab = {
    val atoms0 = bulk.positions
    if (atoms0.size <= 1) return bulk
    var cur = bulk
    var reduced = true
    while (reduced) {
      reduced = false
      val atoms = cur.positions
      val byElem = atoms.groupBy(_.element)
      val ref = byElem.minBy { case (e, as) => (as.size, e) }._2
      val a0 = ref.head
      // deterministic candidate order: shortest periodic image first
      val cands = ref.tail.map { a =>
        Seq(wrapFrac(a.x - a0.x), wrapFrac(a.y - a0.y), wrapFrac(a.z - a0.z))
      }.filter(t => t.exists(v => periDist1(v) > tolFrac))
        .sortBy(t => (t.map(v => { val d = periDist1(v); d * d }).sum, t(0), t(1), t(2)))
      cands.find(isPureTranslation(atoms, _, tolFrac)).foreach { t =>
        // positional ASE constraints cannot survive a reduction that
        // drops and reorders atoms — stale indices would silently pin
        // the WRONG atom in a generated DFT deck; fail loudly
        require(cur.fixed.isEmpty,
          s"primitiveReduce cannot remap positional 'fixed' constraints " +
            s"(key=${cur.mpKey}) — clear them or reduce before constraining")
        // smallest k with k·t integral (k ≤ number of atoms of the
        // reference species; a valid translation permutes its sites)
        val k = (2 to ref.size).find(k =>
          t.forall(v => periDist1(v * k) < tolFrac * k)).getOrElse(
          throw new IllegalStateException(s"translation $t has no small order"))
        val p = t.map(v => math.round(v * k))
        val rows = Seq(
          Array(k.toLong, 0L, 0L), Array(0L, k.toLong, 0L), Array(0L, 0L, k.toLong),
          Array(p(0), p(1), p(2)))
        val h = intLatticeBasis(rows)
        // fractional basis of the primitive cell in OLD-cell coords
        val pFrac: M3 = h.map(_.map(_.toDouble / k).toSeq).toSeq
        val volRatio = math.abs(det3(pFrac)) // = 1/collapse factor
        val collapse = math.round(1.0 / volRatio).toInt
        require(collapse >= 2 && atoms.size % collapse == 0,
          s"primitive reduction collapse $collapse does not divide ${atoms.size}")
        val pInv = inv3(pFrac)
        val newLat: M3 = pFrac.map(row => rowTimes(row, cur.lattice))
        // re-express, wrap, dedupe (collapse identical images)
        val moved = atoms.map { a =>
          val f = rowTimes(Seq(a.x, a.y, a.z), pInv)
          Atom(wrapFrac(f(0)), wrapFrac(f(1)), wrapFrac(f(2)), a.element)
        }
        // dedup tolerance SCALES with the collapse factor: the
        // re-expression through pInv (entries O(k)) amplifies any
        // old-frame coordinate noise by up to ~collapse, so a fixed
        // 10x margin would reject legitimately reducible
        // high-multiplicity supercells with near-tolerance noise.
        // Safe to loosen: distinct primitive-cell sites sit O(1)
        // apart in the new fractional frame, orders above this —
        // but CAPPED at 0.01 fractional: unbounded scaling (a 1×1×N
        // supercell has collapse = N in one pass) would eventually
        // exceed real inter-site separations in large multi-atom
        // primitive cells and falsely merge distinct atoms (the
        // kept-count require below then kills the job on a
        // legitimately reducible input)
        val dupTol = math.min(tolFrac * math.max(10, 4 * collapse), 0.01)
        val kept = scala.collection.mutable.ArrayBuffer[Atom]()
        moved.foreach { a =>
          val dup = kept.exists(b => b.element == a.element &&
            periDist1(a.x - b.x) < dupTol &&
            periDist1(a.y - b.y) < dupTol &&
            periDist1(a.z - b.z) < dupTol)
          if (!dup) kept += a
        }
        require(kept.size * collapse == atoms.size,
          s"primitive reduction kept ${kept.size} of ${atoms.size} atoms, " +
            s"expected ${atoms.size / collapse} (collapse $collapse, key=${cur.mpKey})")
        // first-appearance grouping + normalized header: a repeated-
        // group input header ("V O V O") would make the per-entry
        // count-all rebuild double-count every species and fail the
        // fold check on a legitimately reducible cell; collapsing to
        // per-SPECIES totals makes the check exact for both forms
        val (spOrder, oldTotals) = normalizedHeader(cur.species, cur.counts)
        val spIdx = spOrder.zipWithIndex.toMap
        val sorted = kept.sortBy(a => spIdx(a.element)).toIndexedSeq
        val newCounts = spOrder.map(s => sorted.count(_.element == s))
        require(newCounts.zip(oldTotals).forall { case (n, o) => n * collapse == o },
          s"species counts ${newCounts.mkString(",")} not a $collapse-fold " +
            s"reduction of ${oldTotals.mkString(",")} (key=${cur.mpKey})")
        cur = cur.copy(lattice = newLat, species = spOrder, counts = newCounts,
          positions = sorted)
        reduced = true
      }
    }
    cur
  }
}
