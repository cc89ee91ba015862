package graft.echem

/** Typed data model for the electrochemistry pipeline (SURVEY.md §1,
  * FIXTURES.md). Case classes double as Spark `Encoder` sources for
  * the typed `Dataset` stages.
  */
object Schemas {

  /** One atom site: fractional coordinates + element symbol
    * (POSCAR "direct" row, e.g.
    * `output/slab_poscars/mp-755394-111-3.poscar:9-38`). */
  case class Atom(x: Double, y: Double, z: Double, element: String)

  /** Parsed crystal structure (POSCAR, VASP direct format —
    * reference reads these with `ase.io.read`, `dags/my_dag.py:127`).
    *
    * @param mpKey   key derived from the filename stem (`dags/my_dag.py:122`)
    * @param lattice 3×3 row-major lattice matrix, Å
    * @param fixed   constrained atom indices (ASE `constraints`,
    *                `dags/utils.py:20-21`); empty = all free
    */
  case class Slab(
      mpKey: String,
      title: String,
      scale: Double,
      lattice: Seq[Seq[Double]],
      species: Seq[String],
      counts: Seq[Int],
      positions: Seq[Atom],
      fixed: Seq[Int]) {
    def cell(i: Int, j: Int): Double = lattice(i)(j) * scale
    def nAtoms: Int = positions.size
  }

  /** Final converged metrics of one JDFTx run — the last
    * `FillingsUpdate:  mu: …  nElectrons: …` line per log
    * (`dags/my_dag.py:154-158`). */
  case class JdftxMetrics(mpKey: String, charge: Double, mu: Double, nElectrons: Double)

  /** One row per material loaded into the sink
    * (`dft_echem` DDL, `dags/my_dag.py:199`). */
  case class EchemResult(mpId: String, pzc: Double, capacitance: Double)

  /** ASE's Bohr radius in Å (`ase.units.Bohr`, used at
    * `dags/utils.py:1,7,16` and `dags/my_dag.py:168`). */
  val BohrA: Double = 0.5291772105638411

  /** Hartree → eV factor and SHE offset (`dags/my_dag.py:164`). */
  val HaToEv: Double = 27.2114
  val SheOffsetV: Double = 4.66

  /** Electron charge (C) and µC conversion (`dags/my_dag.py:169`). */
  val ElectronC: Double = 1.60217663e-19
}
