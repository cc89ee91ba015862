package graft.echem

import java.util.Locale
import Schemas.{BohrA, Slab}

/** JDFTx input-deck renderer — byte-parity re-expression of
  * `write_jdftx` (`dags/utils.py:3-48`): lattice block in Bohr
  * (transposed, `%f`-formatted), cartesian `ion` lines with a
  * constraint flag, fixed DFT settings block, and the per-run
  * `elec-initial-charge`.
  *
  * Pure function `Slab => String`; the pipeline maps it over the
  * slab × charge Dataset (ops #6/#26) so rendering distributes with
  * the data. Golden test: exact equality with
  * `fixtures/gc_dft/mp-755394-111-3_0.0.in`.
  */
object JdftxDeck {

  private def f(v: Double): String = String.format(Locale.ROOT, "%f", Double.box(v))

  /** Python `f"{charge}"` parity: -0.0 keeps its sign, and values
    * where Java switches to scientific notation but Python stays
    * plain (1e-4 ≤ |c| < 1e-3, and non-integral |c| ≥ 1e7) render
    * via BigDecimal's plain form of the SAME shortest digits.
    * Declared divergence: below 1e-4 both engines go scientific but
    * with different spellings ("5.0E-5" vs "5e-05") — outside any
    * physical charge range this deck renders. */
  private def chargeRepr(c: Double): String =
    if (c == 0.0 && 1.0 / c < 0) "-0.0"
    else if (c == c.toLong.toDouble && math.abs(c) < 1e16) s"${c.toLong}.0"
    else {
      val s = c.toString
      if (!s.contains("E") || math.abs(c) < 1e-4) s
      else {
        val plain = new java.math.BigDecimal(s).stripTrailingZeros.toPlainString
        if (plain.contains(".")) plain else plain + ".0"
      }
    }

  val DftSettings: Seq[String] = Seq(
    "#DFT settings",
    "dump End State",
    "dump-name $VAR",
    "initial-state $VAR",
    "coulomb-interaction Periodic",
    "ion-species GBRV/$ID_pbe.uspp",
    "elec-cutoff 10",
    "spintype no-spin",
    "symmetries automatic",
    "elec-ex-corr gga-PBE",
    "kpoint 0.5 0.5 0.5 1",
    "kpoint-folding 1 1 1",
    "lcao-params 15 5E-5",
    "elec-smearing Fermi 0.00734",
    "electronic-minimize nIterations 30 energyDiffThreshold 1E-5",
    "fluid LinearPCM #solvation model",
    "pcm-variant CANDLE",
    "fluid-cation Na+ 1.",
    "fluid-anion F- 1.")

  /** Cartesian position of atom i in Å: fractional row-vector times
    * the cell matrix (ASE `get_positions()`). */
  private def cartesian(s: Slab, i: Int): (Double, Double, Double) = {
    val a = s.positions(i)
    def dot(k: Int): Double =
      a.x * s.cell(0, k) + a.y * s.cell(1, k) + a.z * s.cell(2, k)
    (dot(0), dot(1), dot(2))
  }

  def render(s: Slab, charge: Double): String = {
    val sb = new StringBuilder
    // lattice block: R[j][i] transposed, Å → Bohr (`dags/utils.py:7-14`)
    sb.append("lattice \\\n")
    for (i <- 0 until 3) {
      for (j <- 0 until 3) sb.append(f(s.cell(j, i) / BohrA)).append("  ")
      if (i != 2) sb.append('\\')
      sb.append('\n')
    }
    // ion lines (`dags/utils.py:16-25`): fix flag is 0 for
    // constrained atoms, 1 otherwise
    sb.append("\ncoords-type cartesian\n")
    val cons = s.fixed.toSet
    for (i <- s.positions.indices) {
      val (x, y, z) = cartesian(s, i)
      val fix = if (cons.contains(i)) 0 else 1
      sb.append(s"ion ${s.positions(i).element} ${f(x / BohrA)} ${f(y / BohrA)} ${f(z / BohrA)} $fix\n")
    }
    // settings (`dags/utils.py:27-48`)
    DftSettings.foreach(l => sb.append(l).append('\n'))
    sb.append(s"elec-initial-charge ${chargeRepr(charge)}")
    sb.toString
  }
}
