package graft.echem

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Schemas._

/** Electrochemistry analysis (`analyze_electrochem`,
  * `dags/my_dag.py:140-184`) as one declarative plan:
  *
  *  - potential per run:    pot  = mu · (−27.2114) − 4.66
  *  - baseline subtraction: Δne  = ne − ne(charge = 0)      (op #31)
  *  - surface charge:       rhoe = −Δne / area · e · 1e6 / 2
  *  - PZC:                  pot at charge = 0
  *  - capacitance:          slope of deg-1 fit rhoe ~ pot   (op #32,
  *                          `np.polyfit(pots, rhoes, 1)` →
  *                          built-in `regr_slope`)
  *
  * The area formula intentionally replicates the reference's
  * skew-ignoring `cell[0,0] · cell[1,1]` (`dags/my_dag.py:168`) for
  * result parity.
  *
  * Shape at scale: one window + one groupBy, both keyed on `mp_key`
  * — a single shuffle of (materials × charges) rows; the slab
  * geometry side joins broadcast.
  */
object Analysis {

  /** Shared per-run projection: joined metrics + geometry with the
    * derived `pot` and `rhoe` columns. */
  private def withPotRhoe(metrics: DataFrame, geometry: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("mp_key"))
    val pot = col("mu") * lit(-HaToEv) - lit(SheOffsetV)
    val ne0 = max(when(col("charge") === 0.0, col("nelectrons"))).over(w)
    val area = col("cell00") * col("cell11") * lit(BohrA * BohrA) * lit(1e-16) // cm²
    metrics
      .join(broadcast(geometry), "mp_key")
      .withColumn("pot", pot)
      .withColumn("rhoe",
        -(col("nelectrons") - ne0) / area * lit(ElectronC) * lit(1e6) / lit(2.0))
  }

  /** @param metrics (mp_key, charge, mu, nelectrons) — JdftxOutParser.metrics
    * @param geometry (mp_key, cell00, cell11) — slab cell diagonals, Å
    * @return one row per material: (mp_id, pzc, capacitance)
    */
  def electrochem(metrics: DataFrame, geometry: DataFrame): DataFrame =
    withPotRhoe(metrics, geometry)
      .groupBy(col("mp_key").as("mp_id"))
      .agg(
        max(when(col("charge") === 0.0, col("pot"))).as("pzc"),
        regr_slope(col("rhoe"), col("pot")).as("capacitance"))

  /** The per-run (pot, rhoe) series behind the aggregate — the data
    * of the reference's σₑ-vs-φ figure (`plt.plot(pots, rhoes, 'o')`,
    * `dags/my_dag.py:172-183`). One row per (material, charge). */
  def electrochemSeries(metrics: DataFrame, geometry: DataFrame): DataFrame =
    withPotRhoe(metrics, geometry)
      .select(col("mp_key").as("mp_id"), col("charge"), col("pot"), col("rhoe"))
}
