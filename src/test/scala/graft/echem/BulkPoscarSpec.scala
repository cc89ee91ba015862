package graft.echem

import graft.{Pipeline, SparkSpec}
import graft.echem.ProcessRunner.{Exec, RunOutput}
import org.apache.spark.sql.functions._

/** Bulk POSCARs (pymatgen-written, oxidation-state atom labels like
  * "V4+") through the codec and the full EP1 pipeline with multiple
  * bulks — the reference's real extract input
  * (`output/bulk_poscars/`, 131 files).
  */
class BulkPoscarSpec extends SparkSpec {
  import spark.implicits._

  test("bulk POSCAR parse: species line wins over oxidation-state labels") {
    val bulks = PoscarCodec.read(spark, fixturePath("bulk_poscars")).collect()
    assert(bulks.length == 3)
    val els = bulks.flatMap(_.positions.map(_.element)).toSet
    assert(els == Set("V", "O")) // not "V4+"/"O2-"
    bulks.foreach(b => assert(b.nAtoms == b.counts.sum))
  }

  case object FlatExec extends Exec {
    def run(key: String, input: String): RunOutput = {
      val charge = key.substring(key.lastIndexOf('_') + 1).toDouble
      RunOutput(key,
        s"FillingsUpdate:  mu: ${-0.19 + 0.01 * charge}  nElectrons: ${100.0 + charge}", 0)
    }
  }

  test("EP1 over multiple bulks: sample 2, fan out, pick 1, analyze") {
    val res = Pipeline.full(spark,
      bulkPoscarDir = fixturePath("bulk_poscars"),
      facets = Seq("100", "111"),
      nBulkSample = 2,
      nShifts = 3,
      charges = Seq(-0.1, 0.0, 0.1),
      exec = FlatExec,
      existing = Seq.empty[String].toDF("mp_id")).collect()
    assert(res.length == 1)
    val key = res.head.getAs[String]("mp_id")
    // key shape: {bulkId}-{facet}-{shift}
    assert(key.matches("mp-\\d+-(100|111)-\\d"))
  }
}
