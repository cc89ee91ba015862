package graft.echem

import org.apache.spark.sql.functions._
import graft.{Pipeline, SparkSpec}

/** End-to-end EP2 (analysis tail) against the golden JDFTx logs:
  * asserts the published pipeline outputs (BASELINE.md):
  * PZC = 0.46600598 V vs SHE, capacitance = 148.52218 µF/cm²,
  * FillingsUpdate cardinality 72/9/9.
  */
class AnalysisSpec extends SparkSpec {

  test("JDFTx log parse: last FillingsUpdate per file wins (op #29)") {
    val m = JdftxOutParser.metrics(spark, fixturePath("gc_dft"))
      .orderBy("charge").collect()
    assert(m.length == 3)
    val byCharge = m.map(r => (r.getAs[Double]("charge"),
      (r.getAs[Double]("mu"), r.getAs[Double]("nelectrons"), r.getAs[Long]("n_updates")))).toMap
    assert(byCharge(-0.1) == ((-0.191198639, 249.9, 72L)))
    assert(byCharge(0.0) == ((-0.188377150, 250.0, 9L)))
    assert(byCharge(0.1) == ((-0.185485046, 250.1, 9L)))
  }

  test("metricsFromRuns drops rows whose key does not parse (the metrics() convention)") {
    import spark.implicits._
    // previously a bad key sailed through with mp_key = "" and a
    // null charge, then vanished untraceably at the geometry join
    val runs = Seq(
      ("mp-1_0.0", "FillingsUpdate:  mu: -0.1 nElectrons: 10.0"),
      ("no-charge-suffix", "FillingsUpdate:  mu: -0.2 nElectrons: 20.0"))
      .toDF("key", "output")
    val got = graft.echem.JdftxOutParser.metricsFromRuns(runs).collect()
    assert(got.map(_.getAs[String]("mp_key")).toSeq == Seq("mp-1"),
      s"unparseable key must drop, got ${got.mkString(";")}")
  }

  test("EP2: fixtures → (mp_id, pzc, capacitance) golden values") {
    val res = Pipeline.analyzeFixtures(spark,
      fixturePath("gc_dft"), fixturePath("slab_poscars")).collect()
    assert(res.length == 1)
    val r = res.head
    assert(r.getAs[String]("mp_id") == "mp-755394-111-3")
    assert(math.abs(r.getAs[Double]("pzc") - 0.46600598) < 1e-6)
    assert(math.abs(r.getAs[Double]("capacitance") - 148.52218) < 1e-3)
  }

  test("regr_slope equals closed-form least squares on the 3 points") {
    import spark.implicits._
    val pts = Seq((1.0, 2.1), (2.0, 3.9), (3.0, 6.2)).toDF("x", "y")
    val slope = pts.agg(regr_slope(col("y"), col("x"))).head.getDouble(0)
    val (n, sx, sy, sxy, sxx) = (3.0, 6.0, 12.2, 28.5, 14.0)
    val expected = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(slope - expected) < 1e-12)
  }
}
