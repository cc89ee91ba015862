package graft

import org.apache.spark.sql.catalyst.plans.logical.Window

/** Suite-wide plan contract: NO declared query may plan a
  * partition-less Window — the single-hot-task shape that dies at
  * 100 TB — except the two EXACT oracle paths whose scale-safe twins
  * exist as `relErr > 0` variants (`Ops.equiDepthHistogram`,
  * `Ops.rfmSegments`; the approx path is driver-checked via
  * `q_equidepth_hist_approx`). The assertion runs both directions so
  * the allow-list cannot rot: an unexpected global window fails, and
  * an allow-listed query that stops needing its exemption fails too.
  */
class PlanContractSpec extends SparkSpec {

  private val allowedGlobalWindows = Set(
    "q_equidepth_hist", // exact global ntile: the oracle default, relErr>0 is the scale path
    "q_rfm_segments")   // exact per-metric ntile: same contract, 3 windows

  test("no query plans a partition-less window outside the declared exact-oracle paths") {
    val d = "/root/testdata/sf0.001"
    // Known cost, accepted: a few builders (the q_zonemap/q_merge/
    // q_compact warehouse family) EXECUTE small write jobs at
    // construction time, so this plan-shape sweep also runs them at
    // sf0.001. Excluding them would blind the contract to exactly
    // the queries whose read-back plans it must check; the writes
    // are tmp-dir, tiny, and idempotent.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val df = fn(spark, d)
      val n = df.queryExecution.optimizedPlan.collect {
        case w: Window if w.partitionSpec.isEmpty => w
      }.size
      if (n > 0) Some(name) else None
    }.toSet
    assert(offenders == allowedGlobalWindows,
      s"unexpected global-sort windows: ${(offenders -- allowedGlobalWindows).toSeq.sorted
        .mkString(", ")}; stale allow-list entries: ${(allowedGlobalWindows -- offenders)
        .toSeq.sorted.mkString(", ")}")
  }
}
