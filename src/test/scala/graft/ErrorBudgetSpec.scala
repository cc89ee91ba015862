package graft

/** Proves the run-wide ERROR budget is LIVE, in both directions:
  * an undeclared ERROR event is classified as a leak (and would fail
  * the next suite teardown), and a declared negative-test shape
  * debits its budget entry instead of leaking. The deliberate leak is
  * drained through the test-only hook after being observed, so this
  * proof doesn't itself fail the run.
  */
class ErrorBudgetSpec extends SparkSpec {

  test("an undeclared ERROR event is recorded as a leak") {
    val marker = "graft-error-budget-selftest-undeclared"
    org.apache.logging.log4j.LogManager
      .getLogger("graft.test.ScratchNegative").error(s"boom $marker")
    // the appender runs synchronously on the logging thread
    assert(GlobalErrorBudget.drainLeaksMatching(marker) == 1,
      "an ERROR from an undeclared source must be classified as a leak")
    // idempotent: the drain removed it, a second look finds nothing
    assert(GlobalErrorBudget.drainLeaksMatching(marker) == 0)
  }

  test("declared negative-test shapes classify to their budget entries") {
    // the exact logger+line shapes the declared negative tests
    // produce must match their entries (probed via the pure
    // classifier so the real run's counters are untouched)
    def tagOf(logger: String, line: String): Option[String] =
      GlobalErrorBudget.classify(logger, s"$logger: $line").map(_.tag)
    assert(tagOf("org.apache.spark.scheduler.TaskSetManager",
      "Task 0 in stage 9377.0 failed 1 times; aborting job")
      .contains("declared-job-abort"))
    assert(tagOf("org.apache.spark.executor.Executor",
      "Exception in task 0.0 in stage 1.0 (TID 1) thrown=java.lang." +
        "IllegalArgumentException: requirement failed: materials backend: " +
        "HTTP 503 for http://127.0.0.1:1/broken?page=0")
      .contains("materials-http-503"))
    assert(tagOf("org.apache.spark.executor.Executor",
      "Exception in task 0.0 in stage 1.0 (TID 1) thrown=org.apache.spark." +
        "SparkException: [FAILED_READ_FILE.NO_HINT] Encountered error")
      .contains("textformats-failfast"))
    assert(tagOf("org.apache.spark.executor.Executor",
      "Exception in task 0.0 in stage 1.0 (TID 1) thrown=org.apache.spark." +
        "SparkNumberFormatException: [CAST_INVALID_INPUT] The value 'oops'")
      .contains("learn-bad-cast"))
    assert(tagOf("org.apache.spark.executor.Executor",
      "Exception in task 0.0 in stage 2.0 (TID 2) thrown=java.lang." +
        "IllegalArgumentException: SortedIntersectCount: left input violates " +
        "the no-null-elements contract at index 0")
      .contains("setexpr-strict-contract"))
    // ...and a novel shape does NOT silently match anything
    assert(tagOf("org.apache.spark.executor.Executor",
      "Exception in task 0.0 in stage 1.0 (TID 1) thrown=java.lang." +
        "NullPointerException").isEmpty)
  }
}
