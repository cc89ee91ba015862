package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Captures ERROR-level log events for the duration of a suite, so a
  * suite can ASSERT its green run stayed error-free instead of
  * relying on a human to eyeball the sbt log. Motivated by the
  * stream-stop ERROR lines that survived two rounds of "the log
  * looks clean now": a `q.stop()` landing mid-broadcast logs
  * `ERROR TorrentBroadcast` without failing any test, and the only
  * guard against it regressing again is a machine check.
  *
  * Log4j2 (Spark's logging backend): one appender on the root
  * LoggerConfig, removed on uninstall. Suites run sequentially in
  * the one forked test JVM (`Test / fork`, no forked parallelism —
  * pinned mechanically by [[GlobalErrorBudget.ensureInstalled]] via
  * the `graft.test.forkedParallel` property build.sbt exports), so a
  * suite-scoped capture never sees another suite's DELIBERATE error
  * logs... unless a background thread from a prior suite logs late.
  * `loggerPrefixes` narrows a capture to the loggers the suite
  * actually guards (the streaming/broadcast machinery) so a late
  * Executor/TaskSetManager line from an earlier negative test cannot
  * flake an unrelated zero-ERROR assertion.
  */
object ErrorLogCapture {

  final class Capture private[ErrorLogCapture] (loggerPrefixes: Seq[String])
      extends AbstractAppender("graft-error-capture", null, null, true,
        Property.EMPTY_ARRAY) {
    val events = new ConcurrentLinkedQueue[String]()
    override def append(e: LogEvent): Unit =
      if (e.getLevel.isMoreSpecificThan(Level.ERROR) &&
          (loggerPrefixes.isEmpty ||
            loggerPrefixes.exists(e.getLoggerName.startsWith)))
        events.add(s"${e.getLoggerName}: ${e.getMessage.getFormattedMessage}")
    def asSeq: Seq[String] = {
      val b = Seq.newBuilder[String]
      events.forEach(e => b += e)
      b.result()
    }
  }

  /** Loggers the streaming suites' zero-ERROR contract is ABOUT:
    * stream execution/teardown, broadcast + block-manager cleanup,
    * and the shutdown-hook machinery — the sources of every
    * historical leak (r7 shutdown-hook kills, r8 TorrentBroadcast).
    * Task-level loggers (Executor, TaskSetManager) are deliberately
    * outside: those belong to the run-wide [[GlobalErrorBudget]],
    * which tag-matches them against the declared negative tests
    * regardless of WHEN their background threads get around to
    * logging. */
  val StreamingLoggers: Seq[String] = Seq(
    "org.apache.spark.sql.execution.streaming",
    "org.apache.spark.sql.streaming",
    "org.apache.spark.broadcast",
    "org.apache.spark.storage",
    "org.apache.spark.util")

  def install(loggerPrefixes: Seq[String] = Nil): Capture = {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cap = new Capture(loggerPrefixes)
    cap.start()
    ctx.getConfiguration.getRootLogger.addAppender(cap, Level.ERROR, null)
    ctx.updateLoggers()
    cap
  }

  def uninstall(cap: Capture): Unit = {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    ctx.getConfiguration.getRootLogger.removeAppender(cap.getName)
    ctx.updateLoggers()
    cap.stop()
  }
}

/** Run-wide ERROR budget: EVERY ERROR event logged anywhere in the
  * test JVM must match a declared (tag, logger, pattern, max) entry
  * for a known negative test — anything else, including a declared
  * source exceeding its count, is a LEAK that fails the next suite
  * teardown ([[SparkSpec.afterAll]] asserts).
  *
  * This replaces the former contract "only declared suites may log
  * ERROR", under which a TENTH error line from a new test would have
  * grown the budget silently: now the allowlist is an explicit
  * multiset bound, tagged by source. Upper bounds, not exact counts,
  * because task-level error fan-out is racy by construction — when
  * task 0 of the HTTP-503 read fails, task 1 is sometimes killed
  * before it fails and sometimes logs its own ERROR — so the
  * per-tag maximum is the worst-case task count, while a zero count
  * (the negative test stopped exercising its path) is the test's own
  * assertion to catch, not this budget's.
  */
object GlobalErrorBudget {

  /** One declared ERROR source: events whose logger starts with
    * `logger` and whose message+thrown matches `pattern` (find, not
    * full match) debit this entry, at most `max` times per run. */
  final case class Entry(tag: String, logger: String,
                         pattern: scala.util.matching.Regex, max: Int) {
    private[GlobalErrorBudget] val seen = new AtomicInteger(0)
  }

  /** The declared negative tests, r11 census (maxes are worst-case
    * task fan-out, see class doc):
    *  - MaterialsHttpSourceSpec: HTTP-503 intercept — the 2-page read
    *    runs 2 tasks, each may log before the abort lands;
    *  - TextFormatsSpec: two FAILFAST reads (malformed CSV, bad text)
    *    — one stage each, up to 2 tasks;
    *  - LearnSpec: ANSI bad-cast ('oops') — one stage, up to 2 tasks;
    *  - SetExpressionsSpec: three strict-mode contract violations
    *    (unsorted, duplicate, null element), coalesce(1) → one task
    *    each;
    *  - SimilaritySpec: gramMatrix non-finite-component intercept
    *    (r12) — one-row input, up to 2 tasks;
    *  - TaskSetManager's job-abort line is shared by all of the above
    *    (its message carries no cause): one per aborted job, 8 jobs
    *    (the third setexpr contract case, r12, added the eighth).
    */
  private val budget: Seq[Entry] = Seq(
    Entry("materials-http-503", "org.apache.spark.executor.Executor",
      "(?s)HTTP 503 .*?/broken".r, 2),
    Entry("textformats-failfast", "org.apache.spark.executor.Executor",
      "(?s)FAILED_READ_FILE".r, 4),
    Entry("learn-bad-cast", "org.apache.spark.executor.Executor",
      "(?s)CAST_INVALID_INPUT".r, 2),
    Entry("setexpr-strict-contract", "org.apache.spark.executor.Executor",
      "(?s)(sorted-distinct|no-null-elements) contract".r, 3),
    Entry("gram-nonfinite", "org.apache.spark.executor.Executor",
      "(?s)non-finite embedding component".r, 2),
    Entry("declared-job-abort", "org.apache.spark.scheduler.TaskSetManager",
      """Task \d+ in stage .* failed \d+ times; aborting job""".r, 8))

  private val leaks = new ConcurrentLinkedQueue[String]()
  @volatile private var installed = false

  /** Pure classifier (no counter mutation) — also the self-test's
    * probe surface, so ErrorBudgetSpec can prove a declared shape
    * matches without debiting the real run's budget. */
  private[graft] def classify(loggerName: String, line: String): Option[Entry] =
    budget.find(b => loggerName.startsWith(b.logger) &&
      b.pattern.findFirstIn(line).isDefined)

  private final class BudgetAppender
      extends AbstractAppender("graft-global-error-budget", null, null, true,
        Property.EMPTY_ARRAY) {
    override def append(e: LogEvent): Unit = {
      if (e.getLevel.isMoreSpecificThan(Level.ERROR)) {
        val thrown = Option(e.getThrown).map(t => s" thrown=$t").getOrElse("")
        val line = s"${e.getLoggerName}: ${e.getMessage.getFormattedMessage}$thrown"
        classify(e.getLoggerName, line) match {
          case Some(b) =>
            if (b.seen.incrementAndGet() > b.max)
              leaks.add(s"[over-budget ${b.tag} > ${b.max}] $line")
          case None => leaks.add(s"[undeclared] $line")
        }
      }
    }
  }

  def ensureInstalled(): Unit = synchronized {
    if (!installed) {
      // the budget accounting assumes suites run sequentially in this
      // one forked JVM; build.sbt exports the setting so a config
      // change that breaks the assumption fails here, not as a flake
      assert(sys.props.getOrElse("graft.test.forkedParallel", "false") != "true",
        "GlobalErrorBudget requires sequential suite execution " +
          "(Test / testForkedParallel must stay false)")
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val app = new BudgetAppender
      app.start()
      ctx.getConfiguration.getRootLogger.addAppender(app, Level.ERROR, null)
      ctx.updateLoggers()
      installed = true
    }
  }

  /** Asserts no leak has been observed so far; called from every
    * suite's teardown, so the first suite to run after a leak fails
    * loudly (attribution is "at or before <suite>" — sequential
    * execution bounds it to the named suite or a late background
    * thread of an earlier one). */
  def assertNoLeaks(observer: String): Unit = {
    val snapshot = {
      val b = Seq.newBuilder[String]
      leaks.forEach(l => b += l)
      b.result()
    }
    assert(snapshot.isEmpty,
      s"ERROR-budget leak(s) observed at or before $observer — an ERROR " +
        s"event matched no declared negative-test entry (or exceeded its " +
        s"max); extend GlobalErrorBudget.budget ONLY for a new DECLARED " +
        s"negative test:\n${snapshot.mkString("\n")}")
  }

  /** Test hook: remove leaks matching `marker` and return how many
    * were removed — lets ErrorBudgetSpec prove the capture classifies
    * an undeclared ERROR as a leak without failing the run. */
  private[graft] def drainLeaksMatching(marker: String): Int = {
    var n = 0
    val it = leaks.iterator()
    while (it.hasNext) if (it.next().contains(marker)) { it.remove(); n += 1 }
    n
  }
}
