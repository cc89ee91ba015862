package graft

import java.util.concurrent.ConcurrentLinkedQueue

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
  * the one forked test JVM (`Test / fork`, no forked parallelism),
  * so a suite-scoped capture never sees another suite's DELIBERATE
  * error logs (e.g. the HTTP-503 intercept tests).
  */
object ErrorLogCapture {

  final class Capture private[ErrorLogCapture] ()
      extends AbstractAppender("graft-error-capture", null, null, true,
        Property.EMPTY_ARRAY) {
    val events = new ConcurrentLinkedQueue[String]()
    override def append(e: LogEvent): Unit =
      if (e.getLevel.isMoreSpecificThan(Level.ERROR))
        events.add(s"${e.getLoggerName}: ${e.getMessage.getFormattedMessage}")
    def asSeq: Seq[String] = {
      val b = Seq.newBuilder[String]
      events.forEach(e => b += e)
      b.result()
    }
  }

  def install(): Capture = {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cap = new Capture
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
