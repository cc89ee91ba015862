package graft.echem

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.TimeUnit
import org.apache.spark.sql.Dataset

/** External-process-per-row stage (op #27): the reference shells out
  * `jdftx -i deck | tee out` per (slab, charge)
  * (`dags/my_dag.py:135-137`) with a 3-hour task timeout
  * (`dags/my_dag.py:114`, preserved here per SURVEY.md §2j).
  *
  * Spark-first form: `mapPartitions` + `ProcessBuilder` — one
  * process per row, executed inside executors so a cluster fans the
  * binary out across all cores; no driver involvement, no collect.
  *
  * `jdftx` itself is unavailable in CI (SURVEY.md §7 risk), so the
  * stage is parameterized by a [[Exec]]: `BinaryExec` pipes the deck
  * through a real command, `StubExec` replays canned outputs keyed
  * by run key (tests feed it the golden fixtures — EP2's authoring
  * pattern, `dags/dev.py:97-109`).
  */
object ProcessRunner {

  /** (key, rendered input deck) → (key, raw output text). */
  case class Run(key: String, input: String)
  case class RunOutput(key: String, output: String, exitCode: Int)

  trait Exec extends Serializable {
    def run(key: String, input: String): RunOutput
  }

  /** Real execution: write the deck to a scratch file, run
    * `cmd deckPath`, capture stdout, enforce the timeout, clean up
    * scratch (`rm wfns fillings...`, `dags/my_dag.py:137`).
    *
    * Output goes to a scratch FILE, not a pipe read on this thread:
    * reading the pipe before `waitFor(timeout)` would block forever
    * on a hung process that keeps stdout open (the primary hang
    * scenario the timeout exists for), and buffers unbounded output
    * in memory. With file redirection the kernel absorbs the stream,
    * `waitFor` is the first blocking call, and on expiry the process
    * is killed and the partial output still read back. */
  case class BinaryExec(cmd: Seq[String], timeoutSec: Long = 10800L) extends Exec {
    def run(key: String, input: String): RunOutput = {
      val deck = Files.createTempFile(s"graft-$key", ".in")
      val outFile = Files.createTempFile(s"graft-$key", ".out")
      try {
        Files.write(deck, input.getBytes(StandardCharsets.UTF_8))
        val pb = new ProcessBuilder((cmd :+ deck.toString): _*)
        pb.redirectErrorStream(true)
        pb.redirectOutput(outFile.toFile)
        val proc = pb.start()
        proc.getOutputStream.close()
        val finished = proc.waitFor(timeoutSec, TimeUnit.SECONDS)
        val exit =
          if (finished) proc.exitValue()
          else {
            proc.destroyForcibly()
            // bounded wait for the kill to land so the output file is
            // quiescent before we read it
            proc.waitFor(10, TimeUnit.SECONDS)
            -1
          }
        val out = new String(Files.readAllBytes(outFile), StandardCharsets.UTF_8)
        RunOutput(key, out, exit)
      } finally {
        Files.deleteIfExists(deck)
        Files.deleteIfExists(outFile)
      }
    }
  }

  /** Deterministic replay for tests/CI: output = `replay(key)`. */
  case class StubExec(replay: Map[String, String]) extends Exec {
    def run(key: String, input: String): RunOutput =
      RunOutput(key, replay.getOrElse(key, ""), if (replay.contains(key)) 0 else 1)
  }

  /** Stub that loads `<fixtureDir>/<key>.out` lazily on the executor
    * — keeps the closure small (no fixture bytes serialized). */
  case class FixtureDirExec(fixtureDir: String) extends Exec {
    def run(key: String, input: String): RunOutput = {
      val f = new File(fixtureDir, s"$key.out")
      if (f.exists())
        RunOutput(key, new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8), 0)
      else RunOutput(key, "", 1)
    }
  }

  def run(runs: Dataset[Run], exec: Exec): Dataset[RunOutput] = {
    import runs.sparkSession.implicits._
    runs.mapPartitions(_.map(r => exec.run(r.key, r.input)))
  }
}
