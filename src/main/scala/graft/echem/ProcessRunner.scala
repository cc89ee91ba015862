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
    * scratch (`rm wfns fillings...`, `dags/my_dag.py:137`). */
  case class BinaryExec(cmd: Seq[String], timeoutSec: Long = 10800L) extends Exec {
    def run(key: String, input: String): RunOutput = {
      val deck = Files.createTempFile(s"graft-$key", ".in")
      try {
        Files.write(deck, input.getBytes(StandardCharsets.UTF_8))
        val pb = new ProcessBuilder((cmd :+ deck.toString): _*)
        pb.redirectErrorStream(true)
        val proc = pb.start()
        proc.getOutputStream.close()
        val out = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
        val finished = proc.waitFor(timeoutSec, TimeUnit.SECONDS)
        if (!finished) {
          proc.destroyForcibly()
          RunOutput(key, out, -1)
        } else RunOutput(key, out, proc.exitValue())
      } finally Files.deleteIfExists(deck)
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
