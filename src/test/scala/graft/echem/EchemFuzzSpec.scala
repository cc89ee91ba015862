package graft.echem

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Deterministic fuzz sweep over the echem TEXT parsers, extending
  * the `MediaFuzzSpec` contract from byte codecs to the domain's
  * semi-structured text inputs — a corrupt `.out`/`.poscar` is the
  * MOST likely real-world malformed input here (both are produced by
  * external binaries that crash, time out, and truncate).
  *
  * Contracts pinned:
  *  - `PoscarCodec.parse`: ANY input either parses or throws the one
  *    contextual `IllegalArgumentException` naming the file — never
  *    an escaped NumberFormatException-without-context, AIOOBE, or
  *    NegativeArraySizeException (the quarantine-catch type a
  *    million-file scan relies on). NOTE NumberFormatException IS an
  *    IAE subclass, but the contract here is stronger than media's:
  *    the thrown IAE must carry the mp_key context, which the
  *    wrap-all in `parse` guarantees.
  *  - `JdftxOutParser.metricsFromText`: NEVER throws on any text —
  *    the declarative twin of quarantine (no-match → null metrics,
  *    n_updates = 0), because one crashed run's log must not kill a
  *    whole metrics stage under ANSI mode.
  */
class EchemFuzzSpec extends SparkSpec {

  private val validPoscar: String = {
    val p = fixturePath("slab_poscars/mp-755394-111-3.poscar")
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
  }

  private def poscarContract(label: String, text: String): Unit =
    try { PoscarCodec.parse("fuzz-key", text); () } catch {
      case e: IllegalArgumentException =>
        assert(e.getMessage != null && e.getMessage.contains("fuzz-key"),
          s"$label: IAE without the file context: ${e.getMessage}")
      case e: Throwable =>
        fail(s"$label escaped the IAE contract with ${e.getClass.getName}: " +
          s"${e.getMessage} on ${text.length} chars " +
          s"[${text.take(60).replace("\n", "\\n")}]")
    }

  test("PoscarCodec.parse: truncations, mutations, and noise parse or throw contextual IAE") {
    // every line-truncation point (header off-by-ones live here) and
    // a char-level truncation sweep
    val lines = validPoscar.split("\n")
    (0 to lines.length).foreach { n =>
      poscarContract(s"ltrunc$n", lines.take(n).mkString("\n"))
    }
    (0 until validPoscar.length by 37).foreach { n =>
      poscarContract(s"ctrunc$n", validPoscar.take(n))
    }
    // seeded point mutations: swap digits/signs/spaces for arbitrary
    // printable chars, biased toward the header lines
    val rnd = new Random(20260815L)
    val printable = (' ' to '~').toArray
    (1 to 2000).foreach { i =>
      val m = validPoscar.toCharArray
      val nFlips = 1 + rnd.nextInt(4)
      (1 to nFlips).foreach { _ =>
        val p = if (rnd.nextBoolean()) rnd.nextInt(math.min(220, m.length))
                else rnd.nextInt(m.length)
        m(p) = printable(rnd.nextInt(printable.length))
      }
      poscarContract(s"mut$i", new String(m))
    }
    // pure noise, empty, and header-prefixed garbage
    poscarContract("empty", "")
    poscarContract("blank", " \n \n \n")
    (1 to 500).foreach { i =>
      val body = Array.fill(rnd.nextInt(400))(printable(rnd.nextInt(printable.length))).mkString
      poscarContract(s"noise$i", body)
      poscarContract(s"prefixed$i", lines.take(1 + rnd.nextInt(7)).mkString("\n") + "\n" + body)
    }
  }

  test("PoscarCodec.parse: adversarial header shapes stay inside the contract") {
    // shapes chosen to hunt specific escapes: Int overflow in counts,
    // negative counts, count/species mismatch, absurd atom claims,
    // non-direct mode, NaN/Inf scale
    val latt = "1.0 0.0 0.0\n0.0 1.0 0.0\n0.0 0.0 1.0"
    Seq(
      s"t\n1.0\n$latt\nSi O\n2000000000 2000000000\ndirect\n0 0 0",
      s"t\n1.0\n$latt\nSi\n-3\ndirect\n0 0 0",
      s"t\n1.0\n$latt\nSi O\n1\ndirect\n0 0 0",
      s"t\n1.0\n$latt\nSi\n99999999\ndirect\n0 0 0",
      s"t\n1.0\n$latt\nSi\n1\ncartesian\n0 0 0",
      s"t\nNaN\n$latt\nSi\n1\ndirect\n0 0 0",
      s"t\nInfinity\n$latt\nSi\n1\ndirect\n0 0 0",
      s"t\n1.0\n$latt\nSi\n1\ndirect\n0 0",
      s"t\n1.0\n$latt\nSi\nxyz\ndirect\n0 0 0",
      s"t\n1e999\n$latt\nSi\n1\ndirect\n0 0 0"
    ).zipWithIndex.foreach { case (s, i) => poscarContract(s"adv$i", s) }
  }

  private val validOut: String = {
    val p = fixturePath("gc_dft/mp-755394-111-3_0.0.out")
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
  }

  test("JdftxOutParser.metricsFromText never throws: fuzzed logs yield metrics or nulls") {
    import spark.implicits._
    val rnd = new Random(8151412L)
    val printable = (' ' to '~').toArray ++ "\n\n\n\t".toCharArray
    val mutated = (1 to 120).map { i =>
      val m = validOut.toCharArray
      (1 to 1 + rnd.nextInt(6)).foreach { _ =>
        m(rnd.nextInt(m.length)) = printable(rnd.nextInt(printable.length))
      }
      (s"mut$i", new String(m))
    }
    val truncated = (0 until validOut.length by math.max(1, validOut.length / 60))
      .map(n => (s"trunc$n", validOut.take(n)))
    val noise = (1 to 120).map { i =>
      (s"noise$i",
        Array.fill(rnd.nextInt(600))(printable(rnd.nextInt(printable.length))).mkString)
    }
    // near-miss marker lines: the regex's neighborhood, malformed
    val nearMiss = Seq(
      ("nm0", "FillingsUpdate:  mu:"),
      ("nm1", "FillingsUpdate:  mu: abc nElectrons: def"),
      ("nm2", "FillingsUpdate:  mu: +0.5 nElectrons:"),
      ("nm3", "fillingsupdate:  mu: 1 nElectrons: 2"),
      ("nm4", "FillingsUpdate:\tmu:\t-0.187 nElectrons: 1e999"),
      ("nm5", ""))
    val logs = (mutated ++ truncated ++ noise ++ nearMiss).toDF("tag", "text")
    // the contract is simply: this completes (no per-row throw under
    // ANSI mode) and every row is null-or-parsable
    val got = JdftxOutParser.metricsFromText(logs, "text").collect()
    assert(got.length == mutated.size + truncated.size + noise.size + nearMiss.size)
    got.foreach { r =>
      val mu = r.getAs[Any]("mu")
      val ne = r.getAs[Any]("nelectrons")
      val n = r.getAs[Long]("n_updates")
      assert(n >= 0L, s"${r.getAs[String]("tag")}: negative n_updates")
      if (n == 0L) assert(mu == null && ne == null,
        s"${r.getAs[String]("tag")}: metrics without a match")
    }
    // "nm4": 1e999 overflows to Infinity under DoubleType cast — a
    // VALUE question, not a crash; pin that it stays non-fatal
    val nm4 = got.find(_.getAs[String]("tag") == "nm4").get
    assert(nm4.getAs[Long]("n_updates") >= 0L)
  }

  test("metricsQuarantine: one row per .out file, bad names and crashed logs flagged not dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-outq").toString
    def write(name: String, text: String): Unit =
      java.nio.file.Files.write(new java.io.File(dir, name).toPath, text.getBytes("UTF-8"))
    write("mp-1_0.5.out", validOut)                     // good
    write("mp-2_-0.25.out", "garbage with no markers")  // crashed run -> ok=false
    write("badname.out", validOut)                      // unparseable name -> ok=false
    write("mp-3_0.0.out", validOut.take(validOut.length / 2) +
      "\ntruncated mid-write")                          // truncation keeps earlier matches
    write("README.txt", "not a log")                    // not .out -> not scanned
    val got = JdftxOutParser.metricsQuarantine(spark, dir).collect()
      .map(r => new java.io.File(r.getAs[String]("file")).getName -> r).toMap
    assert(got.size == 4, s"expected 4 .out rows, got ${got.keys}")
    assert(got("mp-1_0.5.out").getAs[Boolean]("ok"))
    assert(got("mp-1_0.5.out").getAs[Double]("charge") == 0.5)
    assert(!got("mp-2_-0.25.out").getAs[Boolean]("ok"))
    assert(got("mp-2_-0.25.out").getAs[Double]("charge") == -0.25)
    assert(!got("badname.out").getAs[Boolean]("ok"))
    assert(got("badname.out").getAs[Any]("mp_key") == null)
    // the strict scan and the quarantine twin agree on the ok subset
    val strict = JdftxOutParser.metrics(spark, dir)
      .select("mp_key", "charge", "mu", "nelectrons", "n_updates").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    val okSet = got.values.filter(_.getAs[Boolean]("ok"))
      .map(r => (r.getAs[String]("mp_key"), r.getAs[Double]("charge"))).toSet
    assert(okSet.subsetOf(strict),
      s"quarantine ok rows not in the strict scan: ${okSet.diff(strict)}")
  }
}
