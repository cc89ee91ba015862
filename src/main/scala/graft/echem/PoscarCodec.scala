package graft.echem

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import Schemas.{Atom, Slab}

/** POSCAR (VASP direct format) parse + render — the codec behind the
  * reference's `ase.io.read` / `Poscar.write_file`
  * (`dags/my_dag.py:44,97,127,167,224`). Pure Scala string codec,
  * invoked per-row inside `Dataset.map` partitions — no driver-side
  * file iteration, so a directory of millions of POSCARs distributes
  * like any other scan.
  *
  * Layout (FIXTURES.md A1): title / scale / 3×3 lattice / species
  * symbols / per-species counts / "direct" / one fractional row +
  * element per atom.
  */
object PoscarCodec {

  def parse(mpKey: String, text: String): Slab = try {
    val lines = text.split("\n").map(_.trim).filter(_.nonEmpty)
    require(lines.length >= 8, s"need >= 8 non-empty lines, got ${lines.length}")
    val title = lines(0)
    val scale = lines(1).toDouble
    val lattice = (2 to 4).map(i => lines(i).split("\\s+").map(_.toDouble).toSeq)
    require(lattice.forall(_.length == 3), "lattice rows must have 3 components")
    val species = lines(5).split("\\s+").toSeq
    val counts = lines(6).split("\\s+").map(_.toInt).toSeq
    // length match + Long sum: a counts line like "2000000000 2000000000"
    // wrapped counts.sum NEGATIVE, making the position range empty — a
    // silently ATOM-LESS slab under a header claiming billions; and a
    // counts/species length mismatch sent cum.indexWhere to -1 →
    // species(-1) mid-parse
    require(species.length == counts.length,
      s"${species.length} species but ${counts.length} counts")
    require(counts.forall(_ >= 0), s"negative species count in ${counts.mkString(" ")}")
    val nAtomsL = counts.map(_.toLong).sum
    require(nAtomsL <= lines.length - 8L,
      s"header declares $nAtomsL atoms but only ${lines.length - 8} position lines follow")
    require(lines(7).toLowerCase.startsWith("d"), s"only 'direct' POSCAR supported, got: ${lines(7)}")
    val nAtoms = nAtomsL.toInt
    // the species line + counts is the authoritative element source
    // (VASP spec); trailing per-atom labels may carry pymatgen
    // oxidation-state suffixes like "V4+" and are ignored
    val cum = counts.scanLeft(0)(_ + _).tail
    val positions = (8 until 8 + nAtoms).map { i =>
      val p = lines(i).split("\\s+")
      require(p.length >= 3, s"position line ${i + 1} has ${p.length} fields, need >= 3")
      val el = species(cum.indexWhere((i - 8) < _))
      Atom(p(0).toDouble, p(1).toDouble, p(2).toDouble, el)
    }
    Slab(mpKey, title, scale, lattice, species, counts, positions, Seq.empty)
  } catch {
    // one failure type with the FILE context: a corrupt .poscar in a
    // million-file scan must name itself — a bare NumberFormatException
    // ("For input string: ...") from deep inside a mapPartitions task
    // identifies nothing
    case e: Exception =>
      throw new IllegalArgumentException(
        s"malformed POSCAR '$mpKey': ${e.getMessage}", e)
  }

  // Locale.ROOT, not the f-interpolator: the interpolator formats with
  // the default JVM locale, and a comma-decimal locale (de_DE, ...)
  // would emit "0,5" — unparseable by parse() and by VASP/JDFTx.
  private def f16(v: Double): String =
    String.format(java.util.Locale.ROOT, "%20.16f", Double.box(v))

  def render(s: Slab): String = {
    val sb = new StringBuilder
    sb.append(s.title).append('\n')
    sb.append(s.scale.toString).append('\n')
    s.lattice.foreach { row =>
      sb.append(row.map(f16).mkString(" ")).append('\n')
    }
    sb.append(s.species.mkString(" ")).append('\n')
    sb.append(s.counts.mkString(" ")).append('\n')
    sb.append("direct\n")
    s.positions.foreach { a =>
      sb.append(s"${f16(a.x)} ${f16(a.y)} ${f16(a.z)} ${a.element}\n")
    }
    sb.toString
  }

  /** Distributed POSCAR directory scan → typed `Dataset[Slab]`
    * (op #3). `wholetext` gives one row per file; the key is the
    * filename stem (`Path(p).stem`, `dags/my_dag.py:122`). */
  def read(spark: SparkSession, dir: String): Dataset[Slab] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(dir)
      // extension filter (the JdftxOutParser.metrics convention): a
      // stray README/temp file in the directory must be skipped, not
      // NumberFormatException-kill the whole scan inside parse()
      .filter(input_file_name().endsWith(".poscar"))
      .select(
        regexp_extract(input_file_name(), "([^/]+)\\.poscar$", 1).as("mp_key"),
        col("value"))
      .as[(String, String)]
      .map { case (k, v) => parse(k, v) }
  }
}
