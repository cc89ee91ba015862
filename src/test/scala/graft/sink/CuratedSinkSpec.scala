package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Layout contract of the curated export: hive partition dirs,
  * within-file sort, file-size cap. */
class CuratedSinkSpec extends SparkSpec {
  import spark.implicits._

  test("partition dirs, per-file sort, and maxRecordsPerFile all hold") {
    val docs = (1 to 90).map(i => (i.toLong, s"lang${i % 3}", s"text $i"))
      .toDF("doc_id", "lang", "text")
      // scramble so the sink's sort has to do the work
      .orderBy(expr("(doc_id * 7919) % 97"))
    val out = java.nio.file.Files.createTempDirectory("graft-curated").toString
    CuratedSink.write(docs, out, Seq("lang"), Seq("doc_id"), maxRecordsPerFile = 10L)

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("lang=lang0", "lang=lang1", "lang=lang2"))

    // each partition: 30 rows / cap 10 → ≥ 3 files, each internally sorted
    dirs.foreach { d =>
      val files = new java.io.File(s"$out/$d").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length >= 3, s"$d has ${files.length} files")
      files.foreach { f =>
        val ids = spark.read.parquet(f.getPath).select("doc_id").as[Long].collect().toSeq
        assert(ids == ids.sorted, s"unsorted file ${f.getName}")
        assert(ids.length <= 10)
      }
    }
    // nothing lost or duplicated
    val back = spark.read.parquet(out)
    assert(back.count() == 90)
    assert(back.select("doc_id").distinct().count() == 90)
  }
}
