package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.SparkException

/** Interchange formats must round-trip bit-exactly (doubles, nulls,
  * unicode, embedded separators) and fail loudly on malformed input
  * unless quarantine mode is asked for.
  */
class TextFormatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    new java.io.File(sys.props("java.io.tmpdir"), s"graft_fmt_$name").getPath

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("s", StringType),
    StructField("x", DoubleType)))

  private val awkward = Seq(
    (1L, "plain", 1.5),
    (2L, "comma, quote \" and\nnewline", 0.1 + 0.2), // 0.30000000000000004
    (3L, null.asInstanceOf[String], -1.7976931348623157e308),
    (4L, "unicode é中文", 4.9e-324))
    .toDF("id", "s", "x")

  test("JSONL round-trips doubles, nulls, and unicode bit-exactly") {
    val dir = tmp("jsonl")
    TextFormats.writeJsonl(awkward, dir)
    val back = TextFormats.readJsonl(spark, dir, schema)
    assert(back.schema.fieldNames.toSeq == Seq("id", "s", "x"))
    val a = awkward.orderBy("id").collect().toSeq
    val b = back.orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("CSV round-trips embedded separators, quotes, and newlines (multiLine read)") {
    val dir = tmp("csv")
    TextFormats.writeCsv(awkward, dir)
    // quoted embedded newlines straddle line splits: the default
    // splittable reader must refuse them loudly...
    intercept[SparkException](TextFormats.readCsv(spark, dir, schema).collect())
    // ...and the declared non-splittable mode round-trips exactly
    val back = TextFormats.readCsv(spark, dir, schema, multiLine = true)
    val a = awkward.orderBy("id").collect().toSeq
    val b = back.orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("CSV without embedded newlines round-trips on the splittable default path") {
    val dir = tmp("csv_plain")
    val plain = Seq((1L, "a, quoted \" ok", 0.1 + 0.2), (2L, "plain", -4.25e-17))
      .toDF("id", "s", "x")
    TextFormats.writeCsv(plain, dir)
    val back = TextFormats.readCsv(spark, dir, schema)
    assert(plain.orderBy("id").collect().toSeq == back.orderBy("id").collect().toSeq)
  }

  test("FAILFAST aborts on malformed lines; permissive quarantines them") {
    val dir = tmp("bad")
    Seq("""{"id": 1, "s": "ok", "x": 2.0}""", """{"id": not-json""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val strict = TextFormats.readJsonl(spark, dir, schema)
    intercept[SparkException](strict.collect())
    val loose = TextFormats.readJsonl(spark, dir, schema, permissive = true)
    val rows = loose.collect()
    assert(rows.length == 2)
    val bad = rows.filter(!_.isNullAt(3))
    assert(bad.length == 1 && bad.head.getString(3).contains("not-json"))
  }
}
