package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Line-oriented interchange formats (JSONL, CSV) with PINNED
  * schemas and parse contracts — the ingest/egress surface a corpus
  * pipeline needs beside parquet (crawl dumps arrive as JSONL;
  * labeling vendors want CSV back).
  *
  * Every reader takes an explicit [[StructType]]: schema inference
  * on text formats is a full extra pass over the data at 100 TB
  * (and non-deterministic under sampling), so the library never
  * infers. Readers default to FAILFAST — a malformed line aborts
  * the job with the offending record in the error, rather than
  * silently nulling columns mid-corpus; pass `permissive = true` to
  * instead land bad lines in a `_corrupt_record` column for a
  * quarantine sink. Writers and readers share one option set
  * (separator, quote, escape, timestamp format), so a graft-written
  * file always round-trips through the graft reader bit-exactly —
  * doubles included (Spark emits shortest-round-trip decimal
  * strings, and parsing those back is correctly rounded).
  *
  * Scale shape: both formats read/write as N splittable partitions
  * (JSONL and quoted CSV split on line boundaries); no driver
  * funnel, no coalesce. Compression is the caller's choice via
  * `codec` — zstd for cold egress, none for scratch hand-offs
  * (gzip'd text is NOT splittable: one 10-GB gzip member = one
  * task, the classic ingest stall).
  */
object TextFormats {

  private val csvOptions = Map(
    "header" -> "true",
    "sep" -> ",",
    "quote" -> "\"",
    "escape" -> "\"",
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")

  def writeJsonl(df: DataFrame, dir: String, codec: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
    codec.fold(w)(c => w.option("compression", c)).json(dir)
  }

  def readJsonl(spark: SparkSession, dir: String, schema: StructType,
                permissive: Boolean = false): DataFrame = {
    val s = if (permissive) schema.add("_corrupt_record", "string") else schema
    spark.read
      .schema(s)
      .option("mode", if (permissive) "PERMISSIVE" else "FAILFAST")
      .json(dir)
  }

  def writeCsv(df: DataFrame, dir: String, codec: Option[String] = None): Unit = {
    val w = csvOptions.foldLeft(df.write.mode("overwrite")) {
      case (acc, (k, v)) => acc.option(k, v)
    }
    codec.fold(w)(c => w.option("compression", c)).csv(dir)
  }

  /** @param multiLine RFC-4180 quoted newlines require `multiLine =
    *   true`, which makes each FILE one task (the reader can no
    *   longer split on line boundaries — a record may straddle any
    *   split point). Leave false for data without embedded newlines;
    *   for text WITH newlines prefer JSONL, which escapes them as
    *   `\n` and stays splittable. */
  def readCsv(spark: SparkSession, dir: String, schema: StructType,
              permissive: Boolean = false, multiLine: Boolean = false): DataFrame = {
    val s = if (permissive) schema.add("_corrupt_record", "string") else schema
    val r = csvOptions.foldLeft(spark.read.schema(s)) {
      case (acc, (k, v)) => acc.option(k, v)
    }
    r.option("mode", if (permissive) "PERMISSIVE" else "FAILFAST")
      .option("multiLine", multiLine.toString)
      .csv(dir)
  }
}
