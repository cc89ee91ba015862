package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC egress/ingest — the second columnar interchange format next
  * to parquet (warehouses on the Hive lineage want ORC back). Unlike
  * the text formats, ORC is self-describing: the footer carries
  * schema + per-stripe min/max statistics, so reads take no schema
  * argument and no inference pass, and predicate pushdown skips
  * whole stripes the same way parquet row-groups skip
  * (`PushedFilters` reaches the ORC scan — plan-asserted in the
  * spec). Splittable by stripe; compression is a per-write codec
  * choice (zstd default here — stripe-local, so it never breaks
  * splittability the way whole-file gzip does on text).
  */
object ColumnarFormats {

  def writeOrc(df: DataFrame, dir: String, codec: String = "zstd"): Unit =
    df.write.mode("overwrite").option("compression", codec).orc(dir)

  def readOrc(spark: SparkSession, dir: String): DataFrame =
    spark.read.orc(dir)
}
