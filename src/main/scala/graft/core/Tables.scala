package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed table loaders for the driver testdata layout
  * (`TESTDATA.md`): one parquet file per TPC-H-ish table under a
  * scale-factor directory.
  *
  * Scale notes: loaders return raw scans — predicate pushdown and
  * column pruning are left to Catalyst, so callers compose
  * `.select/.filter` and the parquet reader sees `PushedFilters`.
  * Nothing is cached here; at 100 TB a table is never materialized
  * driver-side.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.parquet` has shipped with two physical `ts` encodings
    * across driver testdata generations: INT64 TIMESTAMP(NANOS)
    * (which Spark's parquet reader rejects by default,
    * [PARQUET_TYPE_ILLEGAL]) and INT64 TIMESTAMP(MICROS). Normalize
    * both to the engine contract — `ts`: LONG ns since epoch — so
    * every downstream `ts div 1000` sees the exact integer the
    * DuckDB oracle's `epoch_us(ts)` sees:
    *  - NANOS: `nanosAsLong` reads the raw int64 ns directly.
    *  - MICROS: read as TIMESTAMP (NTZ inference off, so the stored
    *    int64 µs IS the unix_micros value — no session-timezone
    *    reinterpretation), then widen µs→ns in long arithmetic.
    * Runtime confs — safe to set on a session we did not build.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ => // TIMESTAMP (µs precision) under either tz flavor
        raw.withColumn("ts",
          unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType)) * lit(1000L))
    }
  }

  /** Events with `ts` converted to a proper microsecond timestamp
    * (`ts_t`) via exact integer division — `ts div 1000` stays in
    * long arithmetic; a double division would lose precision above
    * 2^53 ns.
    */
  def eventsWithTs(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
}
