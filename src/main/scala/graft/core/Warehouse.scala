package graft.core

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical-layout helpers for the 100 TB design point (SCALING.md):
  * bucketing for exchange-free co-located joins, salting for skewed
  * keys. Both are pure plan/layout devices — results are identical
  * to the unoptimized forms (property-tested).
  */
object Warehouse {

  /** Persist a table bucketed + sorted by the join key. Two tables
    * bucketed the same way join with NO shuffle exchange on either
    * side — at 100 TB this converts the nightly fact-fact join from
    * a full-network shuffle into local merges. (Local session
    * catalog here; on a cluster this is the metastore + object
    * store.) */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    // a fresh (in-memory) catalog may not know a table whose previous
    // location survives on disk — clear both before writing
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Skew-salted equi-join that preserves inner-join semantics
    * exactly: the big (skewed) side gets a deterministic salt in
    * [0, n) per row; the small side is exploded n× so every
    * (key, salt) replica exists. One degenerate hot key is thereby
    * spread over n reducers. AQE's skew split handles moderate skew
    * automatically — explicit salting is for the pathological keys
    * you know about (LSH buckets, null-ish defaults, celebrity
    * users). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, nSalts: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(nSalts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
