package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Curated-corpus export — the write side of a training-data
  * pipeline. The layout contract is what makes the NEXT job cheap at
  * 100 TB:
  *
  *  - hive-style partition directories (`partitionBy`) → readers
  *    prune whole partitions from the listing, never open a file;
  *  - rows sorted by `sortCols` within each file
  *    (`sortWithinPartitions` with the partition columns prefixed, so
  *    a task's rows stream into its files already grouped) → parquet
  *    gets long runs for RLE/dictionary/delta encodings and range
  *    readers get locality;
  *  - `maxRecordsPerFile` caps file size → no 2 GB parquet monsters,
  *    bounded memory per reader task, parallelism preserved for
  *    downstream scans.
  *
  * Overwrite semantics, stated honestly: `mode("overwrite")` deletes
  * the ENTIRE existing path when the job starts — a failed re-export
  * leaves no previous corpus behind, and partition values absent
  * from the new frame are wiped. For a production re-export of a
  * live corpus, write to a fresh VERSIONED path and repoint readers
  * (the zone-map table's `_current` pattern), or set
  * `spark.sql.sources.partitionOverwriteMode=dynamic` to replace
  * only the partitions present in the frame. Kept as plain overwrite
  * here because the declared export writes to its own fresh dir.
  *
  * The `repartition(partitionCols)` before the write is deliberate:
  * without it every task can hold rows of every partition value and a
  * P-partition × T-task write emits P·T small files — the classic
  * small-files explosion; with it each partition value's rows
  * coalesce into ⌈rows/maxRecordsPerFile⌉ files. A visibly skewed
  * partition column (one language is half the corpus) calls for
  * `repartitionByRange` on (partition, sort) keys instead — noted
  * rather than defaulted, since range partitioning needs a sample
  * pass.
  */
object CuratedSink {

  def write(df: DataFrame, path: String,
            partitionCols: Seq[String], sortCols: Seq[String],
            maxRecordsPerFile: Long = 5000000L): Unit = {
    require(partitionCols.nonEmpty, "curated export requires at least one partition column")
    require(maxRecordsPerFile > 0, s"maxRecordsPerFile must be positive, got $maxRecordsPerFile")
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
