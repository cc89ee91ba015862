package graft.core

import org.apache.spark.sql.SparkSession

/** Session configuration for the engine.
  *
  * `tune` applies the runtime-settable confs every entry point needs
  * (safe on sessions we did not build — the driver owns the builder
  * in Verify/Bench); `local` builds a tuned local session for
  * library users.
  */
object Sessions {

  /** Runtime confs: AQE on (coalescing + skew-join split), nanos
    * timestamps readable, UTC semantics. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    org.apache.spark.sql.graft.FunctionBridge.registerAll(spark)
    spark
  }

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    tune(SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate())
}
