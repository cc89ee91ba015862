package graft.streaming

import java.sql.DriverManager
import java.util.Properties
import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** End-to-end: streaming micro-batches → idempotent JDBC load. The
  * reference's `ON CONFLICT DO NOTHING` load as a `foreachBatch`
  * body — duplicate keys across AND within micro-batches land
  * exactly once, which is what makes streaming retries safe.
  */
class StreamingJdbcSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // same error-free-log contract as StreamingSpec: a streaming suite
  // must not leak ERROR lines into a green run
  private var errCap: graft.ErrorLogCapture.Capture = _
  override def beforeAll(): Unit = {
    super.beforeAll()
    // streaming/broadcast loggers only — same rationale as
    // StreamingSpec (late task-level lines belong to GlobalErrorBudget)
    errCap = graft.ErrorLogCapture.install(graft.ErrorLogCapture.StreamingLoggers)
  }
  override def afterAll(): Unit = {
    spark.streams.active.foreach(_.stop())
    try {
      val errs = errCap.asSeq
      assert(errs.isEmpty,
        s"streaming-jdbc suite logged ${errs.size} ERROR event(s):\n${errs.mkString("\n")}")
    } finally {
      graft.ErrorLogCapture.uninstall(errCap)
      super.afterAll()
    }
  }

  private val url = "jdbc:derby:memory:graftstream;create=true"
  private val table = "stream_echem"
  private def props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  test("streamed batches with overlapping keys load exactly once") {
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute(
      s"CREATE TABLE $table (mp_id VARCHAR(100), pzc DOUBLE, capacitance DOUBLE)")
    finally conn.close()

    // two files → two micro-batches (maxFilesPerTrigger=1) with an
    // overlapping key and an intra-batch duplicate
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-jdbc").toString
    Seq(("mp-a", 0.1, 1.0), ("mp-a", 0.1, 1.0), ("mp-b", 0.2, 2.0))
      .toDF("mp_id", "pzc", "capacitance")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/f1")
    Seq(("mp-b", 0.2, 2.0), ("mp-c", 0.3, 3.0))
      .toDF("mp_id", "pzc", "capacitance")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/f2")
    val inDir = s"$dir/in"
    new java.io.File(inDir).mkdirs()
    def move(src: String): Unit =
      new java.io.File(src).listFiles().filter(_.getName.endsWith(".parquet"))
        .foreach(f => f.renameTo(new java.io.File(inDir, f.getName)))
    move(s"$dir/f1"); move(s"$dir/f2")

    val schema = StructType(Seq(
      StructField("mp_id", StringType), StructField("pzc", DoubleType),
      StructField("capacitance", DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)

    val load = StreamingOps.idempotentForeachBatch(
      key = "mp_id",
      readSink = s => s.read.jdbc(url, table, props),
      append = df => df.write.mode(SaveMode.Append).jdbc(url, table, props))

    val q = stream.writeStream.foreachBatch(load)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val sink = spark.read.jdbc(url, table, props)
    assert(sink.count() == 3)
    assert(sink.select("mp_id").as[String].collect().sorted.toSeq ==
      Seq("mp-a", "mp-b", "mp-c"))
  }
}
