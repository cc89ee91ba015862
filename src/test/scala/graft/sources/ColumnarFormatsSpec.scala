package graft.sources

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** ORC must round-trip exactly and keep the scan-level optimizations
  * that justify a columnar format: filters pushed to the reader and
  * schema pruned to the projection.
  */
class ColumnarFormatsSpec extends SparkSpec {

  private val dir =
    new java.io.File(sys.props("java.io.tmpdir"), "graft_orc_li").getPath

  test("ORC round-trips lineitem exactly") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    ColumnarFormats.writeOrc(li, dir)
    val back = ColumnarFormats.readOrc(spark, dir)
    assert(back.schema == li.schema)
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }

  test("filters and projection reach the ORC scan") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    ColumnarFormats.writeOrc(li, dir)
    val q = ColumnarFormats.readOrc(spark, dir)
      .filter(col("l_quantity") > 30.0)
      .select("l_orderkey", "l_quantity")
    val scan = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(scan.contains("PushedFilters") && scan.contains("l_quantity"),
      s"no pushed filter in scan:\n$scan")
    assert(!scan.contains("l_extendedprice"), s"projection not pruned:\n$scan")
    assert(q.count() > 0)
  }
}
