package graft.sink

import java.sql.DriverManager
import java.util.Properties
import graft.SparkSpec

/** Real JDBC round-trip for the idempotent upsert (op #7/#8) against
  * an embedded Derby database — the ON CONFLICT DO NOTHING contract:
  * duplicate keys within a batch collapse, re-loading a batch is a
  * no-op, and the sink readback drives the anti-join.
  */
class JdbcUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val table = "dft_echem"
  private def props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  test("upsertAppend is idempotent against a live JDBC sink") {
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        s"CREATE TABLE $table (mp_id VARCHAR(100), pzc DOUBLE, capacitance DOUBLE)")
    } finally conn.close()

    val batch = Seq(
      ("mp-1", 0.4, 148.5), ("mp-1", 0.4, 148.5), // intra-batch dup
      ("mp-2", 0.7, 99.0)).toDF("mp_id", "pzc", "capacitance")

    JdbcUpsert.upsertAppend(spark, batch, "mp_id", url, table, props)
    val after1 = spark.read.jdbc(url, table, props)
    assert(after1.count() == 2)

    // re-load the same batch plus one new key → only the new key lands
    val batch2 = batch.union(Seq(("mp-3", 0.1, 10.0)).toDF("mp_id", "pzc", "capacitance"))
    JdbcUpsert.upsertAppend(spark, batch2, "mp_id", url, table, props)
    val after2 = spark.read.jdbc(url, table, props)
    assert(after2.count() == 3)
    assert(after2.select("mp_id").as[String].collect().sorted.toSeq ==
      Seq("mp-1", "mp-2", "mp-3"))
  }

  test("newRows is idempotent for NULL keys (null-safe anti-join)") {
    // a null-key row already in the sink must not be re-appended on
    // rerun: plain equality never matches null = null, so every
    // retry would duplicate exactly the malformed rows
    val incoming = Seq((null.asInstanceOf[String], 1.0), ("k1", 2.0), (null.asInstanceOf[String], 3.0))
      .toDF("mp_id", "pzc")
    val existing = Seq((null.asInstanceOf[String], 9.0)).toDF("mp_id", "pzc")
    val out = JdbcUpsert.newRows(incoming, existing, "mp_id").collect()
    // dropDuplicates keeps ONE null row; the null-safe anti-join then
    // removes it (already loaded) — only k1 is new
    assert(out.map(_.getString(0)).toSeq == Seq("k1"))
    // and with an empty sink, the single deduped null row DOES load
    val empty = Seq.empty[(String, Double)].toDF("mp_id", "pzc")
    val first = JdbcUpsert.newRows(incoming, empty, "mp_id").collect()
    assert(first.length == 2 && first.count(_.isNullAt(0)) == 1)
  }
}
