package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Physical-layout helpers: bucketed joins must plan without shuffle
  * exchanges; salted joins must preserve results exactly.
  */
class WarehouseSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    val d = "/root/testdata/sf0.001"
    Warehouse.writeBucketed(Tables.lineitem(spark, d), "li_b", "l_orderkey", 8)
    Warehouse.writeBucketed(
      Tables.orders(spark, d).withColumnRenamed("o_orderkey", "l_orderkey"),
      "ord_b", "l_orderkey", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
      val n = joined.count()
      assert(n > 0)
      val exchanges = collectWithSubqueries(joined.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty, s"expected no shuffle, found ${exchanges.size}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join == plain join on skewed data") {
    // 90% of big-side rows hit one key — the salting target
    val big = (1 to 20000).map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i))
      .toDF("k", "payload")
    val small = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = big.join(small, "k")
    val salted = Warehouse.saltedJoin(big, small, "k", nSalts = 8)

    assert(salted.count() == plain.count())
    val a = plain.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = salted.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(salted.columns.toSet == plain.columns.toSet) // no salt leakage
  }
}
