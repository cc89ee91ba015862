package graft.functions

import scala.util.Random
import graft.SparkSpec
import graft.text.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The fold→native optimizer rule must rewrite exactly the portable
  * fold shape (and nothing else), preserve results bit-for-bit, and
  * install cleanly through both `extraOptimizations` and the
  * `GraftExtensions` session-extensions entry point.
  */
class VectorFoldRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, seed: Int) = {
    val rnd = new Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
  }

  private def withRule(f: => Unit): Unit = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ VectorFoldRewrite
    try f finally spark.experimental.extraOptimizations = prev
  }

  test("rewrites dot and norm folds to the native expressions, same results") {
    val df = vecs(200, seed = 11)
    val paired = df.as("a").crossJoin(df.as("b")).filter(col("a.id") < col("b.id"))
    def q = paired.select(col("a.id"), col("b.id"),
      Similarity.dotFold(col("a.v"), col("b.v")).as("d"),
      Similarity.norm2Fold(col("a.v")).as("n"))
    val baseline = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    withRule {
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("DotProductF") || plan.contains("dotproductf"),
        s"dot fold not rewritten:\n$plan")
      assert(plan.contains("Norm2F") || plan.contains("norm2f"),
        s"norm fold not rewritten:\n$plan")
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      assert(got.sortBy(t => (t._1, t._2)).sameElements(baseline.sortBy(t => (t._1, t._2))),
        "rewrite changed results")
    }
  }

  test("leaves deviant folds alone (different zero / double arrays / non-sum merge)") {
    val df = vecs(20, seed = 12)
    withRule {
      // non-zero seed value → must NOT rewrite
      val p1 = df.select(aggregate(
        zip_with(col("v"), col("v"), (x, y) => x.cast("double") * y.cast("double")),
        lit(1.0), (acc, x) => acc + x)).queryExecution.optimizedPlan.toString
      assert(!p1.contains("DotProductF"), p1)
      // double arrays → native expression is float-only, must not rewrite
      val dd = df.select(col("v").cast("array<double>").as("w"))
      val p2 = dd.select(aggregate(
        zip_with(col("w"), col("w"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)).queryExecution.optimizedPlan.toString
      assert(!p2.contains("DotProductF"), p2)
      // max-merge instead of sum → must not rewrite
      val p3 = df.select(aggregate(
        zip_with(col("v"), col("v"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => greatest(acc, x))).queryExecution.optimizedPlan.toString
      assert(!p3.contains("DotProductF"), p3)
      // a -0.0 zero literal folds an EMPTY array to -0.0 while the
      // native accumulator starts at +0.0 — bit-distinct, must not
      // rewrite
      val p5 = df.select(aggregate(
        zip_with(col("v"), col("v"), (x, y) => x.cast("double") * y.cast("double")),
        lit(-0.0), (acc, x) => acc + x)).queryExecution.optimizedPlan.toString
      assert(!p5.contains("DotProductF"), p5)
      // ragged lengths DO rewrite — DotProductF mirrors the fold's
      // NULL-on-mismatch, so results agree (checked in
      // VectorExpressionsSpec fold-parity test)
    }
  }

  test("nullable-element arrays DO rewrite, null elements null both paths identically") {
    // parquet/DDL float arrays default containsNull=true — rejecting
    // them made the rule dead on the most common real schemas. The
    // native expressions NULL-propagate null elements exactly like
    // the fold, so the rewrite is safe and must fire.
    val df = vecs(50, seed = 13)
    // 0.95 threshold: ~2.5% of uniform[-1,1] elements null out, so a
    // 16-element vector stays clean with p≈0.67 — the 50-row fixture
    // reliably contains BOTH null-bearing and clean vectors
    // repartition: without a barrier ConvertToLocalRelation folds the
    // whole local fixture eagerly and no plan survives to rewrite
    val nn = df.repartition(2).select(col("id"), transform(col("v"),
      x => when(x > lit(0.95f), lit(null).cast("float")).otherwise(x)).as("v"))
    def q = nn.select(col("id"),
      Similarity.dotFold(col("v"), col("v")).as("d"),
      Similarity.norm2Fold(col("v")).as("n"))
    val baseline = q.collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(baseline.exists(_._2.isEmpty) && baseline.exists(_._2.isDefined),
      "fixture must exercise BOTH null-element and clean rows")
    withRule {
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("DotProductF") || plan.contains("dotproductf"),
        s"nullable-element dot fold not rewritten:\n$plan")
      val got = q.collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
      assert(got.sortBy(_._1).sameElements(baseline.sortBy(_._1)),
        "rewrite changed results on nullable-element arrays")
    }
  }

  test("registered SQL functions accept NULL literals like built-ins") {
    // ImplicitCastInputTypes: a NullType argument coerces and yields
    // NULL — previously a DATATYPE_MISMATCH AnalysisException
    org.apache.spark.sql.graft.FunctionBridge.registerAll(spark)
    val r = spark.sql(
      "SELECT jaro_winkler(NULL, 'abc') AS j, nfc_normalize(NULL) AS s").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("GraftExtensions installs the rule and the SQL functions in a fresh session") {
    val active = SparkSession.getActiveSession
    val default = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val df = Seq((1L, Array(1f, 2f, 3f)), (2L, Array(0.5f, -1f, 2f)))
        .toDF("id", "v")
      df.createOrReplaceTempView("ext_vecs")
      // injected SQL function
      val viaSql = s2.sql("SELECT id, dot_f(v, v) AS d, norm2_f(v) AS n FROM ext_vecs")
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      assert(viaSql(1L) == ((1.0 + 4.0 + 9.0, 14.0)))
      val jw = s2.sql("SELECT jaro_winkler('martha', 'marhta') AS jw")
        .collect()(0).getDouble(0)
      assert(math.abs(jw - 0.9611111111111111) < 1e-12)
      // injected optimizer rule fires without any per-session setup.
      // (Needs a non-LocalRelation source: a literal Seq plan is
      // constant-folded whole before any expression survives.)
      val ranged = s2.range(4).select(
        transform(sequence(lit(0L), col("id") + 1), x => x.cast("float")).as("w"))
      val plan = ranged.select(Similarity.dotFold(col("w"), col("w")))
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("DotProductF") || plan.contains("dotproductf"),
        s"extensions did not install the rewrite:\n$plan")
    } finally {
      active.foreach(SparkSession.setActiveSession)
      default.foreach(SparkSession.setDefaultSession)
    }
  }
}
