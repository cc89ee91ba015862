package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Admission-gate checks: the profile must count exactly, the
  * k-anonymity audit must surface precisely the under-k groups, and
  * two-pass heavy hitters must equal the plain groupBy-count-having
  * it replaces — on adversarial distributions, not just friendly
  * ones (Misra–Gries eviction is where the bugs live).
  */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  test("dataProfile: exact counts, nulls, distincts, min/max per column kind") {
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "b", 2.5), (2L, "a", null), (2L, null, -1.0), (null, "c", 2.5))
      .toDF("id", "s", "x")
    val p = Validate.dataProfile(df, Seq("id", "s", "x"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "s", "x"))
    val id = p("id")
    assert(id.getLong(1) == 4L && id.getLong(2) == 1L && id.getLong(3) == 2L)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 2.0)
    assert(id.isNullAt(6) && id.isNullAt(7))
    val s = p("s")
    assert(s.getLong(2) == 1L && s.getLong(3) == 3L)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) == "a" && s.getString(7) == "c")
    val x = p("x")
    assert(x.getLong(2) == 1L && x.getLong(3) == 2L)
    assert(x.getDouble(4) == -1.0 && x.getDouble(5) == 2.5)
  }

  test("dataProfile: a top-level column name containing a dot profiles correctly") {
    // internal aliases are index-based and source columns resolve
    // backtick-quoted — previously col("__nulls_price.usd") parsed the
    // dot as struct access and failed resolution on this legal name
    val df = Seq[(java.lang.Long, java.lang.Double)]((1L, 2.0), (2L, null))
      .toDF("id", "price.usd")
    val p = Validate.dataProfile(df, Seq("price.usd", "id"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("price.usd", "id"))
    val x = p("price.usd")
    assert(x.getLong(1) == 2L && x.getLong(2) == 1L && x.getLong(3) == 1L)
    assert(x.getDouble(4) == 2.0 && x.getDouble(5) == 2.0)
    intercept[IllegalArgumentException](
      Validate.dataProfile(df.withColumnRenamed("id", "a`b"), Seq("a`b")))
  }

  test("drift family + kAnonymity/heavyHitters resolve dotted top-level names (quoted, family-wide)") {
    // dataProfile's quoted resolution extended family-wide (r13,
    // ADVICE r12): previously these entry points resolved user names
    // with bare col(), misparsing a legal dotted top-level name as
    // struct-field access. Equivalence oracle: rename the columns to
    // plain names and the results must match exactly.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      (s"g${i % 3}", rnd.nextDouble() * 10, 1700000000000000L + i * 1000L)
    }
    val dotted = rows.toDF("grp.name", "val.usd", "ts.us")
    val plain = rows.toDF("g", "v", "t")
    def s(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toSeq.mkString("|")).toSet
    assert(s(Validate.psiDrift(dotted, "grp.name", "val.usd", "ts.us", 5)) ==
      s(Validate.psiDrift(plain, "g", "v", "t", 5)))
    assert(s(Validate.ksDrift(dotted, "grp.name", "val.usd", "ts.us", 8)) ==
      s(Validate.ksDrift(plain, "g", "v", "t", 8)))
    assert(s(Validate.driftByDay(dotted, "grp.name", "val.usd", "ts.us", 5)) ==
      s(Validate.driftByDay(plain, "g", "v", "t", 5)))
    val (mn, mx, ref) = Validate.driftReference(dotted, "grp.name", "val.usd", 5)
    val (mn2, mx2, ref2) = Validate.driftReference(plain, "g", "v", 5)
    assert(mn == mn2 && mx == mx2 && s(ref) == s(ref2))
    assert(s(Validate.kAnonymity(dotted.select(col("`grp.name`")), Seq("grp.name"), 200L)
        .withColumnRenamed("grp.name", "g")) ==
      s(Validate.kAnonymity(plain.select(col("g")), Seq("g"), 200L)))
    assert(s(Validate.heavyHitters(dotted, "grp.name", 0.3)) ==
      s(Validate.heavyHitters(plain, "g", 0.3)))
  }

  test("dataProfile: approx path keeps the same shape with sketched distincts") {
    val df = (1 to 1000).map(i => (i.toLong, s"v${i % 37}")).toDF("id", "s")
    val p = Validate.dataProfile(df, Seq("id", "s"), approx = true)
      .collect().map(r => r.getString(0) -> r).toMap
    // HLL++ at default rsd must land within 5% of truth
    assert(math.abs(p("id").getLong(3) - 1000L) <= 50L)
    assert(math.abs(p("s").getLong(3) - 37L) <= 3L)
    assert(p("id").getDouble(4) == 1.0 && p("id").getDouble(5) == 1000.0)
  }

  test("dataProfile: rejects unknown columns and empty column list") {
    val df = Seq((1, "a")).toDF("id", "s")
    intercept[IllegalArgumentException](Validate.dataProfile(df, Seq("nope")))
    intercept[IllegalArgumentException](Validate.dataProfile(df, Nil))
  }

  test("kAnonymity: surfaces exactly the under-k groups") {
    val df = (Seq.fill(5)(("US", "A")) ++ Seq.fill(2)(("US", "B")) ++
      Seq.fill(1)(("DE", "A"))).toDF("country", "seg")
    val viol = Validate.kAnonymity(df, Seq("country", "seg"), 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(viol == Set(("US", "B", 2L), ("DE", "A", 1L)))
    assert(Validate.kAnonymity(df, Seq("country", "seg"), 2L).count() == 1L)
    intercept[IllegalArgumentException](Validate.kAnonymity(df, Seq("country"), 1L))
    intercept[IllegalArgumentException](Validate.kAnonymity(df, Nil, 3L))
  }

  private def exactHitters(vals: Seq[String], phi: Double): Set[(String, Long)] = {
    val n = vals.size
    val thr = math.ceil(phi * n).toLong
    vals.groupBy(identity).map { case (v, g) => (v, g.size.toLong) }
      .filter(_._2 >= thr).toSet
  }

  test("heavyHitters equals exact groupBy-having on a Zipf-ish stream") {
    val vals = (1 to 2000).flatMap(i => Seq.fill(2000 / i / 10 + 1)(s"w$i"))
    val df = spark.sparkContext.parallelize(vals, 7).toDF("v")
    val got = Validate.heavyHitters(df, "v", 0.02)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == exactHitters(vals, 0.02))
    assert(got.nonEmpty)
  }

  test("heavyHitters: adversarial all-distinct tail cannot evict the true hitter") {
    // one value at exactly the threshold + a sea of singletons that
    // forces constant Misra-Gries decrements
    val n = 10000
    val phi = 0.01
    val hot = Seq.fill(math.ceil(phi * n).toInt)("hot")
    val tail = (1 to (n - hot.size)).map(i => s"t$i")
    // interleave so the hot value never gets a quiet partition
    val vals = (hot ++ tail).zipWithIndex.sortBy(_._2 % 97).map(_._1)
    val df = spark.sparkContext.parallelize(vals, 13).toDF("v")
    val got = Validate.heavyHitters(df, "v", phi)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == exactHitters(vals, phi))
    assert(got.contains(("hot", hot.size.toLong)))
  }

  test("heavyHitters: seeded random streams match exact on every phi") {
    val rnd = new scala.util.Random(41)
    val vals = Seq.fill(5000)(s"k${math.abs(rnd.nextGaussian() * 30).toInt}")
    val df = spark.sparkContext.parallelize(vals, 5).toDF("v")
    for (phi <- Seq(0.005, 0.02, 0.1)) {
      val got = Validate.heavyHitters(df, "v", phi)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == exactHitters(vals, phi), s"phi=$phi")
    }
  }

  test("heavyHitters: empty input and phi validation") {
    val df = Seq.empty[String].toDF("v")
    assert(Validate.heavyHitters(df, "v", 0.1).count() == 0L)
    intercept[IllegalArgumentException](
      Validate.heavyHitters(df, "v", 0.0))
    intercept[IllegalArgumentException](
      Validate.heavyHitters(df, "v", 0.6))
  }

  test("psiDrift: dense bins, zero-sum diff invariant, psi == 0 iff no drift") {
    // identical value distribution on both halves of the time range
    val stable = (0 until 40).map { i =>
      val us = if (i < 20) i.toLong else 1000L + i  // mid splits 20/20
      ("g", (i % 4).toDouble, us)
    }.toDF("grp", "value", "us")
    val s = Validate.psiDrift(stable, "grp", "value", "us", 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(s.length == 10, "bins must be dense: one row per bin")
    assert(s.map(_._4).sum == 0L, "sum of diff_num over bins is identically 0")
    // a == b in every bin and N == M -> every psi piece vanishes
    assert(s.forall { case (_, a, b, diff, _, lnT) =>
      a == b && diff == 0L && lnT == 0.0 })

    // drifted: second half concentrates in the top bin -> psi > 0
    val drifted = (0 until 40).map { i =>
      val us = if (i < 20) i.toLong else 1000L + i
      val v = if (i < 20) (i % 4).toDouble else 3.0
      ("g", v, us)
    }.toDF("grp", "value", "us")
    val d = Validate.psiDrift(drifted, "grp", "value", "us", 10)
      .collect().map(r => (r.getLong(4), r.getLong(5), r.getDouble(6)))
    val psi = d.map { case (diff, den, lnT) => diff.toDouble * lnT / den }.sum
    assert(psi > 0.1, s"concentration drift must give a large PSI, got $psi")
    assert(Validate.psiDrift(drifted, "grp", "value", "us", 10)
      .collect().map(_.getLong(4)).sum == 0L)
  }

  test("ksDrift: closed-form D for disjoint and identical half-splits") {
    // group a: halves fully disjoint in value -> d_num = N*M (max gap)
    // group b: halves identically distributed -> d_num = 0
    val rows = Seq(
      ("a", 0.0, 0L), ("a", 0.0, 1L), ("a", 10.0, 1000L), ("a", 10.0, 1001L),
      ("b", 0.0, 2L), ("b", 10.0, 3L), ("b", 0.0, 1002L), ("b", 10.0, 1003L))
      .toDF("grp", "value", "us")
    val out = Validate.ksDrift(rows, "grp", "value", "us", 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("a") == (2L, 2L, 4L), "disjoint halves reach the full N*M gap")
    assert(out("b") == (2L, 2L, 0L), "identical halves have zero KS gap")
  }

  test("ksDrift: equals a brute-force cumulative-gap computation") {
    val rnd = new scala.util.Random(7)
    val nBins = 8
    val data = (0 until 240).map { i =>
      val g = s"g${i % 3}"
      // g2 drifts: its second-half values shift up by 40
      val base = rnd.nextInt(100).toDouble
      val v = if (g == "g2" && i >= 120) base + 40.0 else base
      (g, v, i.toLong * 10L)
    }
    val df = data.toDF("grp", "value", "us")
    val out = Validate.ksDrift(df, "grp", "value", "us", nBins)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // brute force with the same binning contract
    val usMid = (data.map(_._3).min + data.map(_._3).max) >> 1
    val vmn = data.map(_._2).min
    val vmx = data.map(_._2).max
    def bin(v: Double): Long =
      if (vmx == vmn) 0L
      else math.min(nBins - 1L, math.floor((v - vmn) * nBins / (vmx - vmn)).toLong)
    data.groupBy(_._1).foreach { case (g, rows) =>
      val first = rows.filter(_._3 <= usMid)
      val second = rows.filter(_._3 > usMid)
      val n = first.size.toLong
      val m = second.size.toLong
      var cumA = 0L; var cumB = 0L; var best = 0L
      (0L until nBins).foreach { b =>
        cumA += first.count(r => bin(r._2) == b)
        cumB += second.count(r => bin(r._2) == b)
        best = math.max(best, math.abs(cumA * m - cumB * n))
      }
      assert(out(g) == (n, m, best), s"group $g diverged from brute force")
      assert(best <= n * m, "gap can never exceed N*M")
    }
    // the injected shift must register as the largest normalized D
    val d = out.map { case (g, (n, m, num)) => g -> num.toDouble / (n * m) }
    assert(d("g2") > d("g0") && d("g2") > d("g1"),
      s"drifted group must dominate: $d")
  }

  test("drift family null contract: null values are not samples") {
    // identical halves plus nulls sprinkled asymmetrically — without
    // the filter, the null counts inflate the totals but not the
    // bins, manufacturing a spurious nonzero KS gap
    val rows = Seq[(String, java.lang.Double, Long)](
      ("a", 0.0, 0L), ("a", 10.0, 1L), ("a", null, 2L),
      ("a", 0.0, 1000L), ("a", 10.0, 1001L), ("a", null, 1002L), ("a", null, 1003L))
      .toDF("grp", "value", "us")
    val ks = Validate.ksDrift(rows, "grp", "value", "us", 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(ks == (2L, 2L, 0L),
      "identical non-null halves must have zero gap and null-free totals")
    val psi = Validate.psiDrift(rows, "grp", "value", "us", 2).collect()
    assert(psi.forall(r => r.getLong(4) == 0L),
      "identical non-null halves must have zero psi diff pieces")
    // reference: n_ref equals the sum of dense ref_cnt (CDF reaches 1)
    val (vmn, vmx, ref) = Validate.driftReference(rows, "grp", "value", 2)
    assert(vmn == 0.0 && vmx == 10.0)
    val rs = ref.collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(rs.map(_._1).sum == rs.head._2, "sum(ref_cnt) == n_ref")
  }

  test("dataProfile on an EMPTY table: one row per column, n_nulls 0 not null") {
    val empty = Seq.empty[(Long, String)].toDF("k", "s")
    val rows = Validate.dataProfile(empty, Seq("k", "s")).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == 0L)
      assert(!r.isNullAt(r.fieldIndex("n_nulls")) && r.getAs[Long]("n_nulls") == 0L,
        "an empty (clean) table must profile n_nulls = 0, not null")
    }
  }

  test("heavyHitters: nulls are not samples — excluded from totals AND candidates") {
    // 6 nulls + 4 "x" in 10 rows, phi = 0.5: over NON-NULL values
    // "x" is 4/4 = every sample; pre-fix n_total was 10 and the
    // threshold ceil(5) rejected it — a value covering 100% of the
    // real population reported as not heavy
    val df = ((1 to 6).map(_ => Option.empty[String]) ++
      (1 to 4).map(_ => Some("x"))).toDF("v")
    val got = Validate.heavyHitters(df, "v", 0.5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("x" -> 4L), s"got $got")
  }

  test("driftByDay: null timestamps produce no spurious bucket=null row") {
    val rows = Seq[(String, java.lang.Double, java.lang.Long)](
      ("a", 1.0, 0L), ("a", 9.0, 86400000000L), ("a", 5.0, null))
      .toDF("g", "value", "us")
    val got = Validate.driftByDay(rows, "g", "value", "us", 2).collect()
    assert(got.forall(!_.isNullAt(0)),
      s"bucket=null row leaked: ${got.toSeq}")
    assert(got.length == 2, s"one row per real day expected, got ${got.toSeq}")
  }

  test("drift family rejects reserved group column names up front") {
    val rows = Seq(("a", 1.0, 0L)).toDF("bin", "value", "us")
    val e = intercept[IllegalArgumentException](
      Validate.ksDrift(rows, "bin", "value", "us", 2).collect())
    assert(e.getMessage.contains("reserved"), e.getMessage)
    intercept[IllegalArgumentException](
      Validate.kAnonymity(Seq((1, 2)).toDF("a", "group_size"), Seq("group_size"), 2L))
  }

  test("drift family non-finite contract: NaN/Inf are not samples and cannot abort") {
    // one NaN would poison min/max cut params; a non-finite bin
    // expression would abort on the ANSI double→Long cast (killing a
    // streaming monitor permanently) — both must be filtered like
    // nulls, mirroring the oracles' isfinite(value)
    val rows = Seq[(String, java.lang.Double, Long)](
      ("a", 0.0, 0L), ("a", 10.0, 1L), ("a", Double.NaN, 2L),
      ("a", Double.PositiveInfinity, 3L),
      ("a", 0.0, 1000L), ("a", 10.0, 1001L),
      ("a", Double.NegativeInfinity, 1002L))
      .toDF("grp", "value", "us")
    val clean = rows.filter(!isnan(col("value")) &&
      abs(col("value")) =!= lit(Double.PositiveInfinity))
    def ks(df: org.apache.spark.sql.DataFrame) =
      Validate.ksDrift(df, "grp", "value", "us", 2)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(ks(rows) == ks(clean), "non-finite rows must be excluded, not counted")
    def psi(df: org.apache.spark.sql.DataFrame) =
      Validate.psiDrift(df, "grp", "value", "us", 2)
        .collect().map(r => (r.getLong(1), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    assert(psi(rows) == psi(clean))
    val (vmn, vmx, _) = Validate.driftReference(rows, "grp", "value", 2)
    assert(vmn == 0.0 && vmx == 10.0, s"cut params must stay finite, got [$vmn, $vmx]")
    assert(Validate.driftByDay(rows, "grp", "value", "us", 2).count() ==
      Validate.driftByDay(clean, "grp", "value", "us", 2).count())
    // binColumn: serving-time ±Inf clamps to the boundary bins
    // (double-space clamp) instead of aborting the query
    val served = Seq(Double.NegativeInfinity, -5.0, 5.0, Double.PositiveInfinity)
      .toDF("v").select(Validate.binColumn(col("v"), 0.0, 10.0, 4).as("bin"))
      .collect().map(_.getLong(0)).toSeq
    assert(served == Seq(0L, 0L, 2L, 3L), s"got $served")
    // and non-finite CUT PARAMS are refused at plan time, loudly
    val ex = intercept[IllegalArgumentException](
      Validate.binColumn(col("v"), Double.NaN, 1.0, 4))
    assert(ex.getMessage.contains("finiteSample"))
  }

  test("driftByDay (lazy one-plan) == eager reference + finisher composition") {
    val rnd = new scala.util.Random(11)
    val dayUs = 86400000000L
    val data = (0 until 300).map { i =>
      (s"t${i % 3}", rnd.nextInt(50).toDouble + (i % 4) * 10.0,
        (i % 5) * dayUs + i.toLong * 1000000L)
    }
    val df = data.toDF("event_type", "value", "us")
    val nBins = 8
    val lazyOut = Validate.driftByDay(df, "event_type", "value", "us", nBins)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (vmn, vmx, ref) = Validate.driftReference(df, "event_type", "value", nBins)
    val counts = df.groupBy(
        date_format(timestamp_micros(col("us")), "yyyy-MM-dd").as("bucket"),
        col("event_type").as("grp"),
        Validate.binColumn(col("value"), vmn, vmx, nBins).as("bin"))
      .agg(count(lit(1)).as("cnt"))
    val eagerOut = Validate.ksAgainstReference(counts, ref, nBins)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(lazyOut == eagerOut, "one-plan and train-once forms must agree")
    assert(lazyOut.nonEmpty && lazyOut.keys.map(_._1).toSet.size == 5)
  }
}
