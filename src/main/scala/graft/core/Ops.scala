package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator library — SURVEY.md §2 generalized to
  * `DataFrame => DataFrame` combinators.
  *
  * Every combinator is a lazy, declarative plan fragment: Catalyst
  * handles pushdown/pruning/join-strategy, AQE handles skew, and
  * nothing collects to the driver. Reference citations point into
  * `/root/reference` (the echem ETL whose data operations these
  * generalize).
  *
  * Oracle-parity conventions (driver hashes values after sorting
  * columns by name):
  *  - integer outputs are cast to LongType (DuckDB BIGINT),
  *  - unordered double sums go through exact DECIMAL(18,s)
  *    accumulation then back to double, so summation order cannot
  *    perturb low bits,
  *  - row-wise double arithmetic is written in the same operation
  *    order as the oracle SQL (IEEE ops are deterministic given
  *    identical order).
  */
object Ops {

  /** Exact-sum helper: round to `scale`, accumulate in decimal
    * (order-independent), return double. Keeps group sums
    * bit-identical across engines and across partitionings — also
    * the right call at 100 TB, where a double sum over shuffled
    * partitions is not even deterministic run-to-run.
    */
  def moneySum(c: Column, scale: Int): Column =
    sum(round(c, scale).cast(DecimalType(18, scale))).cast(DoubleType)

  /** Predicate filter + projection pushed to the parquet scan.
    * Generalizes the reference's server-side chemistry filter
    * (`dags/my_dag.py:28-29`). */
  def scanFilter(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1995-01-01").cast(TimestampType) &&
              col("l_shipdate") <  lit("1996-01-01").cast(TimestampType) &&
              col("l_discount") > 0.03)
      .select(col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber"),
              col("l_quantity"), col("l_extendedprice"))

  /** Column pruning (`dags/my_dag.py:33-37` keeps material_id+structure). */
  def project(orders: DataFrame): DataFrame =
    orders.select("o_orderkey", "o_custkey", "o_totalprice")

  /** Substring-match filter (`dags/my_dag.py:156`). */
  def containsFilter(documents: DataFrame, needle: String): DataFrame =
    documents.filter(col("text").contains(needle)).select("doc_id", "lang", "n_chars")

  /** Tokenize + positional extract + cast (`dags/my_dag.py:157-162`):
    * pull the numeric payload out of a semi-structured string. */
  def regexExtract(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast(LongType).as("k_val"),
      col("event_type"))

  /** Semi-structured JSON payload extraction — the schema-on-read
    * path for the `props` column (typed access without a parse
    * stage; at scale prefer `from_json` with an explicit schema when
    * extracting many fields). */
  def jsonExtract(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast(LongType).as("k_val"))

  /** Unit-conversion arithmetic (`dags/my_dag.py:164-170`,
    * constants `dags/utils.py:1`): plain codegen'd column math.
    * Deliberately unrounded — IEEE ops in a fixed order are
    * bit-identical across engines, whereas round() algorithms
    * (BigDecimal HALF_UP vs float multiply-round) are not. */
  def scalarMath(lineitem: DataFrame): DataFrame =
    lineitem.select(
      col("l_orderkey"),
      col("l_linenumber").cast(LongType).as("l_linenumber"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("charge"),
      (col("l_quantity") * lit(-27.2114) - lit(4.66)).as("pzc_like"))

  /** Key derivation string ops (`dags/my_dag.py:95,122,131`). */
  def stringKeys(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey"),
      concat_ws("-", col("p_brand"), col("p_size").cast(StringType)).as("part_key"),
      regexp_extract(col("p_name"), "^(\\w+)", 1).as("name_stem"),
      upper(col("p_type")).as("type_uc"))

  /** Deterministic pseudo-random order key: mirrors the reference's
    * seeded `random.sample` (`dags/my_dag.py:55-57`) with an
    * arithmetic scrambler both engines compute identically
    * (Python's RNG is not SQL-reproducible — SURVEY.md §7 risk).
    *
    * Domain contract: |key| must stay below 2^63 / 9973 ≈ 9.2e14 —
    * above that `key * 9973` wraps, which Spark does silently while
    * an ANSI engine (DuckDB) raises, so the "any engine reproduces
    * it" guarantee dies. Synthetic 64-bit HASH ids exceed this:
    * derive the key from the id's low bits first. Sign: the result
    * keeps the key's sign (Spark `%`); consumers needing [0, m)
    * buckets must `pmod` (see `TextOps.splitAssign`). */
  def scrambleKey(key: Column): Column = (key * 9973 + 12345) % 1000003

  /** Seeded sample-n (`dags/my_dag.py:55-57,109-111`).
    *
    * Null keys drop (the family convention, r13): scrambleKey(null)
    * is null and Spark's ascending sort is NULLS FIRST, so an
    * unfiltered null-key row would deterministically occupy a sample
    * slot on every run — and hash-diverge from engines that sort
    * nulls last. Same guard on the stratified/weighted samplers. */
  def sampleN(orders: DataFrame, n: Int): DataFrame =
    orders.filter(col("o_orderkey").isNotNull)
      .orderBy(scrambleKey(col("o_orderkey")), col("o_orderkey"))
      .limit(n)
      .select("o_orderkey", "o_custkey")

  /** Deterministic stratified sample: the first `n` rows of each
    * group in [[scrambleKey]] order — per-language / per-source quota
    * sampling for training-data curation, reproducible on any engine.
    *
    * Scale shape: one shuffle on the stratum key, then
    * `WindowGroupLimit` keeps a per-partition top-n heap per group —
    * no group is ever fully buffered, so a colossal stratum costs
    * O(n) memory, not O(|stratum|). */
  def sampleStratified(df: DataFrame, stratum: String, key: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(stratum)).orderBy(scrambleKey(col(key)), col(key))
    // null keys drop — see sampleN (NULLS FIRST would hand them rank 1)
    df.filter(col(key).isNotNull)
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= n)
      .select(col(stratum), col(key), col("rk"))
  }

  /** Deterministic weighted sample-n (Efraimidis–Spirakis A-ES): keep
    * the `n` rows with the smallest priority key −ln(u)/w, where
    * u ∈ (0,1] derives from [[scrambleKey]] and w is the row's
    * weight — sampling ∝ weight with a formula any engine reproduces
    * (the curation use: sample documents ∝ length/quality instead of
    * uniformly). Rows with non-positive weight are excluded
    * (undefined priority).
    *
    * The priority rounds to 6 decimals before ranking: ln is
    * cross-libm (1-ulp differences between engines), and an UNROUNDED
    * order-by would let a 1-ulp flip reorder two adjacent priorities;
    * at 6 decimals the flip window is ~1e-9 of the key space, and
    * ties on the rounded key break by id identically everywhere —
    * the BM25 rounding contract applied to ordering.
    *
    * Scale shape: priorities are a per-row map;
    * `orderBy(...).limit(n)` plans as TakeOrderedAndProject —
    * per-partition top-n heaps + one n-row merge, no global sort. */
  def sampleWeighted(df: DataFrame, keyCol: String, weightCol: String, n: Int): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    // pmod, not %: scrambleKey keeps the key's sign, and a NEGATIVE
    // key would give u <= 0 -> log(u) null -> null es_key sorting
    // FIRST, deterministically winning the sample regardless of
    // weight. pmod pins u into (0, 1) for every key sign.
    val u = (pmod(scrambleKey(col(keyCol)), lit(1000003L)) + 1).cast(DoubleType) / 1000004.0d
    // null keys drop — see sampleN: a null key's null es_key sorts
    // FIRST and would win a slot regardless of weight
    df.filter(col(keyCol).isNotNull && col(weightCol) > 0)
      .withColumn("es_key", round(-log(u) / col(weightCol).cast(DoubleType), 6))
      .orderBy(col("es_key"), col(keyCol))
      .limit(n)
      .select(col(keyCol), col(weightCol), col("es_key"))
  }

  /** Semi-join: refetch only sampled keys (`dags/my_dag.py:69-70`).
    * Build side is tiny → broadcast, no shuffle of the fact table. */
  def semiJoin(lineitem: DataFrame, orders: DataFrame, n: Int): DataFrame = {
    val sampled = sampleN(orders, n).select("o_orderkey")
    lineitem.join(broadcast(sampled), col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber"), col("l_quantity"))
  }

  /** Anti-join: `ON CONFLICT DO NOTHING` as a plan
    * (`dags/my_dag.py:201-202`). */
  def antiJoin(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** Equi-join star pattern + grouped rollup (metrics↔geometry join,
    * `dags/my_dag.py:153,166-168`). Dimensions broadcast; only the
    * fact side shuffles for the final aggregate. */
  def equiJoinAgg(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame =
    orders
      .join(broadcast(customer.select("c_custkey", "c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(moneySum(col("o_totalprice"), 2).as("revenue"),
           count(lit(1)).as("n_orders"))

  /** Fan-out against a literal dimension with ordinal — the bulk ×
    * facet expansion (`dags/my_dag.py:78-81`) and per-slab index
    * (`dags/my_dag.py:93-95`). `posexplode` keeps the ordinal
    * without any shuffle. */
  def fanoutExplode(part: DataFrame, facets: Seq[String]): DataFrame =
    part.select(col("p_partkey"), posexplode(typedLit(facets)))
      .select(
        col("p_partkey"),
        col("pos").cast(LongType).as("facet_idx"),
        col("col").as("facet"),
        concat(col("p_partkey").cast(StringType), lit("-"), col("col")).as("slab_key"))

  /** Count + distinct count (`dags/my_dag.py:30`). */
  def countByGroup(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
           countDistinct(col("l_orderkey")).as("n_orders"))

  /** Last-match-per-group — the reference parse loop keeps the final
    * `FillingsUpdate` line per file (`dags/my_dag.py:154-158`).
    * One shuffle on the group key; at scale this is the canonical
    * window-dedup and AQE handles group skew. */
  def lastPerGroup(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
              expr("ts div 1000").as("ts_us"))
  }

  /** As-of join: for each left-type event, the most recent right-type
    * event of the same user with `ts_right <= ts_left` (DuckDB/kdb
    * ASOF semantics, equal timestamps match).
    *
    * Spark has no native as-of join; the naive formulations are a
    * range θ-join (quadratic blow-up per user) or a per-row subquery.
    * The scale-correct shape is the tagged union-merge: union both
    * sides, ONE shuffle on the join key, one ordered pass per
    * partition with a running `last(right_ts) ignoreNulls` window —
    * right side sorted before left at equal ts so ties match. Cost is
    * sort-merge of |L|+|R|, the same as a single window-dedup, and
    * AQE's skew split covers hot users. */
  def asofJoin(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    require(leftType != rightType,
      "self-as-of needs distinct side tags; equal types would tag every row as the left side")
    val ev = events
      .filter(col("event_type").isin(leftType, rightType))
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("us"),
        when(col("event_type") === rightType, 0).otherwise(1).as("side"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("asof_us", last(when(col("side") === 0, col("us")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("us").as("p_us"), col("asof_us"))
  }

  /** Range join (interval containment), grain-bucketed: count
    * right-type events inside [ts − w, ts + w] of each left-type
    * event, across all users.
    *
    * A raw `BETWEEN` θ-join has no equi-key — Spark plans it as a
    * nested-loop, O(|L|·|R|). Bucketing both sides to a time grain of
    * the window width recovers an equi-join: each interval covers ≤ 3
    * grains (explode ×3 — a constant), each point exactly one, and a
    * (grain) shuffle co-locates every candidate pair; the exact
    * containment predicate then filters within buckets. Cost is the
    * true pair count + a 3× constant, at any scale. Unmatched
    * intervals keep count 0 via the left join. */
  def rangeJoinCount(events: DataFrame, leftType: String, rightType: String,
                     windowUs: Long): DataFrame = {
    require(windowUs > 0, s"window half-width must be positive, got $windowUs")
    val grain = windowUs // grain = window half-width → ≤ 3 grains/interval
    val iv = events.filter(col("event_type") === leftType)
      .select(col("event_id"), expr("ts div 1000").as("us"))
      .withColumn("lo", col("us") - windowUs)
      .withColumn("hi", col("us") + windowUs)
      .withColumn("grain", explode(sequence(expr(s"lo div $grain"), expr(s"hi div $grain"))))
    val pts = events.filter(col("event_type") === rightType)
      .select(expr("ts div 1000").as("pt_us"))
      .withColumn("grain", expr(s"pt_us div $grain"))
    iv.join(pts, Seq("grain"), "left")
      .groupBy(col("event_id"))
      .agg(sum(when(col("pt_us").between(col("lo"), col("hi")), 1L).otherwise(0L)).as("n_in_window"))
  }

  /** Gaps-and-islands sessionization: split each user's event stream
    * into sessions wherever the gap to the previous event exceeds
    * `gapUs`. The batch twin of Structured Streaming's
    * `session_window` (`graft.streaming.StreamingOps.sessionizeStream`
    * shares the session definition).
    *
    * Scale shape: ONE shuffle on the user key; the session-boundary
    * flag (`lag`) and the running session counter (prefix `sum`) are
    * two window functions over the SAME (partition, order), so they
    * share one sort. The per-session rollup regroups on
    * (user, session) — bounded by the session count, after map-side
    * combine. No join, no self-comparison of the stream. */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    require(gapUs > 0, s"session gap must be positive, got $gapUs")
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val prev = lag(col("us"), 1).over(w)
    events
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"))
      .withColumn("new_sess",
        when(prev.isNull || col("us") - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
           min(col("us")).as("start_us"),
           max(col("us")).as("end_us"))
      .withColumn("dur_us", col("end_us") - col("start_us"))
  }

  /** Robust outlier flags per group: |x − median| > k·MAD — the
    * median-absolute-deviation rule, immune to the outliers it hunts
    * (a z-score threshold moves when the tail does; MAD doesn't).
    * Output one flag per event.
    *
    * Cross-engine determinism: the median and MAD round to 6 before
    * use — interpolated percentiles are the one place two engines'
    * arithmetic can drift a ulp, and an unrounded threshold would
    * let that ulp flip a flag at the boundary. Every comparison then
    * runs on bit-identical doubles (the A-ES ordering contract,
    * applied to thresholds).
    *
    * Scale shape: two grouped exact percentiles (sort-based within
    * group — groups here are the event-type enum, each a bounded
    * sort) + one broadcast stats join; the event stream itself never
    * shuffles for the flagging pass. */
  def madOutliers(events: DataFrame, k: Double = 3.0): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val med = events.groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 6).as("med"))
    val mad = events.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("value") - col("med")).as("dev"))
      .groupBy("event_type")
      .agg(round(expr("percentile(dev, 0.5)"), 6).as("mad"))
    events.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
      .select(col("event_id"), col("event_type"),
        (abs(col("value") - col("med")) > col("mad") * k).as("is_outlier"))
  }

  /** Time-weighted average per key: Σ vᵢ·(tᵢ₊₁−tᵢ) / Σ (tᵢ₊₁−tᵢ) —
    * each observation weighted by how long it was current (the
    * sensor/position/price averaging rule; a plain mean over-counts
    * bursts). The last observation of a key carries no interval.
    *
    * Float parity without ordering: values round to cents and ride
    * as exact LONGS (cents × long interval), so both quotient
    * operands reach the division as integers — and integer→double
    * conversion is correctly rounded on every engine, unlike the
    * decimal→double path, whose last-ulp drift this op measured
    * (31/150 rows) before switching. One shuffle on the key; lead +
    * the rollup share the sort.
    *
    * Range contract (the [[centsCorrelation]] convention): each
    * long product |cents·Δus| — and their per-key SUM — must stay
    * under 2⁶³ ≈ 9.2·10¹⁸. E.g. a $1M value (10⁸ cents) held for a
    * day (8.6·10¹⁰ µs) is 8.6·10¹⁸: at the edge. Feeds beyond it
    * should pre-scale the value or coarsen the time unit; Spark's
    * non-ANSI long arithmetic wraps SILENTLY past the bound. */
  def timeWeightedAvg(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"),
        // decimal only as exact staging: X.XX * 100 → exact long cents
        (round(col("value"), 2).cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
      .withColumn("next_us", lead(col("us"), 1).over(w))
      .filter(col("next_us").isNotNull)
      .groupBy("user_id")
      // a user whose retained intervals are ALL zero-length (every
      // event at one timestamp) has no held duration — twa is
      // DELIBERATELY null, guarded explicitly rather than reached
      // through 0.0/0.0 (Spark's non-ANSI divide nulls it silently;
      // DuckDB would say NaN — a cross-engine hash bomb)
      .agg(when(sum(col("next_us") - col("us")) === 0L, lit(null).cast(DoubleType))
            .otherwise(
              sum(col("cents") * (col("next_us") - col("us"))).cast(DoubleType)
                / sum(col("next_us") - col("us")).cast(DoubleType) / 100.0).as("twa"),
           count(lit(1)).as("n_intervals"))
  }

  /** Three-step funnel: for each user, the earliest completion of
    * `s1 → s2 → s3` where each later step strictly follows the
    * previous one and the whole chain fits in `withinUs` of the
    * first step — the conversion query of product analytics
    * (signup → click → purchase). Output one row per user who
    * reached step 1: (user_id, t1_us, t2_us, t3_us, steps), later
    * timestamps null where the funnel stalled.
    *
    * Scale shape: one filtered partial-aggregate per step plus one
    * equi-join per step boundary, all keyed on the user — no
    * self-join of the raw stream against itself (each join's right
    * side is the per-user aggregate, one row per key). The
    * sequential dependency (step k's window opens at step k−1's
    * time) is inherent to funnel semantics; k stays small and each
    * pass is a pushed-filter scan, the standard warehouse shape. */
  def funnel(events: DataFrame, s1: String, s2: String, s3: String,
             withinUs: Long): DataFrame = {
    require(withinUs > 0, s"funnel window must be positive, got $withinUs")
    val e = events.select(col("user_id"), col("event_type"), expr("ts div 1000").as("us"))
    val t1 = e.filter(col("event_type") === s1)
      .groupBy("user_id").agg(min(col("us")).as("t1_us"))
    val t2 = e.filter(col("event_type") === s2).join(t1, "user_id")
      .filter(col("us") > col("t1_us") && col("us") <= col("t1_us") + withinUs)
      .groupBy("user_id").agg(min(col("us")).as("t2_us"))
    val t3 = e.filter(col("event_type") === s3).join(t2, "user_id").join(t1, "user_id")
      .filter(col("us") > col("t2_us") && col("us") <= col("t1_us") + withinUs)
      .groupBy("user_id").agg(min(col("us")).as("t3_us"))
    t1.join(t2, Seq("user_id"), "left").join(t3, Seq("user_id"), "left")
      .select(col("user_id"), col("t1_us"), col("t2_us"), col("t3_us"),
        (lit(1L) + when(col("t2_us").isNotNull, 1L).otherwise(0L)
                 + when(col("t3_us").isNotNull, 1L).otherwise(0L)).as("steps"))
  }

  /** Cohort retention: users grouped by the week of their FIRST
    * event (the cohort), counted per week offset they were active —
    * the retention-curve query. Output (cohort_week, week_offset,
    * n_users), weeks as epoch-week indices.
    *
    * Scale shape: per-user first-event aggregate (one partial-agg
    * shuffle), join back on the user key, then a distinct count per
    * (cohort, offset) — the (user, cohort, offset) distinct set is
    * bounded by users × active weeks, and its aggregate
    * partial-combines before the final tiny rollup. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    // exact long division; note `div` truncates toward zero (matching
    // the oracle's `//` floor only for the non-negative epoch range —
    // pre-1970 timestamps would bucket differently)
    val e = events.select(col("user_id"), expr("ts div 1000").as("us"))
      .withColumn("week", expr(s"us div $weekUs"))

    val first = e.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    e.join(first, "user_id")
      .select(col("user_id"), col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Slowly-changing-dimension (type 2) history build: collapse each
    * key's ordered attribute stream to its CHANGE rows and stamp
    * them with `[valid_from_us, valid_to_us)` validity ranges
    * (`valid_to_us` null ⇔ current row) — the warehouse operator
    * that turns an event/snapshot feed into a queryable dimension
    * history.
    *
    * Consecutive equal attribute values collapse into the earlier
    * row's range; a value that recurs AFTER an intervening change
    * opens a new range (history, not distinct-values).
    *
    * Scale shape: ONE shuffle on the key. The change filter (`lag`)
    * and the range stamp (`lead`) are window functions over the same
    * (partition, order); the filter between them preserves both the
    * hash partitioning and the sort, so the second window adds no
    * exchange and no re-sort — the plan is scan → shuffle → sort →
    * two window passes. No self-join against the history table, the
    * classic SCD2 implementation mistake at scale. */
  def scd2(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val prev = lag(col("value"), 1).over(w)
    // null-safe change detection: `value =!= prev` is NULL (filtered
    // as false) when either side is null, which would silently DROP a
    // transition into null and fail to collapse consecutive nulls —
    // `prev.isNull` cannot distinguish "no previous row" from
    // "previous value was null". <=> compares null-safely; the
    // row_number marker handles a first row whose value is null.
    events
      .select(col("user_id"), col("event_id"), col("value"), expr("ts div 1000").as("us"))
      .withColumn("changed",
        row_number().over(w) === lit(1) || !(col("value") <=> prev))
      .filter(col("changed"))
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .select(col("user_id"), col("value"), col("us").as("valid_from_us"),
              col("valid_to_us"), col("valid_to_us").isNull.as("is_current"))
  }

  /** HyperLogLog++ distinct-count sketch per group — the
    * fixed-memory path when exact `countDistinct`'s shuffle of every
    * distinct value is unaffordable (vocabulary/user cardinality
    * sweeps at 100 TB). Sketches merge associatively, so the
    * aggregate stays partial-aggregable: each partition ships one
    * ~`1.04/rsd²`-register sketch, not its value set.
    *
    * `includeExact = true` (NOT the default) rides the exact
    * `countDistinct` along for the error-bound contract — tests
    * assert |approx − exact| within 3·rsd, and the declared
    * benchmark query keeps it so the error bound stays continuously
    * demonstrated. Production sweeps take the default: sketch-only,
    * fixed memory, no distinct-value shuffle.
    *
    * No DuckDB oracle by design: HLL register layouts are
    * engine-specific, so cross-engine value equality is not defined
    * for sketches (the driver records the weaker rows-only check). */
  def approxDistinct(df: DataFrame, groupCol: String, valueCol: String,
                     rsd: Double = 0.05, includeExact: Boolean = false): DataFrame = {
    val approx = approx_count_distinct(col(valueCol), rsd).as("approx_nd")
    if (includeExact)
      df.groupBy(col(groupCol)).agg(approx, countDistinct(col(valueCol)).as("exact_nd"))
    else
      df.groupBy(col(groupCol)).agg(approx)
  }

  /** Oracle-able form of [[approxDistinct]]: per-group exact distinct
    * count plus `within_bound` = |approx − exact| / exact ≤
    * `boundMultiple`·rsd. The sketch itself is engine-specific (HLL
    * register values cannot cross-engine hash-match), but its ERROR
    * BOUND is a deterministic fact the oracle CAN check: Spark's HLL
    * is a pure function of the value set (xxhash64, order-independent
    * register max-merge), so for a fixed dataset the boolean is fixed
    * — the oracle emits the exact count and literal TRUE. The 3·rsd
    * bound is the same contract the unit tests assert. */
  def approxDistinctChecked(df: DataFrame, groupCol: String, valueCol: String,
                            rsd: Double = 0.05, boundMultiple: Double = 3.0): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_nd"),
           countDistinct(col(valueCol)).as("exact_nd"))
      .select(col(groupCol), col("exact_nd"),
        // exact_nd = 0 (an all-null group — both counts skip nulls)
        // would make the ratio a 0/0 that Spark's divide NULLs
        // silently, emitting within_bound = NULL where the oracle's
        // contract is a literal boolean — the timeWeightedAvg
        // zero-denominator guard, applied here (r13 review)
        when(col("exact_nd") === 0L, col("approx_nd") === 0L)
          .otherwise(abs(col("approx_nd") - col("exact_nd")).cast(DoubleType)
            / col("exact_nd") <= lit(boundMultiple * rsd)).as("within_bound"))

  /** Sketch RE-AGGREGATION rollup — the property that makes sketches
    * the 100-TB answer to distinct counting: per-(group, day) HLL
    * sketches (DataSketches binary state, partial-aggregable) UNION
    * into per-(group, week) sketches without touching rows again. A
    * nightly job materializes daily sketches once; every coarser
    * rollup (week/month/ad-hoc cohort) merges kilobyte states — the
    * raw 10-billion-row stream is never re-scanned. `countDistinct`
    * cannot do this: exact partials are the value sets themselves.
    *
    * Declared output follows the [[approxDistinctChecked]] contract
    * (sketch bytes and estimates are engine-specific, the bound is a
    * fact of the fixed dataset): per (group, week) the EXACT distinct
    * plus `within_bound` = |merged-sketch estimate − exact| / exact
    * ≤ bound. The exact side is the verification harness, not the
    * production path. */
  def hllMergeRollup(df: DataFrame, groupCol: String, valueCol: String,
                     tsUsCol: String, bound: Double = 0.05): DataFrame = {
    val dayUs = 86400L * 1000000L
    // the family's FLOOR bucket form (see windowDedup)
    def floorBucket(w: Long) =
      expr(s"$tsUsCol div $w") - when(expr(s"$tsUsCol % $w") < 0, 1L).otherwise(0L)
    val withDay = df.select(col(groupCol), col(valueCol),
      floorBucket(dayUs).as("day"),
      floorBucket(7L * dayUs).as("week"))
    val daily = withDay.groupBy(col(groupCol), col("week"), col("day"))
      .agg(hll_sketch_agg(col(valueCol)).as("sk"))
    val weeklyApprox = daily.groupBy(col(groupCol), col("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_nd"))
    val weeklyExact = withDay.groupBy(col(groupCol), col("week"))
      .agg(countDistinct(col(valueCol)).as("exact_nd"))
    weeklyExact.join(weeklyApprox, Seq(groupCol, "week"))
      .select(col(groupCol), col("week"), col("exact_nd"),
        // same all-null-group 0/0 guard as approxDistinctChecked
        when(col("exact_nd") === 0L, col("approx_nd") === lit(0.0))
          .otherwise(abs(col("approx_nd") - col("exact_nd")).cast(DoubleType)
            / col("exact_nd") <= lit(bound)).as("within_bound"))
  }

  /** Oracle-able sketched percentile, the [[approxDistinctChecked]]
    * pattern applied to quantiles: per group, the EXACT discrete
    * p-quantile (the picked element at rank ⌈p·n⌉ — no
    * interpolation, so it hashes cross-engine) plus `within_bound` =
    * the deterministic fact that Spark's `percentile_approx`
    * (Greenwald–Khanna) lands within its rank-error guarantee. The
    * production sweep at 100 TB runs the sketch alone: fixed memory
    * per group, partial-aggregable, no per-group value sort; the
    * exact side here is the verification harness. The exact pick
    * uses two window passes over ONE (group, value) sort — rank and
    * count share the shuffle — not a per-group `collect_list` (which
    * would buffer a whole group in one row at scale).
    *
    * GK's guarantee is on RANK (± accuracyFraction·n), not value;
    * the bound check therefore compares ranks: the sketch's answer
    * must be an element whose rank is within the tolerance of
    * ⌈p·n⌉. */
  def approxPercentileChecked(df: DataFrame, groupCol: String, valueCol: String,
                              p: Double = 0.5, accuracyFraction: Double = 0.01): DataFrame = {
    require(p > 0.0 && p < 1.0, s"need p in (0,1), got $p")
    require(accuracyFraction > 0.0 && accuracyFraction < 0.5,
      s"need accuracyFraction in (0,0.5), got $accuracyFraction")
    // nulls are not samples (the drift family's discipline, and what
    // percentile_approx itself does): without this filter the exact
    // rank/count include null rows — ascending sort puts them FIRST,
    // so exact_q lands on the wrong element (or on NULL) and
    // within_bound indicts a sketch that is inside its guarantee
    val data = df.select(col(groupCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
    val order = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val whole = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = data
      .withColumn("rk", row_number().over(order))
      .withColumn("n", count(lit(1)).over(whole))
    val exact = ranked
      .filter(col("rk") === ceil(lit(p) * col("n")).cast(LongType))
      .select(col(groupCol), col(valueCol).as("exact_q"), col("n"))
    val approx = data.groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol), lit(p),
        lit(math.max(1, math.ceil(1.0 / accuracyFraction).toInt))).as("approx_q"))
    // rank of the sketch's answer = how many values are <= it; the GK
    // bound allows ±accuracy·n around the target rank
    val approxRank = data
      .join(approx, Seq(groupCol))
      .groupBy(col(groupCol), col("approx_q"))
      .agg(sum(when(col(valueCol) <= col("approx_q"), 1L).otherwise(0L)).as("approx_rank"))
    exact.join(approxRank, Seq(groupCol))
      .select(col(groupCol), col("exact_q"),
        (abs(col("approx_rank") - ceil(lit(p) * col("n")).cast(LongType))
          <= ceil(lit(accuracyFraction) * col("n")).cast(LongType) + lit(1L)).as("within_bound"))
  }

  /** Grouped Pearson correlation over MONEY columns with the exact-
    * integer contract: each value becomes its cents (`round(x·100)`,
    * a long — 2-dp doubles land within an ulp of the integer, never
    * at a .5 boundary), so all five moment sums are exact integer
    * aggregates: order-independent under any partitioning, immune to
    * the float-running-sum drift AND to the decimal→double cast
    * hazard. The final correlation computes in ONE fixed-order
    * double expression from those exact integers (integer→double is
    * correctly rounded everywhere), so even the float result hashes
    * cross-engine. Built-in `corr` is the contrast: a float
    * accumulator whose value depends on row order — fine for
    * analytics, unusable for a reproducibility contract.
    *
    * One partial-aggregated groupBy — moments collapse map-side,
    * the shuffle carries 6 longs per group. Caller owns ranges:
    * the long accumulators hold Σxy exactly while
    * n·max(|x_cents|)·max(|y_cents|) stays under 2⁶³ (true for the
    * declared quantity×discount query by ~8 orders of magnitude);
    * wider ranges move the moments to DECIMAL(38,0) and lose the
    * cast-free guarantee. Zero-variance groups emit null, not a
    * division blow-up. */
  def centsCorrelation(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val xc = round(col(xCol) * 100).cast(LongType)
    val yc = round(col(yCol) * 100).cast(LongType)
    val agg = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"), sum(xc).as("sx"), sum(yc).as("sy"),
      sum(xc * yc).as("sxy"), sum(xc * xc).as("sxx"), sum(yc * yc).as("syy"))
    val nD = col("n").cast(DoubleType)
    val sxD = col("sx").cast(DoubleType); val syD = col("sy").cast(DoubleType)
    val varX = nD * col("sxx").cast(DoubleType) - sxD * sxD
    val varY = nD * col("syy").cast(DoubleType) - syD * syD
    agg.select(col(groupCol), col("n"), col("sx"), col("sy"),
      when(varX > 0.0 && varY > 0.0,
        (nD * col("sxy").cast(DoubleType) - sxD * syD) / (sqrt(varX) * sqrt(varY)))
        .as("corr"))
  }

  val EventTypes: Seq[String] = Seq("click", "view", "purchase", "signup", "error")

  /** Ordered-series pivot per group (`dags/my_dag.py:151-160` collects
    * the 3 charge series per sample). Explicit pivot values avoid the
    * extra distinct-scan Spark needs to infer them. */
  def pivotByType(events: DataFrame): DataFrame = {
    val p = events.groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(moneySum(col("value"), 2))
    p.select(col("user_id") +: EventTypes.map(t => col(t).as(s"${t}_sum")): _*)
  }

  /** Within-group baseline subtraction — `rhoes = -(nes - nes[1])`
    * subtracts the charge=0 row from every row of its group
    * (`dags/my_dag.py:169`). Conditional window aggregate: one
    * shuffle, no self-join. */
  def baselineDiff(lineitem: DataFrame): DataFrame = {
    val base = max(when(col("l_linenumber") === 1, col("l_quantity")))
      .over(Window.partitionBy(col("l_orderkey")))
    lineitem.select(
      col("l_orderkey"),
      col("l_linenumber").cast(LongType).as("l_linenumber"),
      (col("l_quantity") - base).as("qty_diff"))
  }

  /** Degree-1 least-squares fit per group — `np.polyfit(pots, rhoes, 1)`
    * (`dags/my_dag.py:171`) via the built-in `regr_*` aggregates
    * (partial-aggregable → map-side combine, no custom Aggregator). */
  def regrFit(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag")
      .agg(round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
           round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
           regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))

  /** Hierarchical rollup with grouping indicators — subtotal and
    * grand-total rows in one pass (partial-aggregable; the rollup
    * expansion happens map-side). */
  def rollupSummary(lineitem: DataFrame): DataFrame =
    lineitem.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           moneySum(col("l_extendedprice"), 2).as("revenue"),
           grouping(col("l_returnflag")).cast(LongType).as("g_flag"),
           grouping(col("l_linestatus")).cast(LongType).as("g_status"))

  /** Full cube with grouping indicators — every subtotal combination
    * in one pass (2ᵏ grouping sets expanded map-side, still
    * partial-aggregable; same shape as [[rollupSummary]] with the
    * lattice completed). */
  def cubeSummary(lineitem: DataFrame): DataFrame =
    lineitem.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           moneySum(col("l_extendedprice"), 2).as("revenue"),
           grouping(col("l_returnflag")).cast(LongType).as("g_flag"),
           grouping(col("l_linestatus")).cast(LongType).as("g_status"))

  /** Explicit grouping sets — the lattice cuts rollup/cube can't
    * express (per-flag and per-status subtotals plus grand total,
    * WITHOUT the combined (flag, status) cells). Same map-side
    * expansion, partial-aggregable. */
  def groupingSetsSummary(lineitem: DataFrame): DataFrame =
    lineitem.groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           moneySum(col("l_extendedprice"), 2).as("revenue"),
           grouping(col("l_returnflag")).cast(LongType).as("g_flag"),
           grouping(col("l_linestatus")).cast(LongType).as("g_status"))

  /** Fixed-width histogram: arithmetic bucketing + count — the
    * shuffle carries |buckets| rows after map-side combine. */
  def histogram(lineitem: DataFrame, width: Double): DataFrame = {
    // fail fast like every sibling: width = 0 would silently put all
    // rows in one `null` bucket (x/0.0 is NULL under non-ANSI mode),
    // a negative width silently negates every bucket index
    require(width > 0.0, s"bucket width must be positive, got $width")
    lineitem.groupBy(floor(col("l_quantity") / width).cast(LongType).as("bucket"))
      .agg(count(lit(1)).as("n"), moneySum(col("l_extendedprice"), 2).as("revenue"))
  }

  /** Exact interpolated percentiles per group (`percentile`, not
    * `approx_percentile` — t-digest/GK sketches are not
    * cross-engine reproducible; the exact form is, and stays
    * partial-aggregable). */
  def percentiles(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("qty_p50"),
           round(expr("percentile(l_extendedprice, 0.5)"), 4).as("price_p50"),
           round(expr("percentile(l_extendedprice, 0.9)"), 4).as("price_p90"))

  /** Full outer join with both-side orphans: the reconciliation
    * shape (entities vs activity rollup, neither side authoritative).
    * The aggregate side is pre-collapsed so the join carries one row
    * per key — never join-then-aggregate when the rollup can go
    * map-side first. */
  def outerJoinBalance(customer: DataFrame, orders: DataFrame): DataFrame = {
    val c = customer.filter(col("c_custkey") % 2 === 0).select("c_custkey", "c_acctbal")
    val o = orders.filter(col("o_orderkey") % 3 === 0)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice"), 2).as("spend"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("entity_key"),
        col("c_acctbal"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        col("spend"))
  }

  /** Per-key running totals: cumulative decimal-exact sum in event
    * order — the balance/backlog analytic. One shuffle on the key,
    * one sort per partition; the decimal accumulator keeps every
    * prefix exact, so the running values are identical on any engine
    * and any partitioning (a float running sum would drift
    * row-by-row). */
  def runningTotals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"), col("value"))
      .withColumn("run_value",
        sum(round(col("value"), 2).cast(DecimalType(18, 2))).over(w).cast(DoubleType))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))).cast(LongType))
  }

  /** Exact rolling median of `value` over the last `nWindow` events
    * per user — the robust smoother (a rolling MEAN chases every
    * spike; the median ignores them). Spark has no median window
    * function; this composes `collect_list` over a row frame +
    * `sort_array` + middle element. `nWindow` must be ODD and only
    * full windows emit: every median is then a PICKED element, never
    * an interpolation — zero float arithmetic, so the output hashes
    * identically on any engine (an even window would average two
    * middles, and interpolation formulas differ across engines ulp-
    * wise).
    *
    * One shuffle on user_id; both window frames share the same
    * (ts, id) sort. Per-row state is the nWindow-element array — the
    * frame bound, not the partition, so a hot user costs O(nWindow)
    * per row, not O(history). */
  def rollingMedian(events: DataFrame, nWindow: Int = 5): DataFrame = {
    require(nWindow >= 1 && nWindow % 2 == 1, s"need odd nWindow >= 1, got $nWindow")
    val order = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val frame = order.rowsBetween(-(nWindow - 1), Window.currentRow)
    events
      // null values are not samples: collect_list silently DROPS them
      // while the frame and the rn gate still count them, so a null
      // in the window would shift the picked element off the true
      // middle (or past the array's end → null median). Excluding
      // them up front keeps every emitted window exactly nWindow
      // observed values — the windows slide over observations.
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"), col("value"))
      .withColumn("arr", sort_array(collect_list(col("value")).over(frame)))
      .withColumn("rn", row_number().over(order))
      .filter(col("rn") >= nWindow)
      .select(col("user_id"), col("event_id"), col("us"), col("value"),
        element_at(col("arr"), (nWindow + 1) / 2).as("med"))
  }

  /** Windowed dedup: keep the FIRST event per (user, type) within
    * each tumbling window — the batch twin (and backstop) of
    * `StreamingOps.dedupStream`'s watermark-scoped key state. One
    * shuffle on (key, window); `WindowGroupLimit` heap-limits the
    * rank. */
  def windowDedup(events: DataFrame, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"window must be positive, got $windowUs")
    val us = expr("ts div 1000")
    val w = Window
      .partitionBy(col("user_id"), col("event_type"), col("win"))
      .orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_type"), col("event_id"), us.as("us"))
      // FLOOR division, not `div` (truncate-toward-zero): a pre-1970
      // timestamp must land in the window below zero — calendar
      // semantics. DuckDB's `//` ALSO truncates (measured: -7 // 2 =
      // -3), so the oracle spells the same floor adjustment
      // explicitly rather than relying on `//`; the whole tumbling-
      // bucket family (windowDedup, resampleFfill, hllMergeRollup)
      // shares this form on both engines (r13 review).
      .withColumn("win",
        expr(s"us div $windowUs") - when(col("us") % windowUs < 0, 1L).otherwise(0L))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("win"), col("event_id"), col("us"))
  }

  /** Melt/unpivot: wide metric columns → (key, metric, val) long form
    * — the inverse of [[pivotByType]], zero shuffle (pure per-row
    * fan-out via the native `unpivot`). */
  def unpivotMetrics(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber"),
              col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        variableColumnName = "metric",
        valueColumnName = "val")

  /** Same-schema union/append (`dags/my_dag.py:75,99`). */
  def unionEntities(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_custkey").as("entity_key"), col("c_name").as("name"),
                    col("c_acctbal").as("acctbal"), lit("customer").as("src"))
      .unionByName(
        supplier.select(col("s_suppkey").as("entity_key"), col("s_name").as("name"),
                        col("s_acctbal").as("acctbal"), lit("supplier").as("src")))

  /** Ordered string aggregation (SQL `string_agg(expr, sep ORDER BY
    * …)`): per-group concatenation made partitioning-invariant by
    * sorting the COLLECTED array rather than relying on input order
    * (`collect_list` order is whatever the shuffle delivered — the
    * classic nondeterminism trap). Bounded here to the top-n members
    * per group so a colossal group cannot materialize an unbounded
    * string: the heap-per-group `WindowGroupLimit` cut runs BEFORE
    * the collect. */
  def groupConcatTopN(customer: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_members"),
        array_join(array_sort(collect_list(col("c_name"))), ",").as("members"))
  }

  /** Set intersection/difference on a common key projection — the
    * remaining ANSI set operators beside [[unionEntities]]. Spark
    * plans both as aggregates/joins on the full row key (one shuffle,
    * partial-aggregable); declared over the customers-with-orders
    * key overlap (c_custkey ∩ o_custkey) so the result is
    * non-trivial on the testdata. */
  def intersectKeys(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey").as("k"))
      .intersect(orders.select(col("o_custkey").as("k")))

  /** Difference against a FILTERED subset (customers with no order
    * above the threshold) — the full key sets are referentially
    * complete on the testdata, which would make an unfiltered EXCEPT
    * a trivially-empty (and thus meaningless) check. */
  def exceptKeys(customer: DataFrame, orders: DataFrame,
                 minTotal: Double = 400000.0): DataFrame =
    customer.select(col("c_custkey").as("k"))
      .except(orders.filter(col("o_totalprice") > minTotal)
        .select(col("o_custkey").as("k")))

  /** Exact key dedup (UNIQUE(MP_id), `dags/my_dag.py:199-201`). */
  def dedupDistinct(lineitem: DataFrame): DataFrame =
    lineitem.select("l_partkey", "l_suppkey").distinct()

  /** Keep-first-per-key dedup with a deterministic order — the
    * idempotent-load semantics of `ON CONFLICT DO NOTHING`
    * (`dags/my_dag.py:201`) made order-stable. `min_by` is a single
    * partial-aggregable pass (no window sort). */
  def dedupKeyed(lineitem: DataFrame): DataFrame = {
    // 2^20 multiplier: *10 collided once line numbers reach 10
    // (ord(1,15) > ord(2,2) wrongly prefers order 2), making
    // "first" order-dependent on general data; 2^20 keeps the pair
    // ordering exact for line numbers < 1,048,576 and order keys
    // up to 2^43 — both documented bounds, far past any real feed
    val ord = col("l_orderkey") * 1048576L + col("l_linenumber")
    lineitem.groupBy("l_partkey")
      .agg(min_by(col("l_extendedprice"), ord).as("first_price"),
           min(ord).as("first_ord"))
  }

  /** Text render of a struct row + ordered group concat — the JDFTx
    * input-deck builder (`dags/utils.py:3-48`: `'ion %s %f %f %f %i'`
    * per atom, newline-joined). Pure codegen'd expressions; the
    * per-group document is assembled with a deterministic sort so
    * results are partition-order independent. */
  def renderDeck(part: DataFrame): DataFrame = {
    val line = format_string("ion %s %f %f %d",
      regexp_extract(col("p_name"), "^(\\w+)", 1),
      col("p_retailprice"),
      col("p_retailprice") * lit(1.88973),
      col("p_partkey"))
    part.select(col("p_brand"), line.as("line"))
      .groupBy("p_brand")
      .agg(array_join(array_sort(collect_list(col("line"))), "\n").as("deck"),
           count(lit(1)).as("n_lines"))
  }

  /** Tumbling event-time window aggregate — the batch twin of the
    * Structured Streaming path (`graft.streaming`); same plan shape
    * Spark uses under `readStream` with a watermark. */
  def windowAgg(eventsWithTs: DataFrame): DataFrame =
    eventsWithTs
      .groupBy(window(col("ts_t"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value"), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("bucket"),
              col("event_type"), col("n"), col("sum_value"))

  /** First-order Markov transition counts over per-user event
    * sequences: (from, to, cnt, from_total) for every consecutive
    * event-type pair in (time, id) order — the behavioral-model /
    * next-event-prediction statistic. Probabilities are the exact
    * rational cnt/from_total; the division stays OUT of the declared
    * row (the psiDrift discipline).
    *
    * Scale shape: ONE shuffle on user_id for the lead window (the
    * per-user sort is the stream's natural clustering), a partial-agg
    * shuffle on the (from, to) pairs — |types|² rows out — and the
    * row-total window runs on that tiny frame. */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events.select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts div 1000").as("us"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("from_total",
        sum(col("cnt")).over(Window.partitionBy("from_type")).cast(LongType))
  }

  /** RFM (recency / frequency / monetary) segmentation: per-user
    * last-activity time, event count, and exact decimal-summed value,
    * each scored 1–`nSegments` — the classic lifecycle-marketing
    * segmentation. The per-user rollup is one partial-agg shuffle at
    * any scale; what varies is the scoring:
    *
    * `relErr = 0` (oracle default): exact ntile over a (metric,
    * user_id) total order — engine-portable tie-breaks, but all
    * |users| rows sort through one task per metric, so it is the
    * test-scale harness. `relErr > 0`: all three metrics' cut arrays
    * come from ONE `percentile_approx` aggregate pass over the
    * rollup (3·(n−1) values), broadcast back, segments assigned by
    * comparison ([[bucketByCuts]]) — no global window, the 100-TB
    * path. Ties share a segment there instead of splitting. */
  def rfmSegments(events: DataFrame, nSegments: Int = 5, relErr: Double = 0.0): DataFrame = {
    require(nSegments >= 2, s"need nSegments >= 2, got $nSegments")
    require(relErr >= 0.0 && relErr < 0.5, s"need relErr in [0, 0.5), got $relErr")
    val perUser = events.select(col("user_id"), col("value"),
        expr("ts div 1000").as("us"))
      .groupBy("user_id")
      .agg(max(col("us")).as("recency_us"),
           count(lit(1)).as("frequency"),
           moneySum(col("value"), 2).as("monetary"))
    if (relErr == 0.0) {
      def seg(c: String) = ntile(nSegments)
        .over(Window.orderBy(col(c), col("user_id"))).cast(LongType)
      perUser.select(col("user_id"), col("recency_us"), col("frequency"),
        col("monetary"), seg("recency_us").as("r_seg"),
        seg("frequency").as("f_seg"), seg("monetary").as("m_seg"))
    } else {
      val cuts = perUser.agg(
        approxCutsAgg(col("recency_us"), nSegments, relErr).as("r_cuts"),
        approxCutsAgg(col("frequency"), nSegments, relErr).as("f_cuts"),
        approxCutsAgg(col("monetary"), nSegments, relErr).as("m_cuts"))
      perUser.crossJoin(broadcast(cuts))
        .select(col("user_id"), col("recency_us"), col("frequency"),
          col("monetary"),
          bucketByCuts(col("recency_us"), col("r_cuts")).as("r_seg"),
          bucketByCuts(col("frequency"), col("f_cuts")).as("f_seg"),
          bucketByCuts(col("monetary"), col("m_cuts")).as("m_seg"))
    }
  }

  /** Time-series resample + forward fill: project each user's event
    * stream onto a regular `gridUs`-spaced grid (their own [first,
    * last] slot range) carrying the latest value at-or-before each
    * grid point — the gap-filling step before any fixed-step
    * modeling (rates, EWMA, training windows) on irregular events.
    *
    * Scale shape: last-event-per-(user, slot) collapses the stream
    * FIRST (row_number heap on one (user, slot) shuffle), the grid
    * explodes from per-user bounds (|users| rows in, Σ slots out —
    * never events × slots), and the fill is one running `last(…,
    * ignoreNulls)` window sharing the user partitioning. A user's
    * first slot always holds an event, so no null survives the fill.
    */
  def resampleFfill(events: DataFrame, gridUs: Long = 86400000000L): DataFrame = {
    require(gridUs >= 1, s"need gridUs >= 1, got $gridUs")
    val e = events.select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("us"), col("value"))
      // the family's FLOOR bucket form (see windowDedup): truncation
      // would make slot 0 double-width across the epoch and misalign
      // every pre-1970 slot by one
      .withColumn("slot",
        expr(s"us div $gridUs") - when(col("us") % gridUs < 0, 1L).otherwise(0L))
    val lastPerSlot = e
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "slot")
          .orderBy(col("us").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("slot"), col("value"))
    val grid = e.groupBy("user_id")
      .agg(min(col("slot")).as("lo"), max(col("slot")).as("hi"))
      .select(col("user_id"), explode(sequence(col("lo"), col("hi"))).as("slot"))
    grid.join(lastPerSlot, Seq("user_id", "slot"), "left")
      .select(col("user_id"), col("slot"),
        last(col("value"), ignoreNulls = true).over(
          Window.partitionBy("user_id").orderBy("slot")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("value_ffill"))
  }

  /** Interior cut points at p = 1/n … (n−1)/n as ONE partial-
    * aggregable `percentile_approx` array aggregate. This is the
    * bounded metadata (n−1 values, kilobytes) that replaces a global
    * single-partition sort when bucketing at 100 TB: each partition
    * ships a fixed-size Greenwald–Khanna sketch, the merged cut
    * array broadcasts back, and assignment is a per-row comparison.
    * Stays inside the plan (no driver action), so callers compose
    * it with `crossJoin(broadcast(…))` into one job. */
  private[graft] def approxCutsAgg(value: Column, n: Int, relErr: Double): Column = {
    val accuracy = math.min(1000000L, math.max(100L, math.ceil(1.0 / relErr).toLong)).toInt
    percentile_approx(value,
      array((1 until n).map(i => lit(i.toDouble / n)): _*), lit(accuracy))
  }

  /** Ascending bucket index 1..n from a cut array: 1 + the number of
    * cuts strictly below the value. All rows sharing a value share a
    * bucket — the one documented divergence from exact `ntile`,
    * which splits ties across buckets via its id tie-break to
    * balance counts exactly. Duplicate cut values (heavy skew on one
    * value) leave the buckets between them empty rather than
    * misassigning rows. */
  private[graft] def bucketByCuts(v: Column, cuts: Column): Column =
    (lit(1) + aggregate(cuts, lit(0),
      (acc, c) => acc + when(v > c, 1).otherwise(0))).cast(LongType)

  /** Equi-depth histogram: `nBuckets` buckets of (near-)equal row
    * count with exact [lo, hi] value bounds per bucket — the
    * ANALYZE-style statistic a cost-based optimizer feeds on.
    *
    * `relErr = 0` (the oracle default) is the EXACT path: a global
    * `ntile` whose (value, id) order makes bucket assignment a total
    * order, so ties split identically on any engine — but it funnels
    * every row through one task, so it is a test-scale verification
    * harness, not the production path. `relErr > 0` is the 100-TB
    * path: `percentile_approx`-derived cut points (one partial-agg
    * pass, n−1 values) broadcast back and assigned by comparison —
    * no global sort, no single hot partition. Bucket counts are then
    * equal within the sketch's rank error (relErr·N per boundary);
    * ties share a bucket instead of splitting. */
  def equiDepthHistogram(df: DataFrame, valueCol: String, idCol: String,
                         nBuckets: Int = 10, relErr: Double = 0.0): DataFrame = {
    require(nBuckets >= 1, s"need nBuckets >= 1, got $nBuckets")
    require(relErr >= 0.0 && relErr < 0.5, s"need relErr in [0, 0.5), got $relErr")
    val base = df.select(col(valueCol), col(idCol))
    val bucketed =
      if (relErr == 0.0)
        base.withColumn("bucket", ntile(nBuckets).over(
          Window.orderBy(col(valueCol), col(idCol))).cast(LongType))
      else if (nBuckets == 1) base.withColumn("bucket", lit(1L))
      else {
        val cuts = base.agg(approxCutsAgg(col(valueCol), nBuckets, relErr).as("cuts"))
        base.crossJoin(broadcast(cuts))
          .withColumn("bucket", bucketByCuts(col(valueCol), col("cuts")))
          .drop("cuts")
      }
    bucketed.groupBy("bucket")
      .agg(min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"),
           count(lit(1)).as("n"))
  }

  /** 2-D Pareto frontier (skyline): rows not dominated by any other
    * row — maximize `maxCol`, minimize `minCol`; a row loses iff
    * some other row is ≥ on maxCol AND ≤ on minCol with at least
    * one strict. Equal (maxCol, minCol) pairs dominate nobody, so
    * co-optimal duplicates all surface.
    *
    * Scale shape: NOT the O(n²) dominance join, and NOT a global
    * sort either. One partial-agg shuffle reduces the table to
    * |distinct maxCol| rows (per-value min of minCol); the
    * strictly-better-above running-min over that frame — which for a
    * CONTINUOUS dimension can approach |rows|, so a partition-less
    * window would be the single-hot-task shape — runs as the classic
    * distributed prefix scan: range-partition by maxCol desc, local
    * running-min window per partition, per-partition minima
    * (≤ `nScanParts` rows) prefix-combined through a broadcast
    * self-join, `least` of the two. Exact and partitioning-invariant
    * (property-tested); a broadcast-sized join back tags the
    * frontier rows — the full table is scanned once and never
    * self-joined.
    */
  def paretoFront(df: DataFrame, keyCol: String, maxCol: String,
                  minCol: String, nScanParts: Int = 64): DataFrame = {
    require(nScanParts >= 1, s"need nScanParts >= 1, got $nScanParts")
    val perValue = df.groupBy(col(maxCol))
      .agg(min(col(minCol)).as("__mp"))
    // MATERIALIZE the pid-labeled frame (lazy local checkpoint):
    // `parts` feeds two plan branches (the local-running-min window
    // and the per-partition minima), and RangePartitioner samples
    // its boundaries with an rdd.id-derived seed — if the branches
    // ever executed the exchange separately (exchange reuse off, or
    // pruning making the subtrees non-canonical), their __pid labels
    // could disagree and silently corrupt the prefix combine. The
    // frame is |distinct maxCol| rows (already reduced), so the
    // checkpoint is metadata-sized; lineage truncation makes the pid
    // assignment a fact, not a reuse accident.
    val parts = perValue
      .repartitionByRange(nScanParts, col(maxCol).desc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val localW = Window.partitionBy(col("__pid")).orderBy(col(maxCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = parts.withColumn("__lrunmin", min(col("__mp")).over(localW))
    val partMins = parts.groupBy(col("__pid")).agg(min(col("__mp")).as("__pmin"))
    // prefix of EARLIER partitions (range partitions are ordered by
    // maxCol desc, AQE coalescing merges adjacent ones so pid order
    // survives): tiny self-join over ≤nScanParts rows, window-free
    val prefix = partMins.as("a")
      .join(broadcast(partMins.as("b")), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(min(col("b.__pmin")).as("__prefix"))
    val thresholds = withLocal.join(broadcast(prefix), Seq("__pid"))
      .withColumn("__runmin", least(col("__lrunmin"), col("__prefix")))
    val frontier = thresholds
      .filter(col("__runmin").isNull || col("__mp") < col("__runmin"))
      .select(col(maxCol).as("__fmax"), col("__mp"))
    df.join(broadcast(frontier),
        col(maxCol) === col("__fmax") && col(minCol) === col("__mp"))
      .select(col(keyCol), col(maxCol), col(minCol))
  }

  /** Top-k per group (rank window) — generalization of the
    * pick-one-per-group sampling (`dags/my_dag.py:109-111`). */
  def topKPerGroup(orders: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
  }
}
