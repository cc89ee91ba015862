package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH, SimHash, and blocked n-gram Jaccard.
  *
  * Scale design: every candidate-generation step is a key-partitioned
  * shuffle (band bucket / block key), never an all-pairs cross join.
  * At 100 TB the LSH band join is the only quadratic-risk stage and
  * its blow-up is bounded by bucket size — salt the band key or raise
  * the band count if a degenerate corpus (many identical docs) skews
  * a bucket; AQE's skew-join split covers the moderate cases.
  */
object Dedup {

  /** Exact dedup via content hash: one shuffle on md5(text).
    * `min(doc_id)` is the canonical survivor (deterministic). */
  def exactDedup(documents: DataFrame): DataFrame =
    documents.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  val MinhashFuncs = 16
  val MinhashPrime = 2147483647L // 2^31 - 1; keeps a*code+b inside long

  /** Universal-hash parameter table (hid, a, b): a = 2i+1, b = 101i+7.
    * Tiny literal dimension — broadcast, never shuffled. */
  private def hashParams(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until MinhashFuncs).map(i => (i.toLong, 2L * i + 1, 101L * i + 7)).toDF("hid", "a", "b")
  }

  /** MinHash signatures, long form (doc_id, hid, mh): explode distinct
    * tokens, broadcast-join the k hash functions, min per (doc, hid).
    * Partial aggregation makes the shuffle carry at most
    * |docs| × k rows regardless of document length. */
  def minhashSignatures(spark: SparkSession, documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"), explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
    toks.withColumn("code", TextOps.tokenCode(col("tok")) % MinhashPrime)
      .crossJoin(broadcast(hashParams(spark)))
      .groupBy(col("doc_id"), col("hid"))
      .agg(min((col("code") * col("a") + col("b")) % MinhashPrime).as("mh"))
  }

  /** LSH banding over the signatures (bands of 4 → collision prob
    * ≈ J⁴ per band) + same-bucket self-join → candidate near-dup
    * pairs. The join key is (band, md5(band signature)): uniform,
    * small, and shuffle-partitionable. */
  def minhashLshPairs(spark: SparkSession, documents: DataFrame, rowsPerBand: Int = 4): DataFrame = {
    val sig = minhashSignatures(spark, documents)
    val bands = sig
      .withColumn("band", expr(s"hid div $rowsPerBand"))
      .groupBy(col("doc_id"), col("band"))
      .agg(md5(array_join(
        transform(array_sort(collect_list(struct(col("hid"), col("mh")))),
          x => concat(x.getField("hid").cast(StringType), lit(":"), x.getField("mh").cast(StringType))),
        ",")).as("bkey"))
    bands.as("x").join(bands.as("y"), Seq("band", "bkey"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** 32-bit SimHash fingerprint: per distinct token take bit b of the
    * portable token hash, sum ±1 votes per bit, set bit where the
    * vote is positive. The bit dimension (32 rows, with precomputed
    * weights 2^b) is broadcast; two partial-aggregable groupBys. */
  def simhash(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val bits = (0 until 32).map(b => (b.toLong, 1L << b)).toDF("bit", "w")
    val codes = documents
      .select(col("doc_id"), explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
      .withColumn("code", TextOps.tokenCode(col("tok")))
    codes.crossJoin(broadcast(bits))
      .groupBy(col("doc_id"), col("bit"), col("w"))
      .agg(sum(expr("2 * (shiftright(code, cast(bit as int)) & 1) - 1")).as("sgn"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("sgn") > 0, col("w")).otherwise(0L)).as("simhash"))
  }

  /** Blocked n-gram Jaccard near-dup pairs: block on
    * (lang, n_chars div 64) so the self-join is per-block, compute
    * exact Jaccard over distinct token sets, keep pairs ≥ threshold.
    * Blocking keys bound the quadratic term; at scale, block width
    * trades recall for cost (near-dups of very different length are
    * missed — by design, mirroring length-bucketed MinHash practice).
    */
  def jaccardNearDupPairs(documents: DataFrame, threshold: Double): DataFrame = {
    val base = documents.select(
      col("doc_id"), col("lang"),
      expr("n_chars div 64").as("bkt"),
      array_distinct(TextOps.tokens(col("text"))).as("toks"))
    val j = size(array_intersect(col("x.toks"), col("y.toks"))).cast(DoubleType) /
            size(array_union(col("x.toks"), col("y.toks")))
    base.as("x").join(base.as("y"),
        col("x.lang") === col("y.lang") && col("x.bkt") === col("y.bkt") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"), round(j, 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
