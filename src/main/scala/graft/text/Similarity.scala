package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Two paths:
  *  - `cosineTopK`: brute-force baseline — broadcast the (small)
  *    query set against the full corpus; exact, O(|corpus|·|queries|).
  *  - `cosineTopKBucketed`: sign-LSH scale path — hash every vector
  *    into a 2^h hyperplane-sign bucket and only score same-bucket
  *    pairs; the corpus is shuffled once on the bucket key, so cost
  *    is O(|corpus|) + per-bucket products instead of a cross join.
  *
  * All arithmetic is codegen'd column expressions (`zip_with` +
  * ordered `aggregate` fold) — no UDFs, no driver collect.
  */
object Similarity {

  /** Dot product of two float-array columns accumulated in double.
    * Backed by the native codegen'd Catalyst expression
    * (`graft.functions.VectorExpressions.DotProductF`) — identical
    * results to the higher-order fold (left-to-right, per-term
    * double cast), but it stays inside whole-stage codegen with no
    * intermediate array per row. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot_f(a, b)

  def norm2(a: Column): Column =
    graft.functions.VectorExpressions.norm2_f(a)

  /** Reference formulation via built-in higher-order functions — kept
    * for the equivalence property test (and as the fallback shape on
    * engines without the custom expression). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def norm2Fold(a: Column): Column =
    aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  /** Exact cosine top-k: queries = vec_id < nQueries (broadcast),
    * rank by rounded similarity with vec_id tiebreak (deterministic
    * under float noise). */
  def cosineTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"), col("nrm").as("q_nrm"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", round(dot(col("embedding"), col("q_vec")) / sqrt(col("nrm") * col("q_nrm")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select("q_id", "vec_id", "sim", "rk")
  }

  /** Deterministic pseudo-hyperplanes: component j of plane p is
    * ±1 by bit parity of a small arithmetic mix — literal-generated,
    * identical on any engine, no RNG state. */
  private def planeSign(p: Int, j: Column): Column =
    when(((j * (2 * p + 3) + p * 7919) % 2) === 0, 1.0).otherwise(-1.0)

  /** Sign-LSH bucket id from `nPlanes` hyperplanes (bucket = bit
    * pattern of projection signs). */
  def lshBucket(vec: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x.cast(DoubleType) * planeSign(p, j)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN top-k: score only pairs sharing an LSH bucket. Recall is
    * approximate (cosine-close vectors agree on hyperplane signs
    * with high probability); the bucket key is the shuffle key. */
  def cosineTopKBucketed(embeddings: DataFrame, nQueries: Int, k: Int, nPlanes: Int = 4): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"),
      norm2(col("embedding")).as("nrm"), lshBucket(col("embedding"), nPlanes).as("bkt"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
              col("nrm").as("q_nrm"), col("bkt").as("q_bkt"))
    val scored = e.join(broadcast(q), col("bkt") === col("q_bkt") && col("vec_id") =!= col("q_id"))
      .withColumn("sim", round(dot(col("embedding"), col("q_vec")) / sqrt(col("nrm") * col("q_nrm")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select("q_id", "vec_id", "sim", "rk")
  }
}
