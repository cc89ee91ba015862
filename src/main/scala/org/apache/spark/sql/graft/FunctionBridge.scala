package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registers graft's native expressions in the session function
  * registry so plain SQL can call them
  * (`SELECT dot_f(a.embedding, b.embedding) ...`). Same namespace
  * rationale as [[ColumnBridge]]: the registry lives behind
  * `private[sql]` session state in Spark 4.
  */
object FunctionBridge {

  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.createOrReplaceTempFunction("dot_f",
      (exprs: Seq[Expression]) => graft.functions.VectorExpressions.DotProductF(exprs(0), exprs(1)),
      "scala_udf")
    registry.createOrReplaceTempFunction("norm2_f",
      (exprs: Seq[Expression]) => graft.functions.VectorExpressions.Norm2F(exprs.head),
      "scala_udf")
    registry.createOrReplaceTempFunction("jaro_winkler",
      (exprs: Seq[Expression]) =>
        graft.functions.StringSimilarity.JaroWinklerSim(exprs(0), exprs(1)),
      "scala_udf")
  }
}
