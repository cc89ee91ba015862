package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bridge to Spark's OWN bloom-filter expressions — the pair that
  * powers injected runtime filters (`InjectRuntimeFilter`): a
  * partial-aggregable distributed sketch build and a codegen'd
  * membership probe. Both are `private[sql]`-adjacent catalyst
  * internals, hence this bridge namespace (the [[FunctionBridge]]
  * rationale). Used by `graft.text.Dedup.bloomContamination` for the
  * large-probe-set decontamination prefilter.
  */
object BloomBridge {

  /** Aggregate column building a bloom filter over `hashed` (must be
    * the LongType output of `xxhash64(...)` — the same hash the probe
    * side applies). `numBits` sizes the sketch; merge is a bit-OR, so
    * the build is fully partial-aggregable: each executor folds its
    * partition into a local sketch and only `numBits`-sized sketches
    * cross the wire. */
  def bloomAgg(hashed: Column, estimatedItems: Long, numBits: Long): Column =
    ColumnBridge.toCol(
      new BloomFilterAggregate(ColumnBridge.toExpr(hashed),
        Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of serialized sketch `bits` against the
    * LongType `hashed` column — never a false negative, false
    * positives at the sketch's fpp. The bits ride the plan as a
    * foldable Literal (what Spark's own runtime filter becomes after
    * its scalar subquery executes), so the probe stays inside
    * whole-stage codegen. */
  def mightContain(bits: Array[Byte], hashed: Column): Column =
    ColumnBridge.toCol(
      BloomFilterMightContain(Literal(bits, BinaryType), ColumnBridge.toExpr(hashed)))
}
