package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native sorted-set intersection size — the verification kernel of
  * the prefix-filtered set-similarity join ([[graft.text.Dedup]]).
  *
  * `array_intersect` builds a hash set per row pair (an OpenHashSet
  * of boxed elements, then materializes the intersection ARRAY just
  * to take its size); over the ~10⁵–10⁶ surviving candidates of a
  * near-dup join at corpus scale that per-pair allocation is the
  * measured bottleneck (sf0.1: 1.7 s of a 2.6 s query). The producer
  * (`tokenSets`) already emits each document's token-code array
  * SORTED ASCENDING and DISTINCT, so the intersection size is one
  * allocation-free two-pointer merge — `doGenCode` territory, same
  * extension rationale as [[VectorExpressions]].
  *
  * CONTRACT: both inputs must be sorted ascending with no duplicate
  * elements and no null elements — the producer guarantees it, and
  * `DedupPropertySpec` pins the producer+kernel pair against the
  * naive string-set formulation. On unsorted input the release-mode
  * count is simply wrong (no error) — this is a private kernel for a
  * producer that sorts, not a general-purpose function. Because that
  * silent-wrong-answer coupling is one refactor away from a bug, the
  * contract is ALSO locally enforceable: constructing the column
  * under `spark.graft.strictSortedArrays=true` (the test suite's
  * setting) bakes a per-row ascending-strict check into the kernel
  * that throws on violation. The flag is read once at plan-build
  * time and rides in the expression, so executors need no conf;
  * release plans carry zero extra branches. NULL if either side is
  * NULL (BinaryExpression default).
  */
object SetExpressions {

  /** Conf that bakes the sorted-input assertion into new
    * `SortedIntersectCount` columns. Read at COLUMN CONSTRUCTION
    * time (driver), not at eval — flipping it after a plan is built
    * does not retrofit the check.
    */
  val StrictSortedConf = "spark.graft.strictSortedArrays"

  /** Two-pointer merge count. Static so generated code can call it. */
  def countCommonSorted(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  /** Strict twin of [[countCommonSorted]]: verifies both inputs are
    * strictly ascending (sorted, distinct) AND null-element-free
    * before counting — the full three-clause contract. The null check
    * is load-bearing for the enforcement role: `getLong` on a null
    * slot reads the zeroed word as 0, which can PASS the ascending
    * check (e.g. [null, 5]) while the release kernel counts a phantom
    * 0 match — exactly the silent producer drift strict mode exists
    * to catch. Test-mode only — O(n) extra comparisons per row pair.
    */
  def countCommonSortedStrict(a: ArrayData, b: ArrayData): Int = {
    def check(x: ArrayData, side: String): Unit = {
      var i = 0
      while (i < x.numElements()) {
        if (x.isNullAt(i)) throw new IllegalArgumentException(
          s"SortedIntersectCount: $side input violates the no-null-elements " +
            s"contract at index $i — the release kernel would read the slot as 0 " +
            "and count phantom matches; the producer must emit null-free arrays")
        if (i > 0 && x.getLong(i - 1) >= x.getLong(i)) throw new IllegalArgumentException(
          s"SortedIntersectCount: $side input violates the sorted-distinct " +
            s"contract at index $i (${x.getLong(i - 1)} >= ${x.getLong(i)}) — " +
            "the producer must emit strictly ascending arrays")
        i += 1
      }
    }
    check(a, "left"); check(b, "right")
    countCommonSorted(a, b)
  }

  private def checkLongArray(dt: DataType, side: String): TypeCheckResult = dt match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$side must be array<bigint>, got ${other.simpleString}")
  }

  case class SortedIntersectCount(left: Expression, right: Expression,
      strict: Boolean = false)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = left.nullable || right.nullable
    override def checkInputDataTypes(): TypeCheckResult =
      checkLongArray(left.dataType, "left") match {
        case TypeCheckResult.TypeCheckSuccess => checkLongArray(right.dataType, "right")
        case f => f
      }

    private def kernel: String =
      if (strict) "countCommonSortedStrict" else "countCommonSorted"

    override def nullSafeEval(a: Any, b: Any): Any =
      if (strict) countCommonSortedStrict(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      else countCommonSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.SetExpressions.$kernel($a, $b);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  import org.apache.spark.sql.graft.ColumnBridge.{toCol, toExpr}

  /** Strictness is sampled ONCE, on the CONSTRUCTING thread, via the
    * thread-local `SQLConf.get` — the flag is baked into the
    * expression at column-construction time so release plans carry
    * zero extra branches. A thread with no readable session conf
    * (exotic: column built off-driver or before any session exists)
    * resolves to non-strict; a MALFORMED conf value now throws
    * `IllegalArgumentException` at construction instead of silently
    * disarming the assertion (the r11 catch-all swallowed it). */
  def sorted_intersect_count(a: Column, b: Column): Column = {
    val strict =
      (try Some(org.apache.spark.sql.internal.SQLConf.get
         .getConfString(StrictSortedConf, "false"))
       // only the missing-conf-context case disarms; anything else
       // (incl. a bad value's IllegalArgumentException below) is loud
       catch { case _: IllegalStateException => None })
        .exists(_.toBoolean)
    toCol(SortedIntersectCount(toExpr(a), toExpr(b), strict))
  }
}
