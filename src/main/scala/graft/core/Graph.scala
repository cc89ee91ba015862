package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed graph primitives for dedup-cluster construction.
  *
  * The near-dup operators emit PAIRS (edges); turning "A~B, B~C" into
  * the transitive cluster {A,B,C} is a connected-components problem —
  * the step that decides which documents a curation pipeline actually
  * drops. GraphX solves it with Pregel min-propagation; this is the
  * same algorithm expressed as DataFrame joins (no RDD graph copy, and
  * the frames keep AQE + whole-stage codegen).
  */
object Graph {

  /** Connected components by min-label propagation with pointer
    * jumping: (node, component) where `component` is the smallest
    * node id reachable from `node`.
    *
    * Each round does
    *  1. propagate — `comp'(v) = min(comp(v), min over neighbors
    *     comp(u))`: one shuffle join of the (symmetrized, materialized
    *     once) edge list with the label table plus a partial-aggregated
    *     min;
    *  2. shortcut — `comp''(v) = comp'(comp'(v))` (pointer jumping):
    *     one self-join of the label table. Plain propagation needs
    *     `diameter` rounds; the shortcut composes paths so label
    *     distance roughly halves per round → O(log d) rounds, the
    *     property that matters when a 100 TB near-dup graph chains
    *     into long paths.
    *
    * Convergence: labels are monotone non-increasing longs, so
    * `sum(comp)` strictly decreases until fixpoint — one cheap
    * aggregate per round decides termination, no row-level diff join.
    * At fixpoint every edge has equal labels on both ends and each
    * component's label is its minimum node id (the min's own label
    * never changes, and equality along edges spreads it).
    *
    * Every round materializes the label table via `localCheckpoint` —
    * without it round N's plan would re-run rounds 1..N−1 (and
    * re-derive the edge input, which may itself be an expensive
    * near-dup pipeline). On a long-lived cluster job prefer
    * `checkpoint` with a reliable dir — localCheckpoint trades fault
    * tolerance for speed, the right call for an iterative interactive
    * job and the wrong one for a 12-hour pipeline stage.
    */
  /** Materialize an iteration result and RESET its logical lineage:
    * `localCheckpoint` stores the rows, and the RDD round-trip swaps
    * the plan for a bare scan with EMPTY constraints/stats. Without
    * the round-trip each round's `LogicalRDD` inherits the previous
    * round's constraint set rewritten through four join branches —
    * exponential growth that hangs the driver inside
    * `rewriteStatsAndConstraints` by round ~10 (observed). The
    * re-encoding cost is two longs per row — noise next to the
    * shuffles. */
  private def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.createDataFrame(df.localCheckpoint().rdd, df.schema)
  }

  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 50): DataFrame = {
    require(maxIter >= 1, s"need maxIter >= 1, got $maxIter")
    val sym = edges
      .select(col(srcCol).cast(LongType).as("src"), col(dstCol).cast(LongType).as("dst"))
      .union(edges.select(col(dstCol).cast(LongType).as("src"), col(srcCol).cast(LongType).as("dst")))
      .transform(materialize)

    var lab = sym.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("mn"))
      .select(col("node"), least(col("node"), col("mn")).as("comp"))
      .transform(materialize)

    // Active set (vote-to-halt): only labels that CHANGED last round
    // can lower a neighbor, so the edge join probes the delta, not
    // the full label table. At scale most of the graph converges in
    // the first rounds and the per-round edge join shrinks toward the
    // few long chains still moving — the classic Pregel halting
    // shape. Round one seeds everything as active.
    var active = lab
    var iter = 0
    var converged = active.isEmpty // empty edge set → nothing to do
    while (!converged && iter < maxIter) {
      // min over ACTIVE neighbors (join-only, no self-union: a union
      // whose branches share attribute ids trips Catalyst's Union
      // constraint rewrite), then combine with the node's own label
      val fromNbrs = sym.join(active, col("src") === col("node"))
        .groupBy(col("dst").as("nbr_node")).agg(min(col("comp")).as("nbr_comp"))
      val prop = lab.join(fromNbrs, col("node") === col("nbr_node"), "left")
        .select(col("node"), col("comp").as("old"),
                least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
      // one shortcut hop per round (comp∘comp): ~2× path compression
      // per materialization → O(log diameter) rounds. A double hop
      // (comp⁴) was measured SLOWER end-to-end on the near-dup graphs:
      // the nested self-join re-evaluates the propagation subtree
      // faster than it saves rounds at realistic diameters (≤ ~10).
      // The jump also lowers labels of nodes with no active neighbor;
      // the old-vs-new compare below catches them for the next delta.
      val propL = prop.select(col("node"), col("comp"))
      val jumped = prop.as("a")
        .join(propL.as("b"), col("a.comp") === col("b.node"), "left")
        .select(col("a.node").as("node"), col("a.old").as("old"),
                coalesce(col("b.comp"), col("a.comp")).as("comp"))
      val m = materialize(jumped)
      lab = m.select("node", "comp")
      active = m.filter(col("comp") < col("old")).select("node", "comp")
      converged = active.isEmpty
      iter += 1
    }
    // labels that stopped moving ARE the components; labels cut off
    // mid-flight are not transitively closed — returning them would
    // silently under-merge dedup clusters downstream
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIter rounds " +
          "(pointer jumping needs ~log2(diameter)); raise maxIter")
    lab
  }
}
