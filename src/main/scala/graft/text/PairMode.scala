package graft.text

/** Pair-emission contract for EVERY pair-emitting operator:
  * the batch near-dup families ([[Dedup.jaccardNearDupPairs]],
  * [[Dedup.minhashLshPairs]], [[Dedup.simhashNearDupPairs]]), the
  * blocked record-linkage pairs ([[Dedup.editDistancePairs]],
  * [[Dedup.jaroWinklerPairs]]), the embedding-space pairs
  * ([[Similarity.embeddingNearDupPairs]]), and the production ingest
  * screen ([[Dedup.incrementalLshPairs]] /
  * [[Dedup.incrementalLshPairsAgainstStore]] /
  * [[graft.streaming.StreamingOps.lshScreenForeachBatch]], where
  * Star's expansion unit is the fresh doc → stored-cluster-rep edge
  * and Bounded composes with the quarantine hook).
  *
  * Why this exists (SCALING.md, 30× sweep): on a dense corpus the
  * full doc-pair expansion is OUTPUT-QUADRATIC by construction — the
  * observed output exponent is 2.0 at every measured span and the
  * run-time exponent CONVERGES to it, so past the plan floor the job
  * costs whatever its pair list costs to write. No plan change fixes
  * that; the 100-TB answer is a linear-output form. These modes make
  * that answer an API contract instead of documentation: a caller
  * either opts into the linear [[PairMode.Star]] expansion, runs
  * behind [[PairMode.Bounded]]'s loud budget, or keeps the exact
  * historical [[PairMode.Full]] default.
  */
sealed trait PairMode

object PairMode {

  /** The historical default: every qualifying doc pair, exactly —
    * intra-cluster all-pairs plus the full |A|·|B| cross-cluster
    * expansion. Output is quadratic in cluster sizes; on corpora
    * known to be dense, prefer [[Star]] or the component/cluster
    * operators ([[Dedup.jaccardComponents]],
    * [[Dedup.minhashComponents]], [[Dedup.simhashComponents]],
    * [[Dedup.keepBestPerCluster]]). */
  case object Full extends PairMode

  /** Linear star expansion — exact for the dedup decision. Within
    * each identical-content cluster, members pair to the cluster's
    * min-doc rep only (n−1 pairs instead of n·(n−1)/2); between
    * clusters, ONE pair per qualifying distinct-cluster pair (the
    * reps'), instead of |A|·|B|. The emitted edge set is a spanning
    * subset of Full's with the SAME transitive closure, so any
    * downstream keep/drop decision computed per component (which is
    * what a dedup pipeline does with the pairs) is identical;
    * property-tested in DedupPropertySpec. Payload semantics are
    * unchanged (a pair's jaccard/hamming is the value for the two
    * docs actually emitted). Output is linear in documents plus
    * distinct-cluster edges — the banded candidate join already
    * bounds the latter per bucket.
    *
    * Measured guidance (SCALING.md r13, 1×/10× both regimes): Star
    * is for cluster-heavy corpora — on the colossal-cluster (skew)
    * regime it removes the clique term outright (354–643× less
    * output, minhash wall −68%). On a dense corpus of DISTINCT
    * near-dup variants the cluster edge set is itself quadratic and
    * Star only passes it through: minhash still halves (identical
    * signatures cluster), but jaccard at t≥0.8 has near-singleton
    * clusters, so Star saves ~nothing and pays its rep aggregation
    * (+25%) — use the component operators there, or [[Bounded]],
    * whose predicted count doubles as the regime diagnostic. */
  case object Star extends PairMode

  /** Full expansion behind a loud budget: before the expansion job
    * launches, one cheap metadata pass over cluster sizes and
    * distinct-cluster edges computes the EXACT Full output pair
    * count; if it exceeds `maxPairs` the operator throws
    * [[PairBudgetExceededException]] naming both numbers instead of
    * launching a job whose output would dwarf its input. Under
    * budget, the result is bit-identical to [[Full]]. The guard
    * costs one extra action over narrow key/count columns (the wide
    * text/signature work is scope-cached across the two actions —
    * see each operator's cache note). */
  final case class Bounded(maxPairs: Long) extends PairMode {
    require(maxPairs >= 0L, s"need maxPairs >= 0, got $maxPairs")
  }
}

/** Thrown by [[PairMode.Bounded]] when the predicted exact pair
  * count exceeds the budget — BEFORE the quadratic expansion job
  * launches. The message carries both numbers and the linear-output
  * escape hatches, so the fix is in the stack trace. */
final class PairBudgetExceededException(
    val predictedPairs: Long, val maxPairs: Long, family: String)
  extends RuntimeException(
    s"$family would emit $predictedPairs doc pairs (> maxPairs = $maxPairs). " +
      "Pair-mode output is quadratic in near-dup cluster sizes by construction; " +
      "use PairMode.Star (linear, same transitive closure) or the cluster/component " +
      "operators (jaccardComponents / minhashComponents / simhashComponents / " +
      "keepBestPerCluster), or raise the budget deliberately.")

/** Thrown by the component/cluster operators' `maxCandidates` guard
  * when the INTERNAL banded candidate join would evaluate more
  * candidate pairs than the budget — BEFORE that join launches.
  *
  * This is the [[PairBudgetExceededException]] of the operators
  * [[PairMode]] itself routes dense callers to: the components'
  * OUTPUT is linear (one component label per doc), but their
  * candidate+confirm join still evaluates Σ_bucket n·(n−1)/2 pairs
  * of distinct signatures/sets/vectors — quadratic in banding-bucket
  * sizes, the same blow-up `PairMode.Bounded` refuses on the pair
  * operators. Exact duplicates are ALREADY collapsed before every
  * such join, so a breach means genuinely many DISTINCT items share
  * a bucket: tighten the banding (higher threshold → shorter
  * prefixes; larger rowsPerBand / more nPlanes → more selective
  * buckets), or raise the budget deliberately — the predicted count
  * in this message is exact, so the re-budget is informed. */
final class CandidateBudgetExceededException(
    val predictedCandidates: Long, val maxCandidates: Long, family: String)
  extends RuntimeException(
    s"$family's banded candidate join would evaluate $predictedCandidates candidate " +
      s"pairs (> maxCandidates = $maxCandidates). Candidate volume is quadratic in " +
      "banding-bucket sizes (exact duplicates are already collapsed); tighten the " +
      "banding parameters (threshold / rowsPerBand / nPlanes / blocking width) or " +
      "raise the budget deliberately — the predicted count is exact.")
