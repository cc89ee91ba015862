package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `explain("formatted")` for the headline queries to a
  * markdown file — the plan-shape evidence behind SCALING.md's
  * claims (pushed filters, pruned schemas, broadcast placements,
  * whole-stage codegen spans, absence of nested-loop joins).
  *
  * Regenerate with:
  * {{{
  *   sbt "runMain graft.Plans /root/testdata/sf0.01 PLANS.md"
  * }}}
  */
object Plans {

  /** Queries whose plan shape carries a documented claim. */
  val Headline: Seq[String] = Seq(
    "q_scan_filter",      // PushedFilters + pruned ReadSchema
    "q_equi_join",        // broadcast dimension
    "q_window_agg",       // single shuffle + window
    "q_topk_per_group",   // WindowGroupLimit heap
    "q_sample_stratified",// WindowGroupLimit heap per stratum
    "q_asof_join",        // union-merge, no range join
    "q_range_join",       // grain bucketing, no nested loop
    "q_simhash",          // one-pass fold, zero shuffle
    "q_minhash_lsh_pairs",// cluster collapse + pinned hash joins
    "q_embed_neardup",    // banded LSH self-join
    "q_ivf_topk",         // map-side assignment, broadcast quantizer
    "q_ngram_topk",       // TakeOrderedAndProject
    "q_chunks",           // pure fan-out, zero shuffle
    "q_sessionize",       // one shuffle, lag + prefix-sum share a sort
    "q_tfidf",            // two partial aggs + broadcast N + heap top-k
    "q_dup_spans",        // scoped span cache + shuffled-hash count join
    "q_embed_project",    // per-row JL fold, zero shuffle
    "q_pii_scrub",        // shuffle-free regexp sweep
    "q_salted_join",      // explicit salt spread + replica explode
    "q_edit_distance",    // prefix-blocked candidate join
    "q_simhash_neardup",  // banded fingerprint collision + hash expansion
    "q_window_dedup",     // WindowGroupLimit first-per-window
    "q_running_sum",      // decimal running window sum
    "q_ngram_lm",         // bigram-key aggs + model join + decimal sum
    "q_minhash_components", // banding + agreement confirm + rep CC
    "q_image_features",   // narrow decode, zero shuffle
    "q_ann_topk",         // 2-probe bucket join
    "q_cluster_best",     // CC + partial-agg max_by winner (no window)
    "q_mixture_tokens",   // per-lang running sum + budget cut
    "q_scd2",             // one shuffle, lag + lead share a sort
    "q_vocab_oov",        // heap top-V + broadcast vocab apply
    "q_pmi",              // min-count filter before the unigram joins
    "q_embed_scale",      // per-dim partials + broadcast stats join
    "q_funnel",           // per-step partial-aggs, no stream self-join
    "q_time_weighted_avg",// lead + rollup share one sort
    "q_mad_outliers",     // broadcast stats, stream never shuffles
    "q_jaro_winkler",     // blocked join + native codegen'd expression
    "q_simhash_components", // scoped-cached fingerprints + rep CC
    "q_sample_weighted",  // TakeOrderedAndProject heaps
    "q_pack_shards",      // exclusive prefix-sum shard assignment
    "q_normalize_text",   // single codegen'd Project, zero shuffle
    "q_pq_topk",          // broadcast-only joins + WindowGroupLimit rank
    "q_ivfpq_topk",       // one corpus read: cell-assign + encode in one projection
    "q_gopher_rules",     // single codegen'd Project, zero shuffle
    "q_semantic_dedup",   // broadcast argmax assign + shuffle_hash cell join
    "q_dsir_weight",      // two feature passes + broadcast 256-row stats
    "q_bloom_contamination", // codegen'd bloom prefilter + shuffle_hash confirm
    "q_cross_dup_fraction",  // scoped gram cache + shuffle_hash df join
    "q_embed_gram",       // d²/2-key partial agg, map-side combine
    "q_zonemap_prune",    // manifest-pruned file list before the scan
    "q_snapshot_diff",    // ONE full-outer SMJ, null-safe compares, no row hash
    "q_pareto_front",     // distinct-dim frame window + broadcast frontier join
    "q_psi_drift",        // broadcast scalars + one (group, bin) partial agg
    "q_inverted_index",   // token-shuffle reuse: window cap + df agg
    "q_hll_merge",        // partial sketch aggs, union rollup never re-reads rows
    "q_incr_agg",         // algebraic partial-state merge (IVM shape)
    "q_resample_ffill",   // last-per-slot heap + grid explode + one fill window
    "q_markov_transitions", // lead window + |types|^2 partial agg
    "q_degree_hist",      // two tiny partial-agg shuffles over the pair pipeline
    "q_ks_drift",         // PSI-shared binning + window over <=nBins metadata rows
    "q_bpe_encode",       // broadcast merges, zero-shuffle memoized mapPartitions
    "q_drift_by_day",     // frozen-reference monitor: literal binning + metadata finisher
    "q_jaccard_neardup",  // t>=0.5 prefix plan: sorted-code sets + positional bound + merge kernel
    "q_shingle_jaccard")  // t<0.5 co-count plan: token-inverted-index co-occurrence counting

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.codegen.cache.maxEntries",
        graft.core.Sessions.CodegenCacheEntries) // static conf; see Sessions
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Sessions.tune(spark) // shared confs + SQL function registration

    val sb = new StringBuilder
    sb.append("# Physical plans (generated — do not edit)\n\n")
    sb.append(s"Source: `sbt \"runMain graft.Plans $sfDir $out\"` — formatted\n")
    sb.append("explain of each headline query against the named testdata.\n")
    Headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n```\n$plan```\n")
    }
    Files.write(Paths.get(out), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"wrote ${Headline.size} plans to $out")
    spark.stop()
  }
}
