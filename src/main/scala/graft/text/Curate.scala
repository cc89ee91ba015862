package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The composed curation run — the flagship "switch your pipeline to
  * this library" query: Gopher quality gate → exact dedup → language
  * ID → per-(language, source) corpus accounting, each stage the
  * library's own operator, chained the way a production corpus build
  * chains them. One call produces the mixture table a training run
  * starts from.
  */
object Curate {

  /** Gopher-gate `documents`, collapse exact duplicates to their
    * lowest doc_id, language-ID the survivors, and account the kept
    * corpus per (predicted language, source): document count, token
    * count, character count. All-integer output — no float contract
    * needed anywhere.
    *
    * Scale shape, stage by stage: the Gopher gate and language ID
    * are shuffle-free token-fold sweeps ([[TextOps.gopherRules]] /
    * [[TextOps.langId]]); exact dedup is ONE shuffle on md5(text)
    * collapsed map-side, with the keeper join running doc_id ⋈
    * doc_id (co-partitioned with the gate join before it, so AQE
    * reuses the exchange); the final stats are a partial aggregate
    * over the handful of (lang, source) cells. Nothing in the chain
    * widens: the gate drops rows before the dedup shuffle, and the
    * dedup drops rows before language scoring — each stage shrinks
    * the data the next one pays for. */
  def curationPipeline(documents: DataFrame, minWords: Int = 50,
                       minStopwords: Int = 2): DataFrame = {
    require(minStopwords >= 0, s"need minStopwords >= 0, got $minStopwords")
    // n_stopwords is a DISTINCT-stopword count, capped by the list
    // length (8): a floor above it can never pass and would return a
    // silently empty mixture table — the impossible threshold fails
    // loudly instead (r13 review)
    require(minStopwords <= TextOps.GopherStopwords.length,
      s"minStopwords = $minStopwords can never pass: n_stopwords counts DISTINCT " +
        s"stopwords from a ${TextOps.GopherStopwords.length}-word list")
    // the stopword floor is the one Gopher rule that is corpus-
    // language-specific (the stopword list is English function
    // words); a corpus without them — multilingual, or synthetic
    // word-salad like the testdata — tunes it down rather than
    // discarding everything. The other four rules stay as declared.
    val gate = TextOps.gopherRules(documents, minWords)
      .filter(col("ok_word_count") && col("ok_mean_len") && col("ok_symbol_ratio") &&
        col("ok_alpha_ratio") && col("n_stopwords") >= minStopwords)
      .select(col("doc_id"), col("n_words"))
    val kept = documents.join(gate, "doc_id")
    // THE library's exact-dedup operator, not an inline re-spelling
    // (the docstring's "each stage the library's own operator" is a
    // real dependency: Dedup.exactDedup's canonical-survivor rule and
    // NULL-text group semantics are pinned in NullInputSpec, and an
    // inline copy would silently drift if they ever change)
    val reps = Dedup.exactDedup(kept).select(col("keep_id").as("doc_id"))
    val uniq = kept.join(reps, "doc_id")
    val lang = TextOps.langId(uniq).select(col("doc_id"), col("predicted"))
    uniq.join(lang, "doc_id")
      .groupBy(col("predicted").as("lang_pred"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).cast(LongType).as("n_tokens"),
        sum(col("n_chars")).cast(LongType).as("n_chars"))
  }
}
