package graft.text

import graft.SparkSpec

/** The BPE ENCODE path and, critically, the equivalence its DuckDB
  * oracle rests on: the sentinel-flanked string-replace twin
  * (`␁a␁␁b␁` → `␁ab␁` over `␁s₁␁␁s₂␁…`) must equal
  * [[TextOps.bpeMergeOnce]]'s left-to-right scan on EVERY symbol
  * sequence — including the multi-char-symbol boundary traps
  * (`a`-as-suffix, `b`-as-prefix) and overlapping same-pair runs
  * that break naive space-joined replace. The twin here is
  * `java.lang.String.replace`, whose left-to-right non-overlapping
  * replace-all semantics are the same contract DuckDB's `replace()`
  * implements.
  */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  private val S = "\u0001"

  /** Render a symbol sequence in the oracle's flanked encoding. */
  private def render(syms: Seq[String]): String =
    syms.map(s => S + s + S).mkString

  /** The oracle's merge step: literal replace-all on the rendering. */
  private def twinMerge(syms: IndexedSeq[String], a: String, b: String): String =
    render(syms).replace(S + a + S + S + b + S, S + a + b + S)

  private def subwordCount(rendered: String): Int =
    (rendered.length - rendered.replace(S, "").length) / 2

  test("twin equivalence: boundary traps that break naive joined replace") {
    // a-as-suffix: "xa" must not donate its tail 'a' to a (a,b) merge
    assert(twinMerge(IndexedSeq("xa", "b"), "a", "b") ==
      render(TextOps.bpeMergeOnce(IndexedSeq("xa", "b"), "a", "b")))
    assert(TextOps.bpeMergeOnce(IndexedSeq("xa", "b"), "a", "b") == IndexedSeq("xa", "b"))
    // b-as-prefix: "ba" must not lend its head 'b' either
    assert(twinMerge(IndexedSeq("a", "ba"), "a", "b") ==
      render(TextOps.bpeMergeOnce(IndexedSeq("a", "ba"), "a", "b")))
    assert(TextOps.bpeMergeOnce(IndexedSeq("a", "ba"), "a", "b") == IndexedSeq("a", "ba"))
    // overlapping same-pair runs: left-to-right non-overlapping
    assert(twinMerge(IndexedSeq("a", "a", "a"), "a", "a") ==
      render(IndexedSeq("aa", "a")))
    assert(twinMerge(IndexedSeq("a", "a", "a", "a"), "a", "a") ==
      render(IndexedSeq("aa", "aa")))
    // adjacent repetitions of a two-symbol pair all merge
    assert(twinMerge(IndexedSeq("a", "b", "a", "b"), "a", "b") ==
      render(IndexedSeq("ab", "ab")))
  }

  test("twin equivalence: exhaustive over short sequences and all pairs") {
    val alphabet = Seq("a", "b", "c")
    // every symbol sequence of length <= 4 over {a,b,c}, every merge pair
    def seqs(n: Int): Seq[IndexedSeq[String]] =
      if (n == 0) Seq(IndexedSeq.empty)
      else for (t <- seqs(n - 1); s <- alphabet) yield t :+ s
    for {
      n <- 0 to 4
      syms <- seqs(n)
      a <- alphabet
      b <- alphabet
    } assert(twinMerge(syms, a, b) == render(TextOps.bpeMergeOnce(syms, a, b)),
      s"diverged on syms=$syms merge=($a,$b)")
  }

  test("twin equivalence: seeded random multi-char symbols, chained merges") {
    val rnd = new scala.util.Random(42)
    val atoms = Vector("a", "b", "c", "d")
    for (_ <- 1 to 500) {
      var syms: IndexedSeq[String] =
        IndexedSeq.fill(1 + rnd.nextInt(8))(atoms(rnd.nextInt(atoms.length)))
      // apply a chain of random merges, comparing the twin at every step
      for (_ <- 1 to 4) {
        val present = syms.distinct
        val a = present(rnd.nextInt(present.length))
        val b = present(rnd.nextInt(present.length))
        val expect = TextOps.bpeMergeOnce(syms, a, b)
        assert(twinMerge(syms, a, b) == render(expect),
          s"diverged on syms=$syms merge=($a,$b)")
        syms = expect
      }
    }
  }

  test("bpeSegmentOf goldens under the frozen q_bpe_encode model") {
    val m = graft.SparkEntry.bpeModel
    assert(TextOps.bpeSegmentOf("table", m) == Seq("tab", "le"))
    assert(TextOps.bpeSegmentOf("hash", m) == Seq("has", "h"))
    assert(TextOps.bpeSegmentOf("agg", m) == Seq("a", "gg"))   // equal-symbol pair
    assert(TextOps.bpeSegmentOf("order", m) == Seq("or", "d", "er"))
    assert(TextOps.bpeSegmentOf("row", m) == Seq("row"))       // chained to one symbol
    assert(TextOps.bpeSegmentOf("scan", m) == Seq("sca", "n"))
    assert(TextOps.bpeSegmentOf("", m) == Seq.empty)
    // subword count through the twin rendering agrees too
    val rendered = m.foldLeft(render(TextOps.bpeBaseSymbols("table"))) {
      case (s, (a, b)) => s.replace(S + a + S + S + b + S, S + a + b + S)
    }
    assert(subwordCount(rendered) == 2)
  }

  test("bpeEncode: per-doc word and subword accounting, empty docs included") {
    val docs = Seq(
      (1L, "table scan", "en", "s", 10L),
      (2L, "hash hash agg", "en", "s", 13L),
      (3L, "", "en", "s", 0L),
      (4L, "  ", "en", "s", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.bpeEncode(docs, graft.SparkEntry.bpeModel)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // table -> [tab, le]=2, scan -> [sca, n]=2
    assert(out(1L) == (2L, 4L))
    // hash -> [has, h]=2 (x2), agg -> [a, gg]=2
    assert(out(2L) == (3L, 6L))
    assert(out(3L) == (0L, 0L))
    assert(out(4L) == (0L, 0L))
  }

  /** Synthetic TRAINING-ORDERED merge list: every rule merges two
    * symbols that already exist (atoms or earlier merge outputs) —
    * the invariant [[TextOps.bpeTrain]] guarantees by construction
    * and the one the greedy/fold equivalence rests on. */
  private def syntheticModel(nRules: Int, seed: Int): IndexedSeq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    val pool = scala.collection.mutable.ArrayBuffer[String]("a", "b", "c", "d", "e")
    val seen = scala.collection.mutable.HashSet[(String, String)]()
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    while (out.length < nRules) {
      val p = (pool(rnd.nextInt(pool.length)), pool(rnd.nextInt(pool.length)))
      if (!seen(p)) {
        seen += p; out += p
        // cap pool symbol length: unconstrained random concatenation
        // doubles lengths per generation (real BPE symbols are bounded
        // by corpus substrings); the rule itself stays training-ordered
        // whether or not its output re-enters the pool
        val merged = p._1 + p._2
        if (merged.length <= 8) pool += merged
      }
    }
    out.toIndexedSeq
  }

  test("bpeSegmentGreedy == bpeSegmentOf on training-ordered models (trained + synthetic)") {
    val rnd = new scala.util.Random(7)
    // trained model: bpeTrain's output IS training-ordered
    val corpus = (1 to 60).map(i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(5))(
        Seq.fill(2 + rnd.nextInt(6))("abcde" (rnd.nextInt(5)).toString).mkString)
        .mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val trained = TextOps.bpeTrain(corpus, nMerges = 30, minPairCount = 2)
      .map { case (a, b, _) => (a, b) }
    val words = (1 to 300).map(_ =>
      Seq.fill(1 + rnd.nextInt(12))("abcde" (rnd.nextInt(5)).toString).mkString)
    for (m <- Seq(trained, syntheticModel(200, 11), graft.SparkEntry.bpeModel)) {
      val ranks = TextOps.bpeRanks(m)
      for (w <- words)
        assert(TextOps.bpeSegmentGreedy(w, ranks) == TextOps.bpeSegmentOf(w, m),
          s"diverged on '$w' under ${m.take(5)}... (${m.length} rules)")
    }
  }

  test("trainingOrderedOf treats supplementary-plane base symbols as base (codepoints, not chars)") {
    // "😀" is ONE codepoint but TWO UTF-16 units: a length==1 base
    // test misclassified any emoji-bearing trained model as not
    // training-ordered, silently disabling the greedy fast path
    val emoji = new String(Character.toChars(0x1F600))
    val ordered = Seq(emoji -> emoji, "a" -> "b", (emoji + emoji) -> "ab")
    assert(TextOps.trainingOrderedOf(ordered), "codepoint base symbols must count as base")
    // a genuinely out-of-order list still fails: "xy" is neither a
    // base symbol nor produced by an earlier merge
    assert(!TextOps.trainingOrderedOf(Seq("xy" -> "z")))
    // and encode agrees between the two dispatch paths on such a model
    import spark.implicits._
    val docs = Seq((1L, s"$emoji$emoji" + "ab zz")).toDF("doc_id", "text")
    val greedy = TextOps.bpeEncode(docs, ordered, greedyFrom = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val fold = TextOps.bpeEncode(docs, ordered, greedyFrom = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(greedy == fold, s"$greedy vs $fold")
  }

  test("bpeEncode greedy path == fold path; rank scan beats the fold at 10k rules") {
    val model = syntheticModel(10000, 23)
    val rnd = new scala.util.Random(5)
    val words = (1 to 400).map(_ =>
      Seq.fill(2 + rnd.nextInt(14))("abcde" (rnd.nextInt(5)).toString).mkString)
    // DataFrame-level equality: force each path via the greedyFrom knob
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val viaGreedy = TextOps.bpeEncode(docs, model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val viaFold = TextOps.bpeEncode(docs, model, greedyFrom = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(viaGreedy == viaFold)
    // measured speedup on the raw segmenters (memo off, JIT-warmed):
    // the fold pays 10k passes per word, the rank scan O(len²)
    val ranks = TextOps.bpeRanks(model)
    val warm = words.take(40)
    warm.foreach(w => TextOps.bpeSegmentGreedy(w, ranks))
    warm.foreach(w => TextOps.bpeSegmentOf(w, model))
    val t0 = System.nanoTime()
    words.foreach(w => TextOps.bpeSegmentGreedy(w, ranks))
    val tGreedy = System.nanoTime() - t0
    val t1 = System.nanoTime()
    words.foreach(w => TextOps.bpeSegmentOf(w, model))
    val tFold = System.nanoTime() - t1
    info(f"10k-rule encode: fold ${tFold / 1e6}%.1f ms, greedy ${tGreedy / 1e6}%.1f ms, " +
      f"speedup ${tFold.toDouble / tGreedy}%.1fx over 400 words")
    assert(tFold > tGreedy * 10,
      f"expected >=10x at 10k rules, got ${tFold.toDouble / tGreedy}%.1fx")
  }

  test("bpeEncode: no shuffle in the plan and memo cap degrades safely") {
    val docs = Seq((1L, "table scan table", "en", "s", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val plan = TextOps.bpeEncode(docs, graft.SparkEntry.bpeModel)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bpeEncode must not shuffle:\n$plan")
    // memoCap = 0 (never memoize) must produce identical results
    val a = TextOps.bpeEncode(docs, graft.SparkEntry.bpeModel).collect().toSeq
    val b = TextOps.bpeEncode(docs, graft.SparkEntry.bpeModel, memoCap = 0).collect().toSeq
    assert(a == b)
  }
}
