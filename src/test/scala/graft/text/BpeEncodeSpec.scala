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
