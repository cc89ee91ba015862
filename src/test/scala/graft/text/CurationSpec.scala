package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Curation-stage operators: quality-priority cluster collapse,
  * token-budget mixture sampling, shard packing. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // (doc_id, lang, n_chars, text) rows shaped like the documents table
  private def docs(rows: (Long, String, String)*) =
    rows.toSeq.map { case (id, lang, text) => (id, lang, text.length.toLong, text) }
      .toDF("doc_id", "lang", "n_chars", "text")

  test("keepBestPerCluster keeps the highest-quality member, ties to lowest id") {
    // docs 1..3 near-identical (one cluster); doc 3 has the most
    // tokens -> highest quality blend; docs 10, 11 are singletons
    val d = docs(
      (1L, "en", "the quick brown fox jumps over the dog"),
      (2L, "en", "the quick brown fox jumps over the dog!"),
      (3L, "en", "the quick brown fox jumps over the lazy dog and runs off"),
      (10L, "en", "completely different text about ships"),
      (11L, "de", "ganz anderer deutscher inhalt"))
    val out = Dedup.keepBestPerCluster(d, 0.5)
      .collect().map(r => r.getAs[Long]("component") ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("best_doc"))).toMap
    assert(out(1L) == (3L, 3L), s"cluster {1,2,3} should keep doc 3: $out")
    assert(out(10L) == (1L, 10L) && out(11L) == (1L, 11L))
    // exact ties break to the lowest doc_id
    val tied = docs(
      (5L, "en", "same words here"),
      (6L, "en", "same words here"))
    val best = Dedup.keepBestPerCluster(tied, 0.5).collect()
    assert(best.length == 1 && best.head.getAs[Long]("best_doc") == 5L)
  }

  test("mixtureByTokenBudget fills each budget, exceeds by at most one doc") {
    val d = docs((1L to 30L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", Seq.fill(10)("w").mkString(" "))): _*)
    // 15 docs x 10 tokens per lang; budget 45 -> keep ceil(45/10)=5 docs
    val out = TextOps.mixtureByTokenBudget(d, Map("en" -> 45L))
    val rows = out.collect()
    assert(rows.forall(_.getAs[String]("lang") == "en"), "unbudgeted lang must drop")
    assert(rows.length == 5, s"expected 5 en docs, got ${rows.length}")
    assert(rows.map(_.getAs[Long]("cum_before")).max == 40L)
    // determinism: same selection on any partitioning
    val again = TextOps.mixtureByTokenBudget(d.repartition(7), Map("en" -> 45L))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == rows.map(_.getAs[Long]("doc_id")).sorted.toSeq)
  }

  test("mixtureTemperature: α·ln(tokens) log-weights, empty langs dropped") {
    val d = docs(
      (1L, "en", "a b c d e f g h"),   // 8 tokens
      (2L, "en", "i j k l m n o p"),   // 8 tokens -> en 16
      (3L, "de", "x y"),               // de 2
      (4L, "fr", ""))                  // 0 tokens -> dropped
    val got = TextOps.mixtureTemperature(d, 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    def lw(n: Long, a: Double) =
      BigDecimal(math.log(n.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * a
    assert(got == Seq(("de", 1L, 2L, lw(2, 0.5)), ("en", 2L, 16L, lw(16, 0.5))))
    // α flattens: the en/de log-weight GAP halves from α=1 to α=0.5
    val flat = TextOps.mixtureTemperature(d, 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val gapFull = flat("en") - flat("de")
    val gapHalf = got.find(_._1 == "en").get._4 - got.find(_._1 == "de").get._4
    assert(math.abs(gapHalf - gapFull / 2) < 1e-9)
    intercept[IllegalArgumentException](TextOps.mixtureTemperature(d, 0.0))
  }

  test("vocabOov: top-V by (count desc, token), per-doc OOV closed form") {
    val d = docs(
      (1L, "en", "a a a b b c"),   // a:3 b:2 c:1
      (2L, "en", "b c c d"),       // b:1 c:2 d:1  → corpus: a:3 b:3 c:3 d:1
      (3L, "en", "d d d"))         // d:3          → corpus: a:3 b:3 c:3 d:4
    // vocabSize=2 → top by count: d(4), then a/b/c tie at 3 → 'a' wins
    // lexicographically; vocab = {d, a}
    val got = TextOps.vocabOov(d, 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"), r.getAs[Double]("oov_rate")))).toMap
    assert(got(1L) == ((6L, 3L, 0.5)))       // b b c OOV
    assert(got(2L) == ((4L, 3L, 0.75)))      // b c c OOV
    assert(got(3L) == ((3L, 0L, 0.0)))
  }

  test("pmiCollocations: closed-form PMI, min-count filter is integer-exact") {
    val d = docs((1L, "en", "x y x y"))
    // tokens x,y,x,y → U=4, x:2, y:2; bigrams (x,y)(y,x)(x,y) → B=3
    val got = TextOps.pmiCollocations(d, minCount = 1L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("c12"), r.getAs[Long]("c1"), r.getAs[Long]("c2"),
          r.getAs[Double]("pmi")))).toMap
    // the cross-engine contract: each ln term of one exact integer
    // rounds to 6, terms sum in exact decimal arithmetic
    def lnT(n: Long): BigDecimal =
      BigDecimal(math.log(n.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def pmi(c12: Long, c1: Long, c2: Long, u: Long, b: Long): Double =
      (lnT(c12) + lnT(u) * 2 - lnT(c1) - lnT(c2) - lnT(b)).toDouble
    assert(got(("x", "y")) == ((2L, 2L, 2L, pmi(2, 2, 2, 4, 3))))
    assert(got(("y", "x")) == ((1L, 2L, 2L, pmi(1, 2, 2, 4, 3))))
    // minCount=2 drops the single-occurrence bigram
    val strict = TextOps.pmiCollocations(d, minCount = 2L).collect()
    assert(strict.map(r => (r.getString(0), r.getString(1))).toSet == Set(("x", "y")))
  }

  test("vocabOov and pmiCollocations match driver-side references on random corpora") {
    val rnd = new scala.util.Random(17)
    val words = (0 until 30).map(i => s"w$i")
    val rows = (1L to 150L).map { id =>
      val n = 2 + rnd.nextInt(15)
      (id, "en", Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
    }
    val d = docs(rows: _*)
    val toks = rows.map { case (id, _, text) => id -> text.split("\\s+").toSeq }.toMap

    // vocabOov reference
    val counts = toks.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(10).map(_._1).toSet
    val oovRef = toks.map { case (id, ts) =>
      val oov = ts.count(t => !vocab.contains(t))
      (id, ts.size.toLong, oov.toLong,
       BigDecimal(oov.toDouble / ts.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val oovGot = TextOps.vocabOov(d, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(oovGot == oovRef)

    // pmi reference — the per-term rounded-ln decimal-sum contract
    val bi = toks.values.flatMap(ts => ts.zip(ts.drop(1))).toSeq
    val biCounts = bi.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val u = toks.values.map(_.size).sum.toLong
    val b = bi.size.toLong
    def lnT(n: Long): BigDecimal =
      BigDecimal(math.log(n.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val pmiRef = biCounts.collect { case ((w1, w2), c12) if c12 >= 3 =>
      val c1 = counts(w1).toLong
      val c2 = counts(w2).toLong
      (w1, w2, c12, c1, c2,
       (lnT(c12) + lnT(u) * 2 - lnT(c1) - lnT(c2) - lnT(b)).toDouble)
    }.toSet
    val pmiGot = TextOps.pmiCollocations(d, minCount = 3L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("c12"),
        r.getAs[Long]("c1"), r.getAs[Long]("c2"), r.getAs[Double]("pmi"))).toSet
    assert(pmiGot == pmiRef)
  }

  test("spanClusters finds cross-doc boilerplate spans, linear output") {
    val header = "this content is provided under license terms apply"
    val d = docs(
      (1L, "en", s"$header alpha beta gamma delta epsilon"),
      (2L, "en", s"$header totally different body about boats"),
      (3L, "en", s"$header $header"), // repeats IN-doc: counts once
      (4L, "en", "no shared phrasing here at all whatsoever today"))
    val out = TextOps.spanClusters(d, k = 5, minDocs = 2).collect()
    // the 8-token header yields 4 distinct 5-gram spans, each carried
    // by docs {1,2,3} -> n_docs = 3 (doc 3's repetition NOT double-
    // counted), first carrier = 1
    val headerSpans = TextOps.shinglesOf(TextOps.tokensOf(header), 5)
    assert(headerSpans.length == 4)
    headerSpans.foreach { sp =>
      val row = out.find(_.getAs[String]("span") == sp)
      assert(row.isDefined, s"span '$sp' not clustered")
      assert(row.get.getAs[Long]("n_docs") == 3L, s"'$sp': ${row.get}")
      assert(row.get.getAs[Long]("first_doc") == 1L)
    }
    // nothing from the singleton doc; no span below minDocs
    assert(out.forall(_.getAs[Long]("n_docs") >= 2L))
    assert(!out.exists(_.getAs[String]("span").contains("whatsoever")))
    // doc 3's wrap-around spans (…apply this…) exist only in doc 3
    // -> filtered; output is exactly the 4 header spans
    assert(out.length == headerSpans.length, out.mkString("; "))
    intercept[IllegalArgumentException](TextOps.spanClusters(d, k = 0))
    intercept[IllegalArgumentException](TextOps.spanClusters(d, minDocs = 1))
  }

  test("stripBoilerplate removes covered tokens position-wise, keeps the body") {
    val header = "this content is provided under license terms apply" // 8 toks
    val d = docs(
      (1L, "en", s"$header alpha beta gamma delta epsilon"),
      (2L, "en", s"boats sail far $header"),
      (3L, "en", s"$header"),
      (4L, "en", "no shared phrasing here at all whatsoever today"))
    val out = TextOps.stripBoilerplate(d, k = 5, minDocs = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
         r.getAs[String]("clean_text"))).toMap
    // the header's 4 overlapping 5-grams cover all 8 header tokens —
    // union of covers, not per-match deletion
    assert(out(1L) == (13L, 8L, "alpha beta gamma delta epsilon"), out(1L).toString)
    assert(out(2L) == (11L, 8L, "boats sail far"), out(2L).toString)
    assert(out(3L) == (8L, 8L, ""), out(3L).toString)
    // untouched doc passes through token-reassembled, nothing removed
    assert(out(4L) == (8L, 0L, "no shared phrasing here at all whatsoever today"))
    // idempotence: stripping the stripped corpus removes nothing more
    val again = TextOps.stripBoilerplate(
      TextOps.stripBoilerplate(d, 5, 3)
        .select(col("doc_id"), col("clean_text").as("text")), 5, 3)
      .collect()
    assert(again.forall(_.getAs[Long]("n_removed") == 0L))
  }

  test("stripMarkup removes tags, collapses whitespace, counts what it cut") {
    val d = docs(
      (1L, "en", "<p>a  <b>bold</b> move</p>"),
      (2L, "en", "no markup at all"),
      (3L, "en", "<br><br>  <div class=\"x\">only tags</div>"))
    val out = TextOps.stripMarkup(d)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tags"), r.getAs[String]("clean_text"))).toMap
    assert(out(1L) == (4L, "a bold move"))
    assert(out(2L) == (0L, "no markup at all"))
    assert(out(3L) == (4L, "only tags"))
  }

  test("packShards: contiguous per-language shards of ~budget tokens") {
    val d = docs((1L to 10L).map(i =>
      (i, "en", Seq.fill(30)("w").mkString(" "))): _*)  // 10 docs x 30 tokens
    val out = TextOps.packShards(d, 100L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    // exclusive prefix sums 0,30,...,270 -> shard = cum/100
    assert(out == (1L to 10L).map(i => i -> ((i - 1) * 30 / 100)).toMap)
    // every doc is assigned; shards are consecutive from 0
    val shards = out.values.toSeq.distinct.sorted
    assert(shards == (0L to shards.max).toSeq)
  }

  test("packSequences: doc spans cover the token stream, split at seqLen boundaries") {
    // 10 docs x 30 tokens, seqLen 64: doc i starts at (i-1)*30
    val d = docs((1L to 10L).map(i =>
      (i, "en", Seq.fill(30)("w").mkString(" "))) :+ (11L, "en", ""): _*)
    val rows = TextOps.packSequences(d, 64).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("tok_start"), r.getAs[Long]("seq_first"), r.getAs[Long]("seq_last"))))
      .toMap
    assert(!rows.contains(11L)) // empty docs never enter the stream
    (1L to 10L).foreach { i =>
      val start = (i - 1) * 30
      assert(rows(i) == ((start, start / 64, (start + 29) / 64)), s"doc $i: ${rows(i)}")
    }
    // spans tile the stream: consecutive docs abut (start + 30 = next start)
    // and a doc crossing a 64-boundary spans two sequences (doc 3: 60..89)
    assert(rows(3L) == ((60L, 0L, 1L)))
  }

  test("dedupLines keeps first occurrences in order, counts the cut") {
    val d = docs(
      (1L, "en", "nav\nbody one\nnav\nbody two\nnav"),   // repeated nav bar
      (2L, "en", "only line"),                            // nothing to cut
      (3L, "en", "a\n\nb\n\na"),                          // EMPTY lines are EXEMPT (r12)
      (4L, "en", ""))                                     // empty doc: 1 empty line
    val out = TextOps.dedupLines(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 5L, 3L, "nav\nbody one\nbody two")))
    assert(out(1) == ((2L, 1L, 1L, "only line")))
    // empty lines are paragraph separators, never boilerplate: both
    // blanks survive, only the repeated "a" is cut
    assert(out(2) == ((3L, 5L, 4L, "a\n\nb\n")))
    assert(out(3) == ((4L, 1L, 1L, "")))
  }

  test("c4Clean applies the line and page rules") {
    val d = docs(
      // keeps: fox line + ok line; drops: short, no-punct, javascript
      (1L, "en", "The quick brown fox jumps over the lazy dog.\nBuy now\n" +
        "this line has many words but no terminal punctuation\n" +
        "Please enable javascript to continue browsing.\nAnother fine sentence stays here."),
      (2L, "en", "One good sentence that would pass the rules.\nlorem ipsum dolor"), // page flag
      (3L, "en", "A config snippet { like json } kills the page entirely.\nGood line again."), // brace
      (4L, "en", "Too short.\n\"A quoted sentence also counts as terminal.\""))
    val out = TextOps.c4Clean(d, minWords = 3, minKeptLines = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4)))
    assert(out(0) == ((1L, 5L, 2L, true,
      "The quick brown fox jumps over the lazy dog.\nAnother fine sentence stays here.")))
    // lorem-ipsum page: the good line survives LINE rules but the PAGE is dropped
    assert(out(1) == ((2L, 2L, 1L, false, "One good sentence that would pass the rules.")))
    // curly brace anywhere kills the page even though both lines pass
    assert(out(2)._4 == false && out(2)._3 == 2L)
    // "Too short." fails minWords=3; the quoted line's closing " is terminal
    assert(out(3) == ((4L, 2L, 1L, false, "\"A quoted sentence also counts as terminal.\"")))
  }

  test("c4Clean: a page containing only a closing brace is dropped (C4 curly rule)") {
    val d = docs(
      (1L, "en", "End of snippet } trailing prose stays readable.\nA second proper sentence here."),
      (2L, "en", "A clean page with one good sentence.\nAnd a second one to pass the gate."))
    val out = TextOps.c4Clean(d, minWords = 3, minKeptLines = 2)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out == Map(1L -> false, 2L -> true), s"got $out")
  }

  test("langId and qualityScore markers match case-insensitively") {
    // sentence-initial capitals — the highest-frequency markers on
    // any real cased corpus; case-sensitive matching scored these 0
    val d = docs((1L, "en", "The cat sat. A dog ran. Of course. And then."),
                 (2L, "es", "El perro. La casa. De nada. Y entonces."))
    val lid = TextOps.langId(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getString(5))).toMap
    assert(lid(1L)._1 == 4L && lid(1L)._3 == "en", s"got ${lid(1L)}")
    assert(lid(2L)._2 == 4L && lid(2L)._3 == "es", s"got ${lid(2L)}")
    val sr = TextOps.qualityScore(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(sr(1L) > 0.0, s"stop_ratio must see 'The/A/Of/And': got ${sr(1L)}")
  }

  test("qualityNtile approx path keeps NULL-lang documents (null-safe cuts join)") {
    val d = Seq((1L, null.asInstanceOf[String], "one two three four five"),
                (2L, null.asInstanceOf[String], "alpha beta gamma delta"),
                (3L, "en", "the quick brown fox jumps"))
      .map { case (id, lang, t) => (id, lang, t.length.toLong, t) }
      .toDF("doc_id", "lang", "n_chars", "text")
    val exact = TextOps.qualityNtile(d, 2).collect().map(_.getLong(0)).toSet
    val approx = TextOps.qualityNtile(d, 2, relErr = 0.01).collect().map(_.getLong(0)).toSet
    assert(exact == Set(1L, 2L, 3L) && approx == exact,
      s"relErr must not change WHICH rows exist: exact=$exact approx=$approx")
  }

  test("bm25TopK on an all-token-less corpus returns the empty top-k, not NaN rows") {
    val d = docs((1L, "en", ""), (2L, "en", "   "), (3L, "en", "\t"))
    assert(TextOps.bm25TopK(d, Seq("fox"), 5).collect().isEmpty)
  }

  test("gopherRules evaluates each rule with integer arithmetic") {
    // 61 words (8x7 + 5), all eight stopwords, mean word length 3.3
    val good = ("the cat sat to be of and mattress " * 7).trim + " that dogs have with him"
    val d = docs(
      (1L, "en", good),
      (2L, "en", "short text"),                             // fails word count + stopwords
      (3L, "en", good + " ##### ##### ..."),                // 11 symbols vs 64 words -> symbol ratio fails
      (4L, "en", good + " " + ("42 7 9 13 " * 6).trim),     // 24 digit words in 85 -> alpha ratio fails
      (5L, "en", ""))                                       // empty: n_words 0
    val out = TextOps.gopherRules(d, minWords = 50).orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_symbols"), r.getAs[Long]("n_stopwords"),
         r.getAs[Boolean]("ok_symbol_ratio"), r.getAs[Boolean]("ok_alpha_ratio"),
         r.getAs[Boolean]("gopher_keep"))).toMap
    assert(out(1L)._6, s"doc 1 should pass all rules: ${out(1L)}")
    assert(out(1L)._3 == 8L) // all eight stopwords present, counted once each
    assert(out(2L) == ((2L, 0L, 0L, true, true, false)))
    assert(out(3L)._2 == 11L && !out(3L)._4 && !out(3L)._6)
    assert(!out(4L)._5 && !out(4L)._6)
    assert(out(5L) == ((0L, 0L, 0L, true, true, false))) // 0 words: mean-len + count fail, no 0/0
  }

  test("charEntropy: closed form on uniform and constant strings") {
    val d = docs(
      (1L, "en", "aaaa"),   // constant: exactly 0 nats
      (2L, "en", "aabb"),   // uniform over 2 chars: ln 2
      (3L, "en", "abcd"),   // uniform over 4: ln 4
      (4L, "en", ""))       // char-less: excluded
    def ln6(x: Double) =
      BigDecimal(math.log(x)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = TextOps.charEntropy(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.size == 3 && !out.contains(4L))
    assert(out(1L) == ((4L, 1L, 0.0))) // N*ln6(N)/N cancels exactly (division by 4 is exact)
    assert(out(2L)._1 == 4L && out(2L)._2 == 2L)
    assert(math.abs(out(2L)._3 - ln6(2.0)) < 1e-9, s"H(aabb): ${out(2L)}")
    assert(math.abs(out(3L)._3 - ln6(4.0)) < 1e-9, s"H(abcd): ${out(3L)}")
    // ordering: more uniform = higher entropy
    assert(out(1L)._3 < out(2L)._3 && out(2L)._3 < out(3L)._3)
  }

  test("splitAssign: scramble-mod buckets, stable under corpus growth") {
    val d = docs((1L to 200L).map(i => (i, "en", "w")): _*)
    val out = TextOps.splitAssign(d, 90, 5).collect()
      .map(r => (r.getAs[Long]("doc_id"),
                 r.getAs[Long]("bucket"), r.getAs[String]("split"))).toSeq
    out.foreach { case (id, bucket, split) =>
      assert(bucket == ((id * 9973 + 12345) % 1000003) % 100)
      val expect = if (bucket < 90) "train" else if (bucket < 95) "val" else "test"
      assert(split == expect, s"doc $id bucket $bucket -> $split")
    }
    assert(out.map(_._3).distinct.toSet == Set("train", "val", "test"))
    // growth stability: the same doc keeps its split in a larger corpus
    val grown = TextOps.splitAssign(docs((1L to 400L).map(i => (i, "en", "w")): _*), 90, 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    out.foreach { case (id, _, split) => assert(grown(id) == split) }
    // invalid percentages fail fast
    intercept[IllegalArgumentException](TextOps.splitAssign(d, 96, 5))
    intercept[IllegalArgumentException](TextOps.splitAssign(d, 0, 5))
  }

  test("sourceCap keeps the k longest per source, ties to lowest id") {
    val d = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 20L), (4L, "a", 30L),
      (5L, "b", 5L)
    ).toDF("doc_id", "source", "n_chars")
    val out = TextOps.sourceCap(d, 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rk"))).toMap
    // source a: 30-ties break to id 2 then 4; source b: lone doc
    assert(out == Map(2L -> 1L, 4L -> 2L, 5L -> 1L), out.toString)
    intercept[IllegalArgumentException](TextOps.sourceCap(d, 0))
  }

  // driver-side BPE reference: same greedy (count desc, pair asc)
  // rule over an in-memory vocab — the equality oracle for bpeTrain.
  // The tie-break compares UTF-8 bytes unsigned, matching Spark's
  // binary string collation (Java String compare diverges on
  // supplementary-plane vs U+E000..FFFF text)
  private def u8(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val pairOrd: Ordering[((String, String), Long)] = new Ordering[((String, String), Long)] {
    def compare(x: ((String, String), Long), y: ((String, String), Long)): Int = {
      val byCnt = java.lang.Long.compare(y._2, x._2) // count desc
      if (byCnt != 0) byCnt
      else {
        val byA = java.util.Arrays.compareUnsigned(u8(x._1._1), u8(y._1._1))
        if (byA != 0) byA else java.util.Arrays.compareUnsigned(u8(x._1._2), u8(y._1._2))
      }
    }
  }
  private def bpeReference(words: Seq[String], nMerges: Int,
                           minPairCount: Long): Seq[(String, String, Long)] = {
    var vocab: Map[IndexedSeq[String], Long] = words.groupBy(identity).view
      .map { case (w, ws) => TextOps.bpeBaseSymbols(w) -> ws.length.toLong }.toMap
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var done = false
    while (!done && merges.length < nMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      val eligible = counts.filter(_._2 >= minPairCount)
      if (eligible.isEmpty) done = true
      else {
        val ((a, b), cnt) = eligible.toSeq.min(pairOrd)
        merges += ((a, b, cnt))
        vocab = vocab.toSeq.map { case (syms, c) => TextOps.bpeMergeOnce(syms, a, b) -> c }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    merges.toSeq
  }

  test("bpeTrain learns the classic merges and matches the reference rule") {
    // the standard BPE walkthrough corpus: low x5, lower x2,
    // newest x6, widest x3 — first merges are (e,s) 9 then (es,t) 9
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val d = docs((1L, "en", words.mkString(" ")))
    val got = TextOps.bpeTrain(d, 4, 1L)
    assert(got.take(2) == Seq(("e", "s", 9L), ("es", "t", 9L)), got.toString)
    assert(got == bpeReference(words, 4, 1L), s"got $got")
    // the learned merges segment an unseen word by shared subwords
    val merges = got.map(m => (m._1, m._2))
    assert(TextOps.bpeSegmentOf("newest", merges).contains("est"))
    // minPairCount stops training when no pair qualifies
    val tiny = docs((1L, "en", "ab cd"))
    assert(TextOps.bpeTrain(tiny, 10, 2L).isEmpty)
    assert(TextOps.bpeTrain(tiny, 10, 1L).nonEmpty)
  }

  test("bpeTrain equals the reference on random corpora") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      val words = Seq.fill(60)(Seq.fill(2 + rnd.nextInt(5))(
        ('a' + rnd.nextInt(4)).toChar).mkString)
      val d = docs((1L, "en", words.mkString(" ")))
      assert(TextOps.bpeTrain(d, 5, 2L) == bpeReference(words, 5, 2L), s"trial $trial")
    }
  }

  test("bpeMergeBatch equals folding bpeMergeOnce in any order for disjoint pairs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 20) {
      // random symbol stream over a..h, random disjoint pair set over
      // the same alphabet (including possible self-pairs like (c,c))
      val syms = IndexedSeq.fill(3 + rnd.nextInt(20))(('a' + rnd.nextInt(8)).toChar.toString)
      val letters = rnd.shuffle(('a' to 'h').map(_.toString).toVector)
      val pairs = letters.grouped(2).take(1 + rnd.nextInt(3)).map {
        case Vector(a, b) => if (rnd.nextBoolean()) (a, b) else (a, a)
        case v            => (v.head, v.head)
      }.toSeq
      val batch = TextOps.bpeMergeBatch(syms, pairs)
      for (perm <- pairs.permutations.take(6)) {
        val folded = perm.foldLeft(syms) { case (s, (a, b)) => TextOps.bpeMergeOnce(s, a, b) }
        assert(batch == folded, s"trial $trial syms=$syms pairs=$pairs perm=$perm")
      }
    }
    // overlapping pairs refuse loudly
    intercept[IllegalArgumentException](
      TextOps.bpeMergeBatch(IndexedSeq("a", "b", "c"), Seq(("a", "b"), ("b", "c"))))
    // r13: member-DISJOINT but CHAINED — (a,b) mints "ab", which is
    // (ab,c)'s left member; a sequential fold turns [a,b,c] into
    // [abc] while the one scan yields [ab,c]. Order-dependent, so the
    // batch must refuse loudly rather than silently pick one answer.
    val e = intercept[IllegalArgumentException](
      TextOps.bpeMergeBatch(IndexedSeq("a", "b", "c"), Seq(("a", "b"), ("ab", "c"))))
    assert(e.getMessage.contains("interact"))
    // product-product collisions stay legal (they cannot feed each
    // other): both orders and the one scan agree
    assert(TextOps.bpeMergeBatch(IndexedSeq("a", "bc"), Seq(("a", "bc"), ("ab", "c")))
      == IndexedSeq("abc"))
  }

  test("bpeTrainBatched: k=1 is bit-identical to bpeTrain; k>1 matches on disjoint corpora in ~k× fewer rounds") {
    // batchK = 1 must reproduce sequential training exactly, rounds = merges+final probe
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val d = docs((1L, "en", words.mkString(" ")))
    val seq4 = TextOps.bpeTrain(d, 4, 1L)
    val (bat1, rounds1) = TextOps.bpeTrainBatched(d, 4, 1L, batchK = 1)
    assert(bat1 == seq4)
    assert(rounds1 == 4)
    // a corpus whose top pairs are symbol-disjoint: batched == sequential
    // while counting rounds drop ~k×. Word frequencies order the pairs
    // (ab 9, cd 7, ef 5, gh 3), all disjoint.
    val dw = docs((1L, "en", (Seq.fill(9)("ab") ++ Seq.fill(7)("cd") ++
      Seq.fill(5)("ef") ++ Seq.fill(3)("gh")).mkString(" ")))
    val seqM = TextOps.bpeTrain(dw, 4, 1L)
    val (batM, roundsM) = TextOps.bpeTrainBatched(dw, 4, 1L, batchK = 4)
    assert(batM == seqM, s"batched $batM vs sequential $seqM")
    assert(roundsM == 1, s"4 disjoint merges should need 1 counting round, took $roundsM")
    // conflict stops the batch: with every candidate chained (a,b),(ab,c)…
    // each round commits exactly one merge, like sequential
    val chain = docs((1L, "en", Seq.fill(6)("aaaa").mkString(" ")))
    val (batC, _) = TextOps.bpeTrainBatched(chain, 3, 1L, batchK = 8)
    assert(batC == TextOps.bpeTrain(chain, 3, 1L))
  }

  test("bpeMergeOnce is left-to-right non-overlapping") {
    assert(TextOps.bpeMergeOnce(IndexedSeq("a", "a", "a"), "a", "a") == IndexedSeq("aa", "a"))
    assert(TextOps.bpeMergeOnce(IndexedSeq("a", "a", "a", "a"), "a", "a") ==
      IndexedSeq("aa", "aa"))
    assert(TextOps.bpeMergeOnce(IndexedSeq("x"), "a", "b") == IndexedSeq("x"))
  }

  test("BPE segments by codepoint: supplementary-plane chars stay whole symbols") {
    val gclef = new String(Character.toChars(0x1D11E)) // non-BMP, 2 UTF-16 units
    assert(TextOps.bpeBaseSymbols(s"a${gclef}b") == IndexedSeq("a", gclef, "b"))
    // training on emoji-bearing words produces whole-codepoint merges
    // (a code-unit split would emit lone surrogates that corrupt
    // through UTF8String), and agrees with the driver reference
    val words = Seq.fill(4)(s"x$gclef") ++ Seq.fill(2)(s"y$gclef")
    val d = docs((1L, "en", words.mkString(" ")))
    val got = TextOps.bpeTrain(d, 2, 1L)
    assert(got == bpeReference(words, 2, 1L), got.toString)
    assert(got.head == (("x", gclef, 4L)), got.toString)
    got.foreach { case (a, b, _) =>
      val s = a + b // no lone surrogates: UTF-8 round-trip is lossless
      assert(new String(s.getBytes("UTF-8"), "UTF-8") == s,
        s"lone surrogate in merge ($a, $b)")
    }
    // segmentation of the merged vocab matches pair-stats arithmetic:
    // both count the codepoint pair, not the code-unit pair
    val stats = TextOps.bpePairStats(d, 1L).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")) -> r.getAs[Long]("cnt")).toMap
    assert(stats(("x", gclef)) == 4L && stats(("y", gclef)) == 2L, stats.toString)
  }

  test("splitAssign buckets negative ids into [0, 100)") {
    val d = Seq(-10L, -1L, -999L, 5L).map(i => (i, "en", 1L, "w"))
      .toDF("doc_id", "lang", "n_chars", "text")
    val out = TextOps.splitAssign(d, 90, 5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bucket")).toMap
    out.foreach { case (id, b) => assert(b >= 0 && b < 100, s"doc $id bucket $b") }
  }

  test("bpePairStats: weighted adjacent-pair counts over the vocab") {
    // "ab ab cd" + "ab" -> words: ab x3, cd x1
    val d = docs((1L, "en", "ab ab cd"), (2L, "en", "ab"))
    val out = TextOps.bpePairStats(d, 1L)
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
        r.getAs[Long]("cnt")).toMap
    assert(out == Map(("a", "b") -> 3L, ("c", "d") -> 1L), out.toString)
    // multiplicity inside one word counts every adjacent position;
    // single-char words contribute nothing
    val rep = docs((1L, "en", "aaa x"))
    val got = TextOps.bpePairStats(rep, 1L).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")) -> r.getAs[Long]("cnt")).toMap
    assert(got == Map(("a", "a") -> 2L), got.toString)
    // minCount filter is integer-exact
    assert(TextOps.bpePairStats(d, 2L).collect().map(r =>
      (r.getAs[String]("a"), r.getAs[String]("b"))).toSet == Set(("a", "b")))
  }

  test("qualityScore: token-less docs carry NULL quality, never a div-by-zero abort") {
    // Spark 4 default ANSI mode turns x/0 into a whole-job abort —
    // the nullif guard must propagate NULL instead (DuckDB's x/0
    // semantics, so the oracle agrees)
    val docs = Seq(
      (1L, "en", "hello world the and", 19L),
      (2L, "en", "", 0L),
      (3L, "en", "   ", 3L))
      .toDF("doc_id", "lang", "text", "n_chars")
    val out = TextOps.qualityScore(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(3) > 0.0)
    assert(out(2L).isNullAt(2) && out(2L).isNullAt(3),
      "empty doc: NULL stop_ratio and quality")
    assert(out(3L).isNullAt(3), "whitespace-only doc: NULL quality")
  }

  test("c4Clean keeps CRLF pages (trailing \\r stripped before the line rules)") {
    val crlf = Seq((1L, "This is a good long sentence.\r\nAnother good long sentence.\r\n",
        "en", "s", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val row = TextOps.c4Clean(crlf, minWords = 3, minKeptLines = 1).collect().head
    assert(row.getLong(2) == 2L, s"both CRLF lines must pass, got $row")
    assert(row.getBoolean(3), "CRLF page must be keepable")
    assert(!row.getString(4).contains("\r"), "clean output sheds the CRs")
  }

  test("LSH banding rejects a rowsPerBand that does not divide the signature") {
    val docs = Seq((1L, "a b c", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    intercept[IllegalArgumentException] {
      Dedup.minhashLshPairs(spark, docs, rowsPerBand = 5).collect()
    }
    intercept[IllegalArgumentException] {
      Dedup.minhashLshPairs(spark, docs, rowsPerBand = 32).collect()
    }
  }
}
