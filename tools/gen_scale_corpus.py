#!/usr/bin/env python3
"""Generate documents/embeddings corpora at several multiples of the
sf0.1 shape, for empirical scaling-exponent measurement (SCALING.md).

Mirrors the driver testdata's observed structure (driver tooling only
— the engine never depends on this script):
  documents: word-salad text over a small vocab; langs en-heavy
    (~41% en, rest ~15% each), 20 uniform sources, ~5% of docs are
    word-perturbed near-copies of a base doc, ~0.2% exact dups.
  embeddings: 64-dim unit vectors around 10 cluster centers.

Three corpus regimes:
  dense (default): the tiny ~45-word vocab makes near-dup density —
    and every pair operator's true OUTPUT — quadratic in corpus size.
    A deliberate stress case.
  sparse (--sparse): 20k-word vocab, ~3% of docs are near-copies of a
    base that is reused at most twice (cluster size <= 3), so near-dup
    PAIR OUTPUT is linear in corpus size — the regime real corpora
    live in. Embeddings likewise: random unit vectors (pairwise cosine
    ~ N(0, 1/64), i.e. std 1/8 — far from any near-dup threshold) plus ~3% tight
    near-copies.
  skew (--skew): the sparse background PLUS one colossal hot cluster —
    30% of all docs are byte-identical copies of ONE text (and ~2%
    near-copies of it), 30% of embeddings tight copies of ONE vector.
    The regime that stresses the rep-collapse and shuffle-hash-pin
    choices: one set_key/fingerprint/band bucket carries a third of
    the corpus, so any plan that sort-merge-buffers a matched group,
    windows over a cluster, or fails to collapse identical sets before
    pair expansion blows up HERE first. Pair OUTPUT is quadratic by
    construction (the hot clique), so time exponents must be read
    against the output exponents — t-exp tracking o-exp means the
    work is output-bound (streamed expansion), t-exp >> o-exp means a
    real hotspot.

Usage: gen_scale_corpus.py OUTDIR MULTIPLE [SEED] [--sparse|--skew]
Writes OUTDIR/documents.parquet and OUTDIR/embeddings.parquet.
"""
import sys, random, math
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("batch part spark line column order small sort fast value scan hash "
         "slow group agg filter query big key window merge stream row data "
         "vector join table disk page cache node task stage plan scan shuffle "
         "broadcast skew salt bucket codec footer stat prune read write").split()
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]

def gen(outdir, mult, seed=42, sparse=False, skew=False):
    rnd = random.Random(seed)
    n_docs = int(5000 * mult)
    n_emb = int(2000 * mult)
    vocab = [f"w{i:05d}" for i in range(20000)] if (sparse or skew) else VOCAB

    doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
    base_texts = []   # dense mode: unbounded reuse (quadratic pairs)
    base_queue = []   # sparse mode: (words, n_reuses), reused <= 2x
    # skew mode: ONE hot base; 30% of docs are byte-identical copies
    # of it, ~2% near-copies (distinct sets in the same band buckets)
    hot_words = [rnd.choice(vocab) for _ in range(60)] if skew else None
    for i in range(n_docs):
        if skew:
            r = rnd.random()
            if r < 0.30:
                words = None
                t = " ".join(hot_words)
            elif r < 0.32:
                words = hot_words[:]
                for j in range(len(words)):
                    if rnd.random() < 0.05:
                        words[j] = rnd.choice(vocab)
            elif base_queue and rnd.random() < 0.03:
                base, reuses = base_queue.pop()
                words = base[:]
                for j in range(len(words)):
                    if rnd.random() < 0.05:
                        words[j] = rnd.choice(vocab)
                if reuses < 1 and rnd.random() < 0.3:
                    base_queue.append((base, reuses + 1))
            else:
                nw = rnd.randint(8, 110)
                words = [rnd.choice(vocab) for _ in range(nw)]
                if rnd.random() < 0.10:
                    base_queue.append((words, 0))
        elif sparse:
            if base_queue and rnd.random() < 0.03:
                # near-dup of a BOUNDED-reuse base: cluster size <= 3,
                # so pair output stays linear in corpus size. Perturb
                # ~5% of words — above the 0.8 unigram-jaccard
                # confirm threshold for all but the shortest docs.
                base, reuses = base_queue.pop()
                words = base[:]
                for j in range(len(words)):
                    if rnd.random() < 0.05:
                        words[j] = rnd.choice(vocab)
                if reuses < 1 and rnd.random() < 0.3:
                    base_queue.append((base, reuses + 1))
            elif texts and rnd.random() < 0.002:
                words = None  # exact dup (uniform over history: O(1)
                t = rnd.choice(texts)  # expected copies per text)
            else:
                nw = rnd.randint(8, 110)
                words = [rnd.choice(vocab) for _ in range(nw)]
                if rnd.random() < 0.10:
                    base_queue.append((words, 0))
        elif base_texts and rnd.random() < 0.05:
            # near-dup: perturb ~10% of a base doc's words
            words = rnd.choice(base_texts)[:]
            for j in range(len(words)):
                if rnd.random() < 0.10:
                    words[j] = rnd.choice(VOCAB)
        elif texts and rnd.random() < 0.002:
            words = None  # exact dup
            t = rnd.choice(texts)
        else:
            nw = rnd.randint(8, 110)
            words = [rnd.choice(VOCAB) for _ in range(nw)]
            if rnd.random() < 0.10 and len(base_texts) < n_docs // 20:
                base_texts.append(words)
        if words is not None:
            t = " ".join(words)
        doc_ids.append(i + 1)
        texts.append(t)
        langs.append(rnd.choices(LANGS, weights=LANG_W)[0])
        sources.append(f"src{rnd.randrange(20)}")
        n_chars.append(len(t))

    pq.write_table(pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    }), f"{outdir}/documents.parquet")

    centers = []
    for c in range(10):
        v = [rnd.gauss(0, 1) for _ in range(64)]
        n = math.sqrt(sum(x * x for x in v))
        centers.append([x / n for x in v])
    vec_ids, embs, labels = [], [], []
    vbase_queue = []  # sparse: bounded-reuse near-dup vector bases
    # skew: 30% of embeddings are tight copies of ONE hot vector
    hot_v = None
    if skew:
        v = [rnd.gauss(0, 1) for _ in range(64)]
        n = math.sqrt(sum(x * x for x in v))
        hot_v = [x / n for x in v]
    for i in range(n_emb):
        if skew:
            if rnd.random() < 0.30:
                v = [x + rnd.gauss(0, 0.005) for x in hot_v]
            else:
                v = [rnd.gauss(0, 1) for _ in range(64)]
            lab = rnd.randrange(10)
        elif sparse:
            # random unit vectors: pairwise cosine ~ N(0, 1/64) —
            # nowhere near any near-dup threshold; ~3% are tight
            # near-copies (sigma 0.02) of a bounded-reuse base
            if vbase_queue and rnd.random() < 0.03:
                base, reuses = vbase_queue.pop()
                v = [x + rnd.gauss(0, 0.02) for x in base]
                if reuses < 1 and rnd.random() < 0.3:
                    vbase_queue.append((base, reuses + 1))
            else:
                v = [rnd.gauss(0, 1) for _ in range(64)]
                if rnd.random() < 0.10:
                    vbase_queue.append((v, 0))
            lab = rnd.randrange(10)
        else:
            lab = rnd.randrange(10)
            v = [c + rnd.gauss(0, 0.25) for c in centers[lab]]
        n = math.sqrt(sum(x * x for x in v))
        vec_ids.append(i + 1)
        embs.append([x / n for x in v])
        labels.append(lab)
    pq.write_table(pa.table({
        "vec_id": pa.array(vec_ids, pa.int64()),
        "embedding": pa.array(embs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), f"{outdir}/embeddings.parquet")

    # events: mirrors the sf0.1 shape (100k rows at 1x) — 5 types,
    # lognormal-ish positive values with a per-type scale, timestamps
    # spread over 5 days so per-day drift windows exist; the "error"
    # type drifts upward over time (a real signal for the monitors)
    n_ev = int(100000 * mult)
    types = ["view", "click", "purchase", "error", "signup"]
    t0_us = 1600000000000000
    ev_ids, tss, uids, etypes, vals, props = [], [], [], [], [], []
    for i in range(n_ev):
        et = types[rnd.randrange(5)]
        ts = t0_us + rnd.randrange(5 * 86400) * 1000000
        v = abs(rnd.gauss(50, 30)) * (1.0 + types.index(et) * 0.2)
        if et == "error":
            v *= 1.0 + (ts - t0_us) / (5 * 86400 * 1000000) * 0.5
        ev_ids.append(i + 1)
        tss.append(ts)
        uids.append(rnd.randrange(max(1, n_ev // 20)) + 1)
        etypes.append(et)
        vals.append(round(v, 2))
        props.append('{"k":%d}' % rnd.randrange(10))
    pq.write_table(pa.table({
        "event_id": pa.array(ev_ids, pa.int64()),
        "ts": pa.array(tss, pa.timestamp("us")),
        "user_id": pa.array(uids, pa.int64()),
        "event_type": pa.array(etypes, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(props, pa.string()),
    }), f"{outdir}/events.parquet")
    print(f"wrote {outdir}: {n_docs} docs, {n_emb} embeddings, {n_ev} events")

if __name__ == "__main__":
    import os
    args = [a for a in sys.argv[1:] if a not in ("--sparse", "--skew")]
    sparse = "--sparse" in sys.argv[1:]
    skew = "--skew" in sys.argv[1:]
    outdir, mult = args[0], float(args[1])
    seed = int(args[2]) if len(args) > 2 else 42
    os.makedirs(outdir, exist_ok=True)
    gen(outdir, mult, seed, sparse, skew)
