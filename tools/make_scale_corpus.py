#!/usr/bin/env python3
"""Build the SCALING.md probe corpora (dev tool, driver-side only).

Usage: python3 tools/make_scale_corpus.py <k> <outDir> [--mode cipher|heaps|zipf]

Three modes. cipher and heaps replicate the base corpus, salting doc_id
by +5000*copy with copy 0 kept as the identity so the 1x structure
survives verbatim; zipf synthesizes a similarity-probe corpus from
scratch (see zipf_corpus):

cipher (default, the round-11 method): each copy's text mapped through
a per-copy seeded random alphabet PERMUTATION over [a-zA-Z]
(26!-keyspace isomorphism: preserves lengths, word shapes, and
gram-frequency distributions; no two copies share a key, so within-copy
duplicate/near-dup structure replicates exactly and cross-copy
similarity vanishes). Caveat measured in round 12: because every copy
re-labels the ENTIRE vocabulary, word/gram TYPE counts grow linearly
with k — real corpora grow them by Heaps' law (V ~ n^0.4-0.6) — so
vocabulary-table-joined operators (q89/q95/q101) probe super-linear on
this corpus for a reason real data doesn't have.

heaps (round-13): vocabulary grows ~ n^0.5 and aggregate token
frequencies are heavy-tailed (Zipf), like real corpora. A single
deterministic POOL of synthetic word shapes is shared by all copies;
for scale k the pool is its first V_k = ceil(V1 * sqrt(k)) words
(V1 = the base corpus's distinct-token count), so the realized
vocabulary across copies is ~V1*sqrt(k) — Heaps beta = 0.5 exactly.
Each copy c >= 1 maps every base token type to a pool word drawn by a
per-(copy, token) seeded Zipf(s=1.1) rank over the pool, so frequent
pool words are shared across copies (heavy head) while the tail stays
rare — the distribution shape the asymmetric PPJoin prefix and
broadcast-vocabulary arguments assume. Within a copy all occurrences
of a token map identically, so within-copy repeat/duplicate structure
is preserved up to the (rare, allowed) token-collision. Pool word
shapes are sampled from the base corpus's empirical token-length and
letter distributions so BPE/char-level operators see realistic input.
n_chars is recomputed (heaps changes lengths; cipher preserves them).
"""
import random
import string
import sys

import pyarrow.parquet as pq
import pandas as pd


def base_df():
    return pq.read_table("/root/testdata/sf0.1/documents.parquet").to_pandas()


def cipher_copies(df, k):
    lower, upper = string.ascii_lowercase, string.ascii_uppercase
    copies = []
    for c in range(k):
        cp = df.copy()
        cp["doc_id"] = cp["doc_id"] + 5000 * c
        if c > 0:
            rng = random.Random(1000 + c)
            pl, pu = list(lower), list(upper)
            rng.shuffle(pl)
            rng.shuffle(pu)
            table = str.maketrans(lower + upper, "".join(pl) + "".join(pu))
            cp["text"] = cp["text"].map(lambda t: t.translate(table))
        copies.append(cp)
    return copies


def heaps_pool(n, len_dist, letter_weights):
    """First n words of the deterministic shared pool: shapes sampled
    from the base corpus's token-length / letter distributions, distinct
    by construction (seeded retry on collision)."""
    letters, weights = zip(*letter_weights)
    seen, pool = set(), []
    rng = random.Random(0x9EA5)
    while len(pool) < n:
        ln = rng.choices(
            [l for l, _ in len_dist], weights=[w for _, w in len_dist])[0]
        w = "".join(rng.choices(letters, weights=weights, k=ln))
        if w not in seen:
            seen.add(w)
            pool.append(w)
    return pool


def heaps_copies(df, k):
    import collections
    import itertools
    import math
    toks = df["text"].str.split(" ")
    cnt = collections.Counter(itertools.chain.from_iterable(toks))
    cnt.pop("", None)
    vocab = sorted(cnt)  # stable order -> stable per-token seeds
    v1 = len(vocab)
    vk = max(v1, int(round(v1 * math.sqrt(k))))
    len_cnt = collections.Counter(len(w) for w in vocab)
    len_dist = sorted(len_cnt.items())
    letter_cnt = collections.Counter(ch for w in vocab for ch in w)
    letter_weights = sorted(letter_cnt.items())
    pool = heaps_pool(vk, len_dist, letter_weights)
    # Zipf(s=1.1) CDF over pool ranks, shared by every copy at this scale.
    s = 1.1
    probs = [1.0 / (r + 1) ** s for r in range(vk)]
    tot = sum(probs)
    cdf, acc = [], 0.0
    for p in probs:
        acc += p / tot
        cdf.append(acc)
    import bisect
    copies = []
    for c in range(k):
        cp = df.copy()
        cp["doc_id"] = cp["doc_id"] + 5000 * c
        if c > 0:
            mapping = {}
            for j, w in enumerate(vocab):
                u = random.Random((c << 20) ^ (j * 2654435761) ^ 0x5EED).random()
                mapping[w] = pool[bisect.bisect_left(cdf, u)]
            cache = {}

            def tr(t, m=mapping, cache=cache):
                r = cache.get(t)
                if r is None:
                    r = " ".join(m.get(x, x) for x in t.split(" "))
                    cache[t] = r
                return r

            cp["text"] = cp["text"].map(tr)
        copies.append(cp)
    return copies


def zipf_corpus(df, k):
    """Scratch corpus for similarity-join probes (q32): n = 5000*k docs of
    iid Zipf(s=1.05) tokens from a pool of 3000*sqrt(k) word shapes —
    heavy-tailed gram frequencies (rare grams exist, so prefix filters
    have something to select on) at a REALISTIC vocabulary size, unlike
    heaps mode whose tiny pool makes every document near-every-other.
    Every 50th doc is followed by a planted near-dup (5% of tokens
    resubstituted -> 3-gram Jaccard ~ 0.7, above q32's 0.6 threshold), so
    the verify stages have true positives to find. Lengths, langs and
    sources are sampled from the base corpus's empirical distributions."""
    import collections
    import math
    import numpy as np
    rng = np.random.default_rng(0xC0FFEE + k)
    n = 5000 * k
    pool_n = int(3000 * math.sqrt(k))
    # deterministic pool of distinct word shapes (reuse heaps machinery)
    toks = df["text"].str.split(" ")
    vocab = sorted({t for s in toks for t in s if t})
    len_dist = sorted(collections.Counter(len(w) for w in vocab).items())
    letter_weights = sorted(
        collections.Counter(ch for w in vocab for ch in w).items())
    pool = np.array(heaps_pool(pool_n, len_dist, letter_weights))
    probs = 1.0 / np.arange(1, pool_n + 1) ** 1.05
    probs /= probs.sum()
    doc_lens = np.maximum(
        rng.choice([len(s) for s in toks], size=n), 10)
    langs = df["lang"].to_numpy()
    sources = df["source"].to_numpy()
    rows = []
    doc_id = 0
    for i in range(n):
        words = pool[rng.choice(pool_n, size=doc_lens[i], p=probs)]
        rows.append((doc_id, " ".join(words), langs[i % len(langs)],
                     sources[i % len(sources)]))
        doc_id += 1
        if i % 50 == 0:  # planted near-dup: 5% token resubstitution
            dup = words.copy()
            nsub = max(1, len(dup) // 20)
            idx = rng.choice(len(dup), size=nsub, replace=False)
            dup[idx] = pool[rng.choice(pool_n, size=nsub, p=probs)]
            rows.append((doc_id, " ".join(dup), langs[i % len(langs)],
                         sources[i % len(sources)]))
            doc_id += 1
    out = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    out["doc_id"] = out["doc_id"].astype(df["doc_id"].dtype)
    out["n_chars"] = out["text"].str.len().astype(df["n_chars"].dtype)
    return [out]


def main() -> int:
    k, out = int(sys.argv[1]), sys.argv[2]
    mode = "cipher"
    if "--mode" in sys.argv:
        mode = sys.argv[sys.argv.index("--mode") + 1]
    if mode not in ("cipher", "heaps", "zipf"):
        # a typo must not silently build a corpus with different
        # statistics and contaminate a SCALING probe
        raise SystemExit(f"unknown --mode {mode!r}: cipher | heaps | zipf")
    df = base_df()
    copies = (cipher_copies(df, k) if mode == "cipher"
              else heaps_copies(df, k) if mode == "heaps"
              else zipf_corpus(df, k))
    allc = pd.concat(copies, ignore_index=True)
    allc["n_chars"] = allc["text"].str.len().astype(allc["n_chars"].dtype)
    import os
    os.makedirs(out, exist_ok=True)
    allc.to_parquet(f"{out}/documents.parquet", index=False)
    ntypes = len(set(t for s in allc["text"].str.split(" ") for t in s if t))
    print(f"{out}/documents.parquet: {len(allc)} rows ({k} copies, "
          f"mode={mode}, token types={ntypes})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
