#!/usr/bin/env python3
"""Build the SCALING.md probe corpora (dev tool, driver-side only).

Usage: python3 tools/make_scale_corpus.py <k> <outDir>

Unions sf0.1's documents table with itself k times, doc_id salted by
+5000*copy, each copy's text mapped through a per-copy seeded random
alphabet PERMUTATION over [a-zA-Z] (26!-keyspace isomorphism: preserves
lengths, word shapes, and gram-frequency distributions; no two copies
share a key, so within-copy duplicate/near-dup structure replicates
exactly and cross-copy similarity vanishes — the round-11 method, which
replaced the mod-26 Caesar shift that manufactured cross-copy dups at
k >= 26). Copy 0 is the identity so the 1x structure survives verbatim.
"""
import random
import string
import sys

import pyarrow.parquet as pq
import pandas as pd


def main() -> int:
    k, out = int(sys.argv[1]), sys.argv[2]
    df = pq.read_table("/root/testdata/sf0.1/documents.parquet").to_pandas()
    lower, upper = string.ascii_lowercase, string.ascii_uppercase
    copies = []
    for c in range(k):
        cp = df.copy()
        cp["doc_id"] = cp["doc_id"] + 5000 * c
        if c > 0:
            rng = random.Random(1000 + c)
            pl = list(lower)
            pu = list(upper)
            rng.shuffle(pl)
            rng.shuffle(pu)
            table = str.maketrans(lower + upper, "".join(pl) + "".join(pu))
            cp["text"] = cp["text"].map(lambda t: t.translate(table))
        copies.append(cp)
    allc = pd.concat(copies, ignore_index=True)
    import os
    os.makedirs(out, exist_ok=True)
    allc.to_parquet(f"{out}/documents.parquet", index=False)
    print(f"{out}/documents.parquet: {len(allc)} rows ({k} copies)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
