"""Train the frozen BPE merge table committed in harvester_spark/bpe.py.

Classic Sennrich BPE training over the analyzer word-frequency table of a
documents parquet: count adjacent symbol pairs weighted by word frequency,
merge the most frequent pair (ties: lexicographically smallest pair), repeat
N times. Deterministic — rerunning on the same corpus reproduces the
committed table exactly.

Usage: python tools/train_bpe.py [/root/testdata/sf0.01/documents.parquet] [n_merges]
"""

from __future__ import annotations

import collections
import sys


def train(parquet_path: str, n_merges: int = 64) -> list[tuple[str, str]]:
    import duckdb

    con = duckdb.connect()
    words = [
        r[0]
        for r in con.sql(
            "WITH t AS (SELECT unnest(string_split_regex(lower(text), '\\W+')) AS w "
            f"FROM read_parquet('{parquet_path}')) SELECT w FROM t WHERE w <> ''"
        ).fetchall()
    ]
    vocab = collections.Counter(tuple(w) for w in words)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        a, b = best
        new_vocab: collections.Counter = collections.Counter()
        for sym, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    return merges


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01/documents.parquet"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    print("BPE_MERGES =", train(path, n))
