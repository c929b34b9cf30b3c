"""Non-degeneracy + round-trip guarantees for span_corruption_pairs.

The DuckDB oracle proves cross-engine equality; these tests prove the
synthesis itself is meaningful (CLAUDE.md rule: an oracle can pass on a
degenerate column and prove nothing):

- masking actually fires on a nontrivial share of documents,
- sentinels are well-formed and ordinally dense per doc,
- the (input, target) pair reconstructs the ORIGINAL token stream exactly
  — splice each target span back over its sentinel and compare.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from harvester_spark.analysis import tokens_column
from harvester_spark.operators.training_prep import (
    SPAN_LEN,
    span_corruption_pairs,
)
from tests.conftest import SF_DIR

_SENT = re.compile(r"^<extra_id_(\d+)>$")


def _reconstruct(input_text: str, target_text: str) -> list[str]:
    spans: dict[int, list[str]] = {}
    cur = None
    for tok in target_text.split():
        m = _SENT.match(tok)
        if m:
            cur = int(m.group(1))
            spans[cur] = []
        else:
            spans[cur].append(tok)
    out: list[str] = []
    for tok in input_text.split() if input_text else []:
        m = _SENT.match(tok)
        out.extend(spans[int(m.group(1))] if m else [tok])
    return out


def test_span_corruption_round_trip_and_nondegenerate(spark):
    pairs = {
        r["doc_id"]: r
        for r in span_corruption_pairs(spark, SF_DIR).collect()
    }
    orig = {
        r["doc_id"]: r["toks"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", tokens_column(F.col("text")).alias("toks"))
        .collect()
    }
    assert set(pairs) == set(orig)

    masked_docs = 0
    for doc_id, row in pairs.items():
        toks = orig[doc_id]
        assert _reconstruct(row["input_text"], row["target_text"]) == toks
        n_sent_in = sum(1 for t in row["input_text"].split() if _SENT.match(t))
        sent_ids = [
            int(_SENT.match(t).group(1))
            for t in row["target_text"].split()
            if _SENT.match(t)
        ]
        # ordinally dense 0..n-1, one target span per input sentinel
        assert sent_ids == list(range(n_sent_in))
        assert row["n_masked"] == SPAN_LEN * n_sent_in
        if n_sent_in:
            masked_docs += 1
            assert row["n_masked"] <= len(toks)

    # ~15% of blocks selected → essentially every 100+-token doc has a span;
    # require a clear majority so a silently-degenerate hash can't pass.
    assert masked_docs > len(pairs) * 0.5
