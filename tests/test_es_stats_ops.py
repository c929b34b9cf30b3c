"""Semantics guards for the ES statistical-agg tail.

What each test pins:
- es_string_stats: entropy respects its information-theoretic bounds
  (0 < H ≤ log2(alphabet)) and is recomputed exactly in pure Python from
  the same char counts — the codec-parity discipline.
- es_mad_boxplot: quartile monotonicity (min ≤ q1 ≤ med ≤ q3 ≤ max), MAD
  nonnegative and ≤ the half-range, and the MAD is recomputed in pure
  Python under the same discrete ceil-rank/tie-break contract.
- es_t_test / events_ks_test: the statistic is recomputed from scratch in
  Python (Welch formula; exact KS over the empirical CDFs) and must agree
  to the integer unit — plus non-degeneracy (the two segments actually
  differ: d_num > 0).
"""

from __future__ import annotations

import math
from collections import Counter

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    from harvester_spark.operators.common import load

    return [
        (r["event_type"], int(round(r["value"] * 100)), int(r["event_id"]))
        for r in load(spark, SF_DIR, "events").collect()
    ]


def test_string_stats_entropy_matches_python(spark):
    from harvester_spark.operators.es_aggs import es_string_stats
    from harvester_spark.operators.common import load

    texts = {}
    for r in load(spark, SF_DIR, "documents").collect():
        texts.setdefault(r["lang"], []).append(r["text"])
    for row in es_string_stats(spark, SF_DIR).collect():
        dist = Counter("".join(texts[row["lang"]]))
        tot = sum(dist.values())
        assert row["total_chars"] == tot
        ent = sum(
            int(round(1e6 * c * math.log(tot / c) / (tot * math.log(2))))
            for c in dist.values()
        )
        assert row["entropy_micro"] == ent
        assert 0 < row["entropy_micro"] <= 1_000_000 * math.log2(len(dist)) + 1


def test_mad_boxplot_bounds_and_python_mad(spark):
    from harvester_spark.operators.es_aggs import es_mad_boxplot

    ev = _events(spark)
    for row in es_mad_boxplot(spark, SF_DIR).collect():
        assert (
            row["min_c"] <= row["q1_c"] <= row["med_c"]
            <= row["q3_c"] <= row["max_c"]
        )
        vals = sorted(
            (c, eid) for t, c, eid in ev if t == row["event_type"]
        )
        n = len(vals)
        med = vals[(n * 50 + 99) // 100 - 1][0]
        assert row["med_c"] == med
        devs = sorted(
            (abs(c - med), eid) for t, c, eid in ev if t == row["event_type"]
        )
        assert row["mad_c"] == devs[(n * 50 + 99) // 100 - 1][0]
        assert 0 <= row["mad_c"] <= row["max_c"] - row["min_c"]


def test_t_test_matches_python_welch(spark):
    from harvester_spark.operators.es_aggs import TT_A, TT_B, es_t_test

    ev = _events(spark)
    a = [c for t, c, _ in ev if t == TT_A]
    b = [c for t, c, _ in ev if t == TT_B]
    m1, m2 = sum(a) / len(a), sum(b) / len(b)
    v1 = sum((x - m1) ** 2 for x in a) / (len(a) - 1)
    v2 = sum((x - m2) ** 2 for x in b) / (len(b) - 1)
    t = (m1 - m2) / math.sqrt(v1 / len(a) + v2 / len(b))
    row = es_t_test(spark, SF_DIR).collect()[0]
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert abs(row["t_micro"] - 1e6 * t) <= 1.0


def test_ks_test_matches_python_exact(spark):
    from harvester_spark.operators.es_aggs import KS_A, KS_B, events_ks_test

    ev = _events(spark)
    a = sorted(c for t, c, _ in ev if t == KS_A)
    b = sorted(c for t, c, _ in ev if t == KS_B)
    na, nb = len(a), len(b)
    best, at = -1, None
    for x in sorted(set(a) | set(b)):
        ca = sum(1 for v in a if v <= x)
        cb = sum(1 for v in b if v <= x)
        d = abs(ca * nb - cb * na)
        if d > best:
            best, at = d, x
    row = events_ks_test(spark, SF_DIR).collect()[0]
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert row["d_num"] == best and row["d_num"] > 0
    assert row["c_at_max"] == at
    assert 0 <= row["d_milli"] <= 1000
