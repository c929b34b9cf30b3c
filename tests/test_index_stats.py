"""index_stats operators: codec byte-parity and shard-skew invariants."""

import numpy as np

from harvester_spark.operators.fulltext_queries import BM25_TERMS, ft_postings
from harvester_spark.operators.index_stats import (
    NSHARDS,
    index_shard_skew,
    postings_varbyte_size,
)

SF_DIR = "/root/testdata/sf0.001"


def test_varbyte_size_matches_real_codec_byte_for_byte(spark):
    """The relational estimate must equal len() of the actual
    index/codec.py encode_blocks output — same blocks, same deltas, same
    varbyte — or it is not a codec twin."""
    from harvester_spark.index.codec import encode_blocks

    got = {r["term"]: r for r in postings_varbyte_size(spark, SF_DIR).collect()}
    posts = ft_postings(spark, SF_DIR).collect()
    assert set(got) == set(BM25_TERMS)
    for t in BM25_TERMS:
        rows = sorted((r["doc_id"], r["tf"]) for r in posts if r["term"] == t)
        ids = np.array([d for d, _ in rows], dtype=np.uint64)
        tfs = np.array([tf for _, tf in rows], dtype=np.uint64)
        blocks = encode_blocks(ids, tfs, np.ones(len(ids), dtype=np.float64))
        bytes_docs = sum(len(b[2]) for b in blocks)
        bytes_tfs = sum(len(b[3]) for b in blocks)
        g = got[t]
        assert g["df"] == len(rows)
        assert g["n_blocks"] == len(blocks)
        assert g["bytes_docs"] == bytes_docs, (t, g["bytes_docs"], bytes_docs)
        assert g["bytes_tfs"] == bytes_tfs, (t, g["bytes_tfs"], bytes_tfs)
        assert g["total_bytes"] == bytes_docs + bytes_tfs


def test_block_max_impacts_match_real_codec_bounds(spark):
    """The relational ub_micro must equal the micro-floored
    block_max_impact the real codec stores (impacts from the ONE shared
    bm25.tf_norm kernel) — same blocks, same maxima — or it is not a
    Block-Max WAND metadata twin."""
    from harvester_spark.index.codec import encode_blocks
    from harvester_spark.operators.common import doc_tokens
    from harvester_spark.operators.index_stats import block_max_impacts
    from harvester_spark.search import bm25

    got = {
        (r["term"], r["blk"]): r
        for r in block_max_impacts(spark, SF_DIR).collect()
    }
    dl = {
        r["doc_id"]: r["cnt"]
        for r in doc_tokens(spark, SF_DIR).groupBy("doc_id").count()
        .withColumnRenamed("count", "cnt").collect()
    }
    avgdl = sum(dl.values()) * 1.0 / len(dl)
    posts = ft_postings(spark, SF_DIR).collect()
    seen = set()
    for t in BM25_TERMS:
        rows = sorted((r["doc_id"], r["tf"]) for r in posts if r["term"] == t)
        ids = np.array([d for d, _ in rows], dtype=np.uint64)
        tfs = np.array([tf for _, tf in rows], dtype=np.uint64)
        imps = bm25.tf_norm(
            tfs, np.array([dl[int(d)] for d in ids], dtype=np.float64), avgdl
        )
        blocks = encode_blocks(ids, tfs, imps)
        for bix, (base, n, _, _, max_tf, max_imp) in enumerate(blocks):
            g = got[(t, bix)]
            seen.add((t, bix))
            assert g["base_doc_id"] == base
            assert g["max_doc_id"] == int(ids[bix * 128 : bix * 128 + n][-1])
            assert g["n_postings"] == n
            assert g["max_tf"] == max_tf
            want = int(np.floor(max_imp * 1e6 + 0.5))
            assert g["ub_micro"] == want, (t, bix, g["ub_micro"], want)
    assert seen == set(got)


def test_shard_skew_shares_sum_to_one_and_skew_is_real(spark):
    rows = index_shard_skew(spark, SF_DIR).collect()
    assert 1 < len(rows) <= NSHARDS
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    # a Zipfian term distribution hashed into shards is NOT uniform:
    # at least one shard must be visibly over its fair share
    assert max(r["skew"] for r in rows) > 1.2
    assert all(r["n_terms"] > 0 and r["n_postings"] > 0 for r in rows)
    total = sum(r["n_postings"] for r in rows)
    assert all(abs(r["n_postings"] * NSHARDS / total - r["skew"]) < 1e-3 for r in rows)


def test_roaring_containers_hit_all_three_regimes(spark):
    """The three docID-set classes must each land in a DIFFERENT container
    encoding — otherwise the decision rule is untested by the data: _live
    (contiguous) → run, _sparse (doc_id % 37) → array, flagship postings
    (dense-ish) → bitmap. An all-one-type output would pass the oracle on
    arithmetic alone and prove nothing about the regime switch."""
    from harvester_spark.operators.index_stats import postings_roaring_size

    rows = {r["term"]: r for r in postings_roaring_size(spark, SF_DIR).collect()}
    live, sparse = rows["_live"], rows["_sparse"]
    assert live["n_run"] == live["n_containers"] and live["n_run"] > 0
    assert sparse["n_array"] == sparse["n_containers"] and sparse["n_array"] > 0
    assert any(
        rows[t]["n_bitmap"] > 0 for t in BM25_TERMS
    ), "no flagship container chose bitmap — density regime untested"
    # run containers must be the cheapest possible: 6 bytes each
    assert live["total_bytes"] == 6 * live["n_containers"]


def test_codec_compare_formulas_are_lawful(spark):
    """Cross-codec sanity on the full dictionary: Elias-Fano can never
    exceed varbyte on these dense lists; FOR block cost is lower-bounded
    by its own header; every codec spends at least 1 bit per posting; and
    the EF low-bit derivation length(bin(u DIV n)) - 1 equals
    floor(log2(u/n)) recomputed in Python."""
    import math

    from harvester_spark.operators.index_stats import postings_codec_compare

    rows = postings_codec_compare(spark, SF_DIR).collect()
    assert len(rows) > 10  # whole dictionary, not a term sample
    for r in rows:
        assert r["ef_bits"] >= r["df"]
        assert r["for_bits"] >= 8 * r["n_blocks"] + r["df"]
        assert r["vb_bits"] >= 8 * r["df"]  # varbyte: >= 1 byte per posting
        assert r["ef_bits"] <= r["vb_bits"], r
        assert r["best"] in ("ef", "for", "vb")
    # recompute one EF size end-to-end from the raw postings
    from harvester_spark.operators.common import doc_tokens
    import pyspark.sql.functions as F

    t0 = min(r["term"] for r in rows)
    ids = sorted(
        x["doc_id"]
        for x in doc_tokens(spark, SF_DIR)
        .filter(F.col("term") == t0)
        .select("doc_id")
        .distinct()
        .collect()
    )
    n, u = len(ids), ids[-1] + 1
    l = max(0, math.floor(math.log2(u / n)))
    expect = n * l + n + (u >> l)
    got = {r["term"]: r["ef_bits"] for r in rows}[t0]
    assert got == expect, (t0, got, expect)


def test_maxscore_split_is_safe_and_discriminates(spark):
    """MaxScore safety: a document containing ONLY non-essential terms can
    never reach θ, so skipping those lists as drivers is rank-safe. Verify
    against the brute-force disjunctive scores; require the split itself to
    be non-degenerate (at least one list on each side)."""
    from harvester_spark.operators.fulltext_queries import bm25_or_scored
    from harvester_spark.operators.index_stats import (
        MAXSCORE_K,
        ft_maxscore_split,
    )
    from harvester_spark.operators.common import doc_tokens
    import pyspark.sql.functions as F

    split = {r["term"]: r for r in ft_maxscore_split(spark, SF_DIR).collect()}
    ess = {t for t, r in split.items() if r["essential"]}
    non = set(split) - ess
    assert ess and non, f"degenerate split: {split}"

    scores = {
        r["doc_id"]: r["score"] for r in bm25_or_scored(spark, SF_DIR).collect()
    }
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    theta = ranked[MAXSCORE_K - 1][1]

    # docs whose flagship terms are all non-essential
    toks = (
        doc_tokens(spark, SF_DIR)
        .filter(F.col("term").isin(list(split)))
        .groupBy("doc_id")
        .agg(F.collect_set("term").alias("ts"))
        .collect()
    )
    only_non = [r["doc_id"] for r in toks if set(r["ts"]) <= non]
    assert only_non, "no doc exercises the non-essential-only case"
    worst = max(scores[d] for d in only_non)
    # micro-unit floors can understate each UB by < 1e-6
    assert worst <= theta + len(non) * 1e-6, (worst, theta)


def test_zipf_slope_matches_integer_least_squares(spark):
    """Recompute the fit from the raw collection frequencies with the same
    milli-nat integer pipeline in plain Python — the operator must match
    EXACTLY (the whole point of the integer-division rounding), and the
    slope must be negative (frequency falls with rank)."""
    import math

    from harvester_spark.operators.common import doc_tokens
    from harvester_spark.operators.index_stats import ft_zipf_slope
    import pyspark.sql.functions as F

    row = ft_zipf_slope(spark, SF_DIR).collect()[0]
    cf = sorted(
        (
            (r["cf"], r["term"])
            for r in doc_tokens(spark, SF_DIR)
            .groupBy("term")
            .agg(F.count("*").alias("cf"))
            .collect()
        ),
        key=lambda t: (-t[0], t[1]),
    )
    xs = [math.floor(math.log(i + 1) * 1e3 + 0.5) for i in range(len(cf))]
    ys = [math.floor(math.log(c) * 1e3 + 0.5) for c, _ in cf]
    n = len(cf)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    if num >= 0:
        slope = (num * 1_000_000 + den // 2) // den
    else:
        slope = -((-num * 1_000_000 + den // 2) // den)
    assert row["n_terms"] == n
    assert row["slope_micro"] == slope
    assert row["slope_micro"] < 0
    assert row["intercept_milli"] == (sy * 1_000_000 - slope * sx) // (n * 1_000_000)


def test_pef_exact_recompute_and_clustered_win(spark, tmp_path):
    """Partitioned Elias-Fano guard, two legs:

    1. Exact Python recompute of the whole bucket rollup at sf0.001 —
       every bit count (blocking, rebasing, low-bit widths, headers) is
       integer arithmetic, so equality is exact.
    2. A synthesized corpus where a term's postings are two dense runs at
       opposite ends of a 4096-doc universe: local rebasing MUST make PEF
       beat plain EF there (pef_wins >= 1). The driver corpus is too
       dense for PEF to ever win, so without this leg the win branch
       (and the whole point of partitioning) would be dead code.
    """
    import math
    from collections import defaultdict

    import pandas as pd

    from harvester_spark.operators.index_stats import (
        BLOCK,
        PEF_HEADER_BITS,
        postings_pef_size,
    )

    def ef_bits(n, u):
        l = max(0, math.floor(math.log2(u / n)))
        return n * l + n + (u >> l)

    def pef_bits(ids):
        total, base = 0, 0
        for s in range(0, len(ids), BLOCK):
            blk = ids[s : s + BLOCK]
            u_b = blk[-1] - base + 1
            total += ef_bits(len(blk), u_b) + PEF_HEADER_BITS
            base = blk[-1] + 1
        return total

    # --- leg 1: exact recompute on the real corpus
    import re

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    tok = re.compile(r"\W+", re.ASCII)
    postings: dict[str, set] = defaultdict(set)
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        for t in set(x for x in tok.split(text.lower()) if x):
            postings[t].add(int(doc_id))
    expect: dict[int, list] = {}
    for t, s in postings.items():
        ids = sorted(s)
        b = len(ids).bit_length()
        row = expect.setdefault(b, [0, 0, 0, 0, 0])
        row[0] += 1
        row[1] += (len(ids) + BLOCK - 1) // BLOCK
        row[2] += ef_bits(len(ids), ids[-1] + 1)
        p = pef_bits(ids)
        row[3] += p
        row[4] += int(p < ef_bits(len(ids), ids[-1] + 1))
    got = {r["df_bucket"]: r for r in postings_pef_size(spark, SF_DIR).collect()}
    assert set(got) == set(expect)
    for b, (nt, nb, efb, pefb, wins) in expect.items():
        r = got[b]
        assert (r["n_terms"], r["n_blocks"], r["ef_bits"], r["pef_bits"]) == (
            nt, nb, efb, pefb
        ), (b, r)
        assert r["pef_wins"] == wins
        assert r["pef_ratio_milli"] == (1000 * pefb) // efb

    # --- leg 2: clustered synthesis where PEF must win
    run = set(range(128)) | set(range(3968, 4096))
    synth = pd.DataFrame(
        {
            "doc_id": range(4096),
            "lang": ["en"] * 4096,
            "text": [
                "clx" if i in run else f"f{i}" for i in range(4096)
            ],
        }
    )
    synth.to_parquet(tmp_path / "documents.parquet")
    rows = postings_pef_size(spark, str(tmp_path)).collect()
    bucket9 = [r for r in rows if r["df_bucket"] == 9]
    assert len(bucket9) == 1 and bucket9[0]["n_terms"] == 1
    assert bucket9[0]["pef_wins"] == 1
    assert bucket9[0]["pef_bits"] < bucket9[0]["ef_bits"]
    ids = sorted(run)
    assert bucket9[0]["pef_bits"] == pef_bits(ids)
    assert bucket9[0]["ef_bits"] == ef_bits(len(ids), ids[-1] + 1)
