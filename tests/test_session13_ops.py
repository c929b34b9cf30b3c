"""Semantics + parity guards for session-13 operators.

What each test pins:
- lnc.ltc: the full top-10 (ids AND integer micro scores) recomputed
  end-to-end in pure Python from the corpus text — weights, exact int64
  norm accumulation, IEEE sqrt/division, floor(+0.5) — the codec-parity
  discipline. Plus family-distinct ordering vs BM25.
- BM25+: the defining lower bound (every matched term contributes
  ≥ idf·δ, so score ≥ δ·Σ idf over matched terms) recomputed per top
  doc, and the δ-induced multi-term preference vs plain BM25.
- RM3 second pass: the interpolated query model recomputed exactly in
  Python (weights from the oracle-gated expansion ranking, Dirichlet
  micro-nats, int64 Σ wt·lp), and the expansion must actually MOVE the
  ranking relative to the unexpanded query (else the op proves nothing).
- Kendall τ-b: exact Python recompute for every registry query from the
  two score columns (concordant/discordant/tie counts and the
  sign-split milli ratio), plus non-degeneracy: the rankers genuinely
  agree more than chance (τ > 0 somewhere) and genuinely disagree
  somewhere (τ < 1000 somewhere).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

SF_DIR = "/root/testdata/sf0.001"

TOKEN_RE = re.compile(r"\W+", re.ASCII)


def _toks(text: str) -> list[str]:
    return [t for t in TOKEN_RE.split(text.lower()) if t]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    return {r["doc_id"]: _toks(r["text"]) for r in rows}


# ------------------------------------------------------ SMART lnc.ltc


def test_tfidf_lnc_ltc_matches_pure_python_recompute(spark, corpus):
    from harvester_spark.operators.fulltext_queries import BM25_TERMS
    from harvester_spark.operators.ranking_models import ft_tfidf_lnc_ltc_topk

    nd = len(corpus)
    tf = {d: Counter(ts) for d, ts in corpus.items()}
    df = {
        t: sum(1 for d in corpus if tf[d][t] > 0)
        for t in BM25_TERMS
    }
    scored = {}
    for d, cnt in tf.items():
        if not cnt:
            continue
        n2 = 0
        for c in cnt.values():
            dwm = int(round(1e6 * (1.0 + math.log(c))))
            n2 += dwm * dwm
        dot = 0
        for t in BM25_TERMS:
            if cnt[t] > 0:
                dwm = int(round(1e6 * (1.0 + math.log(cnt[t]))))
                qwm = int(round(1e6 * math.log(nd / df[t])))
                dot += qwm * dwm
        if dot > 0:
            scored[d] = int(math.floor(dot / math.sqrt(n2) + 0.5))
    expect = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["doc_id"], r["score_micro"])
        for r in ft_tfidf_lnc_ltc_topk(spark, SF_DIR)
        .orderBy("rank")
        .collect()
    ]
    assert got == expect
    assert len(got) == 10


def test_tfidf_family_distinct_from_bm25(spark):
    from harvester_spark.operators.fulltext_queries import ft_bm25_or_topk
    from harvester_spark.operators.ranking_models import ft_tfidf_lnc_ltc_topk

    a = [r["doc_id"] for r in ft_tfidf_lnc_ltc_topk(spark, SF_DIR).orderBy("rank").collect()]
    b = [r["doc_id"] for r in ft_bm25_or_topk(spark, SF_DIR).orderBy("rank").collect()]
    assert a != b  # cosine normalization is a different length model


# ------------------------------------------------------------- BM25+


def test_bm25plus_lower_bound_and_multi_term_preference(spark, corpus):
    from harvester_spark.operators.fulltext_queries import BM25_TERMS
    from harvester_spark.operators.ranking_models import (
        BM25PLUS_DELTA,
        ft_bm25plus_topk,
    )

    nd = len(corpus)
    tf = {d: Counter(ts) for d, ts in corpus.items()}
    df = {t: sum(1 for d in corpus if tf[d][t] > 0) for t in BM25_TERMS}
    idf = {
        t: math.log(1.0 + (nd - df[t] + 0.5) / (df[t] + 0.5))
        for t in BM25_TERMS
    }
    rows = ft_bm25plus_topk(spark, SF_DIR).orderBy("rank").collect()
    assert len(rows) == 10
    for r in rows:
        matched = [t for t in BM25_TERMS if tf[r["doc_id"]][t] > 0]
        lower = BM25PLUS_DELTA * sum(idf[t] for t in matched)
        # δ guarantees every match contributes at least idf·δ
        assert r["score"] >= lower - 1e-6
    # δ rewards matching MORE terms: the top doc must match the maximum
    # number of query terms found anywhere in the corpus
    max_matched = max(
        sum(1 for t in BM25_TERMS if cnt[t] > 0) for cnt in tf.values()
    )
    top_matched = sum(
        1 for t in BM25_TERMS if tf[rows[0]["doc_id"]][t] > 0
    )
    assert top_matched == max_matched


# --------------------------------------------------- RM3 second pass


def test_rm3_rerank_matches_python_recompute_and_moves_ranking(spark, corpus):
    from harvester_spark.operators.fulltext_queries import BM25_TERMS
    from harvester_spark.operators.retrieval import (
        RM3_EXP_POOL,
        RM3_ORIG_W,
        RM3_RR_TERMS,
        ft_rm3_expansion,
        ft_rm3_rerank_topk,
    )

    exp = [
        (r["term"], int(round(r["weight"] * 1e6)))
        for r in ft_rm3_expansion(spark, SF_DIR).orderBy("rank").collect()
    ][:RM3_RR_TERMS]
    assert len(exp) == RM3_RR_TERMS
    assert not set(t for t, _ in exp) & set(BM25_TERMS)  # genuinely new terms
    wsum = sum(w for _, w in exp)
    weights = Counter()
    for t in BM25_TERMS:
        weights[t] += RM3_ORIG_W
    for t, w in exp:
        weights[t] += (RM3_EXP_POOL * w) // wsum

    tf = {d: Counter(ts) for d, ts in corpus.items()}
    dl = {d: len(ts) for d, ts in corpus.items()}
    ct = sum(dl.values())
    cf = Counter()
    for ts in corpus.values():
        for t in ts:
            if t in weights:
                cf[t] += 1
    scored = {}
    for d in corpus:
        s = 0
        for t, wt in weights.items():
            lp = int(
                round(
                    1e6
                    * math.log(
                        (tf[d][t] + 2000.0 * cf[t] / ct) / (dl[d] + 2000.0)
                    )
                )
            )
            s += wt * lp
        scored[d] = s
    expect = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["doc_id"], r["score_units"])
        for r in ft_rm3_rerank_topk(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert got == expect

    # the expansion must move the ranking vs the α-mass-only query
    # (otherwise the second pass proved nothing)
    unexpanded = {}
    for d in corpus:
        s = 0
        for t in BM25_TERMS:
            lp = int(
                round(
                    1e6
                    * math.log(
                        (tf[d][t] + 2000.0 * cf[t] / ct) / (dl[d] + 2000.0)
                    )
                )
            )
            s += RM3_ORIG_W * lp
        unexpanded[d] = s
    base = [d for d, _ in sorted(unexpanded.items(), key=lambda kv: (-kv[1], kv[0]))[:10]]
    assert [d for d, _ in got] != base


# --------------------------------------------------- Kendall tau-b


def test_tau_b_matches_exact_python_recompute(spark):
    from harvester_spark.operators.ranking_ext import (
        TAU_K,
        ranker_tau_correlation,
    )
    from harvester_spark.operators.retrieval import _graded_ranking

    got = {
        r["q_id"]: r
        for r in ranker_tau_correlation(spark, SF_DIR).collect()
    }
    assert len(got) == 16

    # recompute score_b (Dirichlet micro-nats) for every candidate
    graded = [
        (r["q_id"], r["doc_id"], float(r["score"]))
        for r in _graded_ranking(spark, SF_DIR).collect()
    ]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    corpus = {r["doc_id"]: _toks(r["text"]) for r in docs}
    from harvester_spark.operators.retrieval import HN_N_QUERIES, HN_Q_LEN

    q_ids = sorted(corpus)[:HN_N_QUERIES]
    qsel = {}
    for q in q_ids:
        firsts = {}
        for i, t in enumerate(corpus[q]):
            firsts.setdefault(t, i)
        ordered = sorted(firsts.items(), key=lambda kv: (kv[1], kv[0]))
        qsel[q] = [t for t, _ in ordered[:HN_Q_LEN]]
    all_terms = set(t for ts in qsel.values() for t in ts)
    cf = Counter()
    ct = 0
    for ts in corpus.values():
        ct += len(ts)
        for t in ts:
            if t in all_terms:
                cf[t] += 1
    tf = {d: Counter(ts) for d, ts in corpus.items()}
    dl = {d: len(ts) for d, ts in corpus.items()}

    def score_b(q, d):
        s = 0
        for t in qsel[q]:
            lp = int(
                round(
                    1e6
                    * math.log(
                        (tf[d][t] + 2000.0 * cf[t] / ct) / (dl[d] + 2000.0)
                    )
                )
            )
            s += lp
        return s

    taus = set()
    for q in q_ids:
        cand = [(d, sa) for (qq, d, sa) in graded if qq == q]
        sb = {d: score_b(q, d) for d, _ in cand}
        ra = {
            d: i + 1
            for i, (d, _) in enumerate(
                sorted(cand, key=lambda kv: (-kv[1], kv[0]))
            )
        }
        rb = {
            d: i + 1
            for i, d in enumerate(
                sorted(sb, key=lambda d: (-sb[d], d))
            )
        }
        sel = sorted(d for d, _ in cand if ra[d] <= TAU_K or rb[d] <= TAU_K)
        sa = dict(cand)
        c = d_ = n1 = n2 = n0 = 0
        for i in range(len(sel)):
            for j in range(i + 1, len(sel)):
                x, y = sel[i], sel[j]
                s1 = (sa[x] > sa[y]) - (sa[x] < sa[y])
                s2 = (sb[x] > sb[y]) - (sb[x] < sb[y])
                n0 += 1
                n1 += s1 == 0
                n2 += s2 == 0
                c += s1 * s2 == 1
                d_ += s1 * s2 == -1
        r = got[q]
        assert (r["n_docs"], r["n_pairs"]) == (len(sel), n0)
        assert (r["concordant"], r["discordant"]) == (c, d_)
        assert (r["ties_a"], r["ties_b"]) == (n1, n2)
        den = (n0 - n1) * (n0 - n2)
        if den == 0:
            assert r["tau_b_milli"] is None
        else:
            x = 1000.0 * (c - d_) / math.sqrt(den)
            expect = (
                int(math.floor(x + 0.5))
                if c >= d_
                else -int(math.floor(-x + 0.5))
            )
            assert r["tau_b_milli"] == expect
        taus.add(r["tau_b_milli"])
    # the two rankers genuinely correlate AND genuinely disagree
    assert any(t is not None and t > 0 for t in taus)
    assert any(t is not None and t < 1000 for t in taus)
    assert len(taus) > 3


# ------------------------------------------------------------ bpref


def test_bpref_matches_exact_python_recompute(spark):
    from harvester_spark.operators.retrieval import (
        _graded_ranking,
        ft_rank_eval_bpref,
    )

    graded = [
        (r["q_id"], r["doc_id"], float(r["score"]), int(r["rel"]))
        for r in _graded_ranking(spark, SF_DIR).collect()
    ]
    got = {r["q_id"]: r for r in ft_rank_eval_bpref(spark, SF_DIR).collect()}
    assert len(got) == 16
    vals = set()
    for q in got:
        rows = sorted(
            (r for r in graded if r[0] == q), key=lambda r: (-r[2], r[1])
        )
        rel = [r[3] >= 3 for r in rows]
        R = sum(rel)
        N = len(rel) - R
        M = min(R, N)
        assert (got[q]["n_rel"], got[q]["n_nonrel"]) == (R, N)
        if R == 0 or N == 0:
            assert got[q]["bpref_micro"] is None
            continue
        num = 0
        nonrel_above = 0
        for is_rel in rel:
            if is_rel:
                num += M - min(nonrel_above, M)
            else:
                nonrel_above += 1
        assert got[q]["bpref_micro"] == (1_000_000 * num) // (R * M)
        vals.add(got[q]["bpref_micro"])
    assert len(vals) > 3  # non-constant metric


# -------------------------------------------------------------- RBO


def test_rbo_matches_exact_fraction_recompute(spark, corpus):
    from fractions import Fraction

    from harvester_spark.operators.ranking_ext import (
        RBO_K,
        _RBO_D,
        ranker_rbo_overlap,
    )
    from harvester_spark.operators.retrieval import (
        HN_N_QUERIES,
        HN_Q_LEN,
        _graded_ranking,
    )

    graded = [
        (r["q_id"], r["doc_id"], float(r["score"]))
        for r in _graded_ranking(spark, SF_DIR).collect()
    ]
    q_ids = sorted(corpus)[:HN_N_QUERIES]
    qsel = {}
    for q in q_ids:
        firsts = {}
        for i, t in enumerate(corpus[q]):
            firsts.setdefault(t, i)
        ordered = sorted(firsts.items(), key=lambda kv: (kv[1], kv[0]))
        qsel[q] = [t for t, _ in ordered[:HN_Q_LEN]]
    all_terms = set(t for ts in qsel.values() for t in ts)
    cf = Counter()
    ct = 0
    for ts in corpus.values():
        ct += len(ts)
        for t in ts:
            if t in all_terms:
                cf[t] += 1
    tf = {d: Counter(ts) for d, ts in corpus.items()}
    dl = {d: len(ts) for d, ts in corpus.items()}

    got = {r["q_id"]: r for r in ranker_rbo_overlap(spark, SF_DIR).collect()}
    assert len(got) == 16
    vals = set()
    for q in q_ids:
        cand = [(d, sa) for (qq, d, sa) in graded if qq == q]
        sb = {
            d: sum(
                int(
                    round(
                        1e6
                        * math.log(
                            (tf[d][t] + 2000.0 * cf[t] / ct)
                            / (dl[d] + 2000.0)
                        )
                    )
                )
                for t in qsel[q]
            )
            for d, _ in cand
        }
        ra = {
            d: i + 1
            for i, (d, _) in enumerate(
                sorted(cand, key=lambda kv: (-kv[1], kv[0]))
            )
        }
        rb = {
            d: i + 1
            for i, d in enumerate(sorted(sb, key=lambda d: (-sb[d], d)))
        }
        # exact RBO@K with p = 1/2 as a Fraction, then D-units and micro
        rbo = Fraction(0)
        units = 0
        overlap = 0
        for d in ra:
            m = max(ra[d], rb[d])
            if m <= RBO_K:
                overlap += 1
                for depth in range(m, RBO_K + 1):
                    rbo += Fraction(1, depth * 2**depth)
                    units += _RBO_D // (depth * 2**depth)
        assert got[q]["overlap_at_k"] == overlap
        assert got[q]["rbo_units"] == units
        assert Fraction(units, _RBO_D) == rbo  # D-units are EXACT
        assert got[q]["rbo_micro"] == (units * 1_000_000) // _RBO_D
        vals.add(got[q]["rbo_micro"])
    assert len(vals) > 3


# ------------------------------------------------------ Adamic-Adar


def test_adamic_adar_matches_python_recompute(spark):
    import hashlib

    from harvester_spark.operators.graph import (
        AA_TOP,
        PR_FANOUT,
        host_adamic_adar,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    )
    edges = set()
    for r in rows:
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:14], 16)
        dst = f"src{h % PR_FANOUT}"
        if r["source"] != dst:
            edges.add((r["source"], dst))
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
    deg = {z: len(ns) for z, ns in nbrs.items()}
    scores = {}
    commons = {}
    for z, ns in nbrs.items():
        w = int(round(1e6 / math.log(deg[z])))
        for a in ns:
            for b in ns:
                if a < b and (a, b) not in und:
                    scores[(a, b)] = scores.get((a, b), 0) + w
                    commons[(a, b)] = commons.get((a, b), 0) + 1
    expect = sorted(
        scores.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )[:AA_TOP]
    got = [
        (
            (r["host_a"], r["host_b"]),
            r["aa_micro"],
            r["n_common"],
        )
        for r in host_adamic_adar(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert [(p, s) for p, s, _ in got] == expect
    for p, _, c in got:
        assert commons[p] == c
        # every common neighbor has undirected degree >= 2 structurally
        assert c >= 1
    assert len(set(s for _, s, _ in got)) > 2  # weighted, not just counts


# ------------------------------------------- label propagation (LPA)


def _semisync_lpa(rows, iters):
    """Semi-synchronous LPA recompute: leaves then hubs per iteration."""
    import hashlib

    fan = max(len(rows) // 2, 20)
    und = set()
    hubs = set()
    for r in rows:
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:14], 16)
        dst = f"h{h % fan}"
        if r["source"] != dst:
            und.add((r["source"], dst))
            und.add((dst, r["source"]))
            hubs.add(r["source"])
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
    labels = {h: h for h in nbrs}
    for _ in range(iters):
        for update_hubs in (False, True):
            nxt = dict(labels)
            for h, ns in nbrs.items():
                if (h in hubs) == update_hubs:
                    cnt = Counter(labels[n] for n in ns)
                    nxt[h] = min(cnt, key=lambda l: (-cnt[l], l))
            labels = nxt
    return und, hubs, labels


def test_labelprop_matches_semisync_python_recompute(spark):
    from harvester_spark.operators.graph import (
        LPA_ITERS,
        host_labelprop_communities,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    )
    _, _, labels = _semisync_lpa(rows, LPA_ITERS)
    sizes = Counter(labels.values())
    got = {
        r["host"]: (r["label"], r["comm_size"])
        for r in host_labelprop_communities(spark, SF_DIR).collect()
    }
    assert got == {h: (l, sizes[l]) for h, l in labels.items()}
    # non-degenerate: real communities formed (many, not one blob, and
    # hubs actually absorbed leaves: some community has > 1 member)
    assert len(sizes) > 1
    assert max(sizes.values()) > 1


# ------------------------------------------------------ FST sizing


def test_dict_fst_size_matches_python_recompute(spark, corpus):
    from harvester_spark.operators.index_stats import dict_fst_size

    vocab = set(t for ts in corpus.values() for t in ts)
    prefixes = set()
    suffixes = set()
    total = 0
    for t in vocab:
        total += len(t)
        for i in range(1, len(t) + 1):
            prefixes.add(t[:i])
            suffixes.add(t[i - 1:])
    r = dict_fst_size(spark, SF_DIR).collect()[0]
    assert r["n_terms"] == len(vocab)
    assert r["total_chars"] == total
    assert r["trie_edges"] == len(prefixes)
    assert r["trie_saved_chars"] == total - len(prefixes)
    assert r["n_distinct_suffixes"] == len(suffixes)
    assert r["suffix_share_potential"] == len(prefixes) - len(suffixes)
    # the corpus vocabulary genuinely shares prefixes (else the trie
    # stat proves nothing)
    assert r["trie_saved_chars"] > 0


# ---------------------------------------------- synonym-graph query


def test_synonym_graph_expansion_is_real_and_moves_ranking(spark, corpus):
    from harvester_spark.operators.es_ext import (
        SYN_MIN_CODF,
        ft_synonym_graph_topk,
    )
    from harvester_spark.operators.fulltext_queries import (
        BM25_TERMS,
        ft_bm25_or_topk,
    )

    # recompute the max-PMI synonym table exactly
    dt = {d: set(ts) for d, ts in corpus.items()}
    nd = len(corpus)
    df = Counter()
    for ts in dt.values():
        for t in ts:
            df[t] += 1
    syn = {}
    for qt in BM25_TERMS:
        best = None
        for c in df:
            if c in BM25_TERMS:
                continue
            n_ab = sum(1 for ts in dt.values() if qt in ts and c in ts)
            if n_ab < SYN_MIN_CODF:
                continue
            pmi = int(round(1e6 * math.log(n_ab * nd / (df[qt] * df[c]))))
            key = (-pmi, c)
            if best is None or key < best[0]:
                best = (key, c)
        assert best is not None  # a synonym exists for every query term
        syn[qt] = best[1]
    assert len(set(syn.values())) >= 1
    assert not set(syn.values()) & set(BM25_TERMS)

    got = [
        r["doc_id"]
        for r in ft_synonym_graph_topk(spark, SF_DIR).orderBy("rank").collect()
    ]
    plain = [
        r["doc_id"]
        for r in ft_bm25_or_topk(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert len(got) == 10
    # expansion must actually move the ranking (the synonym postings
    # blend into group tf/df — identical output would mean the synonym
    # derivation or the blend is dead code)
    assert got != plain


# --------------------------------------------------- phonetic buckets


def _py_soundex(term: str) -> str:
    """American Soundex, the Spark/Apache Commons automaton: h/w
    transparent, vowels reset, adjacent codes merged."""
    CODE = {}
    for chars, d in (
        ("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
        ("l", "4"), ("mn", "5"), ("r", "6"), ("hw", "-"),
    ):
        for ch in chars:
            CODE[ch] = d
    codes0 = [CODE.get(c, "0") for c in term]
    kept = [c for c in codes0 if c != "-"]
    dedup = [c for i, c in enumerate(kept) if i == 0 or kept[i - 1] != c]
    start = 0 if codes0[0] == "-" else 1
    digits = "".join(c for c in dedup[start:] if c != "0")
    return (term[0].upper() + (digits + "000")[:3])


def test_phonetic_buckets_match_python_soundex_and_collapse(spark, corpus):
    from harvester_spark.operators.es_ext import ft_phonetic_buckets

    base = sorted(
        set(
            t
            for ts in corpus.values()
            for t in ts
            if re.fullmatch(r"[a-z]+", t)
        )
    )
    df = Counter()
    for ts in corpus.values():
        for t in set(ts):
            if t in set(base):
                df[t] += 1
    rot = str.maketrans("aeiou", "eioua")
    forms = {t: (1, df[t]) for t in base}
    for t in base:
        if len(t) >= 3:
            v = t.translate(rot)
            if v not in forms:
                forms[v] = (0, 0)
    buckets = {}
    for t, (is_base, d) in forms.items():
        c = _py_soundex(t)
        nf, nb, dfb = buckets.get(c, (0, 0, 0))
        buckets[c] = (nf + 1, nb + is_base, dfb + d)
    expect = sorted(
        ((c, *v) for c, v in buckets.items()),
        key=lambda r: (-r[1], r[0]),
    )[:20]
    got = [
        (r["code"], r["n_forms"], r["n_base"], r["df_base"])
        for r in ft_phonetic_buckets(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert got == expect
    # the vowel-rotated variants genuinely collapse through the encoder
    assert any(nf > nb for _, nf, nb, _ in got)
    # and a real base term shares its bucket with a variant, not only
    # variant-only buckets (the synthesis touches the corpus vocabulary)
    assert any(nf > nb and nb >= 1 for _, nf, nb, _ in got)


# ------------------------------------------------ secret entropy scan


def test_secret_scan_recovers_planted_exactly(spark, corpus):
    import hashlib

    from harvester_spark.operators.curation import (
        SECRET_MIN_ENT,
        SECRET_MIN_LEN,
        curation_secret_entropy,
    )

    got = {
        r["doc_id"]: r
        for r in curation_secret_entropy(spark, SF_DIR).collect()
    }
    planted = {d for d in corpus if d % 97 == 0}
    assert set(got) == planted  # full recovery, zero false positives
    assert planted  # the plant is non-empty at this sf
    for d in planted:
        secret = hashlib.md5(str(d).encode()).hexdigest()
        cnt = Counter(secret)
        n = len(secret)
        sum_cm = sum(int(round(1e6 * c * math.log(c))) for c in cnt.values())
        h = int(round(1e6 * math.log(n))) - sum_cm // n
        assert h >= SECRET_MIN_ENT
        assert got[d]["max_entropy_micro"] >= h  # ≥: doc may hold others
        assert got[d]["n_secret_tokens"] >= 1
    # natural corpus long tokens must NOT trip the detector
    for d, ts in corpus.items():
        if d in planted:
            continue
        assert d not in got
        for t in ts:
            if len(t) >= SECRET_MIN_LEN:
                cnt = Counter(t)
                sum_cm = sum(
                    int(round(1e6 * c * math.log(c))) for c in cnt.values()
                )
                h = int(round(1e6 * math.log(len(t)))) - sum_cm // len(t)
                assert h < SECRET_MIN_ENT


# --------------------------------------------------- DocValues sizing


def test_docvalues_delta_size_matches_python_recompute(spark):
    from harvester_spark.operators.index_stats import (
        DV_BLOCK,
        docvalues_delta_size,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    )
    blocks = {}
    for r in rows:
        blocks.setdefault(r["doc_id"] // DV_BLOCK, []).append(r["n_chars"])
    def bits(lo, hi):
        return 0 if hi == lo else (hi - lo).bit_length()
    packed = sum(
        9 + (len(vs) * bits(min(vs), max(vs)) + 7) // 8
        for vs in blocks.values()
    )
    allv = [r["n_chars"] for r in rows]
    gbytes = 9 + (len(allv) * bits(min(allv), max(allv)) + 7) // 8
    r = docvalues_delta_size(spark, SF_DIR).collect()[0]
    assert r["n_rows"] == len(allv)
    assert r["n_blocks"] == len(blocks)
    assert r["raw_bytes"] == 8 * len(allv)
    assert r["packed_bytes"] == packed
    assert r["global_packed_bytes"] == gbytes
    assert r["blocked_vs_global"] == packed - gbytes
    # packing beats raw 8B/value on this column (bit_length ≪ 64)
    assert r["packed_bytes"] < r["raw_bytes"]


# ------------------------------------------------- Matryoshka family


def test_matryoshka_recall_bounds_and_schema(spark):
    from harvester_spark.operators.similarity import (
        MRL_DIMS,
        TOP_K,
        emb_matryoshka_recall,
    )

    rows = emb_matryoshka_recall(spark, SF_DIR).collect()
    assert len(rows) == 5 * len(MRL_DIMS)
    for r in rows:
        assert 0 <= r["n_hits"] <= TOP_K
        assert abs(r["recall"] - r["n_hits"] / TOP_K) < 1e-9
    # truncation genuinely loses recall somewhere (isotropic prefixes
    # are NOT the full vector) and retains some signal somewhere
    assert any(r["n_hits"] < TOP_K for r in rows)
    assert any(r["n_hits"] > 0 for r in rows)


def test_matryoshka_funnel_dominates_prefix_only(spark):
    from harvester_spark.operators.similarity import ann_matryoshka_rerank

    rows = ann_matryoshka_rerank(spark, SF_DIR).collect()
    assert len(rows) == 5
    # the defining funnel property: exact rerank of the prefix shortlist
    # can only improve on the prefix-only top-k — and genuinely does
    assert all(r["n_hits_funnel"] >= r["n_hits_prefix"] for r in rows)
    assert any(r["n_hits_funnel"] > r["n_hits_prefix"] for r in rows)


# ----------------------------------------------- PCA power iteration


def test_pca_power_recovers_planted_direction(spark):
    import hashlib

    import numpy as np

    from harvester_spark.operators.similarity import emb_pca_power

    def h56(sv: str) -> int:
        return int(hashlib.md5(sv.encode()).hexdigest()[:14], 16)

    g = np.array([h56(f"pcag:{j}") % 9 - 4 for j in range(64)], dtype=float)
    rows = emb_pca_power(spark, SF_DIR).collect()
    assert len(rows) == 64
    v = np.zeros(64)
    for r in rows:
        v[r["pos"]] = r["v_micro"]
    assert np.abs(v).max() == 1_000_000  # normalized: some |component| = unit
    cos = abs(v @ g / (np.linalg.norm(v) * np.linalg.norm(g)))
    # the planted rank-one spike must be recovered through 4 integer
    # power iterations — near-isotropic data alone would sit ≈ 0.2-0.35
    # (measured), so this threshold separates recovery from drift
    assert cos > 0.99


# ---------------------------------------------- Broder containment


def test_containment_exact_recompute_and_asymmetry(spark, corpus):
    from harvester_spark.operators.dedup import dedup_containment_pairs

    def shingles(ts):
        return set(
            f"{a} {b}" for a, b in zip(ts, ts[1:])
        )

    sh = {d: shingles(ts) for d, ts in corpus.items()}
    rows = dedup_containment_pairs(spark, SF_DIR).collect()
    assert rows  # the LSH banding finds candidates on this corpus
    for r in rows:
        A, B = sh[r["doc_a"]], sh[r["doc_b"]]
        inter = len(A & B)
        assert (r["n_inter"], r["n_a"], r["n_b"]) == (inter, len(A), len(B))
        assert r["cont_ab_micro"] == (inter * 1_000_000) // len(A)
        assert r["cont_ba_micro"] == (inter * 1_000_000) // len(B)
        # containment dominates resemblance structurally
        jac = (inter * 1_000_000) // (len(A) + len(B) - inter)
        assert r["max_cont_micro"] >= jac
    # the measure is genuinely ASYMMETRIC on this corpus (else reporting
    # two directions is dead weight)
    assert any(r["cont_ab_micro"] != r["cont_ba_micro"] for r in rows)


# ------------------------------------------------- 1-bit minhash


def test_bbit_minhash_recompute_and_discrimination(spark, corpus):
    import hashlib

    from harvester_spark.operators.dedup import (
        BBIT_K,
        JACCARD_SUBSET,
        dedup_bbit_minhash_eval,
    )

    def h56(sv: str) -> int:
        return int(hashlib.md5(sv.encode()).hexdigest()[:14], 16)

    sh = {
        d: set(f"{a} {b}" for a, b in zip(ts, ts[1:]))
        for d, ts in corpus.items()
        if d < JACCARD_SUBSET
    }
    bits = {
        d: [min(h56(f"b{i}:{s}") for s in ss) % 2 for i in range(BBIT_K)]
        for d, ss in sh.items()
        if ss
    }
    rows = dedup_bbit_minhash_eval(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        A, B = sh[r["doc_a"]], sh[r["doc_b"]]
        inter = len(A & B)
        assert inter > 0
        agree = sum(
            1
            for i in range(BBIT_K)
            if bits[r["doc_a"]][i] == bits[r["doc_b"]][i]
        )
        assert r["n_agree"] == agree
        assert r["j_exact_micro"] == (inter * 1_000_000) // (
            len(A) + len(B) - inter
        )
        est = max(0, ((2 * agree - BBIT_K) * 1_000_000) // BBIT_K)
        assert r["j_est_micro"] == est
        assert r["abs_err_micro"] == abs(est - r["j_exact_micro"])
    # the estimator DISCRIMINATES: bit agreement over the top-exact-J
    # quartile beats the bottom quartile (Pr[agree] = J + (1−J)/2)
    ordered = sorted(rows, key=lambda r: r["j_exact_micro"])
    q = max(len(ordered) // 4, 1)
    lo = sum(r["n_agree"] for r in ordered[:q]) / q
    hi = sum(r["n_agree"] for r in ordered[-q:]) / q
    assert hi > lo


# ----------------------------------------------------- BP128 sizing


def test_bp128_matches_python_recompute(spark, corpus):
    from harvester_spark.operators.fulltext_queries import BM25_TERMS
    from harvester_spark.operators.index_stats import BLOCK, postings_bp128_size

    got = {r["term"]: r for r in postings_bp128_size(spark, SF_DIR).collect()}
    assert set(got) == set(BM25_TERMS)
    for term in BM25_TERMS:
        postings = sorted(
            (d, sum(1 for t in ts if t == term))
            for d, ts in corpus.items()
            if term in ts
        )
        bytes_doc = bytes_tf = n_blocks = 0
        for b0 in range(0, len(postings), BLOCK):
            blk = postings[b0 : b0 + BLOCK]
            n_blocks += 1
            gaps = [
                blk[i][0] - blk[i - 1][0] for i in range(1, len(blk))
            ]
            wd = max((g.bit_length() for g in gaps), default=0)
            wt = max(tf.bit_length() for _, tf in blk)
            bytes_doc += 5 + (len(gaps) * wd + 7) // 8
            bytes_tf += 1 + (len(blk) * wt + 7) // 8
        r = got[term]
        assert r["df"] == len(postings)
        assert r["n_blocks"] == n_blocks
        assert r["bytes_docs"] == bytes_doc
        assert r["bytes_tfs"] == bytes_tf
        assert r["total_bytes"] == bytes_doc + bytes_tf
        # binary packing genuinely beats 8B/posting raw
        assert r["total_bytes"] < 16 * len(postings)


# -------------------------------------------- impact quantization


def test_impact_quantization_quality_ordering(spark):
    from harvester_spark.operators.index_stats import (
        IQ_LEVELS,
        ft_impact_quantization_eval,
    )

    rows = {
        r["n_levels"]: r
        for r in ft_impact_quantization_eval(spark, SF_DIR).collect()
    }
    assert set(rows) == set(IQ_LEVELS)
    for r in rows.values():
        assert 0 <= r["n_overlap"] <= 10
    # more quantization levels can only help on this corpus: 8-bit must
    # dominate 4-bit on overlap and not lose on total rank shift
    assert rows[255]["n_overlap"] >= rows[15]["n_overlap"]
    assert rows[255]["sum_abs_shift"] <= rows[15]["sum_abs_shift"]
    # 8-bit impacts preserve the serving top-10 essentially intact —
    # the property impact-ordered indexes rely on
    assert rows[255]["n_overlap"] >= 9


# ------------------------------------------- in-batch conflicts


def test_inbatch_conflicts_match_python_recompute(spark):
    import hashlib

    from harvester_spark.operators.training_prep import (
        BATCH_SIZE,
        DOCS_PER_SHARD,
        ORDER_SALT,
        train_inbatch_conflicts,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    )
    n_shards = max(len(rows) // DOCS_PER_SHARD, 1)

    def h56(sv: str) -> int:
        return int(hashlib.md5(sv.encode()).hexdigest()[:14], 16)

    keyed = [
        (h56(f"{ORDER_SALT}:{r['doc_id']}"), r["doc_id"], r["source"])
        for r in rows
    ]
    shards = {}
    for k, d, src in keyed:
        shards.setdefault(k % n_shards, []).append((k, d, src))
    expect = {}
    for sh, members in shards.items():
        members.sort()
        for i, (_, _, src) in enumerate(members):
            bk = sh * 2**32 + i // BATCH_SIZE
            expect.setdefault(bk, []).append(src)
    want = {
        bk: (
            len(srcs),
            sum(
                c * (c - 1) // 2 for c in Counter(srcs).values()
            ),
        )
        for bk, srcs in expect.items()
    }
    got = {
        r["batch_key"]: (r["n_docs"], r["n_conflict_pairs"])
        for r in train_inbatch_conflicts(spark, SF_DIR).collect()
    }
    assert got == want
    # the audit finds real conflicts on this corpus (20 sources ⇒
    # birthday collisions inside 32-doc batches are near-certain)
    assert sum(v[1] for v in got.values()) > 0
    assert any(v[1] == 0 or v[1] > 0 for v in got.values())


# ------------------------------------------------------ AMQ bake-off


def test_amq_compare_matches_python_recompute(spark, corpus):
    from harvester_spark.operators.sketches import (
        AMQ_EPS_LOG2,
        amq_filter_compare,
    )

    n = len(
        set(
            f"{a} {b}"
            for ts in corpus.values()
            for a, b in zip(ts, ts[1:])
        )
    )
    k = AMQ_EPS_LOG2
    f = AMQ_EPS_LOG2 + 3
    bloom = (n * k * 14427) // 10000
    cuckoo = ((n * 10000) // 9550 + 1) * f
    qf = (1 << ((n * 10000) // 7500 - 1).bit_length()) * f
    r = amq_filter_compare(spark, SF_DIR).collect()[0]
    assert r["n_items"] == n
    assert r["bloom_bits"] == bloom
    assert r["bloom_k"] == k
    assert r["cuckoo_bits"] == cuckoo
    assert r["qf_bits"] == qf
    assert r["bloom_bpi_milli"] == (bloom * 1000) // n
    assert r["cuckoo_bpi_milli"] == (cuckoo * 1000) // n
    assert r["qf_bpi_milli"] == (qf * 1000) // n
    # sanity: all three sit in the 10–25 bits/item band at ε = 2^-8
    # (the quotient filter pays the pow2 round-up, so it is the widest)
    for col in ("bloom_bpi_milli", "cuckoo_bpi_milli", "qf_bpi_milli"):
        assert 10_000 <= r[col] <= 25_000
    assert r["qf_bpi_milli"] >= r["bloom_bpi_milli"]


# ------------------------------------------------- shard top-k merge


def test_shard_topk_merge_matches_python_recompute(spark, corpus):
    from harvester_spark.operators.index_stats import (
        N_MERGE_SHARDS,
        shard_topk_merge_eval,
    )
    from harvester_spark.operators.fulltext_queries import bm25_or_scored

    scored = [
        (r["doc_id"], float(r["score"]))
        for r in bm25_or_scored(spark, SF_DIR).collect()
    ]
    glob = sorted(scored, key=lambda kv: (-kv[1], kv[0]))
    top10 = [d for d, _ in glob[:10]]
    local_rank = {}
    for sh in range(N_MERGE_SHARDS):
        members = sorted(
            (kv for kv in scored if kv[0] % N_MERGE_SHARDS == sh),
            key=lambda kv: (-kv[1], kv[0]),
        )
        for i, (d, _) in enumerate(members, start=1):
            local_rank[d] = i
    expect = {}
    for sh in range(N_MERGE_SHARDS):
        hits = [d for d in top10 if d % N_MERGE_SHARDS == sh]
        expect[sh] = (
            len(hits),
            max((local_rank[d] for d in hits), default=0),
        )
    got = {
        r["shard"]: (r["n_global_hits"], r["max_local_rank"])
        for r in shard_topk_merge_eval(spark, SF_DIR).collect()
    }
    assert got == expect
    assert sum(v[0] for v in got.values()) == 10  # winners all accounted
    # the fan-out economy: per-shard fetch depth k' ≪ shard size — local
    # rank of a global winner never exceeds 10 (k' = k suffices here)
    assert all(v[1] <= 10 for v in got.values())


# ---------------------------------------------------- skip-list size


def test_skiplist_size_matches_python_recompute(spark, corpus):
    from harvester_spark.operators.fulltext_queries import BM25_TERMS
    from harvester_spark.operators.index_stats import (
        SKIP_ENTRY_BYTES,
        SKIP_INTERVAL,
        SKIP_MAX_LEVELS,
        postings_skiplist_size,
    )

    got = {
        r["term"]: r for r in postings_skiplist_size(spark, SF_DIR).collect()
    }
    assert set(got) == set(BM25_TERMS)
    for term in BM25_TERMS:
        df = sum(1 for ts in corpus.values() if term in ts)
        levels = sum(
            1
            for k in range(1, SKIP_MAX_LEVELS + 1)
            if df >= SKIP_INTERVAL**k
        )
        pointers = sum(
            df // SKIP_INTERVAL**k for k in range(1, SKIP_MAX_LEVELS + 1)
        )
        r = got[term]
        assert r["df"] == df
        assert r["n_levels"] == levels
        assert r["n_pointers"] == pointers
        assert r["skip_bytes"] == pointers * SKIP_ENTRY_BYTES
        assert levels >= 1  # flagship terms are frequent enough to skip


# ----------------------------------------------------- geohash grid


def _ref_geohash1(lat: float, lon: float) -> str:
    """Independent reference: canonical geohash bisection, 1 char."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
    bits = []
    for i in range(5):
        if i % 2 == 0:  # even bit (from 0): longitude
            mid = (lon_rng[0] + lon_rng[1]) / 2
            bits.append(1 if lon >= mid else 0)
            lon_rng[0 if lon >= mid else 1] = mid
        else:
            mid = (lat_rng[0] + lat_rng[1]) / 2
            bits.append(1 if lat >= mid else 0)
            lat_rng[0 if lat >= mid else 1] = mid
    cell = 0
    for b in bits:
        cell = cell * 2 + b
    return alphabet[cell]


def test_geohash_grid_matches_reference_bisection(spark):
    import hashlib

    from harvester_spark.operators.es_aggs import es_geohash_grid

    def h56(sv: str) -> int:
        return int(hashlib.md5(sv.encode()).hexdigest()[:14], 16)

    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    cells = Counter()
    for d in ids:
        lat = (h56(f"lat:{d}") % 180000 - 90000) / 1000.0
        lon = (h56(f"lon:{d}") % 360000 - 180000) / 1000.0
        cells[_ref_geohash1(lat, lon)] += 1
    got = es_geohash_grid(spark, SF_DIR).orderBy("rank").collect()
    expect = sorted(cells.items(), key=lambda kv: (-kv[1], kv[0]))
    # the operator's cell ids must decode to the SAME base32 chars the
    # canonical bisection produces, with the same counts
    got_pairs = [(r["geohash"], r["n_docs"]) for r in got]
    # tie order between equal-count cells: operator ties on integer cell
    # id, reference list on char — char order and cell order agree
    # because the alphabet is ordered by cell value
    assert got_pairs == expect[: len(got_pairs)]
    assert sum(cells.values()) == len(ids)
    assert len(cells) > 10  # planted coordinates genuinely spread


# ------------------------------------------------- held-out OOV rate


def test_vocab_oov_matches_python_recompute(spark, corpus):
    import hashlib

    from harvester_spark.operators.training_prep import vocab_oov_holdout

    def h56(sv: str) -> int:
        return int(hashlib.md5(sv.encode()).hexdigest()[:14], 16)

    n = len(corpus)
    k = max(n // 2, 1)
    streams = {
        d: list(ts) + [f"v{h56(str(d)) % k}"] for d, ts in corpus.items()
    }
    vocab = set(t for d, ts in streams.items() if d % 2 == 0 for t in ts)
    held_tokens = [t for d, ts in streams.items() if d % 2 == 1 for t in ts]
    held_types = set(held_tokens)
    oov_tok = sum(1 for t in held_tokens if t not in vocab)
    oov_typ = sum(1 for t in held_types if t not in vocab)
    r = vocab_oov_holdout(spark, SF_DIR).collect()[0]
    assert r["n_heldout_tokens"] == len(held_tokens)
    assert r["n_oov_tokens"] == oov_tok
    assert r["n_heldout_types"] == len(held_types)
    assert r["n_oov_types"] == oov_typ
    assert r["token_oov_micro"] == (oov_tok * 1_000_000) // len(held_tokens)
    assert r["type_oov_micro"] == (oov_typ * 1_000_000) // len(held_types)
    # non-degenerate: the planted pseudo-rare tail produces REAL OOV,
    # and the Zipfian signature holds — the unseen tail is TYPES-heavy
    assert 0 < r["n_oov_tokens"] < len(held_tokens)
    assert r["type_oov_micro"] > r["token_oov_micro"]


# ------------------------------------------------ IVF n_probe sweep


def test_ivf_nprobe_sweep_monotone(spark):
    from harvester_spark.operators.similarity import (
        IVF_SWEEP_PROBES,
        TOP_K,
        ann_ivf_nprobe_sweep,
    )

    rows = ann_ivf_nprobe_sweep(spark, SF_DIR).collect()
    assert len(rows) == 5 * len(IVF_SWEEP_PROBES)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], {})[r["n_probe"]] = r
    for qid, levels in by_q.items():
        assert set(levels) == set(IVF_SWEEP_PROBES)
        ps = sorted(levels)
        for a, b in zip(ps, ps[1:]):
            # candidate sets NEST ⇒ both cost and recall are monotone
            assert levels[b]["n_cand"] >= levels[a]["n_cand"]
            assert levels[b]["n_hits"] >= levels[a]["n_hits"]
        for r in levels.values():
            assert 0 <= r["n_hits"] <= TOP_K
    # the sweep genuinely trades cost for recall somewhere: deeper
    # probes add candidates, and some query gains recall from them
    assert any(
        lv[max(IVF_SWEEP_PROBES)]["n_cand"] > lv[min(IVF_SWEEP_PROBES)]["n_cand"]
        for lv in by_q.values()
    )
    assert any(
        lv[max(IVF_SWEEP_PROBES)]["n_hits"] > lv[min(IVF_SWEEP_PROBES)]["n_hits"]
        for lv in by_q.values()
    )


# ------------------------------------------------ gap entropy bound


def test_gap_entropy_bound_matches_python_recompute(spark, corpus):
    from harvester_spark.operators.fulltext_queries import BM25_TERMS
    from harvester_spark.operators.index_stats import (
        postings_gap_entropy_bound,
        postings_bp128_size,
    )

    got = {
        r["term"]: r
        for r in postings_gap_entropy_bound(spark, SF_DIR).collect()
    }
    bp = {
        r["term"]: r for r in postings_bp128_size(spark, SF_DIR).collect()
    }
    assert set(got) == set(BM25_TERMS)
    for term in BM25_TERMS:
        docs = sorted(d for d, ts in corpus.items() if term in ts)
        gaps = Counter(b - a for a, b in zip(docs, docs[1:]))
        n = sum(gaps.values())
        sum_cm = sum(
            int(round(1e6 * c * math.log(c))) for c in gaps.values()
        )
        h = int(round(1e6 * math.log(n))) - sum_cm // n
        r = got[term]
        assert r["n_gaps"] == n
        assert r["n_distinct_gaps"] == len(gaps)
        assert r["h_micro_nats"] == h
        assert r["entropy_floor_bytes"] == (n * h) // 5545177
        # the bound is a genuine floor: the measured BP128 doc bytes sit
        # above it (headers + block-max widths vs per-symbol optimum)
        assert bp[term]["bytes_docs"] >= r["entropy_floor_bytes"]
        assert r["h_micro_nats"] > 0


# ------------------------------------------------- k-means purity


def test_kmeans_purity_matches_python_recompute(spark):
    from harvester_spark.operators.similarity import (
        emb_kmeans_assign,
        emb_kmeans_purity,
    )

    assign = {
        r["vec_id"]: r["cent_id"]
        for r in emb_kmeans_assign(spark, SF_DIR).collect()
    }
    labels = {
        r["vec_id"]: r["label"]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    cells = Counter((assign[v], labels[v]) for v in assign)
    n = sum(cells.values())
    am = Counter()
    bm = Counter()
    for (cid, lab), c in cells.items():
        am[cid] += c
        bm[lab] += c
    pur_num = sum(
        max(c for (cid2, _), c in cells.items() if cid2 == cid)
        for cid in am
    )
    sum_mc = sum(
        int(round(1e6 * c * math.log(c * n / (am[cid] * bm[lab]))))
        for (cid, lab), c in cells.items()
    )
    i_micro = sum_mc // n if sum_mc >= 0 else -((-sum_mc) // n)
    sum_ea = sum(int(round(1e6 * a * math.log(a))) for a in am.values())
    sum_eb = sum(int(round(1e6 * b * math.log(b))) for b in bm.values())
    lnn = int(round(1e6 * math.log(n)))
    hc = lnn - sum_ea // n
    hl = lnn - sum_eb // n
    r = emb_kmeans_purity(spark, SF_DIR).collect()[0]
    assert r["n_vectors"] == n
    assert r["n_clusters"] == len(am)
    assert r["n_labels"] == len(bm)
    assert r["purity_milli"] == (pur_num * 1000) // n
    assert r["i_micro"] == i_micro
    assert r["h_cluster_micro"] == hc
    assert r["h_label_micro"] == hl
    if i_micro >= 0:
        assert r["nmi_milli"] == (2 * i_micro * 1000) // (hc + hl)
    # structural sanity: purity ≥ 1/n_labels trivially; NMI in [-ε, 1000]
    assert r["purity_milli"] * r["n_labels"] >= 1000
    assert r["nmi_milli"] <= 1000


# --------------------------------------------- BM25 × PageRank blend


def test_bm25_pagerank_blend_recompute_and_prior_effect(spark):
    from harvester_spark.operators.fulltext_queries import (
        bm25_or_scored,
        ft_bm25_or_topk,
    )
    from harvester_spark.operators.graph import (
        PRB_W_STATIC,
        PRB_W_TEXT,
        ft_bm25_pagerank_blend,
        host_pagerank,
    )

    pr = {
        r["host"]: r["rank_unit"]
        for r in host_pagerank(spark, SF_DIR).collect()
    }
    src = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    blended = {}
    for r in bm25_or_scored(spark, SF_DIR).collect():
        bm = int(round(r["score"] * 1e6))
        prior = int(round(1e6 * math.log(1.0 + pr.get(src[r["doc_id"]], 0))))
        blended[r["doc_id"]] = PRB_W_TEXT * bm + PRB_W_STATIC * prior
    expect = sorted(blended.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["doc_id"], r["score_cm"])
        for r in ft_bm25_pagerank_blend(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert got == expect
    # the static prior genuinely reorders the text-only ranking (hosts
    # differ in rank mass — the non-degeneracy host_pagerank pins)
    plain = [
        r["doc_id"] for r in ft_bm25_or_topk(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert [d for d, _ in got] != plain


# ------------------------------------------------ geo_distance agg


def test_geo_distance_ranges_match_python_recompute(spark):
    import hashlib

    from harvester_spark.operators.es_aggs import (
        GEO_EDGES_MDEG,
        es_geo_distance_ranges,
    )

    def h56(sv: str) -> int:
        return int(hashlib.md5(sv.encode()).hexdigest()[:14], 16)

    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    edges = [e * e for e in GEO_EDGES_MDEG]
    buckets = {}
    for d in ids:
        lat = h56(f"lat:{d}") % 180000 - 90000
        lon = h56(f"lon:{d}") % 360000 - 180000
        d2 = lat * lat + lon * lon
        b = sum(1 for e in edges if d2 >= e)
        buckets.setdefault(b, []).append(d2)
    got = {
        r["bucket"]: (r["n_docs"], r["min_d2"], r["max_d2"])
        for r in es_geo_distance_ranges(spark, SF_DIR).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    for b in range(4):
        if b in buckets:
            vs = buckets[b]
            assert got[b] == (len(vs), min(vs), max(vs))
        else:
            assert got[b] == (0, -1, -1)
    # planted coordinates populate several rings (non-degenerate)
    assert sum(1 for b in got.values() if b[0] > 0) >= 3


# -------------------------------------------------- modularity (Q)


def test_labelprop_modularity_matches_python_recompute(spark):
    from harvester_spark.operators.graph import (
        LPA_ITERS,
        host_labelprop_modularity,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    )
    und_dir, _, labels = _semisync_lpa(rows, LPA_ITERS)
    und_pairs = set((min(a, b), max(a, b)) for a, b in und_dir)
    m = len(und_pairs)
    e_c = Counter()
    d_c = Counter()
    for a, b in und_pairs:
        if labels[a] == labels[b]:
            e_c[labels[a]] += 1
        d_c[labels[a]] += 1
        d_c[labels[b]] += 1
    comms = set(d_c)
    q_num = sum(4 * m * e_c[c] - d_c[c] * d_c[c] for c in comms)
    r = host_labelprop_modularity(spark, SF_DIR).collect()[0]
    assert r["n_edges"] == m
    assert r["n_communities"] == len(comms)
    assert r["q_num"] == q_num
    assert r["q_den"] == 4 * m * m
    expect_micro = (
        (q_num * 1_000_000) // (4 * m * m)
        if q_num >= 0
        else -(((-q_num) * 1_000_000) // (4 * m * m))
    )
    assert r["q_micro"] == expect_micro
    # semi-synchronous LPA is genuinely MODULAR on the bipartite graph —
    # fully synchronous updates oscillate to Q ≈ −0.06…−0.15 here
    # (measured), so this pin is exactly what the half-round schedule buys
    assert r["q_micro"] > 250_000


# --------------------------------------------------- silhouette


def test_silhouette_matches_python_recompute(spark):
    from harvester_spark.operators.similarity import (
        SIL_SUBSET,
        _SIL_Q,
        emb_kmeans_assign,
        emb_silhouette,
    )

    assign = {
        r["vec_id"]: r["cent_id"]
        for r in emb_kmeans_assign(spark, SF_DIR).collect()
        if r["vec_id"] < SIL_SUBSET
    }
    emb = {
        r["vec_id"]: [int(round(v * _SIL_Q)) for v in r["embedding"]]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
        if r["vec_id"] < SIL_SUBSET
    }
    ids = sorted(assign)

    def d2(i, j):
        return sum((a - b) ** 2 for a, b in zip(emb[i], emb[j]))

    per_cluster = {}
    for i in ids:
        by_c = {}
        for j in ids:
            if j != i:
                by_c.setdefault(assign[j], []).append(d2(i, j))
        a = None
        if assign[i] in by_c:
            vs = by_c[assign[i]]
            a = sum(vs) // len(vs)
        bs = [
            sum(vs) // len(vs) for c, vs in by_c.items() if c != assign[i]
        ]
        b = min(bs) if bs else None
        if a is None or b is None:
            s = 0
        elif a == 0 and b == 0:
            s = 0
        elif b >= a:
            s = (1000 * (b - a)) // b
        else:
            s = -((1000 * (a - b)) // a)
        per_cluster.setdefault(assign[i], []).append(s)
    expect = {}
    for c, ss in per_cluster.items():
        tot = sum(ss)
        mean = tot // len(ss) if tot >= 0 else -((-tot) // len(ss))
        expect[c] = (len(ss), mean)
    got = {
        r["cent_id"]: (r["n_members"], r["mean_s_milli"])
        for r in emb_silhouette(spark, SF_DIR).collect()
    }
    assert got == expect
    # non-degenerate: scores vary across clusters
    assert len(set(v[1] for v in got.values())) > 2
