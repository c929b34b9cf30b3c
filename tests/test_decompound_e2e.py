"""Dutch decompounder END-TO-END: flagged nl index build + synonym-group
query, rank-identical to an independent numpy oracle.

Mirrors /root/reference/harvester/search/models/index.py:173-188 (dictionary
decompounder on the nl analyzer behind OPENSEARCH_ENABLE_DECOMPOUND_ANALYZERS):
a doc containing 'fietsband' is indexed with 'fiets' and 'band' stacked at
the compound's position, so the sub-word query finds it; query-side compounds
expand into synonym groups.
"""

import os

import numpy as np
import pandas as pd
import pytest

from harvester_spark.analysis import tokenize
from harvester_spark.decompound import (
    decompound_search,
    decompound_token,
    expand_index_tokens,
)
from harvester_spark.index.build import IndexBuilder
from harvester_spark.search import bm25
from harvester_spark.search.engine import IndexSearcher

WORDS = frozenset(
    {"fiets", "band", "winkel", "boek", "handel", "zonne", "bloem", "water"}
)

DOCS = [
    ("mijn fietsband is lek vandaag", "nl"),
    ("de boekhandel om de hoek verkoopt ook een zonnebloem", "nl"),
    ("fiets band winkel los geschreven woorden", "nl"),
    ("een fietsbandwinkel met drie delen in een woord", "nl"),
    ("gewone nederlandse tekst zonder samenstellingen hier", "nl"),
    ("water en nog wat water want water is goed", "nl"),
    ("fietsband appears in an english doc and must NOT expand", "en"),
    ("plain english filler text about nothing much at all", "en"),
]


@pytest.fixture(scope="module")
def env(spark, tmp_root):
    rows = [
        (i, text, lang, len(tokenize(text))) for i, (text, lang) in enumerate(DOCS)
    ]
    documents = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, doc_len int"
    )
    out = os.path.join(tmp_root, "decomp_index")
    IndexBuilder(spark, out).build(
        documents, resume=False, num_partitions=2, decompound_words=WORDS
    )
    searcher = IndexSearcher(spark, out)
    return searcher


def _expanded_corpus():
    """doc_id → expanded token list (nl only), plus doc_len per the stored
    (canonical) count."""
    toks, dls, langs = {}, {}, {}
    for i, (text, lang) in enumerate(DOCS):
        base = tokenize(text)
        toks[i] = expand_index_tokens(base, WORDS) if lang == "nl" else base
        dls[i] = len(base)
        langs[i] = lang
    return toks, dls, langs


def _oracle(query: str, k: int = 10, lang: str = "nl") -> pd.DataFrame:
    toks, dls, langs = _expanded_corpus()
    in_lang = [d for d in toks if lang == "all" or langs[d] == lang]
    n_docs = len(in_lang)
    avgdl = float(np.mean([dls[d] for d in in_lang]))
    groups = [
        sorted(set(decompound_token(t, WORDS))) for t in sorted(set(tokenize(query)))
    ]
    all_terms = sorted({m for g in groups for m in g})
    dfs = {
        t: sum(1 for d in in_lang if t in toks[d]) for t in all_terms
    }
    cands = [
        d
        for d in in_lang
        if all(any(m in toks[d] for m in g) for g in groups)
    ]
    rows = []
    for d in cands:
        s = 0.0
        for t in bm25.term_order([t for t in all_terms if dfs[t] > 0], dfs):
            tf = toks[d].count(t)
            if tf:
                s += float(bm25.idf(n_docs, dfs[t])) * float(
                    bm25.tf_norm(np.float64(tf), np.float64(dls[d]), avgdl)
                )
        rows.append((d, s))
    rows.sort(key=lambda r: (-r[1], r[0]))
    rows = rows[:k]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(rows) + 1),
            "doc_id": [d for d, _ in rows],
            "score": [s for _, s in rows],
        }
    )


QUERIES = [
    "fiets",            # sub-word finds the compound docs
    "band",
    "fietsband",        # compound query expands → also matches split words
    "boekhandel",
    "zonnebloem",
    "band winkel",      # multi-group AND
    "fietsbandwinkel",  # 3-part compound
    "water",
    "niksgevonden",     # dead term
]


@pytest.mark.parametrize("query", QUERIES)
def test_decompound_rank_identity(env, query):
    searcher = env
    got = decompound_search(searcher, query, WORDS, k=10, lang="nl")
    exp = _oracle(query, k=10, lang="nl")
    assert list(got["doc_id"]) == list(exp["doc_id"]), query
    g = np.asarray(got["score"], dtype=np.float64)
    e = np.asarray(exp["score"], dtype=np.float64)
    assert g.shape == e.shape and (g == e).all(), query


def test_compound_doc_found_by_subword(env):
    searcher = env
    got = decompound_search(searcher, "fiets", WORDS, k=10, lang="nl")
    assert 0 in set(got["doc_id"])  # 'fietsband' doc
    assert 3 in set(got["doc_id"])  # 'fietsbandwinkel' doc


def test_en_docs_not_expanded(env):
    """The flag applies to the nl analyzer only: the en doc containing
    'fietsband' is NOT findable via 'fiets' in the en index."""
    searcher = env
    r = searcher.search("fiets", k=10, lang="en")
    assert list(r.topk["doc_id"]) == []
    r2 = searcher.search("fietsband", k=10, lang="en")
    assert 6 in set(r2.topk["doc_id"])


def test_analyzer_marker_written(env, tmp_root):
    import json

    with open(os.path.join(tmp_root, "decomp_index", "analyzer.json")) as f:
        marker = json.load(f)
    assert marker["decompound_nl"] is True and marker["n_words"] == len(WORDS)
