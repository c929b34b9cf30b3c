"""Analyzer chain — tokenization shared by index build and query side.

The reference's own text analysis splits lowercased text on ``\\W+``
(/root/reference/harvester/core/analysis/text.py:45-52); OpenSearch analyzers
add per-language stemming/decompounding (/root/reference/harvester/search/
models/index.py:173-188, Dutch decompound word list). For the rank-identity
target we fix ONE canonical analyzer — lowercase + ``\\W+`` split, empty
tokens dropped — used identically at index time, query time, and in the
DuckDB/numpy oracles (SURVEY.md §2.8). ``\\W`` is pinned to ASCII semantics so
the Python (re.ASCII), Spark (Java regex default), and DuckDB (RE2) engines
agree byte-for-byte.

Language normalization mirrors /root/reference/harvester/core/utils/
analyzers.py:6-14: anything outside {en, nl} becomes ``unk``; each doc is also
visible to the combined ``all`` index (search/tasks/index.py:38-41), which we
realize as a query-time lang-filter rather than double storage.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

LANGUAGES = ("en", "nl", "unk")
ALL_LANG = "all"

_RE_SPLIT = re.compile(r"\W+", re.ASCII)


def normalize_lang_value(lang: str | None) -> str:
    if lang is None:
        return "unk"
    lang = lang.strip().lower()[:2]
    return lang if lang in ("en", "nl") else "unk"


def normalize_lang(col: Column) -> Column:
    """Spark column expr for language normalization (JVM-side, no UDF)."""
    two = F.lower(F.substring(F.trim(col), 1, 2))
    return F.when(two.isin("en", "nl"), two).otherwise(F.lit("unk"))


def tokenize(text: str) -> list[str]:
    """Pure tokenizer — the spec; lowercase + ASCII ``\\W+`` split."""
    if not text:
        return []
    return [t for t in _RE_SPLIT.split(text.lower()) if t]


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized tokenizer: Series[str] → Series[list[str]]."""
    lowered = texts.fillna("").str.lower()
    return lowered.str.split(_RE_SPLIT).map(lambda ts: [t for t in ts if t])


def tokens_column(col: Column) -> Column:
    """JVM-side tokens expr (whole-stage codegen, no Python at all).

    Equivalent to :func:`tokenize`; used where the plan stays relational
    (word counts, doc_len, facet-style term queries).
    """
    return F.filter(F.split(F.lower(col), r"\W+"), lambda t: t != "")


def doc_len_column(col: Column) -> Column:
    """Token count of a text column — BM25 ``dl`` input."""
    return F.size(tokens_column(col))


def suggest_completion_terms(title: str | None, text: str | None) -> list[str]:
    """The reference's autocomplete candidate builder
    (/root/reference/harvester/products/models/datatypes/product.py:169-180):
    title words + FIRST 1000 text words (split on single space), each word
    accent-folded (unidecode) and stripped to its letters; empties dropped
    here (the reference keeps them; they can never prefix-match).
    """
    import re as _re
    import unicodedata

    words: list[str] = []
    if title:
        words += title.split(" ")
    if text:
        words += text.split(" ")[:1000]
    alpha = _re.compile("[^a-zA-Z]+")
    out = []
    for w in words:
        folded = (
            unicodedata.normalize("NFKD", w).encode("ascii", "ignore").decode("ascii")
        )
        folded = alpha.sub("", folded)
        if folded:
            out.append(folded)
    return out


# The DuckDB-side equivalents (oracle parity), kept here so every oracle SQL
# string uses the exact same chain:
DUCKDB_TOKENS_EXPR = (
    "list_filter(string_split_regex(lower({col}), '\\W+'), t -> t <> '')"
)
DUCKDB_DOC_LEN_EXPR = "len(" + DUCKDB_TOKENS_EXPR + ")"
