"""Trigram-index-accelerated substring search (the Google Code Search /
Zoekt recipe: Cox, "Regular Expression Matching with a Trigram Index",
2012 — public write-up of the codesearch design).

Exact substring match ("grep the corpus") is the one retrieval mode the
tokenized inverted index cannot answer: the analyzer (ASCII ``\\W+``)
destroys intra-token and cross-token character structure. The classic
scale answer is a CHARACTER-trigram index: a document can contain the
needle only if it contains every trigram of the needle, so the trigram
posting lists prune the corpus to a candidate set that is then verified
exactly. Beyond-reference surface: the reference's search contract stops
at simple_query_string (core/models/search/query.py) — this operator adds
the grep-style exact-substring mode a code/web corpus needs.

Scale shape (100 TB): at scale the trigram postings are a BUILT index
(exactly like the term postings in index/build.py — one groupBy(trigram)
over the corpus, stored sorted); a query then reads only the needle's
|needle|-2 posting lists, AND-intersects them (groupBy(doc_id) count ==
n_grams — map-side combinable), and the exact ``contains`` verification
touches ONLY candidate documents via a semi-join back to the doc store.
Shuffle volume is O(candidate postings), never O(corpus text). This
operator runs the same dataflow inline: trigram extraction is a pure
array expression in the scan, the posting filter ``tg IN needle_grams``
is pushed below the only gram-keyed exchange, and the verify join is
doc_id-keyed. The candidate superset property (no false negatives) and
the bounded-verify shape are test-pinned (tests/test_substring.py).

Determinism: raw-text byte semantics (no lowercasing — grep semantics);
first_pos is 1-based in both engines (Spark ``instr`` == DuckDB
``strpos``); occurrence counts via non-overlapping ``replace`` length
arithmetic, identical in both engines; integer division (``div`` / ``//``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from harvester_spark.operators.common import load

# Needle set spans the selectivity range on the synthetic corpus:
# ~28 hits / 2 hits / 1 hit / 0 hits at sf0.01 (non-degeneracy test-pinned).
NEEDLES = [
    "merge batch",
    "window sort merge",
    "slow fast table",
    "qqqzzz xx",
]


def needle_trigrams(needle: str) -> list[str]:
    """Distinct character trigrams of a needle (sorted for determinism)."""
    if len(needle) < 3:
        raise ValueError(
            f"substring_search: needle {needle!r} shorter than 3 chars — "
            "a trigram index cannot prune; route to a full scan explicitly"
        )
    return sorted({needle[i : i + 3] for i in range(len(needle) - 2)})


def doc_trigrams(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, tg): DISTINCT character trigrams per doc, built
    as one array expression inside the scan (no UDF, no pre-explode)."""
    n = F.length("text")
    grams = F.when(n < 3, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - 2),
                lambda i: F.col("text").substr(i, F.lit(3)),
            )
        )
    )
    return docs.select("doc_id", F.explode(grams).alias("tg"))


def trigram_candidates(
    spark: SparkSession, docs: DataFrame, needles: list[str]
) -> DataFrame:
    """(needle, doc_id) candidate pairs: docs containing EVERY trigram of
    the needle. Guaranteed superset of the true match set (a substring
    occurrence contains all its trigrams) — never a false negative."""
    gram_rows = [
        (needle, g) for needle in needles for g in needle_trigrams(needle)
    ]
    gram_dim = F.broadcast(
        spark.createDataFrame(gram_rows, "needle string, tg string")
    )
    n_grams = F.broadcast(
        spark.createDataFrame(
            [(n, len(needle_trigrams(n))) for n in needles],
            "needle string, n_grams int",
        )
    )
    all_grams = sorted({g for _, g in gram_rows})
    postings = doc_trigrams(docs).filter(F.col("tg").isin(all_grams))
    return (
        postings.join(gram_dim, "tg")
        .groupBy("needle", "doc_id")
        .agg(F.count("*").alias("c"))
        .join(n_grams, "needle")
        .filter(F.col("c") == F.col("n_grams"))
        .select("needle", "doc_id")
    )


def ft_substring_search(spark, sf_dir) -> DataFrame:
    """Exact substring hits for each needle: (needle, doc_id, first_pos,
    n_occ) — trigram-pruned candidates, then exact verification on the
    candidate set only."""
    docs = load(spark, sf_dir, "documents")
    cand = trigram_candidates(spark, docs, NEEDLES)
    verified = (
        cand.join(docs.select("doc_id", "text"), "doc_id")
        .withColumn("first_pos", F.expr("instr(text, needle)").cast("long"))
        .filter(F.col("first_pos") > 0)
    )
    return verified.select(
        "needle",
        "doc_id",
        "first_pos",
        F.expr(
            "(length(text) - length(replace(text, needle, ''))) div length(needle)"
        )
        .cast("long")
        .alias("n_occ"),
    )


def _sql_values() -> str:
    return ", ".join(f"('{n}')" for n in NEEDLES)


SQL_SUBSTRING_SEARCH = f"""
WITH needles(needle) AS (VALUES {_sql_values()})
SELECT n.needle, d.doc_id,
       CAST(strpos(d.text, n.needle) AS BIGINT) AS first_pos,
       CAST((length(d.text) - length(replace(d.text, n.needle, '')))
            // length(n.needle) AS BIGINT) AS n_occ
FROM documents d, needles n
WHERE strpos(d.text, n.needle) > 0
"""


QUERIES = {
    "ft_substring_search": (ft_substring_search, SQL_SUBSTRING_SEARCH),
}


# ------------------------------------------------- regex over the trigram index

# Cox's second codesearch stage: a REGEX can be answered by the same
# trigram index by compiling the pattern into a boolean query over
# required literal trigrams — every match of ``merge (batch|window)``
# must contain all trigrams of "merge " AND (all trigrams of "batch" OR
# all of "window"). Candidates satisfying the boolean query are then
# verified with the real regex engine. Supported pattern class here:
# ``.*``-separated segments, each a literal or one parenthesized literal
# alternation (prefix(a|b)suffix) — enough for the AND-of-ORs plan shape;
# anything wider is a ValueError, not a silent full scan.
#
# Scale shape: the boolean query evaluates RELATIONALLY — postings join
# the (pattern, group, alt, trigram) dim (broadcast — it is query-sized),
# then three bounded aggs: alt satisfied (count == alt's gram count),
# group satisfied (any alt), pattern candidate (all groups). The regex
# engine runs ONLY on the candidate semi-join. Regex dialect: literals,
# ``|``, ``()``, ``.*`` — the subset where Java regex (Spark) and RE2
# (DuckDB) agree on both matching and leftmost-first extraction.

REGEXES = [
    "merge (batch|window)",
    "slow .* fast",
    "(fast|slow) table",
    "key agg row .* hash",
]


def regex_required_groups(pattern: str) -> list[list[list[str]]]:
    """pattern → AND-groups, each a list of OR-alternatives, each the
    alternative's trigram list. Groups whose every alternative is shorter
    than 3 chars are unprunable and dropped (they constrain nothing)."""
    import re as _re

    groups: list[list[list[str]]] = []
    for seg in pattern.split(".*"):
        if not seg:
            continue
        m = _re.fullmatch(r"([^()|]*)\(([^()]+)\)([^()|]*)", seg)
        if m:
            alts = [m.group(1) + a + m.group(3) for a in m.group(2).split("|")]
        elif _re.fullmatch(r"[^()|*+?\[\]{}\\^$.]*", seg):
            alts = [seg]
        else:
            raise ValueError(
                f"regex_search: unsupported pattern segment {seg!r} — "
                "supported class is .*-separated literals with one (a|b) "
                "alternation per segment"
            )
        if any(len(a) < 3 for a in alts):
            continue
        groups.append([needle_trigrams(a) for a in alts])
    return groups


def regex_candidates(
    spark: SparkSession, docs: DataFrame, patterns: list[str]
) -> DataFrame:
    """(pattern, doc_id) candidates satisfying every pattern's trigram
    AND-of-ORs. Superset of the true regex match set."""
    dim_rows, size_rows, ngroups_rows = [], [], []
    for p in patterns:
        groups = regex_required_groups(p)
        if not groups:
            raise ValueError(
                f"regex_search: pattern {p!r} has no prunable literals — "
                "route to a full scan explicitly"
            )
        ngroups_rows.append((p, len(groups)))
        for gix, alts in enumerate(groups):
            for aix, grams in enumerate(alts):
                size_rows.append((p, gix, aix, len(grams)))
                dim_rows.extend((p, gix, aix, g) for g in grams)
    gram_dim = F.broadcast(
        spark.createDataFrame(
            dim_rows, "pattern string, gix int, aix int, tg string"
        )
    )
    alt_size = F.broadcast(
        spark.createDataFrame(
            size_rows, "pattern string, gix int, aix int, n_grams int"
        )
    )
    n_groups = F.broadcast(
        spark.createDataFrame(ngroups_rows, "pattern string, n_groups int")
    )
    all_grams = sorted({r[3] for r in dim_rows})
    postings = doc_trigrams(docs).filter(F.col("tg").isin(all_grams))
    sat_alt = (
        postings.join(gram_dim, "tg")
        .groupBy("pattern", "doc_id", "gix", "aix")
        .agg(F.count("*").alias("c"))
        .join(alt_size, ["pattern", "gix", "aix"])
        .filter(F.col("c") == F.col("n_grams"))
    )
    sat_group = sat_alt.select("pattern", "doc_id", "gix").distinct()
    return (
        sat_group.groupBy("pattern", "doc_id")
        .agg(F.countDistinct("gix").alias("g"))
        .join(n_groups, "pattern")
        .filter(F.col("g") == F.col("n_groups"))
        .select("pattern", "doc_id")
    )


def ft_regex_search(spark, sf_dir) -> DataFrame:
    """Exact regex hits per pattern: (pattern, doc_id, match) — trigram
    boolean-query candidates, regex-verified; match = leftmost match."""
    docs = load(spark, sf_dir, "documents")
    cand = regex_candidates(spark, docs, REGEXES)
    return (
        cand.join(docs.select("doc_id", "text"), "doc_id")
        .filter(F.expr("regexp_like(text, pattern)"))
        .select(
            "pattern",
            "doc_id",
            F.expr("regexp_extract(text, pattern, 0)").alias("match"),
        )
    )


def _sql_regex_values() -> str:
    return ", ".join(f"('{p}')" for p in REGEXES)


SQL_REGEX_SEARCH = f"""
WITH pats(pattern) AS (VALUES {_sql_regex_values()})
SELECT p.pattern, d.doc_id,
       regexp_extract(d.text, p.pattern, 0) AS match
FROM documents d, pats p
WHERE regexp_matches(d.text, p.pattern)
"""


QUERIES["ft_regex_search"] = (ft_regex_search, SQL_REGEX_SEARCH)


# ------------------------------------------- wildcard over the trigram index

# ES `wildcard` query (`*` = any run, `?` = one char), answered by the same
# trigram index: every literal run of >= 3 chars must appear in a matching
# document, so candidates = docs containing all trigrams of all prunable
# runs (AND across runs — a superset by construction: a LIKE match contains
# every literal run as a substring). Exact verification is SQL LIKE
# (`*`→`%`, `?`→`_`, implicit anchors) on the candidate semi-join ONLY.
# A pattern with no >= 3-char literal run raises ValueError — the explicit
# "this needs a full scan" refusal, same policy as the regex parser.

WILDCARDS = [
    "merge*batch",
    "merg? b?tch",
    "dup*dup",
]


def _wildcard_runs(pattern: str) -> list[str]:
    runs = [r for r in re.split(r"[*?]", pattern) if len(r) >= 3]
    if not runs:
        raise ValueError(
            f"wildcard_search: pattern {pattern!r} has no literal run of "
            ">= 3 chars — a trigram index cannot prune; route to a full "
            "scan explicitly"
        )
    return sorted(set(runs))


def _wildcard_like(pattern: str) -> str:
    return "%" + pattern.replace("*", "%").replace("?", "_") + "%"


def ft_wildcard_search(spark, sf_dir) -> DataFrame:
    """(pattern, doc_id) wildcard matches: trigram-pruned run candidates
    intersected per pattern, LIKE-verified on the semi-join only."""
    docs = load(spark, sf_dir, "documents")
    run_rows = [(p, r) for p in WILDCARDS for r in _wildcard_runs(p)]
    all_runs = sorted({r for _, r in run_rows})
    run_dim = F.broadcast(
        spark.createDataFrame(run_rows, "pattern string, needle string")
    )
    n_runs = F.broadcast(
        spark.createDataFrame(
            [(p, len(_wildcard_runs(p))) for p in WILDCARDS],
            "pattern string, n_runs int",
        )
    )
    like_dim = F.broadcast(
        spark.createDataFrame(
            [(p, _wildcard_like(p)) for p in WILDCARDS], "pattern string, lk string"
        )
    )
    cand = (
        trigram_candidates(spark, docs, all_runs)
        .join(run_dim, "needle")
        .groupBy("pattern", "doc_id")
        .agg(F.countDistinct("needle").alias("c"))
        .join(n_runs, "pattern")
        .filter(F.col("c") == F.col("n_runs"))
        .select("pattern", "doc_id")
    )
    return (
        cand.join(docs.select("doc_id", "text"), "doc_id")
        .join(like_dim, "pattern")
        .filter(F.expr("text LIKE lk"))
        .select("pattern", "doc_id")
    )


def _sql_wildcard_values() -> str:
    return ", ".join(f"('{p}', '{_wildcard_like(p)}')" for p in WILDCARDS)


SQL_WILDCARD_SEARCH = f"""
WITH pats(pattern, lk) AS (VALUES {_sql_wildcard_values()})
SELECT p.pattern, d.doc_id
FROM documents d, pats p
WHERE d.text LIKE p.lk
"""


QUERIES["ft_wildcard_search"] = (ft_wildcard_search, SQL_WILDCARD_SEARCH)
