"""Serving-path result highlighting: best-fragment snippets with matched
terms wrapped in ``<em>`` tags, the OpenSearch/Lucene highlighter surface
the reference gets for free from its search backend.

Semantics are IDENTICAL to the distributed operator twin
(operators/text_analytics.ft_snippet_topk, oracle-gated): the best fragment
is the ``SNIP_W``-token window anchored at a query-term hit maximizing
(distinct matched terms, total hits), tie-break earliest anchor — and the
parity is test-enforced (tests/test_highlight.py runs both on the same
corpus and compares window choices).

Cost model: highlighting runs on the k RESULT docs only (the bounded-rerank
contract shared with recency boost) — a pyarrow point fetch of k text rows
plus an O(hits × SNIP_W) scan per doc. Nothing here touches the corpus or
the index, so the path is unchanged at 100 TB.
"""

from __future__ import annotations

from harvester_spark.analysis import tokenize

SNIP_W = 8  # keep in lockstep with operators/text_analytics.SNIP_W


def extract_positive_terms(query_text: str) -> tuple[set[str], list[str]]:
    """Highlightable (terms, prefixes) from a simple_query_string query:
    positive Term/Phrase words and Prefix stems; anything under ``-`` (Not)
    is excluded (a negated term never occurs in a matching doc anyway);
    Fuzzy variants are skipped (the matched surface form is per-doc —
    Lucene's default highlighter term extraction makes the same trade)."""
    from harvester_spark.search.sqs import And, Fuzzy, Not, Or, Phrase, Prefix, Term, parse

    terms: set[str] = set()
    prefixes: list[str] = []

    def walk(node, negated: bool):
        if node is None or negated:
            return
        if isinstance(node, Term):
            terms.add(node.term)
        elif isinstance(node, Phrase):
            terms.update(node.words)
        elif isinstance(node, Prefix):
            prefixes.append(node.prefix)
        elif isinstance(node, Fuzzy):
            pass
        elif isinstance(node, Not):
            walk(node.child, True)
        elif isinstance(node, (And, Or)):
            walk(node.left, negated)
            walk(node.right, negated)

    walk(parse(query_text), False)
    return terms, prefixes


def best_window(
    tokens: list[str], terms: set[str], prefixes: list[str] = (), w: int = SNIP_W
) -> tuple[int, int, int] | None:
    """(start, n_distinct_terms, n_hits) of the best w-token window, or None
    when no query term occurs. Anchors at hit positions; maximizes distinct
    matched token values then total hits, earliest anchor on ties — the
    exact ordering of the ft_snippet_topk window ranker."""

    def is_hit(t: str) -> bool:
        return t in terms or any(t.startswith(p) for p in prefixes)

    hits = [i for i, t in enumerate(tokens) if is_hit(t)]
    if not hits:
        return None
    best = None  # (-n_terms, -n_hits, start)
    for j, a in enumerate(hits):
        vals = set()
        n = 0
        for b in hits[j:]:
            if b > a + w - 1:
                break
            vals.add(tokens[b])
            n += 1
        key = (-len(vals), -n, a)
        if best is None or key < best:
            best = key
    return best[2], -best[0], -best[1]


def render_snippet(
    tokens: list[str], start: int, terms: set[str], prefixes: list[str] = (),
    w: int = SNIP_W,
) -> str:
    """The window's tokens joined with spaces, matched tokens ``<em>``-wrapped
    (the reference's OpenSearch default highlight markup)."""

    def fmt(t: str) -> str:
        if t in terms or any(t.startswith(p) for p in prefixes):
            return f"<em>{t}</em>"
        return t

    return " ".join(fmt(t) for t in tokens[start : start + w])


def highlight_text(text: str, query_text: str, w: int = SNIP_W) -> str | None:
    """text + raw query → best ``<em>``-marked snippet (None if no term
    occurs — OpenSearch omits the highlight entry for such fields)."""
    terms, prefixes = extract_positive_terms(query_text)
    if not terms and not prefixes:
        return None
    tokens = tokenize(text or "")
    win = best_window(tokens, terms, prefixes, w)
    if win is None:
        return None
    return render_snippet(tokens, win[0], terms, prefixes, w)
