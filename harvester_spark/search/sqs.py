"""``simple_query_string`` operator surface: ``-`` negation, ``|`` OR,
trailing-``*`` prefix, ``( )`` grouping, quoted phrases — over the index.

The reference queries OpenSearch with ``simple_query_string``,
``default_operator: and`` and ALL default flags enabled
(/root/reference/harvester/core/models/search/query.py:73-98), so its users
type ``-term``, ``a | b``, ``pre*`` and ``"exact phrase"`` in the search
box. Round 1/2 served only the AND + quoted-phrase subset; this module
completes the grammar:

Grammar (Lucene ``SimpleQueryParser`` subset — whitespace = the default
AND operator, ``|`` = OR, equal precedence, LEFT-associative, so
``a b | c`` ≡ ``(a AND b) OR c`` and ``a | b c`` ≡ ``(a OR b) AND c``)::

    query  := clause ( '|'? clause )*
    clause := '-'? atom
    atom   := '(' query ')' | '"' words '"' | WORD '*'?

``-`` negates only at the start of a whitespace-delimited chunk (so
``state-of-the-art`` stays four AND'ed terms, exactly like the plain
path); other un-grammatical input degrades leniently to terms, never an
error (SimpleQueryParser contract). ``~N`` fuzzy/slop and ``NEAR`` are not
implemented (the reference UI never emits them).

Matching is BooleanQuery semantics per level: positives intersect (AND) or
union (OR); a negated clause excludes its matches from the level's result
whichever operator joined it (``a | -b`` ≡ docs with a and without b — a
Lucene BooleanQuery applies MUST_NOT level-wide); a level with only
negative clauses matches nothing.

Scoring is Lucene BooleanQuery scoring, made bit-deterministic: a node
contributes only where the WHOLE node matches; leaves contribute the
shared-kernel BM25 of their term (phrases: constituent terms in
(df asc, term asc) order, the existing phrase contract), prefixes
contribute constant 1.0 per matching doc (Lucene's CONSTANT_SCORE rewrite
for multi-term expansion); children accumulate in parse order. The
brute-force oracle walks the SAME tree over re-tokenized text with an
independent matcher, so engine == oracle holds to the last float bit.

Scale: every leaf decodes via the block interface (works over
DeltaSearcher's merged view too); prefix expansion pushes a range filter
into the dictionary scan. Set algebra runs on sorted int64 id arrays.
Prefix expansion over a delta'd index uses the BASE dictionary until
compaction (brand-new delta-only terms won't expand; documented gap).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd

from harvester_spark.analysis import ALL_LANG, tokenize
from harvester_spark.search import bm25
from harvester_spark.search.engine import IndexSearcher, SearchResult

_WORD_RE = re.compile(r"[A-Za-z0-9_]+", re.ASCII)


# ------------------------------------------------------------------ AST


@dataclass
class Term:
    term: str


@dataclass
class Prefix:
    prefix: str


@dataclass
class Phrase:
    words: list


@dataclass
class Not:
    child: object


@dataclass
class And:
    left: object
    right: object


@dataclass
class Or:
    left: object
    right: object


# ---------------------------------------------------------------- lexer


def _lex(q: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
            continue
        if c == '"':
            j = q.find('"', i + 1)
            if j == -1:  # unbalanced quote: lenient — rest of string is the phrase
                out.append(("PHRASE", q[i + 1 :]))
                i = n
            else:
                out.append(("PHRASE", q[i + 1 : j]))
                i = j + 1
            continue
        if c in "()|":
            out.append((c, c))
            i += 1
            continue
        if c == "-":
            prev = q[i - 1] if i > 0 else " "
            nxt = q[i + 1] if i + 1 < n else " "
            # negation only at the start of a chunk (after space / ( / | )
            if (prev.isspace() or prev in "(|") and not nxt.isspace() and nxt not in ")|":
                out.append(("NOT", "-"))
            i += 1
            continue
        m = _WORD_RE.match(q, i)
        if m:
            w = m.group(0).lower()
            i = m.end()
            if i < n and q[i] == "*":
                out.append(("PREFIX", w))
                i += 1
            else:
                out.append(("WORD", w))
            continue
        i += 1  # analyzer-invisible punctuation
    return out


# --------------------------------------------------------------- parser


def parse(query_text: str):
    """Query string → AST root (None for an empty/operator-less-empty query)."""
    node, _pos = _parse(_lex(query_text or ""), 0, depth=0)
    return node


def _parse(tokens: list, pos: int, depth: int = 0):
    cur = None
    pending_or = False
    negate_next = False
    while pos < len(tokens):
        tt, tv = tokens[pos]
        if tt == ")":
            pos += 1
            if depth > 0:
                break
            continue  # stray ')' at top level: lenient skip
        if tt == "|":
            pending_or = True
            pos += 1
            continue
        if tt == "NOT":
            negate_next = True
            pos += 1
            continue
        if tt == "(":
            node, pos = _parse(tokens, pos + 1, depth + 1)
        elif tt == "PHRASE":
            words = tokenize(tv)
            node = (
                Phrase(words) if len(words) > 1 else (Term(words[0]) if words else None)
            )
            pos += 1
        elif tt == "PREFIX":
            node = Prefix(tv)
            pos += 1
        else:  # WORD
            node = Term(tv)
            pos += 1
        if node is None:  # empty parens / empty phrase: lenient no-op
            negate_next = False
            continue
        if negate_next:
            node = Not(node)
            negate_next = False
        if cur is None:
            cur = node
        elif pending_or:
            cur = Or(cur, node)
        else:
            cur = And(cur, node)
        pending_or = False
    return cur, pos


def has_operators(query_text: str) -> bool:
    """True when the query uses grammar beyond plain AND terms + phrases —
    the router between the optimized plain paths and the SQS evaluator."""
    return any(tt in ("NOT", "PREFIX", "(", "|") for tt, _tv in _lex(query_text or ""))


# ------------------------------------------------------- engine evaluation


class _IndexEval:
    """Match + score evaluation over an :class:`IndexSearcher` (or any
    subclass serving the block interface, e.g. DeltaSearcher)."""

    def __init__(self, searcher: IndexSearcher, lang: str):
        self.searcher = searcher
        self.lang = lang
        self._postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._dfs: dict[str, int] = {}
        self._prefix_terms: dict[str, list[str]] = {}

    # -- leaf data ---------------------------------------------------------

    def load_terms(self, terms: list[str]) -> None:
        missing = sorted({t for t in terms if t not in self._postings})
        if not missing:
            return
        from harvester_spark.index.codec import decode_blocks_batch

        self._dfs.update(self.searcher._dfs(missing, self.lang))
        blocks = self.searcher._term_postings(missing, self.lang)
        for t in missing:
            tb = blocks[blocks["term"] == t]
            if len(tb) == 0:
                self._postings[t] = (np.empty(0, np.int64), np.empty(0, np.int64))
                continue
            ids, tfv = decode_blocks_batch(
                tb["base_doc_id"].to_numpy(),
                tb["n"].to_numpy(),
                [bytes(b) for b in tb["doc_deltas"]],
                [bytes(b) for b in tb["tfs"]],
            )
            order = np.argsort(ids, kind="stable")
            self._postings[t] = (ids[order], tfv[order])

    def expand_prefix(self, prefix: str) -> list[str]:
        if prefix in self._prefix_terms:
            return self._prefix_terms[prefix]
        s = self.searcher
        hi = prefix + "\x7f"  # ASCII analyzer: '\x7f' > every token char
        if s._pa_dictionary is not None:
            import pyarrow.dataset as ds

            flt = (
                (ds.field("term") >= prefix)
                & (ds.field("term") < hi)
                & (ds.field("lang") == self.lang)
            )
            terms = s._pa_dictionary.to_table(
                filter=flt, columns=["term"]
            )["term"].to_pylist()
        else:
            from pyspark.sql import functions as F

            terms = [
                r["term"]
                for r in s.dictionary.filter(
                    (F.col("lang") == self.lang)
                    & (F.col("term") >= prefix)
                    & (F.col("term") < hi)
                )
                .select("term")
                .collect()
            ]
        # common-grams bigram tokens (contain a space) never surface here
        out = sorted({t for t in terms if t.startswith(prefix) and " " not in t})
        self._prefix_terms[prefix] = out
        return out

    # -- match sets --------------------------------------------------------

    def match_ids(self, node) -> np.ndarray:
        """Sorted docIDs matching ``node`` (top-level Not matches nothing)."""
        if isinstance(node, Not):
            return np.empty(0, np.int64)
        if isinstance(node, Term):
            self.load_terms([node.term])
            return self._postings[node.term][0]
        if isinstance(node, Prefix):
            terms = self.expand_prefix(node.prefix)
            if not terms:
                return np.empty(0, np.int64)
            self.load_terms(terms)
            ids = [self._postings[t][0] for t in terms]
            return np.unique(np.concatenate(ids))
        if isinstance(node, Phrase):
            from harvester_spark.search.phrase import phrase_match_ids

            return phrase_match_ids(self.searcher, " ".join(node.words), self.lang)
        if isinstance(node, (And, Or)):
            l_neg, r_neg = isinstance(node.left, Not), isinstance(node.right, Not)
            lm = None if l_neg else self.match_ids(node.left)
            rm = None if r_neg else self.match_ids(node.right)
            if isinstance(node, And):
                if lm is None and rm is None:
                    m = np.empty(0, np.int64)  # pure-negative level
                elif lm is None:
                    m = rm
                elif rm is None:
                    m = lm
                else:
                    m = lm[bm25.sorted_member_mask(lm, rm)]
            else:
                parts = [x for x in (lm, rm) if x is not None]
                m = (
                    np.unique(np.concatenate(parts))
                    if parts
                    else np.empty(0, np.int64)
                )
            # BooleanQuery MUST_NOT applies level-wide, whatever joined it
            for neg, child in ((l_neg, node.left), (r_neg, node.right)):
                if neg and m.size:
                    ex = self.match_ids(child.child)
                    m = m[~bm25.sorted_member_mask(m, ex)]
            return m
        raise TypeError(f"unknown node {node!r}")

    # -- scoring -----------------------------------------------------------

    def score(self, node, M: np.ndarray, dl: np.ndarray, n_docs: int, avgdl: float):
        """(match mask over M, score vector over M) for ``node`` —
        recursive BooleanQuery scoring: a node's scores are zero wherever
        the node as a whole does not match."""
        if isinstance(node, Term):
            self.load_terms([node.term])
            ids, tfv = self._postings[node.term]
            mask = bm25.sorted_member_mask(M, ids)
            scores = np.zeros(M.size, dtype=np.float64)
            if mask.any():
                pos = np.searchsorted(ids, M[mask])
                scores[mask] = bm25.idf(n_docs, self._dfs[node.term]) * bm25.tf_norm(
                    tfv[pos], dl[mask], avgdl
                )
            return mask, scores
        if isinstance(node, Prefix):
            pm = self.match_ids(node)
            mask = bm25.sorted_member_mask(M, pm)
            return mask, mask.astype(np.float64)  # CONSTANT_SCORE = 1.0
        if isinstance(node, Phrase):
            pm = self.match_ids(node)
            mask = bm25.sorted_member_mask(M, pm)
            scores = np.zeros(M.size, dtype=np.float64)
            if mask.any():
                self.load_terms(node.words)
                for t in bm25.term_order(sorted(set(node.words)), self._dfs):
                    ids, tfv = self._postings[t]
                    pos = np.searchsorted(ids, M[mask])
                    scores[mask] += bm25.idf(n_docs, self._dfs[t]) * bm25.tf_norm(
                        tfv[pos], dl[mask], avgdl
                    )
            return mask, scores
        if isinstance(node, (And, Or)):
            l_neg, r_neg = isinstance(node.left, Not), isinstance(node.right, Not)
            sides = []
            for neg, child in ((l_neg, node.left), (r_neg, node.right)):
                if not neg:
                    sides.append(self.score(child, M, dl, n_docs, avgdl))
            if not sides:
                z = np.zeros(M.size, dtype=np.float64)
                return np.zeros(M.size, dtype=bool), z
            if isinstance(node, And) and len(sides) == 2:
                mask = sides[0][0] & sides[1][0]
            elif isinstance(node, And):
                mask = sides[0][0]
            else:
                mask = sides[0][0]
                for m2, _s in sides[1:]:
                    mask = mask | m2
            for neg, child in ((l_neg, node.left), (r_neg, node.right)):
                if neg:
                    ex = self.match_ids(child.child)
                    mask = mask & ~bm25.sorted_member_mask(M, ex)
            scores = sides[0][1].copy()
            for _m2, s2 in sides[1:]:
                scores += s2
            scores[~mask] = 0.0
            return mask, scores
        raise TypeError(f"unknown node {node!r}")


def sqs_search(
    searcher: IndexSearcher,
    query_text: str,
    k: int = 10,
    lang: str = ALL_LANG,
    allowed_doc_ids=None,
    page: int = 1,
) -> SearchResult:
    """Full simple_query_string search → exact top-k + exact total."""
    empty = pd.DataFrame(columns=["rank", "doc_id", "score"])
    root = parse(query_text)
    if root is None:
        return SearchResult(query_text, lang, empty, 0)
    ev = _IndexEval(searcher, lang)
    M = ev.match_ids(root)
    if allowed_doc_ids is not None and M.size:
        from harvester_spark.search.allowed import allowed_filter_mask

        M = M[allowed_filter_mask(allowed_doc_ids, M)]
    if M.size == 0:
        return SearchResult(query_text, lang, empty, 0)
    n_docs, avgdl = searcher._corpus_stats[lang]
    dl = searcher._doc_lens()[M]
    _mask, scores = ev.score(root, M, dl, n_docs, avgdl)
    total = int(M.size)
    top = bm25.topk_order(scores, M, page * k)[(page - 1) * k :]
    topk = pd.DataFrame(
        {
            "rank": np.arange((page - 1) * k + 1, (page - 1) * k + 1 + len(top)),
            "doc_id": M[top].astype(np.int64),
            "score": scores[top],
        }
    )
    return SearchResult(query_text, lang, topk, total)


# ------------------------------------------------------ brute-force oracle


class _BruteEval:
    """The same tree walk over re-tokenized text — independent matcher,
    shared kernel, shared accumulation order → bit-identical by design."""

    def __init__(self, tokens: list[list[str]]):
        self.tokens = tokens
        self._tf: dict[str, np.ndarray] = {}

    def tf(self, term: str) -> np.ndarray:
        if term not in self._tf:
            self._tf[term] = np.array(
                [ts.count(term) for ts in self.tokens], dtype=np.float64
            )
        return self._tf[term]

    def df(self, term: str) -> int:
        return int((self.tf(term) > 0).sum())

    def match(self, node) -> np.ndarray:
        n = len(self.tokens)
        if isinstance(node, Not):
            return np.zeros(n, dtype=bool)
        if isinstance(node, Term):
            return self.tf(node.term) > 0
        if isinstance(node, Prefix):
            m = np.zeros(n, dtype=bool)
            for i, ts in enumerate(self.tokens):
                m[i] = any(t.startswith(node.prefix) for t in ts)
            return m
        if isinstance(node, Phrase):
            m = np.zeros(n, dtype=bool)
            w = node.words
            for i, ts in enumerate(self.tokens):
                m[i] = any(
                    ts[j : j + len(w)] == w for j in range(len(ts) - len(w) + 1)
                )
            return m
        if isinstance(node, (And, Or)):
            l_neg, r_neg = isinstance(node.left, Not), isinstance(node.right, Not)
            lm = None if l_neg else self.match(node.left)
            rm = None if r_neg else self.match(node.right)
            if isinstance(node, And):
                if lm is None and rm is None:
                    m = np.zeros(n, dtype=bool)
                elif lm is None:
                    m = rm
                elif rm is None:
                    m = lm
                else:
                    m = lm & rm
            else:
                m = np.zeros(n, dtype=bool)
                for x in (lm, rm):
                    if x is not None:
                        m |= x
            for neg, child in ((l_neg, node.left), (r_neg, node.right)):
                if neg:
                    m &= ~self.match(child.child)
            return m
        raise TypeError(f"unknown node {node!r}")

    def score(self, node, cand: np.ndarray, dl, n_docs, avgdl):
        if isinstance(node, Term):
            tfv = self.tf(node.term)[cand]
            mask = tfv > 0
            scores = np.zeros(cand.size, dtype=np.float64)
            if mask.any():
                scores[mask] = bm25.idf(n_docs, self.df(node.term)) * bm25.tf_norm(
                    tfv[mask], dl[cand][mask], avgdl
                )
            return mask, scores
        if isinstance(node, Prefix):
            mask = self.match(node)[cand]
            return mask, mask.astype(np.float64)
        if isinstance(node, Phrase):
            mask = self.match(node)[cand]
            scores = np.zeros(cand.size, dtype=np.float64)
            if mask.any():
                dfs = {t: self.df(t) for t in set(node.words)}
                for t in bm25.term_order(sorted(set(node.words)), dfs):
                    tfv = self.tf(t)[cand][mask]
                    scores[mask] += bm25.idf(n_docs, dfs[t]) * bm25.tf_norm(
                        tfv, dl[cand][mask], avgdl
                    )
            return mask, scores
        if isinstance(node, (And, Or)):
            l_neg, r_neg = isinstance(node.left, Not), isinstance(node.right, Not)
            sides = []
            for neg, child in ((l_neg, node.left), (r_neg, node.right)):
                if not neg:
                    sides.append(self.score(child, cand, dl, n_docs, avgdl))
            if not sides:
                return (
                    np.zeros(cand.size, dtype=bool),
                    np.zeros(cand.size, dtype=np.float64),
                )
            if isinstance(node, And) and len(sides) == 2:
                mask = sides[0][0] & sides[1][0]
            elif isinstance(node, And):
                mask = sides[0][0]
            else:
                mask = sides[0][0]
                for m2, _s in sides[1:]:
                    mask = mask | m2
            for neg, child in ((l_neg, node.left), (r_neg, node.right)):
                if neg:
                    mask = mask & ~self.match(child.child)[cand]
            scores = sides[0][1].copy()
            for _m2, s2 in sides[1:]:
                scores += s2
            scores[~mask] = 0.0
            return mask, scores
        raise TypeError(f"unknown node {node!r}")


def brute_force_sqs(
    docs: pd.DataFrame, query_text: str, k: int = 10, lang: str = ALL_LANG
) -> pd.DataFrame:
    """Oracle: same grammar + scoring over re-tokenized text."""
    sub = docs if lang == ALL_LANG else docs[docs["lang"] == lang]
    sub = sub.reset_index(drop=True)
    root = parse(query_text)
    if root is None or len(sub) == 0:
        return pd.DataFrame(columns=["rank", "doc_id", "score"])
    tokens = [tokenize(t) for t in sub["text"].fillna("")]
    dl = np.array([len(ts) for ts in tokens], dtype=np.float64)
    n_docs = len(sub)
    avgdl = float(dl.mean())
    ev = _BruteEval(tokens)
    m = ev.match(root)
    cand = np.flatnonzero(m)
    if cand.size == 0:
        return pd.DataFrame(columns=["rank", "doc_id", "score"])
    _mask, scores = ev.score(root, cand, dl, n_docs, avgdl)
    doc_ids = sub["doc_id"].to_numpy()[cand]
    top = bm25.topk_order(scores, doc_ids, k)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "doc_id": doc_ids[top].astype(np.int64),
            "score": scores[top],
        }
    )
