"""Real byte-pair encoding over the analyzer's word stream.

Round-3 upgrade of the "BPE-ish" regex counter: actual BPE merges applied in
training order, so training-prep token counts match what a real pipeline
would pack by. The merge table below is a FROZEN TOKENIZER ASSET (the way
GPT-2 ships merges.txt): 64 merges trained once with the classic Sennrich
procedure (count adjacent symbol pairs over the word-frequency table, merge
the most frequent, repeat; ties break lexicographically) over the sf0.01
``documents`` corpus, then committed as a literal. Training code:
tools/train_bpe.py.

Encoding is the standard merge-list fold: for each merge (a, b) in training
order, replace every adjacent (a, b) token pair with ``ab``, exhaustively,
then move to the next merge. This equals priority-queue BPE encoding because
a merge's operands are produced only by EARLIER merges — once merge i has
been exhausted it can never become applicable again (merging j > i creates
tokens that participate only in merges > j).

The fold runs as PURE STRING REPLACES inside whole-stage codegen / DuckDB
vectorized expressions — no UDF. Words are rendered with DOUBLE-separator
boundaries::

    table  →  ␟␟t␟␟a␟␟b␟␟l␟␟e␟␟        (␟ = 0x1f, outside the token alphabet)

and merge (a, b) is the literal replace  ``␟a␟␟b␟`` → ``␟ab␟``. The double
separator is what makes one replace pass per merge EXACT BPE:

- token boundaries on both sides of the pattern prevent partial-token
  matches (``xa·b`` never matches merge (a, b));
- consecutive occurrences share a boundary; each match consumes only ONE of
  the boundary's two separators, so left-to-right non-overlapping replace
  (Java and DuckDB semantics agree) merges ``a b a b`` into ``ab ab`` in one
  pass, and overlapping runs (``a a a`` under merge (a, a)) merge leftmost —
  exactly the reference BPE behavior (tested against a pure-Python encoder).

Token count per word = separators/2 - 1 (every token is framed by double
separators). All integers — cross-engine hash-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

SEP = "\x1f"

# frozen tokenizer asset — see module docstring; do not re-derive at runtime
BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"), ("m", "er"),
    ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"), ("j", "o"), ("jo", "in"),
    ("a", "s"), ("as", "h"), ("h", "ash"), ("r", "ow"), ("at", "c"),
    ("atc", "h"), ("b", "atch"), ("a", "n"), ("c", "an"), ("s", "can"),
    ("c", "o"), ("c", "u"), ("co", "lu"), ("colu", "m"), ("colum", "n"),
    ("cu", "st"), ("cust", "o"), ("custo", "mer"), ("f", "i"), ("fi", "l"),
    ("fil", "t"), ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"),
    ("s", "mall"), ("g", "e"), ("l", "ow"), ("mer", "ge"), ("s", "low"),
    ("c", "t"), ("ct", "or"), ("d", "er"), ("e", "ctor"), ("or", "der"),
    ("v", "ector"), ("in", "e"), ("l", "ine"), ("a", "b"), ("ab", "l"),
    ("abl", "e"), ("at", "a"), ("d", "ata"), ("t", "able"), ("u", "p"),
    ("a", "g"), ("ag", "g"), ("a", "lu"), ("alu", "e"), ("v", "alue"),
    ("e", "y"), ("k", "ey"),
]


def bpe_encode_col(word: Column) -> Column:
    """Encoded double-separator rendering of one word after all merges."""
    s = F.concat(F.lit(SEP * 2), F.regexp_replace(word, "(.)", "$1" + SEP * 2))
    for a, b in BPE_MERGES:
        s = F.replace(
            s, F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"), F.lit(f"{SEP}{a}{b}{SEP}")
        )
    return s


def bpe_token_count_col(word: Column) -> Column:
    """Token count of one word under the frozen merge table (JVM-only)."""
    enc = bpe_encode_col(word)
    seps = F.length(enc) - F.length(F.replace(enc, F.lit(SEP), F.lit("")))
    return (seps / F.lit(2) - F.lit(1)).cast("long")


def bpe_encode_py(word: str) -> list[str]:
    """Independent pure-Python reference encoder (classic merge fold over a
    token list) — the unit-test golden for the string-replace formulation."""
    toks = list(word)
    for a, b in BPE_MERGES:
        out: list[str] = []
        i = 0
        while i < len(toks):
            if i < len(toks) - 1 and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def sql_bpe_token_count(wexpr: str) -> str:
    """DuckDB expression: BPE token count of word expression ``wexpr`` —
    the identical seed + replace chain (RE2/DuckDB string semantics match
    Java's left-to-right non-overlapping replace)."""
    s = f"(repeat(chr(31), 2) || regexp_replace({wexpr}, '(.)', '\\1' || repeat(chr(31), 2), 'g'))"
    for a, b in BPE_MERGES:
        pat = f"chr(31) || '{a}' || chr(31) || chr(31) || '{b}' || chr(31)"
        rep = f"chr(31) || '{a}{b}' || chr(31)"
        s = f"replace({s}, {pat}, {rep})"
    return f"((length({s}) - length(replace({s}, chr(31), ''))) // 2 - 1)"
