"""Golden-output extractor tests — byte-identity per input (BASELINE input_hint).

Mirrors the reference's golden seeding/model test style
(/root/reference/harvester/products/tests/models/test_product_document.py):
expected outputs are written literally so the spec is pinned independently of
the implementation.
"""

import pandas as pd
import pytest

from harvester_spark.extract import (
    TEXT_CAP_CHARS,
    TEXT_CAP_WORDS,
    extract_text,
    extract_text_series,
)

GOLDEN = [
    (b"<html><body><p>hello world</p></body></html>", "hello world"),
    (b"<p>a</p><p>b</p>", "a b"),
    # script/style/noscript dropped entirely, incl. their text
    (b"<script>var x = 1 < 2;</script>keep<style>.a{}</style>", "keep"),
    (b"<noscript>nope</noscript>yes", "yes"),
    # page chrome dropped with its text (trafilatura-style main content)
    (b"<nav>menu a b</nav><p>content</p><footer>(c) 2024</footer>", "content"),
    (b"<header>site title</header>body<aside>related</aside>", "body"),
    # comments dropped, including multiline
    (b"<!-- a \n b -->text", "text"),
    # entities unescaped AFTER tag stripping: literal &lt;tag&gt; survives
    (b"<p>x &amp; y &lt;tag&gt;</p>", "x & y <tag>"),
    (b"caf\xc3\xa9 &nbsp; na\xc3\xafve", "caf\xe9 na\xefve"),
    # broken/unclosed markup: tag regex consumes up to the first '>'; a
    # trailing fragment with no '>' is not a tag and survives as text
    (b'<div class="a<b" <p>body</p></div', "body </div"),
    # numeric entity
    (b"&#65;&#x42;", "AB"),
    # invalid UTF-8 byte -> U+FFFD replacement
    (b"ok \xff bad", "ok � bad"),
    # whitespace runs (tabs, newlines, NBSP after unescape) collapse
    (b"a\t\t b\n\nc&nbsp;d", "a b c d"),
    (b"", ""),
    (b"   ", ""),
]


@pytest.mark.parametrize("html,expected", GOLDEN, ids=range(len(GOLDEN)))
def test_extract_golden(html, expected):
    assert extract_text(html) == expected


def test_series_matches_scalar():
    htmls = [h for h, _ in GOLDEN]
    out = extract_text_series(pd.Series(htmls))
    assert list(out) == [extract_text(h) for h in htmls]


def test_truncation_rule():
    # >= 1,000,000 chars -> first 10,000 space-split words
    # (/root/reference/harvester/files/models/datatypes/file.py:182-185)
    word = "tok"
    n_words = (TEXT_CAP_CHARS // (len(word) + 1)) + 10
    body = " ".join([word] * n_words)
    assert len(body) >= TEXT_CAP_CHARS
    out = extract_text(f"<p>{body}</p>".encode())
    assert out == " ".join([word] * TEXT_CAP_WORDS)
    # one char below the cap: untouched
    under = "a" * (TEXT_CAP_CHARS - 1)
    assert extract_text(under.encode()) == under


def test_spark_udf_matches_scalar(spark):
    from pyspark.sql import functions as F
    from harvester_spark.extract import extract_text_udf

    df = spark.createDataFrame([(h,) for h, _ in GOLDEN if h], "html binary")
    got = [r["t"] for r in df.select(extract_text_udf()(F.col("html")).alias("t")).collect()]
    assert got == [extract_text(h) for h, _ in GOLDEN if h]
