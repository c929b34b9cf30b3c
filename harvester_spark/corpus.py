"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the BASELINE.json ``input_hint`` table
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
fully distributed (``spark.range`` → ``mapInPandas``) with **per-doc_ix
determinism**: every document's randomness comes from a Philox counter RNG
keyed ``(seed, doc_ix)``, so the corpus is byte-identical regardless of
partition count, task retries, or AQE — the property the docID-assignment and
resume tests rely on.

Shape follows FIXTURES.md §1 and mirrors the reference's deterministic test
generators (sequence-numbered seeds, language round-robin en/nl/unk —
/root/reference/harvester/testing/utils/generators.py:13-28):

- Zipf-distributed ~5,000-term vocabulary (head-term skew for the salted /
  range-partitioned merge paths) + per-doc rare ``term_{doc_ix}`` markers,
- planted multi-word phrases used by the query set; a zero-hit term is
  reserved (never generated); ``nlonlyterm`` appears only in nl docs,
- doc lengths log-normal, clamped to [50, 2000] words,
- HTML wraps the body with boilerplate (head/title/script/style/comments);
  adversarial variants (broken tags, entities, multibyte UTF-8, and a
  >=1,000,000-char body exercising the 10,000-word truncation rule of
  /root/reference/harvester/files/models/datatypes/file.py:182-185),
- the golden ``text`` column is computed by running :func:`extract.extract_text`
  on the generated HTML inside the same batch — the corpus carries its own
  extraction ground truth per url.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from harvester_spark.extract import extract_text

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.07
SETS = ("alpha", "bravo", "charlie", "delta")
EPOCH = np.datetime64("1970-01-01T00:00:00")

# Planted phrases for the reference query set; ZERO_HIT_TERM is never emitted.
PHRASES = (
    "inverted index construction",
    "block max wand",
    "dutch decompound analyzer",
    "atomic alias promotion",
    "relevance judgment ratings",
)
ZERO_HIT_TERM = "zzznohit"
NL_ONLY_TERM = "nlonlyterm"
BIG_DOC_EVERY = 4999  # doc_ix % BIG_DOC_EVERY == BIG_DOC_EVERY-1 → ~1M chars

_vocab = np.array([f"w{i:05d}" for i in range(VOCAB_SIZE)])
_ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
_weights = 1.0 / _ranks**ZIPF_S
_CDF = np.cumsum(_weights) / _weights.sum()

CORPUS_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _doc_rng(doc_ix: int) -> np.random.Generator:
    return np.random.Generator(np.random.Philox(key=[SEED, int(doc_ix)]))


def doc_lang(doc_ix: int) -> str:
    return ("en", "nl", "unk")[doc_ix % 3]


def doc_url(doc_ix: int) -> str:
    return f"https://example.org/{SETS[doc_ix % len(SETS)]}/{doc_ix:08d}"


def _doc_words(doc_ix: int) -> list[str]:
    rng = _doc_rng(doc_ix)
    length = int(np.clip(np.exp(rng.normal(5.0, 0.9)), 50, 2000))
    words = list(_vocab[np.searchsorted(_CDF, rng.random(length))])
    if doc_ix % 7 == 0:
        words.insert(int(rng.integers(0, len(words))), f"term_{doc_ix}")
    if doc_ix % 11 == 0:
        phrase = PHRASES[doc_ix % len(PHRASES)].split()
        pos = int(rng.integers(0, len(words)))
        words[pos:pos] = phrase
    if doc_lang(doc_ix) == "nl" and doc_ix % 13 == 1:
        words.append(NL_ONLY_TERM)
    if doc_ix % BIG_DOC_EVERY == BIG_DOC_EVERY - 1:
        # ~1M+ chars to exercise the 10k-word truncation rule.
        reps = (1_100_000 // (len(" ".join(words)) + 1)) + 1
        words = words * reps
    return words


def _doc_html(doc_ix: int, words: list[str]) -> bytes:
    body = " ".join(words)
    title = f"Document {doc_ix} — {words[0]}"
    boiler_script = "<script>var x = 1 < 2 && 3 > 2;</script>"
    boiler_style = "<style>.c { color: red; }</style>"
    comment = f"<!-- crawl doc {doc_ix} \n multiline -->"
    if doc_ix % 17 == 0:
        # Adversarial: broken/unclosed markup, stray angle brackets in attrs.
        para = f'<div class="a<b" <p>{body}</p></div'
    elif doc_ix % 23 == 0:
        # Adversarial: entities + multibyte UTF-8 + NBSP runs.
        body = body.replace(" ", "&nbsp;", 3)
        para = f"<p>café &amp; naïve — {body} &lt;tag&gt;</p>"
    else:
        para = f"<p>{body}</p>"
    html = (
        f"<!DOCTYPE html><html><head><title>{title}</title>{boiler_style}"
        f"{boiler_script}</head><body>{comment}<h1>{title}</h1>{para}"
        f"<footer>footer boilerplate</footer></body></html>"
    )
    return html.encode("utf-8")


def corpus_pdf(doc_ixs: np.ndarray) -> pd.DataFrame:
    """Pure generator for a batch of doc indices — used by tests and Spark."""
    rows = []
    for doc_ix in doc_ixs:
        doc_ix = int(doc_ix)
        html = _doc_html(doc_ix, _doc_words(doc_ix))
        rows.append(
            (
                doc_url(doc_ix),
                EPOCH + np.timedelta64(doc_ix * 137, "s"),
                html,
                extract_text(html),
                doc_lang(doc_ix),
            )
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def generate_corpus(spark, n_docs: int, num_partitions: int | None = None):
    """Distributed corpus DataFrame; deterministic for a given ``n_docs``."""
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
        num_partitions = max(1, min(num_partitions, max(1, n_docs // 64)))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield corpus_pdf(pdf["id"].values)

    return (
        spark.range(0, n_docs, numPartitions=num_partitions)
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
    )


def write_corpus(spark, path: str, n_docs: int, num_partitions: int | None = None):
    generate_corpus(spark, n_docs, num_partitions).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
