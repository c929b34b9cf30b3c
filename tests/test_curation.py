"""Curation operators on crafted real-world strings.

The oracle-parity gate (test_oracle_parity.py) proves Spark==DuckDB on the
synthesized corpus inputs; these tests pin the DETECTION/CANONICALIZATION
semantics themselves on realistic strings the synthetic corpus can't carry.
"""

from pyspark.sql import functions as F

from harvester_spark.operators.curation import canonicalize_url, redact_pii


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "page_text string")
    return redact_pii(df, "page_text").collect()[0]


class TestRedactPii:
    def test_email_variants(self, spark):
        r = _one(spark, "mail first.last+tag@sub.example.co.uk or bob@x.io now")
        assert r.n_emails == 2
        assert r.redacted_text == "mail <EMAIL> or <EMAIL> now"

    def test_phone_and_ip(self, spark):
        r = _one(spark, "call +31612345678; server at 192.168.1.200 is up")
        assert (r.n_phones, r.n_ips) == (1, 1)
        assert r.redacted_text == "call <PHONE>; server at <IP> is up"

    def test_ip_word_boundary(self, spark):
        # version strings like 1.2.3.4000 must not match as an IP
        r = _one(spark, "release 1.2.3.4000 shipped")
        assert r.n_ips == 0
        assert r.redacted_text == "release 1.2.3.4000 shipped"

    def test_clean_text_untouched(self, spark):
        t = "no pii in this sentence at all"
        r = _one(spark, t)
        assert (r.n_emails, r.n_phones, r.n_ips) == (0, 0, 0)
        assert r.redacted_text == t

    def test_mixed_counts(self, spark):
        r = _one(spark, "a@b.org c@d.net +31699999999 +31600000000 10.0.0.1")
        assert (r.n_emails, r.n_phones, r.n_ips) == (2, 2, 1)

    def test_mixed_case_email(self, spark):
        r = _one(spark, "Contact Bob.Smith@Example.COM today")
        assert r.n_emails == 1
        assert r.redacted_text == "Contact <EMAIL> today"


def _canon(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return canonicalize_url(df).collect()[0].canonical_url


class TestCanonicalizeUrl:
    def test_variants_collapse(self, spark):
        urls = [
            "https://Example.org/a/5",
            "https://example.org/a/5/",
            "https://example.org/a/5?utm_source=feed&utm_campaign=x",
            "http://www.example.org/a/5#frag",
            "HTTPS is not a url scheme here",  # no scheme prefix → passthrough-ish
        ]
        canons = {u: _canon(spark, u) for u in urls}
        assert len({canons[u] for u in urls[:4]}) == 1
        assert canons[urls[0]] == "example.org/a/5"

    def test_keeps_non_tracking_params(self, spark):
        assert (
            _canon(spark, "https://example.org/search?q=spark&utm_source=x")
            == "example.org/search?q=spark"
        )

    def test_utm_strip_is_boundary_anchored(self, spark):
        # a param whose NAME merely contains 'utm_' must survive intact
        assert (
            _canon(spark, "https://example.org/p?noutm_x=1")
            == "example.org/p?noutm_x=1"
        )
        # utm leading with a real param following keeps the real param
        assert (
            _canon(spark, "https://example.org/p?utm_a=1&q=2")
            == "example.org/p?q=2"
        )
        # utm-only query strings vanish entirely
        assert (
            _canon(spark, "https://example.org/p?utm_a=1&utm_b=2")
            == "example.org/p"
        )

    def test_strips_only_leading_www(self, spark):
        assert _canon(spark, "https://www.wwwexample.org/p") == "wwwexample.org/p"
        assert _canon(spark, "https://awww.example.org/p") == "awww.example.org/p"

    def test_corpus_synthesis_actually_collapses_variants(self, spark):
        # guard against the degenerate synthesis this operator originally
        # shipped with (base ≡ variant mod 4 → one spelling per page): on
        # corpus data some canonical url must absorb >1 raw spelling
        from harvester_spark.operators.curation import url_canonical_dedup

        out = url_canonical_dedup(spark, "/root/testdata/sf0.001")
        mx = out.agg(F.max("n_raw_variants").alias("m")).collect()[0].m
        assert mx > 1

    def test_host_only_url(self, spark):
        assert _canon(spark, "https://Example.org/") == "example.org"

    def test_preserves_original_columns(self, spark):
        df = spark.createDataFrame([(7, "https://x.org/a")], "doc_id long, url string")
        out = canonicalize_url(df)
        assert out.columns == ["doc_id", "url", "canonical_url"]
        assert out.collect()[0].doc_id == 7


class TestGopherRulesSignal:
    def test_rules_discriminate(self, spark):
        # the synthetic corpus must exercise both outcomes of at least the
        # token-count and stopword rules — otherwise the oracle hash would
        # pass on a constant column and prove nothing
        from harvester_spark.operators.curation import gopher_rules

        out = gopher_rules(spark, "/root/testdata/sf0.001")
        agg = out.agg(
            F.countDistinct("pass_token_count").alias("c1"),
            F.countDistinct("pass_stopwords").alias("c2"),
            F.countDistinct("keep").alias("c3"),
        ).collect()[0]
        assert agg.c1 == 2 and agg.c2 == 2 and agg.c3 == 2


class TestWinnowing:
    def _fps(self, spark, tmp_path, texts):
        import pandas as pd

        sf = str(tmp_path / "sf")
        (tmp_path / "sf").mkdir(exist_ok=True)
        pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ).to_parquet(sf + "/documents.parquet")
        from harvester_spark.operators.fulltext_queries import ft_winnow_fingerprints

        rows = ft_winnow_fingerprints(spark, sf).collect()
        out = {}
        for r in rows:
            out.setdefault(r.doc_id, set()).add(r.fp_hash)
        return out

    def test_shared_run_shares_fingerprint(self, spark, tmp_path):
        # the winnowing guarantee: a shared run of K+W-1 = 8 tokens must
        # yield at least one common selected fingerprint
        shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
        fps = self._fps(
            spark,
            tmp_path,
            [
                f"one two three four five six {shared} seven eight nine ten",
                f"red green blue cyan {shared} magenta yellow black white pink",
                "wholly unrelated words with nothing in common here at all ok",
            ],
        )
        assert fps[0] & fps[1], "shared 8-token run must share a fingerprint"
        assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])

    def test_short_doc_no_full_window_is_empty(self, spark, tmp_path):
        # < K+W-1 tokens → no full winnowing window → no fingerprints
        fps = self._fps(spark, tmp_path, ["just five little words here", "a b"])
        assert fps == {}


def _write_docs(tmp_path, name, doc_ids):
    import pandas as pd

    d = tmp_path / name
    d.mkdir(exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": doc_ids,
            "text": ["word soup text"] * len(doc_ids),
            "lang": ["en"] * len(doc_ids),
            "source": ["s"] * len(doc_ids),
            "n_chars": [14] * len(doc_ids),
        }
    ).to_parquet(str(d / "documents.parquet"))
    return str(d)


def test_split_assignment_stable_under_growth(spark, tmp_path):
    # the split must be a pure function of doc_id: the assignment computed
    # over a SMALL corpus and over a 30x-grown, differently-partitioned
    # corpus must agree on the common docs (randomSplit/sample fail this)
    from harvester_spark.operators.training_prep import split_train_val

    small = _write_docs(tmp_path, "small", list(range(100)))
    grown = _write_docs(tmp_path, "grown", list(range(3000)))
    a = {r.doc_id: r.split for r in split_train_val(spark, small).collect()}
    b_df = split_train_val(spark, grown)
    b = {r.doc_id: r.split for r in b_df.repartition(7).collect()}
    assert all(b[i] == a[i] for i in range(100))
    assert set(b.values()) == {"train", "val"}  # ~1% val actually appears


def test_curate_pipeline_dispositions(spark):
    # the composed pass: disposition is 'dropped' exactly for unselected
    # docs and a split name for survivors; every doc gets exactly one row
    from harvester_spark.operators.curation import curate_pipeline

    out = curate_pipeline(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 500 and len({r.doc_id for r in out}) == 500
    for r in out:
        assert r.selected == (r.keep_quality and r.keep_dedup)
        assert (r.disposition == "dropped") == (not r.selected)
        if r.selected:
            assert r.disposition in ("train", "val")
    assert any(r.selected for r in out) and any(not r.selected for r in out)


class TestCrossEngineRegexFuzz:
    """Direct Spark-vs-DuckDB parity of the curation regex chains on
    ADVERSARIAL generated strings — the corpus synthesis only exercises the
    well-formed shapes; dialect drift (Java regex vs RE2) would first show
    on junk. Deterministic seed; mirrors the 3-engine analyzer parity
    philosophy (CLAUDE.md)."""

    def _gen_urls(self, n=300):
        import random

        rng = random.Random(42)
        schemes = ["https://", "http://", "", "HtTpS://", "ftp://"]
        hosts = ["Example.org", "www.ex.com", "wwwx.nl", "a.b.c.d", "xn--x",
                 "WWW.UPPER.ORG", ""]
        paths = ["", "/", "/a/b", "/p/", "//", "/a..b", "/%20x"]
        queries = ["", "?", "?q=1", "?utm_a=1", "?utm_a=1&q=2", "?q=1&utm_b=",
                   "?noutm_x=1", "?utm_=1", "?&", "?utm_a=1&utm_b=2&utm_c=3",
                   "?a=utm_b=2", "?q=a&b"]
        frags = ["", "#", "#f", "#a#b", "#utm_x=1"]
        out = []
        for _ in range(n):
            out.append(
                rng.choice(schemes) + rng.choice(hosts) + rng.choice(paths)
                + rng.choice(queries) + rng.choice(frags)
            )
        return out

    def test_canonicalize_parity(self, spark):
        import duckdb

        from harvester_spark.operators.curation import _SQL_CANON, canonicalize_url

        urls = self._gen_urls()
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
        )
        got = {
            r.doc_id: r.canonical_url for r in canonicalize_url(df).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE urls AS SELECT unnest(range(?)) AS doc_id, unnest(?) AS url",
            [len(urls), urls],
        )
        want = dict(
            con.execute(f"SELECT doc_id, canonical_url FROM ({_SQL_CANON})").fetchall()
        )
        for i, u in enumerate(urls):
            assert got[i] == want[i], (u, got[i], want[i])

    def test_redact_parity(self, spark):
        import random

        import duckdb

        from harvester_spark.operators.curation import (
            RE_EMAIL, RE_IP, RE_PHONE, redact_pii,
        )

        rng = random.Random(7)
        frags = ["a@b.io", "x", "Bob.S@Ex.COM", "+31612345678", "+3161234567",
                 "10.0.0.1", "1.2.3.4000", "..", "@", "user@@x.org", "+31",
                 "999.999.999.999", "a_b%c@d-e.fg", " ", "v1.2.3.4b", "@x.io"]
        texts = [
            " ".join(rng.choice(frags) for _ in range(rng.randint(0, 8)))
            for _ in range(300)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, page_text string"
        )
        got = {
            r.doc_id: (r.n_emails, r.n_phones, r.n_ips, r.redacted_text)
            for r in redact_pii(df).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE pages AS SELECT unnest(range(?)) AS doc_id, unnest(?) AS page_text",
            [len(texts), texts],
        )
        want = {
            r[0]: (r[1], r[2], r[3], r[4])
            for r in con.execute(f"""
                SELECT doc_id,
                       CAST(len(regexp_extract_all(page_text, '{RE_EMAIL}')) AS BIGINT),
                       CAST(len(regexp_extract_all(page_text, '{RE_PHONE}')) AS BIGINT),
                       CAST(len(regexp_extract_all(page_text, '{RE_IP}')) AS BIGINT),
                       regexp_replace(regexp_replace(regexp_replace(page_text,
                         '{RE_EMAIL}', '<EMAIL>', 'g'),
                         '{RE_PHONE}', '<PHONE>', 'g'),
                         '{RE_IP}', '<IP>', 'g')
                FROM pages
            """).fetchall()
        }
        for i in got:
            assert got[i] == want[i], (texts[i], got[i], want[i])


def test_winnowing_triangulates_against_classic_algorithm(spark, tmp_path):
    """Spark==DuckDB proves engine parity but both share the packed-key
    window-min FORMULATION; this triangulates it against an independent
    straight-from-the-paper implementation (per window: argmin by
    (hash, pos), dedup selections), on small-vocab docs where repeated
    grams force hash ties through the tie-break."""
    import hashlib
    import random

    from harvester_spark.operators.fulltext_queries import (
        WINNOW_K, WINNOW_W, _W_HMOD, ft_winnow_fingerprints,
    )

    rng = random.Random(99)
    vocab = ["aa", "bb", "cc"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))
        for _ in range(40)
    ]

    def classic(tokens):
        grams = [
            " ".join(tokens[i : i + WINNOW_K])
            for i in range(len(tokens) - WINNOW_K + 1)
        ]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:14], 16) % _W_HMOD
            for g in grams
        ]
        sel = set()
        for s in range(len(hs) - WINNOW_W + 1):
            win = [(hs[i], i) for i in range(s, s + WINNOW_W)]
            h, i = min(win)
            sel.add((i, h))
        return sel

    sf = _write_docs(tmp_path, "winnow", list(range(len(texts))))
    # overwrite texts column with the crafted ones
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(sf + "/documents.parquet")

    got = {}
    for r in ft_winnow_fingerprints(spark, sf).collect():
        got.setdefault(r.doc_id, set()).add((r.fp_pos, r.fp_hash))
    for i, t in enumerate(texts):
        want = classic(t.split()) if t else set()
        assert got.get(i, set()) == want, (i, t)


class TestQualityClassifier:
    """The hashed-linear classifier's semantics on crafted inputs (the
    oracle gate proves Spark==DuckDB; these pin WHAT is computed)."""

    def _score(self, spark, tmp_path, texts):
        import pandas as pd
        from harvester_spark.operators.curation import quality_classifier_score

        import os

        pdf = pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts, "lang": "en",
             "source": "t", "n_chars": [len(t) for t in texts]}
        )
        d = str(tmp_path / "cls")
        os.makedirs(d, exist_ok=True)
        pdf.to_parquet(f"{d}/documents.parquet", index=False)
        return {
            r["doc_id"]: r
            for r in quality_classifier_score(spark, d).collect()
        }

    def test_weight_matches_hashlib(self, spark, tmp_path):
        # single-token doc: logit == the bucket weight of that unigram,
        # recomputed here from first principles (md5 → 56-bit int → bucket
        # → Knuth-shifted weight)
        import hashlib
        from harvester_spark.operators.curation import (
            CLS_BUCKETS, CLS_KNUTH, CLS_WMOD, CLS_WOFF,
        )

        tok = "spark"
        h56 = int(hashlib.md5(tok.encode()).hexdigest()[:14], 16)
        expect = (h56 % CLS_BUCKETS) * CLS_KNUTH % CLS_WMOD - CLS_WOFF
        row = self._score(spark, tmp_path, [tok])[0]
        assert row["n_feats"] == 1
        assert row["logit_sum_milli"] == expect

    def test_features_are_unigrams_plus_bigrams(self, spark, tmp_path):
        # "a b c" → 3 unigrams + 2 bigrams; logit = sum over all five,
        # bigrams hashed as 'a_b' / 'b_c'
        import hashlib
        from harvester_spark.operators.curation import (
            CLS_BUCKETS, CLS_KNUTH, CLS_WMOD, CLS_WOFF,
        )

        def w(f):
            h56 = int(hashlib.md5(f.encode()).hexdigest()[:14], 16)
            return (h56 % CLS_BUCKETS) * CLS_KNUTH % CLS_WMOD - CLS_WOFF

        row = self._score(spark, tmp_path, ["a b c"])[0]
        assert row["n_feats"] == 5
        assert row["logit_sum_milli"] == sum(
            w(f) for f in ["a", "b", "c", "a_b", "b_c"]
        )
        assert row["keep"] == (row["logit_sum_milli"] >= 0)

    def test_empty_text_dropped(self, spark, tmp_path):
        row = self._score(spark, tmp_path, ["", "real text here"])[0]
        assert row["n_feats"] == 0
        assert row["score"] == 0.0
        assert not row["keep"]

    def test_discriminates_on_corpus(self, spark):
        # both verdicts must occur on the synthetic corpus — a constant
        # keep column would let the oracle pass while proving nothing
        from harvester_spark.operators.curation import quality_classifier_score

        out = quality_classifier_score(spark, "/root/testdata/sf0.001")
        assert out.select(F.countDistinct("keep")).collect()[0][0] == 2


class TestC4LineDedup:
    def _run(self, spark, tmp_path, rows):
        from harvester_spark.operators.curation import c4_line_dedup

        d = str(tmp_path / "c4corpus")
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in enumerate(rows, start=1)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        return {r.doc_id: r for r in c4_line_dedup(spark, d).collect()}

    def test_keep_first_across_and_within_docs(self, spark, tmp_path):
        out = self._run(
            spark,
            tmp_path,
            [
                "a b c d e x y z w v",  # doc 1: both lines unique
                "a b c d e q r s t u",  # doc 2: first line dups doc 1's
                "p p p p p p p p p p",  # doc 3: second line dups its own first
            ],
        )
        assert (out[1].n_lines, out[1].n_removed) == (2, 0)
        assert (out[2].n_removed, out[2].n_kept) == (1, 1)
        assert (out[3].n_removed, out[3].n_kept) == (1, 1)

    def test_trailing_partial_group_is_a_line(self, spark, tmp_path):
        out = self._run(spark, tmp_path, ["a b c d e f g"])
        assert (out[1].n_lines, out[1].n_removed) == (2, 0)

    def test_corpus_removal_nondegenerate(self, spark):
        # the synthetic corpus must exercise BOTH outcomes: real duplicate
        # lines exist (removal happens) and most lines survive — otherwise
        # the oracle hash could pass on a constant column
        from harvester_spark.operators.curation import c4_line_dedup

        r = (
            c4_line_dedup(spark, "/root/testdata/sf0.001")
            .agg(F.sum("n_removed").alias("rm"), F.sum("n_lines").alias("n"))
            .collect()[0]
        )
        assert r.rm > 0
        assert r.rm < 0.2 * r.n
