"""Trigram-pruned substring search: superset guarantee, pruning, edge cases.

The oracle-parity gate proves engine == brute-force `contains` on the
corpus; these tests pin the index-side properties the gate can't see.
"""

import pytest
from pyspark.sql import functions as F

from harvester_spark.operators.substring import (
    NEEDLES,
    doc_trigrams,
    ft_substring_search,
    needle_trigrams,
    trigram_candidates,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows, start=1)],
        "doc_id long, text string",
    )


class TestTrigramPruning:
    def test_candidates_superset_of_matches(self, spark):
        # the index contract: NO false negatives — every true `contains`
        # doc must be in the trigram candidate set, for every needle
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        cand = {
            (r.needle, r.doc_id)
            for r in trigram_candidates(spark, docs, NEEDLES).collect()
        }
        for needle in NEEDLES:
            truth = {
                (needle, r.doc_id)
                for r in docs.filter(
                    F.expr(f"contains(text, '{needle}')")
                ).collect()
            }
            assert truth <= cand

    def test_pruning_is_real(self, spark):
        # a needle with an alien trigram must prune to ZERO candidates
        # without ever verifying a document
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        n = docs.count()
        cand = trigram_candidates(spark, docs, ["qqqzzz xx"])
        assert cand.count() == 0
        # and a selective needle prunes well below the corpus
        sel = trigram_candidates(spark, docs, ["window sort merge"])
        assert sel.count() < n / 2

    def test_short_needle_refused(self):
        with pytest.raises(ValueError):
            needle_trigrams("ab")

    def test_needle_trigram_set_is_distinct(self):
        # "aaaa" has one distinct trigram; the AND count must use the set
        assert needle_trigrams("aaaa") == ["aaa"]

    def test_short_doc_has_no_trigrams(self, spark):
        out = doc_trigrams(_docs(spark, ["ab", "abc"])).collect()
        assert {(r.doc_id, r.tg) for r in out} == {(2, "abc")}


class TestSubstringSemantics:
    def _search(self, spark, tmp_path, rows, monkeypatch, needles):
        import harvester_spark.operators.substring as mod

        monkeypatch.setattr(mod, "NEEDLES", needles)
        d = str(tmp_path / "sub")
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in enumerate(rows, start=1)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        return {
            (r.needle, r.doc_id): r for r in ft_substring_search(spark, d).collect()
        }

    def test_positions_and_counts(self, spark, tmp_path, monkeypatch):
        out = self._search(
            spark,
            tmp_path,
            ["xx abc yy abc", "no hit here", "ababab"],
            monkeypatch,
            ["abc", "abab"],
        )
        assert out[("abc", 1)].first_pos == 4
        assert out[("abc", 1)].n_occ == 2
        # non-overlapping counting (replace semantics, both engines):
        # "ababab" holds one disjoint "abab"
        assert out[("abab", 3)].n_occ == 1
        assert ("abc", 2) not in out

    def test_case_sensitive_grep_semantics(self, spark, tmp_path, monkeypatch):
        out = self._search(spark, tmp_path, ["Merge Batch"], monkeypatch, ["merge"])
        assert out == {}

    def test_zero_hit_needle_on_corpus(self, spark):
        hits = ft_substring_search(spark, SF)
        assert hits.filter(F.col("needle") == "qqqzzz xx").count() == 0
        # and at least one needle really hits (non-degeneracy)
        assert hits.count() > 0


class TestRegexSearch:
    def test_required_groups_parse(self):
        from harvester_spark.operators.substring import regex_required_groups

        # no ".*": one segment, the prefix folds into BOTH alternatives —
        # candidates need all trigrams of "merge batch" OR of "merge window"
        g = regex_required_groups("merge (batch|window)")
        assert len(g) == 1
        assert len(g[0]) == 2  # two alternatives
        assert all("mer" in alt for alt in g[0])
        # ".*" splits segments into independent AND groups
        g3 = regex_required_groups("merge .* (batch|window)")
        assert len(g3) == 2
        # prefix folds into each alternative
        g2 = regex_required_groups("pre(a|b)post")
        assert len(g2) == 1 and len(g2[0]) == 2

    def test_unprunable_group_dropped_not_fatal(self):
        from harvester_spark.operators.substring import regex_required_groups

        # "(a|b)" has only 1-char alternatives -> contributes nothing, but
        # the "merge" literal still prunes
        g = regex_required_groups("merge .* (a|b)")
        assert len(g) == 1

    def test_unsupported_pattern_refused(self):
        import pytest as _pytest

        from harvester_spark.operators.substring import (
            regex_candidates,
            regex_required_groups,
        )

        with _pytest.raises(ValueError):
            regex_required_groups("nested (a(b|c)) group")
        with _pytest.raises(ValueError):
            regex_required_groups("cls[abc]+")

    def test_fully_unprunable_pattern_refused(self, spark):
        import pytest as _pytest

        from harvester_spark.operators.substring import regex_candidates

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        with _pytest.raises(ValueError):
            regex_candidates(spark, docs, ["(a|b)"])

    def test_candidates_superset_of_regex_matches(self, spark):
        from harvester_spark.operators.substring import (
            REGEXES,
            regex_candidates,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        cand = {
            (r.pattern, r.doc_id)
            for r in regex_candidates(spark, docs, REGEXES).collect()
        }
        for p in REGEXES:
            truth = {
                (p, r.doc_id)
                for r in docs.filter(F.expr(f"regexp_like(text, '{p}')")).collect()
            }
            assert truth <= cand

    def test_alternation_semantics(self, spark, tmp_path, monkeypatch):
        import harvester_spark.operators.substring as mod
        from harvester_spark.operators.substring import ft_regex_search

        monkeypatch.setattr(mod, "REGEXES", ["merge (batch|window)"])
        d = str(tmp_path / "rx")
        spark.createDataFrame(
            [
                (1, "a merge batch b", "en", "s", 1),
                (2, "a merge window b", "en", "s", 1),
                (3, "a merge nothing b", "en", "s", 1),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {(r.doc_id, r.match) for r in ft_regex_search(spark, d).collect()}
        assert got == {(1, "merge batch"), (2, "merge window")}


class TestWildcard:
    def test_unprunable_pattern_refused(self):
        import pytest

        from harvester_spark.operators.substring import _wildcard_runs

        with pytest.raises(ValueError):
            _wildcard_runs("a?b*c")  # no >=3-char literal run
        assert _wildcard_runs("merg? b?tch") == ["merg", "tch"]

    def test_candidates_superset_of_like(self, spark):
        """Every LIKE match must be in the trigram candidate set (no false
        negatives) — verified by comparing against a raw full-scan LIKE."""
        from pyspark.sql import functions as F

        from harvester_spark.operators.substring import (
            WILDCARDS,
            _wildcard_like,
            ft_wildcard_search,
        )

        sf = "/root/testdata/sf0.001"
        got = {
            (r["pattern"], r["doc_id"])
            for r in ft_wildcard_search(spark, sf).collect()
        }
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        want = set()
        for p in WILDCARDS:
            for r in docs.filter(F.col("text").like(_wildcard_like(p))).collect():
                want.add((p, r["doc_id"]))
        assert got == want
