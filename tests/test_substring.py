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
