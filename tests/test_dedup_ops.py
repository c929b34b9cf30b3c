"""Semantic consistency across the dedup operator family (the oracle gate
proves Spark==DuckDB per operator; these pin relationships BETWEEN them)."""

from harvester_spark.operators.dedup import (
    NEW_SNAPSHOT_MOD,
    dedup_lsh_jaccard_verified,
    dedup_new_vs_base,
)

SF_DIR = "/root/testdata/sf0.001"


class TestNewVsBase:
    def test_split_sides_and_corpus_consistency(self, spark):
        """Every pair is new×base, the result is non-empty (a constant
        empty output would prove nothing), and the pair set equals the
        cross-split subset of the corpus-wide verified operator — probing
        only new×base must lose no duplicate that a full rerun would find."""
        nvb = {
            (r["new_doc"], r["base_doc"])
            for r in dedup_new_vs_base(spark, SF_DIR).collect()
        }
        assert nvb, "no cross-snapshot duplicates found — degenerate input"
        for n, b in nvb:
            assert n % NEW_SNAPSHOT_MOD == 0 and b % NEW_SNAPSHOT_MOD != 0
        full = dedup_lsh_jaccard_verified(spark, SF_DIR).collect()
        cross = set()
        for r in full:
            a, b = r["doc_a"], r["doc_b"]
            if (a % NEW_SNAPSHOT_MOD == 0) != (b % NEW_SNAPSHOT_MOD == 0):
                cross.add((a, b) if a % NEW_SNAPSHOT_MOD == 0 else (b, a))
        assert nvb == cross
