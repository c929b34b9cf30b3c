"""Varbyte/delta block codec round-trip tests (property-based + golden)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from harvester_spark.index.codec import (
    decode_block,
    encode_blocks,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_golden():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    # 128 = 0b1000_0000 -> low 7 bits with continuation, then 1
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varbyte_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert list(varbyte_decode(varbyte_encode(arr))) == values


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=400, unique=True),
    st.data(),
)
def test_block_roundtrip(ids, data):
    doc_ids = np.array(sorted(ids), dtype=np.int64)
    tfs = np.array(
        data.draw(st.lists(st.integers(1, 1000), min_size=len(ids), max_size=len(ids))),
        dtype=np.int64,
    )
    impacts = tfs.astype(np.float64) / (tfs + 1.0)
    blocks = encode_blocks(doc_ids, tfs, impacts, block_size=128)
    got_ids, got_tfs = [], []
    for base, n, deltas, tf_bytes, max_tf, max_imp in blocks:
        ids_b, tfs_b = decode_block(base, deltas, tf_bytes)
        assert len(ids_b) == n
        assert max_tf == int(tfs_b.max())
        got_ids.append(ids_b)
        got_tfs.append(tfs_b)
    assert list(np.concatenate(got_ids)) == list(doc_ids)
    assert list(np.concatenate(got_tfs)) == list(tfs)
    assert all(b[1] <= 128 for b in blocks)


def test_positions_roundtrip():
    import numpy as np

    from harvester_spark.index.codec import decode_positions, encode_positions

    rng = np.random.default_rng(3)
    for _ in range(20):
        n_postings = int(rng.integers(1, 50))
        counts = rng.integers(1, 12, size=n_postings)
        flat = np.concatenate(
            [np.sort(rng.choice(5000, size=c, replace=False)) for c in counts]
        )
        blob = encode_positions(flat, counts)
        out, starts = decode_positions(blob, counts)
        assert np.array_equal(out, flat)
        assert np.array_equal(starts, np.concatenate(([0], np.cumsum(counts)[:-1])))
    assert encode_positions(np.empty(0), np.empty(0, int)) == b""


def test_topk_order_matches_lexsort():
    import numpy as np

    from harvester_spark.search.bm25 import topk_order

    rng = np.random.default_rng(11)
    for _ in range(200):
        n = int(rng.integers(1, 400))
        # coarse score grid → plenty of exact ties
        scores = rng.integers(0, 8, size=n).astype(np.float64) / 3.0
        docs = rng.permutation(n).astype(np.int64)
        for k in (0, 1, 3, n // 2, n, n + 5):
            exp = np.lexsort((docs, -scores))[:k]
            got = topk_order(scores, docs, k)
            assert np.array_equal(got, exp), (n, k)


def test_encode_positions_per_posting_byte_identity():
    """The map-side pre-encode (round-4) must produce the EXACT bytes of
    reduce-side encode_positions, and every contiguous posting slice of the
    blob must itself decode correctly — the property that lets the block
    encoder assemble block blobs by byte slicing."""
    import numpy as np

    from harvester_spark.index.codec import (
        decode_positions,
        encode_positions,
        encode_positions_per_posting,
    )

    rng = np.random.default_rng(7)
    for trial in range(50):
        n_postings = int(rng.integers(1, 40))
        counts = rng.integers(1, 9, size=n_postings).astype(np.int64)
        # ascending positions per posting, values spanning varbyte widths
        flat = np.concatenate(
            [
                np.sort(
                    rng.choice(
                        int(rng.choice([50, 200, 20_000, 3_000_000])),
                        size=c,
                        replace=False,
                    )
                )
                for c in counts
            ]
        ).astype(np.int64)
        blob, off = encode_positions_per_posting(flat, counts)
        assert blob == encode_positions(flat, counts)
        assert off[0] == 0 and off[-1] == len(blob) and len(off) == n_postings + 1
        # any contiguous posting range slices to a valid stream
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        for _ in range(5):
            i = int(rng.integers(0, n_postings))
            j = int(rng.integers(i + 1, n_postings + 1))
            sl = bytes(blob[off[i] : off[j]])
            sub_counts = counts[i:j]
            sub_flat = flat[starts[i] : starts[i] + sub_counts.sum()]
            out, _ = decode_positions(sl, sub_counts)
            assert np.array_equal(out, sub_flat)
    b, o = encode_positions_per_posting(np.empty(0), np.empty(0, int))
    assert b == b"" and list(o) == [0]
