"""Delta + varbyte block codec for posting lists — numpy-vectorized.

Postings for a term are sorted by docID and cut into blocks of
``BLOCK_SIZE`` (=128, FIXTURES.md §3). Each block stores:

- ``base_doc_id``: absolute docID of the first posting,
- ``doc_deltas``: varbyte of ``[0, diff(doc_ids)...]`` (first delta is 0),
- ``tfs``: varbyte of raw term frequencies,
- ``n``: posting count,
- ``block_max_tf`` and ``block_max_impact``: per-block upper bounds. The
  impact is the BM25 tf-normalization part ``tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))``
  which is the term's score divided by its idf — idf is a per-term constant,
  so ``idf * block_max_impact`` is an exact per-block score bound usable for
  block-max WAND / block-skipping without knowing global df at encode time.

Both encode and decode are loop-free over postings (the only Python loop is
over the ≤10 byte positions of a varbyte integer), so blocks stream through
Arrow batches at memory bandwidth.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
_U7 = np.uint64(7)
_U0x7F = np.uint64(0x7F)


def varbyte_encode(values: np.ndarray) -> bytes:
    """Little-endian base-128 varint encoding of a uint64 array."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    if a.size == 0:
        return b""
    n_bytes = np.ones(a.size, dtype=np.int64)
    v = a >> _U7
    while v.any():
        n_bytes += (v > 0).astype(np.int64)
        v >>= _U7
    ends = np.cumsum(n_bytes)
    starts = ends - n_bytes
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    for i in range(int(n_bytes.max())):
        mask = n_bytes > i
        pos = starts[mask] + i
        group = ((a[mask] >> np.uint64(7 * i)) & _U0x7F).astype(np.uint8)
        cont = (n_bytes[mask] - 1 > i).astype(np.uint8) << 7
        out[pos] = group | cont
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Inverse of :func:`varbyte_encode` → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    for i in range(int(lengths.max())):
        mask = lengths > i
        pos = starts[mask] + i
        vals[mask] |= (b[pos].astype(np.uint64) & _U0x7F) << np.uint64(7 * i)
    return vals


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    impacts: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> list[tuple[int, int, bytes, bytes, int, float]]:
    """Sorted (doc_ids, tfs, impacts) → block tuples.

    Returns ``[(base_doc_id, n, doc_deltas, tfs_bytes, block_max_tf,
    block_max_impact), ...]``.
    """
    blocks = []
    for s in range(0, len(doc_ids), block_size):
        ids = np.asarray(doc_ids[s : s + block_size], dtype=np.uint64)
        tf = np.asarray(tfs[s : s + block_size], dtype=np.uint64)
        imp = np.asarray(impacts[s : s + block_size], dtype=np.float64)
        deltas = np.empty_like(ids)
        deltas[0] = 0
        np.subtract(ids[1:], ids[:-1], out=deltas[1:])
        blocks.append(
            (
                int(ids[0]),
                int(ids.size),
                varbyte_encode(deltas),
                varbyte_encode(tf),
                int(tf.max()),
                float(imp.max()),
            )
        )
    return blocks


def decode_block(base_doc_id: int, doc_deltas: bytes, tfs: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Block → (doc_ids int64 ascending, tfs int64)."""
    deltas = varbyte_decode(doc_deltas).astype(np.int64)
    ids = np.cumsum(deltas) + np.int64(base_doc_id)
    return ids, varbyte_decode(tfs).astype(np.int64)


def encode_positions(flat: np.ndarray, counts: np.ndarray) -> bytes:
    """Per-posting delta-encoded token positions → one varbyte blob.

    ``flat`` concatenates each posting's ascending positions; ``counts`` is
    the per-posting position count (== tf). The first value of each posting
    is stored absolute, the rest as diffs — the classic positional-postings
    layout (Lucene-style; quoted-phrase support the reference gets from
    OpenSearch, /root/reference/harvester/core/models/search/query.py:81-86).
    """
    flat = np.asarray(flat, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    if flat.size == 0:
        return b""
    deltas = flat.copy()
    deltas[1:] -= flat[:-1]
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    deltas[starts] = flat[starts]  # posting boundaries reset to absolute
    return varbyte_encode(deltas.astype(np.uint64))


def encode_positions_per_posting(
    flat: np.ndarray, counts: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """:func:`encode_positions` plus per-posting byte boundaries.

    Returns ``(blob, off)`` where ``blob`` equals
    ``encode_positions(flat, counts)`` byte-for-byte and ``off`` (len
    ``n_postings + 1``) marks each posting's byte range:
    ``blob[off[i]:off[j]]`` IS the encoding of postings ``i..j-1`` — each
    posting's stream starts absolute, so any contiguous slice is itself a
    valid stream. This is the property the map-side pre-encode in
    :func:`harvester_spark.index.build.postings_rows` relies on: positions
    cross the build shuffle as ~1 byte/position varbyte instead of
    4-byte int32 lists (the build's heaviest exchange, round-4), and the
    block encoder assembles final block blobs by pure byte slicing.
    ``counts`` must be all-positive (tf ≥ 1 by construction).
    """
    flat = np.asarray(flat, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    if flat.size == 0:
        return b"", np.zeros(counts.size + 1, dtype=np.int64)
    deltas = flat.copy()
    deltas[1:] -= flat[:-1]
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    deltas[starts] = flat[starts]  # posting boundaries reset to absolute
    u = deltas.astype(np.uint64)
    nb = np.ones(u.size, dtype=np.int64)
    v = u >> _U7
    while v.any():
        nb += (v > 0).astype(np.int64)
        v >>= _U7
    per_posting = np.add.reduceat(nb, starts)
    off = np.concatenate(([0], np.cumsum(per_posting)))
    return varbyte_encode(u), off


def decode_positions(blob: bytes, counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_positions` → (flat positions, posting starts).

    Vectorized like :func:`decode_blocks_batch`: one varbyte pass, then the
    per-posting delta baseline undone with a single gather.
    """
    counts = np.asarray(counts, dtype=np.int64)
    vals = varbyte_decode(blob).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    if vals.size == 0:
        return vals, starts
    csum = np.cumsum(vals)
    start_cum = csum[starts] - vals[starts]
    idx = np.repeat(np.arange(len(counts)), counts)
    return csum - start_cum[idx], starts


def decode_blocks_batch(
    bases: np.ndarray, ns: np.ndarray, deltas_list: list[bytes], tfs_list: list[bytes]
) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY blocks in one vectorized pass (hot serving path).

    Concatenates the varbyte streams (decodable as one stream), then undoes
    the per-block delta baseline with a single gather: within a block,
    ids = cumsum(deltas) + base and the first delta is 0, so the global
    cumsum minus its value at each block start plus the block base gives
    every id without a Python-level loop over blocks.
    """
    if len(deltas_list) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    all_deltas = varbyte_decode(b"".join(deltas_list)).astype(np.int64)
    all_tfs = varbyte_decode(b"".join(tfs_list)).astype(np.int64)
    ns = np.asarray(ns, dtype=np.int64)
    bases = np.asarray(bases, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(ns)[:-1]))
    csum = np.cumsum(all_deltas)
    block_idx = np.repeat(np.arange(len(ns)), ns)
    start_cum = csum[starts] - all_deltas[starts]  # cumulative before block
    ids = csum - start_cum[block_idx] + bases[block_idx]
    return ids, all_tfs
