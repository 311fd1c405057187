"""Delta-gap + varint posting-list codec with per-block max-impact metadata.

The reference inherits FTS5's delta+varint doclist format behind its DDL
(`/root/reference/database/database.go:59-66`); we implement our own columnar
variant, numpy-vectorized on both encode and decode (Arrow batches in, numpy
out — no per-row Python in the hot path):

- doc ids: sorted int64; first value zigzag-varint, then unsigned varint gaps
- tfs: unsigned varint per doc
- positions: per doc ``varint(n)`` then delta-varint token positions — kept in
  a separate stream so term-only queries never decode them (SURVEY.md §7.8-4)
- blocks of 128 docs: per-block first doc id, byte offsets into each stream,
  and ``max_impact`` = max over docs of the BM25 tf/dl factor
  tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) — multiplied by idf at query time this
  is the block-max WAND upper bound (SURVEY.md §2.5 Q2)
"""

from __future__ import annotations

import numpy as np

BLOCK = 128
K1 = 1.2
B = 0.75


def zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def varint_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a uint64 array."""
    v = values.astype(np.uint64, copy=True)
    if len(v) == 0:
        return b""
    # bytes needed per value: ceil(bitlen/7), min 1
    nbits = np.zeros(len(v), dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 7
        tmp >>= np.uint64(7)
    nbytes = np.maximum(nbits // 7, 1)
    offsets = np.zeros(len(v) + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    maxb = int(nbytes.max())
    for j in range(maxb):
        mask = nbytes > j
        idx = offsets[:-1][mask] + j
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes | memoryview, count: int | None = None, offset: int = 0) -> np.ndarray:
    """Vectorized LEB128 decode → uint64 array. Decodes the whole buffer from
    ``offset`` (or the first ``count`` values)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if offset:
        b = b[offset:]
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    if count is not None:
        ends = ends[:count]
        b = b[: ends[-1] + 1] if len(ends) else b[:0]
        is_last = is_last[: len(b)]
    starts = np.empty(len(ends), dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(len(ends), dtype=np.uint64)
    maxb = int(lengths.max()) if len(lengths) else 0
    for j in range(maxb):
        mask = lengths > j
        vals[mask] |= (b[starts[mask] + j] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    return vals


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    positions: list[np.ndarray],
    avgdl: float,
) -> dict:
    """Encode one (term, shard) posting list. Inputs sorted by doc_id asc.

    Returns dict with blob columns + block metadata arrays (SURVEY.md §1.3
    postings table schema).
    """
    n = len(doc_ids)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    tfs = tfs[order].astype(np.int64)
    dls = dls[order].astype(np.int64)
    positions = [positions[i] for i in order]

    # doc id stream: zigzag first-in-block, plain gaps within block — each
    # block independently decodable for WAND skipping.
    doc_chunks: list[bytes] = []
    tf_chunks: list[bytes] = []
    pos_chunks: list[bytes] = []
    first_docs: list[int] = []
    doc_offs: list[int] = [0]
    tf_offs: list[int] = [0]
    pos_offs: list[int] = [0]
    max_impacts: list[float] = []
    block_lens: list[int] = []

    impact = tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * (dls / max(avgdl, 1e-9))))

    for s in range(0, n, BLOCK):
        e = min(s + BLOCK, n)
        ids = doc_ids[s:e].astype(np.int64)
        gaps = np.empty(e - s, dtype=np.uint64)
        gaps[0] = zigzag(int(ids[0])) & 0xFFFFFFFFFFFFFFFF
        if e - s > 1:
            gaps[1:] = np.diff(ids.astype(np.uint64))
        doc_chunks.append(varint_encode(gaps))
        tf_chunks.append(varint_encode(tfs[s:e].astype(np.uint64)))
        # positions: concat per-doc [n, p0, gap...]
        plist = []
        for i in range(s, e):
            p = positions[i]
            pl = np.empty(len(p) + 1, dtype=np.uint64)
            pl[0] = len(p)
            if len(p):
                pl[1] = p[0]
                if len(p) > 1:
                    pl[2:] = np.diff(p.astype(np.uint64))
            plist.append(pl)
        pos_chunks.append(varint_encode(np.concatenate(plist) if plist else np.zeros(0, dtype=np.uint64)))
        first_docs.append(int(ids[0]))
        doc_offs.append(doc_offs[-1] + len(doc_chunks[-1]))
        tf_offs.append(tf_offs[-1] + len(tf_chunks[-1]))
        pos_offs.append(pos_offs[-1] + len(pos_chunks[-1]))
        max_impacts.append(float(impact[s:e].max()))
        block_lens.append(e - s)

    return {
        "df": n,
        "cf": int(tfs.sum()),
        # per-doc lengths travel with the posting so scoring never joins a
        # doc-stats table at query time (self-contained shard reads)
        "dl_blob": varint_encode(dls.astype(np.uint64)),
        "doc_blob": b"".join(doc_chunks),
        "tf_blob": b"".join(tf_chunks),
        "pos_blob": b"".join(pos_chunks),
        "first_docs": first_docs,
        "doc_offs": doc_offs[:-1],
        "tf_offs": tf_offs[:-1],
        "pos_offs": pos_offs[:-1],
        "block_lens": block_lens,
        "max_impacts": max_impacts,
    }


def decode_doc_ids(doc_blob: bytes, block_lens: list[int]) -> np.ndarray:
    """Decode the full doc-id stream (all blocks)."""
    gaps = varint_decode(doc_blob)
    out = np.empty(len(gaps), dtype=np.int64)
    i = 0
    for bl in block_lens:
        out[i] = unzigzag(int(gaps[i]))
        if bl > 1:
            out[i + 1 : i + bl] = out[i] + np.cumsum(gaps[i + 1 : i + bl].astype(np.int64))
        i += bl
    return out


def decode_tfs(tf_blob: bytes) -> np.ndarray:
    return varint_decode(tf_blob).astype(np.int64)


def decode_dls(dl_blob: bytes) -> np.ndarray:
    return varint_decode(dl_blob).astype(np.int64)


def decode_positions(pos_blob: bytes, df: int) -> list[np.ndarray]:
    """Decode per-doc position arrays (delta-decoded)."""
    flat = varint_decode(pos_blob).astype(np.int64)
    out: list[np.ndarray] = []
    i = 0
    for _ in range(df):
        n = int(flat[i])
        i += 1
        p = flat[i : i + n]
        out.append(np.cumsum(p) if n else p)
        i += n
    return out
