"""Batch-vectorized MD5 for short strings.

``sample_tiles`` (and any SQL-reproducible deterministic sampler) needs
``md5(image_id)`` per row because the DuckDB oracle can only reproduce a
hash it also implements. The round-2 formulation called ``hashlib.md5``
in a Python loop per row — flagged as a hot-path scalar loop. MD5 of a
message ≤ 55 bytes is a SINGLE 64-byte block, and the 64 MD5 rounds are
plain 32-bit arithmetic — so the whole batch can be hashed in numpy:
build the (n, 64)-byte padded block matrix once, then run the 64 rounds
as vectorized uint32 ops across all n messages simultaneously.

``md5_prefix32`` returns ``int(md5(s).hexdigest()[:8], 16)`` (the
big-endian first 4 digest bytes — what the SQL oracle computes with
``('0x' || substr(md5(id), 1, 8))::BIGINT``) for every string of an
Arrow array. Rows longer than 55 bytes (multi-block) fall back to
``hashlib`` — tile ids never are, but the function stays total.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["md5_prefix32"]

# standard MD5 tables: K[i] = floor(|sin(i+1)| * 2^32), per-round rotations
_K = np.floor(np.abs(np.sin(np.arange(1, 65, dtype=np.float64))) * 2**32).astype(
    np.uint32
)
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4
    + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
# message-word index per round
_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16)]
    + [(3 * i + 5) % 16 for i in range(16)]
    + [(7 * i) % 16 for i in range(16)],
    dtype=np.int64,
)


def _rotl(x: np.ndarray, s: int) -> np.ndarray:
    return (x << np.uint32(s)) | (x >> np.uint32(32 - s))


def _md5_single_block(blocks: np.ndarray) -> np.ndarray:
    """MD5 of n pre-padded 64-byte blocks → first-4-digest-bytes as a
    big-endian uint64 (== ``int(hexdigest()[:8], 16)``)."""
    m = np.ascontiguousarray(blocks).view("<u4").reshape(blocks.shape[0], 16)
    m = [np.ascontiguousarray(m[:, j]) for j in range(16)]  # contiguous cols
    a = np.full(blocks.shape[0], 0x67452301, np.uint32)
    b = np.full(blocks.shape[0], 0xEFCDAB89, np.uint32)
    c = np.full(blocks.shape[0], 0x98BADCFE, np.uint32)
    d = np.full(blocks.shape[0], 0x10325476, np.uint32)
    for i in range(64):
        if i < 16:
            f = (b & c) | (~b & d)
        elif i < 32:
            f = (d & b) | (~d & c)
        elif i < 48:
            f = b ^ c ^ d
        else:
            f = c ^ (b | ~d)
        tmp = d
        d = c
        c = b
        b = b + _rotl(a + f + _K[i] + m[_G[i]], int(_S[i]))
        a = tmp
    a0 = a + np.uint32(0x67452301)
    # hexdigest()[:8] reads the first 4 digest bytes big-endian; the digest
    # serializes the final A word little-endian, so the value is byteswap(A)
    return a0.byteswap().astype(np.uint64)


def md5_prefix32(arr: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """``int(md5(s).hexdigest()[:8], 16)`` per element of an Arrow string
    array, vectorized (hashlib fallback only for rows > 55 UTF-8 bytes)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    # offset width depends on the string type: string = int32, large_string
    # (which Ray/Arrow produce for big blocks) = int64 — viewing a
    # large_string offset buffer as int32 would silently misread it
    if pa.types.is_large_string(arr.type):
        off_dtype: type = np.int64
    elif pa.types.is_string(arr.type):
        off_dtype = np.int32
    else:
        arr = arr.cast(pa.string())
        off_dtype = np.int32
    off = np.frombuffer(arr.buffers()[1], off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    lens = np.diff(off).astype(np.int64)
    out = np.empty(n, dtype=np.uint64)
    short = lens <= 55
    if short.any():
        idx = np.nonzero(short)[0]
        sl = lens[idx]
        blocks = np.zeros((idx.size, 64), np.uint8)
        rows = np.repeat(np.arange(idx.size), sl)
        cols = np.arange(int(sl.sum())) - np.repeat(np.cumsum(sl) - sl, sl)
        if short.all():
            src = data[off[0] : off[-1]]  # contiguous — no per-row gather
        else:
            src = np.concatenate([data[off[i] : off[i + 1]] for i in idx])
        blocks[rows, cols] = src
        blocks[np.arange(idx.size), sl] = 0x80
        bitlen = (sl * 8).astype(np.uint64)
        w = blocks.view("<u4")
        w[:, 14] = (bitlen & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        w[:, 15] = (bitlen >> np.uint64(32)).astype(np.uint32)
        out[idx] = _md5_single_block(blocks)
    if (~short).any():
        for i in np.nonzero(~short)[0]:
            h = hashlib.md5(data[off[i] : off[i + 1]].tobytes()).hexdigest()
            out[i] = int(h[:8], 16)
    return out
