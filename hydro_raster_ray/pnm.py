"""REAL PNM (Netpbm PGM/PPM) codec — pure stdlib + numpy.

Implements the public Netpbm formats: P2 (ASCII gray), P3 (ASCII RGB),
P5 (binary gray), P6 (binary RGB). Header tokens may be separated by any
whitespace and interleaved with ``#`` comments; binary sample size
follows maxval (1 byte ≤ 255, else 2 bytes BIG-endian — the classic
16-bit PNM trap). Encode is deterministic (single space separators,
70-col ASCII wrap like the netpbm tools).

Out of scope: P1/P4 bitmaps and PAM (P7) raise ``NotImplementedError``.

Used by ``stages/multimodal.MediaCodec`` (fmt="pnm"); tested in
``tests/test_pnm.py`` against hand-written header bytes (comments,
16-bit endianness, ASCII whitespace forms) and roundtrips.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pnm_decode", "pnm_encode"]


def _tokens(buf: bytes, need: int, start: int) -> tuple[list[int], int]:
    """Read ``need`` whitespace-separated integer tokens, skipping
    ``#``-to-EOL comments. Returns (values, next_offset)."""
    vals: list[int] = []
    i, n = start, len(buf)
    while len(vals) < need:
        while i < n and buf[i:i + 1].isspace():
            i += 1
        if i < n and buf[i] == 0x23:  # '#'
            while i < n and buf[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and not buf[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("PNM header ended early")
        vals.append(int(buf[i:j]))
        i = j
    return vals, i


def pnm_decode(buf) -> np.ndarray:
    """Decode P2/P3/P5/P6 → (h, w) or (h, w, 3) uint8/uint16."""
    buf = bytes(buf)
    magic = buf[:2]
    if magic in (b"P1", b"P4", b"P7"):
        raise NotImplementedError(f"PNM type {magic.decode()} not supported")
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        raise ValueError(f"not a PNM: magic {magic!r}")
    (w, h, maxval), i = _tokens(buf, 3, 2)
    if not 0 < maxval < 65536:
        raise ValueError(f"PNM maxval {maxval} out of range")
    spp = 3 if magic in (b"P3", b"P6") else 1
    count = w * h * spp
    dt = np.uint16 if maxval > 255 else np.uint8
    if magic in (b"P2", b"P3"):
        vals, _ = _tokens(buf, count, i)
        a = np.array(vals, dtype=np.int64)
    else:
        i += 1  # exactly ONE whitespace byte after maxval (spec)
        if maxval > 255:
            a = np.frombuffer(buf, ">u2", count, i).astype(np.int64)
        else:
            a = np.frombuffer(buf, np.uint8, count, i).astype(np.int64)
    if a.max(initial=0) > maxval:
        raise ValueError("PNM sample exceeds maxval")
    a = a.astype(dt).reshape((h, w) if spp == 1 else (h, w, 3))
    return a


def pnm_encode(arr: np.ndarray, ascii_form: bool = False) -> bytes:
    """Encode uint8/uint16 gray or uint8 RGB. Binary P5/P6 by default;
    ``ascii_form`` writes P2/P3 (70-column wrapped)."""
    a = np.asarray(arr)
    if a.dtype == np.uint8:
        maxval = 255
    elif a.dtype == np.uint16:
        maxval = 65535
    else:
        raise ValueError(f"unsupported dtype {a.dtype}")
    if a.ndim == 2:
        spp = 1
    elif a.ndim == 3 and a.shape[2] == 3:
        spp = 3
        if a.dtype == np.uint16:
            raise NotImplementedError("16-bit RGB PNM encode not supported")
    else:
        raise ValueError(f"unsupported shape {a.shape}")
    h, w = a.shape[:2]
    if ascii_form:
        magic = b"P2" if spp == 1 else b"P3"
        head = b"%s\n%d %d\n%d\n" % (magic, w, h, maxval)
        flat = a.reshape(-1)
        lines, cur = [], ""
        for v in flat:
            tok = str(int(v))
            if cur and len(cur) + 1 + len(tok) > 70:
                lines.append(cur)
                cur = tok
            else:
                cur = tok if not cur else cur + " " + tok
        if cur:
            lines.append(cur)
        return head + ("\n".join(lines) + "\n").encode()
    magic = b"P5" if spp == 1 else b"P6"
    head = b"%s\n%d %d\n%d\n" % (magic, w, h, maxval)
    payload = a.astype(">u2").tobytes() if maxval > 255 else a.tobytes()
    return head + payload
