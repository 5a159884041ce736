"""Real GIF codec — pure stdlib ``struct`` + numpy, no Pillow.

Third member of the self-contained image-codec family (``png.py``,
``jpeg.py``): GIF needs no native library either — the container is byte
arithmetic and the payload is LZW with variable-width codes (Welch 1984,
public algorithm; the patent lapsed in 2003). The reference reads any
GDAL/PIL-supported raster (``Raster.py:60-76``); the engine's analog is a
real decode path for each format feasible without native libs, wired as
``fmt == "gif"`` into ``stages/multimodal.MediaCodec``.

Coverage:

- decode: GIF87a + GIF89a, global and local color tables, the 4-pass
  interlace permutation, variable-width LZW (dictionary growth, CLEAR /
  END handling, the 12-bit cap, deferred-clear streams). Returns the FIRST
  image frame as (h, w, 3) uint8 RGB — animation is out of scope for a
  data engine (frame handling lives in the ``rawv-u8`` video path); a
  Graphic Control Extension's transparency index is parsed and exposed on
  the info object but not composited (there is no background to composite
  against when the frame IS the data).
- encode: 8-bit grayscale (ramp palette) or (array, palette) indexed
  input, real LZW compression (not the clear-code-spam fallback), no
  interlace. Deterministic — pure function of its inputs, so payloads are
  retry/resume safe like every codec in ``codecs.py``.

The LZW inner loops are per-code Python — inherently sequential state, the
same accepted boundary as PNG's Paeth row loop and JPEG's Huffman walk;
tiles are small and decode runs inside actor-pool ``map_batches`` stages.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["gif_encode", "gif_decode", "GifInfo"]


class GifInfo:
    """Decoded-frame metadata (shape is authoritative on the array)."""

    __slots__ = ("width", "height", "version", "transparent_index")

    def __init__(self, width, height, version, transparent_index=None):
        self.width = width
        self.height = height
        self.version = version
        self.transparent_index = transparent_index

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return (
            f"GifInfo(width={self.width}, height={self.height}, "
            f"version={self.version!r}, "
            f"transparent_index={self.transparent_index})"
        )


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Variable-width LZW per the GIF spec: codes start at
    ``min_code_size + 1`` bits, the table grows by one entry per emitted
    code, the width bumps when the next code would not fit, capped at 12
    bits (further codes reuse the full table until a CLEAR)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, np.uint8)
    n_out = 0

    # bit reader: GIF packs codes LSB-first
    acc = 0
    nbits = 0
    pos = 0
    nbytes = len(data)

    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None

    while n_out < n_pixels:
        while nbits < width:
            if pos >= nbytes:
                raise ValueError("gif: LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"gif: LZW code {code} beyond table")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n_out < n_pixels:
        raise ValueError(f"gif: LZW ended early ({n_out}/{n_pixels} px)")
    return out


def _lzw_encode(pixels: np.ndarray, min_code_size: int) -> bytes:
    """Real LZW compression (prefix-dict growth), emitting CLEAR up front
    and on table overflow at 4096 entries, END at stream end."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict = {(None, i): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = None
    for k in map(int, pixels):
        if (prev, k) in table:
            prev = table[(prev, k)]
            continue
        emit(prev, width)
        table[(prev, k)] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4096:
            emit(clear, width)
            table = {(None, i): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prev = k
    if prev is not None:
        emit(prev, width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_rows(h: int) -> np.ndarray:
    """Row permutation: stored-row order → display-row index."""
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    inv = np.empty(h, np.int64)
    inv[np.asarray(rows, np.int64)] = np.arange(h)
    return inv


def gif_decode(buf) -> tuple[np.ndarray, GifInfo]:
    """Decode the first frame of a GIF87a/89a stream to (h, w, 3) uint8
    RGB. See module docstring for scope."""
    b = bytes(buf)
    if b[:3] != b"GIF" or b[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF stream")
    version = b[3:6].decode()
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    transparent = None
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("gif: no image data")
        if block == 0x21:  # extension: label + sub-blocks
            label = b[pos]
            pos += 1
            if label == 0xF9 and b[pos] >= 4:  # graphic control
                flags = b[pos + 1]
                if flags & 0x01:
                    transparent = b[pos + 4]
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{block:02x}")
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("gif: image has no color table")
        mcs = b[pos]
        pos += 1
        chunks = []
        while b[pos] != 0:
            ln = b[pos]
            chunks.append(b[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(chunks), mcs, w * h).reshape(h, w)
        if idx.max(initial=0) >= ct.shape[0]:
            raise ValueError("gif: pixel index beyond color table")
        if ipacked & 0x40:
            idx = idx[_deinterlace_rows(h)]
        rgb = ct[idx]
        return rgb, GifInfo(w, h, version, transparent)
    raise ValueError("gif: truncated stream")


def gif_encode(arr: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """Encode one frame. ``arr`` is (h, w) uint8 — grayscale when
    ``palette`` is None (a 256-gray ramp palette is written), else indices
    into ``palette`` (n≤256, shape (n, 3) uint8). GIF89a, global color
    table, no interlace."""
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError("gif_encode wants a (h, w) uint8 array")
    if palette is None:
        palette = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
    palette = np.ascontiguousarray(palette, np.uint8)
    n = palette.shape[0]
    if n > 256 or palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError("palette must be (n<=256, 3) uint8")
    if int(arr.max(initial=0)) >= n:
        raise ValueError("index beyond palette")
    # color-table size field: 2^(f+1) entries, >= max(n, 4)
    f = max(int(np.ceil(np.log2(max(n, 4)))) - 1, 1)
    tbl = np.zeros((2 << f, 3), np.uint8)
    tbl[:n] = palette
    h, w = arr.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (f << 4) | f, 0, 0)
    out += tbl.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    mcs = max(f + 1, 2)
    out.append(mcs)
    payload = _lzw_encode(arr.ravel(), mcs)
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
