"""REAL baseline TIFF codec — pure stdlib + numpy, no imaging libraries.

Implements the TIFF 6.0 specification (Adobe, 1992 — public):

- container: both byte orders (``II`` little / ``MM`` big endian), classic
  32-bit offsets, first-IFD image, strip organization (StripOffsets /
  StripByteCounts / RowsPerStrip).
- pixel types: grayscale 8- and 16-bit, RGB 8-bit (chunky planar config),
  unsigned integer samples.
- compression: 1 = none, 5 = LZW (TIFF variant: MSB-first bit packing,
  EarlyChange code-width bumps at table sizes 511/1023/2047, Clear at
  4094 — §13 + the TIFF TechNote), 32773 = PackBits (§9).
- Predictor tag 317 = 2 (horizontal differencing, §14) on decode and
  optionally on encode.

Out of scope (explicit ``NotImplementedError``): tiled organization,
planar configuration 2, floating-point / signed sample formats, palette
color, BigTIFF. These raise with the tag that triggered them so a user
sees exactly which corpus variant needs a real imaging lib.

Reference-parity note: the reference engine reads rasters through
rasterio/GDAL (`spatial_analysis.py:174-209` ``tif_read``,
`Raster.py:602-630` ``write_tif``); this module is the sandbox-native
equivalent for the container itself, used by ``stages/multimodal.py``'s
``MediaCodec`` (fmt="tiff"). Tested in ``tests/test_tiff.py`` against
hand-built byte streams (pencil-derived IFDs, an MSB-first LZW bitstream
built by binary-string concatenation, PackBits spec examples).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["TiffInfo", "tiff_decode", "tiff_encode"]

# tag ids (TIFF 6.0 §8)
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284
_PREDICTOR = 317
_TILE_WIDTH = 322
_TILE_LENGTH = 323
_SAMPLE_FORMAT = 339

# field types → (struct char, size)
_TYPE_FMT = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4)}


class TiffInfo:
    """Parsed container facts (width/height/bits/spp/compression/order)."""

    def __init__(self, width, height, bits, spp, compression, byteorder,
                 predictor=1):
        self.width = width
        self.height = height
        self.bits = bits
        self.spp = spp
        self.compression = compression
        self.byteorder = byteorder
        self.predictor = predictor

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return (f"TiffInfo({self.width}x{self.height} bits={self.bits} "
                f"spp={self.spp} comp={self.compression} "
                f"order={self.byteorder!r} pred={self.predictor})")


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 §9)
# ---------------------------------------------------------------------------

def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:  # replicate next byte 257-h times
            out += data[i:i + 1] * (257 - h)
            i += 1
        # h == 128: no-op per spec
    if len(out) < expected:
        raise ValueError("PackBits strip ended short")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    """Greedy spec encoder: replicate runs ≥3, literals otherwise;
    literal chunks capped at 128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # measure the replicate run at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i = j
            continue
        # literal: extend until a ≥3 run starts or 128 bytes
        k = i
        while k < n and k - i < 128:
            if k + 2 < n and data[k] == data[k + 1] == data[k + 2]:
                break
            k += 1
        out.append(k - i - 1)
        out += data[i:k]
        i = k
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF LZW (TIFF 6.0 §13 + TechNote: MSB-first, EarlyChange)
# ---------------------------------------------------------------------------

_CLEAR = 256
_EOI = 257


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """Variable-width (9→12 bit) LZW, codes packed MSB-first. EarlyChange:
    the read width bumps when the NEXT table entry index would be
    2^width − 1 (511/1023/2047), mirroring writers that bump early."""
    out = bytearray()
    bitbuf = 0
    bitcnt = 0
    pos = 0
    n = len(data)
    width = 9
    # table: entries 0-255 literal, 256 clear, 257 eoi
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None

    while len(out) < expected:
        while bitcnt < width:
            if pos >= n:
                raise ValueError("LZW strip ended short")
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            bitcnt += 8
        code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
        bitcnt -= width
        if code == _EOI:
            break
        if code == _CLEAR:
            del table[258:]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= 256:
                raise ValueError("LZW: first code after clear not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW: code beyond table")
        out += entry
        prev = entry
        # The decoder's table lags the writer's by ONE entry at each read
        # (it needs the next code's first byte to finish an entry), so with
        # EarlyChange it bumps at 2^w − 2 where the writer bumps at 2^w − 1.
        if len(table) + 2 == (1 << width) and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("LZW output short")
    return bytes(out[:expected])


def _lzw_encode(data: bytes) -> bytes:
    """Matching writer: emits Clear, string codes, Clear again when the
    table reaches 4094 entries, EOI; width bumps one code early."""
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    emit(_CLEAR, width)
    cur = b""
    for b in data:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = nxt
        nxt += 1
        if nxt + 1 == (1 << width) and width < 12:  # early change
            width += 1
        cur = bytes([b])
        if nxt >= 4094:
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
    if cur:
        emit(table[cur], width)
    emit(_EOI, width)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

def _read_ifd(buf: bytes, bo: str):
    """Parse header + first IFD → {tag: (type, [values])}."""
    if len(buf) < 8:
        raise ValueError("not a TIFF: short header")
    order = buf[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError(f"not a TIFF: byte-order mark {order!r}")
    magic, off = struct.unpack(e + "HI", buf[2:8])
    if magic == 43:
        raise NotImplementedError("BigTIFF (magic 43) not supported")
    if magic != 42:
        raise ValueError(f"not a TIFF: magic {magic}")
    n_tags = struct.unpack_from(e + "H", buf, off)[0]
    tags = {}
    for i in range(n_tags):
        base = off + 2 + 12 * i
        tag, ftype, count = struct.unpack_from(e + "HHI", buf, base)
        if ftype not in _TYPE_FMT:
            continue  # RATIONAL/ASCII metadata tags — not needed
        ch, sz = _TYPE_FMT[ftype]
        total = sz * count
        if total <= 4:
            raw = buf[base + 8:base + 8 + total]
        else:
            voff = struct.unpack_from(e + "I", buf, base + 8)[0]
            raw = buf[voff:voff + total]
        tags[tag] = list(struct.unpack(e + ch * count, raw))
    return e, tags


def tiff_decode(buf) -> tuple[np.ndarray, TiffInfo]:
    """Decode the first image of a TIFF byte string.

    Returns ``(array, TiffInfo)`` — array is uint8/uint16, shape (h, w)
    for grayscale or (h, w, 3) for RGB."""
    buf = bytes(buf)
    e, tags = _read_ifd(buf, "")
    if _TILE_WIDTH in tags or _TILE_LENGTH in tags:
        raise NotImplementedError("tiled TIFF not supported (tag 322/323)")
    w = tags[_IMAGE_WIDTH][0]
    h = tags[_IMAGE_LENGTH][0]
    spp = tags.get(_SAMPLES_PER_PIXEL, [1])[0]
    bits_l = tags.get(_BITS_PER_SAMPLE, [1])
    if len(set(bits_l)) != 1:
        raise NotImplementedError(f"mixed BitsPerSample {bits_l}")
    bits = bits_l[0]
    comp = tags.get(_COMPRESSION, [1])[0]
    pred = tags.get(_PREDICTOR, [1])[0]
    planar = tags.get(_PLANAR_CONFIG, [1])[0]
    sfmt = tags.get(_SAMPLE_FORMAT, [1])[0]
    if planar != 1:
        raise NotImplementedError("planar configuration 2 not supported")
    if sfmt != 1:
        raise NotImplementedError(f"sample format {sfmt} (non-uint)")
    if bits not in (8, 16) or spp not in (1, 3) or (bits, spp) == (16, 3):
        raise NotImplementedError(f"bits={bits} spp={spp} not supported")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"compression {comp} not supported")

    offsets = tags[_STRIP_OFFSETS]
    counts = tags[_STRIP_BYTE_COUNTS]
    rps = tags.get(_ROWS_PER_STRIP, [h])[0]
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    row_bytes = w * spp * (bits // 8)

    raw = bytearray()
    for si, (o, c) in enumerate(zip(offsets, counts)):
        nrows = min(rps, h - si * rps)
        expected = nrows * row_bytes
        strip = buf[o:o + c]
        if comp == 1:
            if len(strip) < expected:
                raise ValueError("uncompressed strip short")
            data = strip[:expected]
        elif comp == 32773:
            data = _packbits_decode(strip, expected)
        else:
            data = _lzw_decode(strip, expected)
        if pred == 2:
            # horizontal differencing is applied per row, per sample,
            # BEFORE byte-order packing — undo on the sample grid
            a = np.frombuffer(data, dtype=(e + "u2") if bits == 16 else "u1")
            a = a.reshape(nrows, w, spp).astype(
                np.uint16 if bits == 16 else np.uint8)
            a = np.cumsum(a.astype(np.int64), axis=1, dtype=np.int64)
            a = (a & ((1 << bits) - 1)).astype(
                np.uint16 if bits == 16 else np.uint8)
            data = a.astype(e + "u2").tobytes() if bits == 16 else a.tobytes()
        raw += data

    dt = np.dtype(e + "u2") if bits == 16 else np.dtype("u1")
    arr = np.frombuffer(bytes(raw), dtype=dt).reshape(h, w, spp)
    arr = arr.astype(np.uint16 if bits == 16 else np.uint8)
    if spp == 1:
        arr = arr[:, :, 0]
    info = TiffInfo(w, h, bits, spp, comp, "II" if e == "<" else "MM", pred)
    return arr, info


def _encode_strip(rows: np.ndarray, comp: int, pred: int, bits: int,
                  e: str) -> bytes:
    if pred == 2:
        d = rows.astype(np.int64)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        rows = (d & ((1 << bits) - 1)).astype(rows.dtype)
    data = rows.astype(e + "u2").tobytes() if bits == 16 else rows.tobytes()
    if comp == 1:
        return data
    if comp == 32773:
        return _packbits_encode(data)
    return _lzw_encode(data)


def tiff_encode(arr: np.ndarray, compression: str = "none",
                predictor: bool = False, byteorder: str = "II",
                rows_per_strip: int | None = None) -> bytes:
    """Encode uint8 gray / uint8 RGB / uint16 gray as a baseline TIFF.

    compression: "none" | "packbits" | "lzw"; predictor applies TIFF
    horizontal differencing (tag 317=2, LZW/PackBits payloads only).
    Deterministic; strips default to ~8 KiB so multi-strip paths are
    exercised on realistic sizes."""
    comp = {"none": 1, "lzw": 5, "packbits": 32773}[compression]
    if predictor and comp == 1:
        raise ValueError("predictor without compression is pointless")
    e = "<" if byteorder == "II" else ">"
    a = np.asarray(arr)
    if a.ndim == 2:
        spp = 1
        a3 = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        spp = 3
        a3 = a
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    if a.dtype == np.uint8:
        bits = 8
    elif a.dtype == np.uint16:
        bits = 16
        if spp == 3:
            raise NotImplementedError("16-bit RGB encode not supported")
    else:
        raise ValueError(f"unsupported dtype {a.dtype}")
    h, w = a3.shape[:2]
    row_bytes = w * spp * (bits // 8)
    rps = rows_per_strip or max(1, 8192 // max(row_bytes, 1))
    pred = 2 if predictor else 1

    strips = []
    for r0 in range(0, h, rps):
        rows = a3[r0:r0 + rps]
        strips.append(_encode_strip(rows, comp, pred, bits, e))

    # layout: header(8) | IFD | external values | strip data
    entries = []  # (tag, type, count, packed-or-external values)

    def ent(tag, ftype, values):
        entries.append((tag, ftype, values))

    ent(_IMAGE_WIDTH, 4, [w])
    ent(_IMAGE_LENGTH, 4, [h])
    ent(_BITS_PER_SAMPLE, 3, [bits] * spp)
    ent(_COMPRESSION, 3, [comp])
    ent(_PHOTOMETRIC, 3, [1 if spp == 1 else 2])  # BlackIsZero / RGB
    ent(_STRIP_OFFSETS, 4, [0] * len(strips))  # patched below
    ent(_SAMPLES_PER_PIXEL, 3, [spp])
    ent(_ROWS_PER_STRIP, 4, [rps])
    ent(_STRIP_BYTE_COUNTS, 4, [len(s) for s in strips])
    ent(_PLANAR_CONFIG, 3, [1])
    if pred == 2:
        ent(_PREDICTOR, 3, [pred])
    ent(_SAMPLE_FORMAT, 3, [1] * spp)
    entries.sort(key=lambda t: t[0])

    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    ext_off = ifd_off + ifd_size
    ext = bytearray()
    # first pass: compute external space
    packed = []
    for tag, ftype, values in entries:
        ch, sz = _TYPE_FMT[ftype]
        total = sz * len(values)
        if total <= 4:
            packed.append(None)
        else:
            packed.append(ext_off + len(ext))
            ext += b"\0" * total
    data_off = ext_off + len(ext)
    strip_offsets = []
    o = data_off
    for s in strips:
        strip_offsets.append(o)
        o += len(s)

    out = bytearray()
    out += (b"II" if e == "<" else b"MM") + struct.pack(e + "HI", 42, ifd_off)
    out += struct.pack(e + "H", len(entries))
    ext = bytearray()
    for (tag, ftype, values), voff in zip(entries, packed):
        if tag == _STRIP_OFFSETS:
            values = strip_offsets
        ch, sz = _TYPE_FMT[ftype]
        total = sz * len(values)
        out += struct.pack(e + "HHI", tag, ftype, len(values))
        if total <= 4:
            out += struct.pack(e + ch * len(values), *values).ljust(4, b"\0")
        else:
            out += struct.pack(e + "I", voff)
            ext += struct.pack(e + ch * len(values), *values)
    out += struct.pack(e + "I", 0)  # next-IFD pointer: none
    out += ext
    for s in strips:
        out += s
    return bytes(out)
