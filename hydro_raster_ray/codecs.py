"""Tile payload codecs for the ``fmt`` column of the tiles table.

The reference stores pixels as an in-memory float64 array with the NODATA
sentinel eagerly rewritten to NaN on load and written back on save
(``Raster.py:104-109``, ``spatial_analysis.py:117-119,169``). The engine's
analog: the ``bytes`` column holds an encoded ``(h, w)`` patch; ``decode``
always yields float64 with NaN holes, ``encode`` writes the sentinel back.
That NODATA↔NaN round-trip is a test-visible semantic.

Codecs (all little-endian, vectorized via ``np.frombuffer``):

- ``raw-f32``  — float32 pixels, NaN = nodata. Lossless for f32 data.
- ``raw-u16``  — 16-byte header (offset:f64, scale:f64) then uint16 pixels;
  65535 = nodata; value = offset + scale*u, cast to float32 precision (the
  decoded-value contract: any decoded payload re-encodes as ``raw-f32``
  bit-exactly, so value-preserving ops can switch fmt losslessly).
- ``qlossy``   — same layout with uint8 pixels (255 = nodata); scale spans the
  tile's min..max over 254 levels ⇒ PSNR ≥ 40 dB for the fixture surface
  (quantization step ≈ range/254, RMSE ≈ step/√12).
- ``png16``    — raw-u16's quantization wrapped in a real 16-bit grayscale
  PNG (pure-stdlib codec, ``png.py``): same 16-byte header, then a PNG whose
  u16 samples carry the identical offset/scale mapping (65535 = nodata).
  Decodes bit-identically to the raw-u16 of the same plane; DEFLATE + the
  Up filter compress smooth DEM tiles several-fold, cutting object-store
  and storage bytes. Variable-length (``payload_nbytes`` returns -1).
- ``raw-f64``  — float64 pixels, NaN = nodata. The EXACT-INTEGER plane
  format for id/count planes (basin labels are global cell ids, flow
  accumulation counts) whose values exceed float32's 2²⁴ contiguous-integer
  range on large grids: f64 holds integers exactly to 2⁵³ (~9·10¹⁵ cells).
  Deliberately OUTSIDE the f32 decoded-value contract the measurement
  codecs share — ``decode(dtype=float32)`` raises rather than silently
  rounding ids together, so the f32 pixel hot paths (halo exchange,
  bandwidth-lean kernels) can never ingest one by accident.

All functions are deterministic (retry/resume safe; zlib output is
deterministic at a fixed level).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = [
    "FORMATS",
    "decode",
    "encode",
    "roundtrip",
    "payload_nbytes",
    "phash64",
    "psnr",
]

_U16_NODATA = np.uint16(65535)
_U8_NODATA = np.uint8(255)
_HDR_FMT = "<dd"  # offset, scale
_HDR_SIZE = struct.calcsize(_HDR_FMT)

FORMATS = ("raw-f32", "raw-u16", "qlossy", "png16", "raw-f64")
# codecs under the f32 decoded-value contract (raw-f64 is the documented
# exact-integer carve-out — see module docstring)
F32_CONTRACT_FORMATS = ("raw-f32", "raw-u16", "qlossy", "png16")
# compressed fmts whose payload length depends on content, not just (h, w)
VARIABLE_FORMATS = frozenset({"png16"})


def payload_nbytes(fmt: str, h: int, w: int) -> int:
    """Expected byte length — the per-row consistency check mirroring the
    reference's array/header shape check (``Raster.py:112-114``). Returns
    -1 for compressed fmts whose length is content-dependent (callers skip
    the length check for those; the PNG container carries its own CRCs)."""
    n = int(h) * int(w)
    if fmt == "raw-f32":
        return 4 * n
    if fmt == "raw-u16":
        return _HDR_SIZE + 2 * n
    if fmt == "qlossy":
        return _HDR_SIZE + n
    if fmt == "raw-f64":
        return 8 * n
    if fmt in VARIABLE_FORMATS:
        return -1
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(buf: bytes, h: int, w: int, fmt: str, dtype=np.float64) -> np.ndarray:
    """bytes → (h, w) float array with NaN holes (NODATA→NaN semantics).

    ``dtype`` picks the in-memory plane representation. Decoded VALUES are
    float32-precision by codec contract regardless, so ``dtype=float32`` is
    lossless — it only halves the DRAM traffic of plane-sized kernels (the
    single-box bandwidth ceiling documented in BASELINE.md). Callers that
    take f32 planes must promote at multi-op arithmetic and pass explicit
    float64 accumulators to reductions (``sum(dtype=np.float64)``) so
    aggregate results stay bit-identical to the f64 path.

    The raw-f32 + float32 fast path returns a READ-ONLY zero-copy view of
    ``buf`` — copy before mutating in place.
    """
    n = int(h) * int(w)
    if fmt == "raw-f32":
        a = np.frombuffer(buf, dtype="<f4", count=n)
        if dtype != np.float32:
            a = a.astype(dtype)
        return a.reshape(int(h), int(w))
    if fmt == "raw-f64":
        if dtype != np.float64:
            raise ValueError(
                "raw-f64 planes carry exact integer ids/counts beyond f32 "
                "range; decode at float64 (dtype=float32 would merge ids)"
            )
        return np.frombuffer(buf, dtype="<f8", count=n).reshape(int(h), int(w))
    if fmt == "raw-u16":
        offset, scale = struct.unpack_from(_HDR_FMT, buf, 0)
        u = np.frombuffer(buf, dtype="<u2", count=n, offset=_HDR_SIZE)
        # decoded values are float32-precision by contract: any codec's
        # decoded payload re-encodes as raw-f32 bit-exactly, so trims/masks
        # (value-preserving ops) stay lossless across fmt switches
        a = (offset + scale * u.astype(np.float64)).astype(np.float32).astype(dtype, copy=False)
        a[u == _U16_NODATA] = np.nan
        return a.reshape(int(h), int(w))
    if fmt == "qlossy":
        offset, scale = struct.unpack_from(_HDR_FMT, buf, 0)
        u = np.frombuffer(buf, dtype="u1", count=n, offset=_HDR_SIZE)
        a = (offset + scale * u.astype(np.float64)).astype(np.float32).astype(dtype, copy=False)
        a[u == _U8_NODATA] = np.nan
        return a.reshape(int(h), int(w))
    if fmt == "png16":
        from .png import png_decode

        offset, scale = struct.unpack_from(_HDR_FMT, buf, 0)
        u, info = png_decode(memoryview(buf)[_HDR_SIZE:])
        if u.dtype != np.uint16 or u.ndim != 2:
            raise ValueError("png16 payload must be a 16-bit grayscale PNG")
        if u.shape != (int(h), int(w)):
            raise ValueError(
                f"png16 payload is {u.shape}, row metadata says {(h, w)}"
            )
        # identical value mapping to raw-u16 → decodes bit-identically
        a = (offset + scale * u.astype(np.float64)).astype(np.float32).astype(dtype, copy=False)
        a[u == _U16_NODATA] = np.nan
        return a
    raise ValueError(f"unknown fmt {fmt!r}")


def _u16_params(a: np.ndarray) -> tuple[float, float]:
    finite = a[np.isfinite(a)]
    if finite.size == 0:
        return 0.0, 1.0
    lo = float(finite.min())
    hi = float(finite.max())
    scale = (hi - lo) / 65534.0 if hi > lo else 1.0
    return lo, scale


def _u8_params(a: np.ndarray) -> tuple[float, float]:
    finite = a[np.isfinite(a)]
    if finite.size == 0:
        return 0.0, 1.0
    lo = float(finite.min())
    hi = float(finite.max())
    scale = (hi - lo) / 254.0 if hi > lo else 1.0
    return lo, scale


def encode(a: np.ndarray, fmt: str) -> bytes:
    """float array (NaN holes) → bytes (NaN→sentinel semantics)."""
    if fmt == "raw-f32":
        return np.ascontiguousarray(a, dtype="<f4").tobytes()
    if fmt == "raw-f64":
        return np.ascontiguousarray(a, dtype="<f8").tobytes()
    if fmt == "raw-u16":
        offset, scale = _u16_params(a)
        q = np.clip(np.round((a - offset) / scale), 0, 65534)
        u = np.where(np.isnan(a), _U16_NODATA, np.nan_to_num(q).astype(np.uint16))
        return struct.pack(_HDR_FMT, offset, scale) + u.astype("<u2").tobytes()
    if fmt == "qlossy":
        offset, scale = _u8_params(a)
        q = np.clip(np.round((a - offset) / scale), 0, 254)
        u = np.where(np.isnan(a), _U8_NODATA, np.nan_to_num(q).astype(np.uint8))
        return struct.pack(_HDR_FMT, offset, scale) + u.astype("u1").tobytes()
    if fmt == "png16":
        from .png import png_encode

        offset, scale = _u16_params(a)
        q = np.clip(np.round((a - offset) / scale), 0, 65534)
        u = np.where(np.isnan(a), _U16_NODATA, np.nan_to_num(q).astype(np.uint16))
        return struct.pack(_HDR_FMT, offset, scale) + png_encode(
            u.astype(np.uint16), filter="up"
        )
    raise ValueError(f"unknown fmt {fmt!r}")


def roundtrip(a: np.ndarray, fmt: str) -> np.ndarray:
    """decode(encode(a, fmt)) — the decoded truth of a payload generated
    from ``a``. The fixture generator defines tile ground truth this way so
    engine-vs-oracle comparisons are exact for every codec."""
    h, w = a.shape
    return decode(encode(a, fmt), h, w, fmt)


def phash64(a: np.ndarray) -> int:
    """Stable 64-bit content key of the decoded payload: blake2b-8 of the
    little-endian float32 pixel bytes (NaN canonicalized by float32 cast).
    Deterministic across processes — the dedup/partition key of the table."""
    buf = np.ascontiguousarray(a, dtype="<f4").tobytes()
    d = hashlib.blake2b(buf, digest_size=8).digest()
    return int.from_bytes(d, "little", signed=True)


def psnr(ref: np.ndarray, test: np.ndarray) -> float:
    """Peak signal-to-noise ratio over jointly-valid cells, peak = ref range.
    Returns +inf for exact match. The lossy-fmt pass gate is PSNR ≥ 40 dB."""
    m = np.isfinite(ref) & np.isfinite(test)
    if not m.any():
        return float("inf")
    err = ref[m] - test[m]
    mse = float(np.mean(err * err))
    if mse == 0.0:
        return float("inf")
    peak = float(ref[m].max() - ref[m].min())
    if peak == 0.0:
        return float("inf")
    return 20.0 * np.log10(peak) - 10.0 * np.log10(mse)
