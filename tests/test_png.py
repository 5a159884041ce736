"""Pure-stdlib PNG codec: round-trips, all five filters, palette, CRCs,
and the ``png16`` compressed tile format's bit-parity with raw-u16."""

import struct
import zlib

import numpy as np
import pytest

from hydro_raster_ray import codecs
from hydro_raster_ray.png import png_decode, png_encode


def _rng():
    return np.random.default_rng(7)


# ---------------------------------------------------------------------------
# encoder → decoder round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("filt", ["none", "sub", "up"])
@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((13, 17), np.uint8),  # gray 8
        ((13, 17), np.uint16),  # gray 16
        ((9, 5, 2), np.uint8),  # gray+alpha
        ((7, 11, 3), np.uint8),  # RGB
        ((6, 8, 4), np.uint8),  # RGBA
        ((5, 4, 3), np.uint16),  # RGB 16
        ((1, 1), np.uint8),  # single pixel
    ],
)
def test_roundtrip(shape, dtype, filt):
    a = _rng().integers(0, np.iinfo(dtype).max + 1, shape, dtype=dtype)
    out, info = png_decode(png_encode(a, filter=filt))
    assert out.dtype == dtype and out.shape == a.shape
    np.testing.assert_array_equal(out, a)
    assert (info.width, info.height) == (a.shape[1], a.shape[0])


def test_16bit_is_big_endian_per_spec():
    # one sample 0x0102 must serialize as bytes 01 02 in the scanline
    a = np.array([[0x0102]], np.uint16)
    buf = png_encode(a, filter="none", level=0)
    # IDAT payload: zlib-wrapped [filter=0, 0x01, 0x02]
    idat_at = buf.index(b"IDAT") + 4
    (ln,) = struct.unpack_from(">I", buf, idat_at - 8)
    raw = zlib.decompress(buf[idat_at : idat_at + ln])
    assert raw == b"\x00\x01\x02"


# ---------------------------------------------------------------------------
# decode of externally-filtered scanlines (Average / Paeth / mixed)
# ---------------------------------------------------------------------------


def _forward_filter(a: np.ndarray, ftypes) -> bytes:
    """Scalar forward filter (the encoder's inverse) — test-local witness."""
    h = a.shape[0]
    c = 1 if a.ndim == 2 else a.shape[2]
    w = a.shape[1]
    raw = a.reshape(h, w * c).astype(np.int32)
    bpp = c
    out = bytearray()
    prev = np.zeros(w * c, np.int32)
    for r in range(h):
        f = ftypes[r % len(ftypes)]
        out.append(f)
        row = raw[r]
        rec = row.copy()
        for i in range(w * c):
            left = rec[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                v = row[i]
            elif f == 1:
                v = row[i] - left
            elif f == 2:
                v = row[i] - up
            elif f == 3:
                v = row[i] - ((left + up) >> 1)
            else:
                pa_, pb, pc = abs(up - ul), abs(left - ul), abs(left + up - 2 * ul)
                pred = left if (pa_ <= pb and pa_ <= pc) else (up if pb <= pc else ul)
                v = row[i] - pred
            out.append(v & 0xFF)
        prev = rec
    return bytes(out)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _build_png(a: np.ndarray, ftypes, color_type: int, extra=b"") -> bytes:
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(_forward_filter(a, ftypes)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[3], [4], [0, 1, 2, 3, 4]])
def test_decode_average_paeth_gray(ftypes):
    a = _rng().integers(0, 256, (11, 13), dtype=np.uint8)
    out, _ = png_decode(_build_png(a, ftypes, color_type=0))
    np.testing.assert_array_equal(out, a)


@pytest.mark.parametrize("ftypes", [[3], [4], [4, 3, 1, 2, 0]])
def test_decode_average_paeth_rgb(ftypes):
    a = _rng().integers(0, 256, (6, 7, 3), dtype=np.uint8)
    out, _ = png_decode(_build_png(a, ftypes, color_type=2))
    np.testing.assert_array_equal(out, a)


def test_decode_palette_and_trns():
    rng = _rng()
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    png = _build_png(idx, [0], color_type=3, extra=_chunk(b"PLTE", pal.tobytes()))
    out, info = png_decode(png)
    np.testing.assert_array_equal(out, pal[idx])
    # with tRNS → RGBA
    trns = bytes(range(16))
    png = _build_png(
        idx, [0], color_type=3,
        extra=_chunk(b"PLTE", pal.tobytes()) + _chunk(b"tRNS", trns),
    )
    out, _ = png_decode(png)
    assert out.shape == (5, 9, 4)
    np.testing.assert_array_equal(out[..., :3], pal[idx])
    want_a = np.full(256, 255, np.uint8)
    want_a[:16] = np.frombuffer(trns, np.uint8)
    np.testing.assert_array_equal(out[..., 3], want_a[idx])


def test_decode_viz_output():
    """viz.array_to_png emits standard RGBA-8 PNG — the codec reads it."""
    from hydro_raster_ray.viz import array_to_png

    arr = _rng().normal(size=(20, 30))
    arr[3, 4] = np.nan
    out, info = png_decode(array_to_png(arr))
    assert out.shape == (20, 30, 4) and info.color_type == 6
    assert out[3, 4, 3] == 0 and out[0, 0, 3] == 255


def test_crc_and_signature_errors():
    a = _rng().integers(0, 256, (4, 4), dtype=np.uint8)
    buf = bytearray(png_encode(a))
    buf[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(buf))
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"\x89PNh" + bytes(buf[4:]))


def test_interlace_rejected():
    a = _rng().integers(0, 256, (4, 4), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)  # interlace=1
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_forward_filter(a, [0])))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="interlace"):
        png_decode(png)


# ---------------------------------------------------------------------------
# png16 tile format
# ---------------------------------------------------------------------------


def _surface(h=64, w=64):
    y, x = np.mgrid[0:h, 0:w]
    a = np.sin(x / 5.0) * 20.0 + np.cos(y / 3.0) * 7.0
    a[(x + y) % 11 == 0] = np.nan
    return a


def test_png16_bit_identical_to_raw_u16():
    """png16 wraps raw-u16's exact quantization: decoded planes match
    bit-for-bit, so fmt conversion raw-u16 ↔ png16 is value-lossless."""
    a = _surface()
    d_png = codecs.decode(codecs.encode(a, "png16"), 64, 64, "png16")
    d_u16 = codecs.decode(codecs.encode(a, "raw-u16"), 64, 64, "raw-u16")
    np.testing.assert_array_equal(np.isnan(d_png), np.isnan(d_u16))
    np.testing.assert_array_equal(d_png[~np.isnan(d_png)], d_u16[~np.isnan(d_u16)])


def test_png16_compresses_smooth_tiles():
    a = _surface(256, 256)
    png_len = len(codecs.encode(a, "png16"))
    u16_len = codecs.payload_nbytes("raw-u16", 256, 256)
    assert png_len < u16_len / 2  # Up filter + DEFLATE on a smooth DEM
    assert codecs.payload_nbytes("png16", 256, 256) == -1  # variable


def test_png16_shape_mismatch_raises():
    buf = codecs.encode(_surface(8, 8), "png16")
    with pytest.raises(ValueError, match="metadata"):
        codecs.decode(buf, 8, 9, "png16")


def test_png16_tileset_validation_and_decode(ray_session, small_scheme):
    """A tiles table re-encoded to png16 passes the read validator (variable
    length skips the affine check) and decodes to the same global stats."""
    import pyarrow as pa

    from hydro_raster_ray import fixtures
    from hydro_raster_ray.sources import from_arrow_tiles
    from hydro_raster_ray.stages.stats import global_stats

    t = fixtures.tiles_table(small_scheme)
    bufs, fmts = [], []
    for i in range(t.num_rows):
        z = codecs.decode(
            t["bytes"][i].as_py(), t["h"][i].as_py(), t["w"][i].as_py(),
            t["fmt"][i].as_py(),
        )
        bufs.append(codecs.encode(z, "png16"))
        fmts.append("png16")
    t2 = t.drop_columns(["bytes", "fmt"]) \
          .append_column("bytes", pa.array(bufs, pa.binary())) \
          .append_column("fmt", pa.array(fmts, pa.string()))
    ts_ref = from_arrow_tiles(t, small_scheme)
    ts_png = from_arrow_tiles(t2, small_scheme)
    ref = global_stats(ts_ref)
    got = global_stats(ts_png)
    # png16 re-quantizes the decoded f32 values on a u16 grid over the same
    # min..max → values match raw-u16 tiles exactly; f32/qlossy tiles shift
    # by ≤ half a quantization step
    assert got["n_valid"] == ref["n_valid"]
    rng_z = float(ref["max"] - ref["min"])
    assert abs(got["sum"] - ref["sum"]) <= rng_z / 65534.0 * ref["n_valid"]
