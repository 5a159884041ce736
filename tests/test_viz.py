"""PNG dump tests: the written file is decoded back with ONLY stdlib
zlib/struct (no imaging library) and compared pixel-for-pixel — a
self-contained golden round trip."""

import struct
import zlib

import numpy as np
import pytest


def _decode_png(png: bytes):
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    idat = b""
    w = h = None
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos : pos + 4])
        tag = png[pos + 4 : pos + 8]
        data = png[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", png[pos + 8 + ln : pos + 12 + ln])
        assert crc == (zlib.crc32(tag + data) & 0xFFFFFFFF)
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", data[:10])
            assert depth == 8 and ctype == 6  # 8-bit RGBA
        elif tag == b"IDAT":
            idat += data
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, 1 + w * 4)
    assert (raw[:, 0] == 0).all()  # filter type 0 per scanline
    return raw[:, 1:].reshape(h, w, 4)


def test_array_to_png_round_trip():
    from hydro_raster_ray.viz import array_to_png

    arr = np.array([[0.0, 5.0, 10.0], [np.nan, 2.5, 7.5]])
    rgba = _decode_png(array_to_png(arr))
    assert rgba.shape == (2, 3, 4)
    # grayscale ramp 0..255 over [0, 10]; NaN transparent
    assert rgba[0, 0, 0] == 0 and rgba[0, 2, 0] == 255
    assert rgba[0, 1, 0] == 127 or rgba[0, 1, 0] == 128
    assert rgba[1, 0, 3] == 0 and rgba[0, 0, 3] == 255
    assert (rgba[..., 0] == rgba[..., 1]).all() and (rgba[..., 0] == rgba[..., 2]).all()


def test_png_dump_small_mosaic(tmp_path, ray_session):
    from hydro_raster_ray import fixtures
    from hydro_raster_ray.pipelines.tile_queries import tiles_for
    from hydro_raster_ray.sources.tiles import to_array
    from hydro_raster_ray.viz import png_dump

    fixtures.ensure_fixture_dir("sf0.001")
    ts, _ = tiles_for("/root/testdata/sf0.001")
    p = png_dump(ts, str(tmp_path / "mosaic.png"))
    rgba = _decode_png(open(p, "rb").read())
    truth = to_array(ts)
    assert rgba.shape[:2] == truth.shape
    # NaN pattern preserved in alpha exactly
    assert ((rgba[..., 3] == 255) == np.isfinite(truth)).all()


def test_png_dump_guards_large_grids(ray_session):
    from hydro_raster_ray import fixtures
    from hydro_raster_ray.pipelines.tile_queries import tiles_for
    from hydro_raster_ray.viz import png_dump

    fixtures.ensure_fixture_dir("sf0.001")
    ts, _ = tiles_for("/root/testdata/sf0.001")
    with pytest.raises(ValueError, match="max_px"):
        png_dump(ts, "/tmp/never.png", max_px=10)
