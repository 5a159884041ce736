"""Baseline JPEG codec: hand-built bitstreams with pencil-derived pixels
(decoder correctness independent of the encoder), flat-block exactness,
round-trip PSNR gates (the north rule's lossy bar), restart markers, and
the multimodal wiring."""

import struct

import numpy as np
import pytest

from hydro_raster_ray.jpeg import JpegInfo, jpeg_decode, jpeg_encode


def _psnr(a, b):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


# ---------------------------------------------------------------------------
# hand-built bitstreams (assembled byte by byte from ITU-T.81, never via
# jpeg_encode — a symmetric encoder/decoder bug cannot cancel out here)


def _dqt_all(v):
    return b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([v] * 64)


def _sof0_gray(h, w):
    return (
        b"\xff\xc0" + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
    )


def _dht(tclass, tid, bits, vals):
    body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


_SOS_GRAY = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
# DC table: single code '00' (len 2) → category 2; AC: '0' (len 1) → EOB
_DC_BITS = [0, 1] + [0] * 14
_AC_EOB_BITS = [1] + [0] * 15


def test_handbuilt_dc_only_gray():
    """8×8 grayscale, quant table all 8s, DC diff = 3 (bits '00'+'11'),
    then EOB ('0'), padded with 1s → one byte 0x37. DC-only IDCT is a
    constant plane: 3·8/8 + 128 = 131 exactly."""
    buf = (
        b"\xff\xd8"
        + _dqt_all(8)
        + _sof0_gray(8, 8)
        + _dht(0, 0, _DC_BITS, [2])
        + _dht(1, 0, _AC_EOB_BITS, [0x00])
        + _SOS_GRAY
        + bytes([0b00110111])
        + b"\xff\xd9"
    )
    img, info = jpeg_decode(buf)
    assert info == JpegInfo(8, 8, 1, "gray")
    np.testing.assert_array_equal(img, np.full((8, 8), 131, np.uint8))


def test_handbuilt_negative_dc_and_crop():
    """11×6 image (2×1 MCUs, cropped): two blocks, DC diffs −3 then +3
    (category-2 low bits '00' encode −3). Block 1 = 128 − 3 = 125, block
    2 returns to 128 (predictor −3 + diff 3 = 0)."""
    # MCU1: '00'+'00' (diff −3) + EOB '0';  MCU2: '00'+'11' (+3) + EOB '0'
    # → 00000 00110 + 6 pad ones
    bits = bytes([0b00000001, 0b10111111])
    buf = (
        b"\xff\xd8"
        + _dqt_all(8)
        + _sof0_gray(11, 6)
        + _dht(0, 0, _DC_BITS, [2])
        + _dht(1, 0, _AC_EOB_BITS, [0x00])
        + _SOS_GRAY
        + bits
        + b"\xff\xd9"
    )
    img, info = jpeg_decode(buf)
    assert img.shape == (11, 6)
    np.testing.assert_array_equal(img[:8], np.full((8, 6), 125, np.uint8))
    np.testing.assert_array_equal(img[8:], np.full((3, 6), 128, np.uint8))


def test_handbuilt_ac_coefficient():
    """One AC coefficient: AC table '00'→EOB, '01'→(run 0, size 1); stream
    DC=3, then AC +1 at zigzag k=1 (natural position (0,1)), EOB. Pixels
    must equal the explicit T.81 IDCT cosine sum."""
    # bits: DC '00'+'11', AC '01'+'1', EOB '00' → 001101100 + pad 7 ones
    bits = bytes([0b00110110, 0b01111111])
    buf = (
        b"\xff\xd8"
        + _dqt_all(8)
        + _sof0_gray(8, 8)
        + _dht(0, 0, _DC_BITS, [2])
        + _dht(1, 0, [0, 2] + [0] * 14, [0x00, 0x01])
        + _SOS_GRAY
        + bits
        + b"\xff\xd9"
    )
    img, _ = jpeg_decode(buf)
    # independent reconstruction: S(0,0)=24, S(0,1)=8 (both dequantized)
    want = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u, v, coeff in ((0, 0, 24.0), (0, 1, 8.0)):
                cu = 1 / np.sqrt(2) if u == 0 else 1.0
                cv = 1 / np.sqrt(2) if v == 0 else 1.0
                s += (
                    0.25 * cu * cv * coeff
                    * np.cos((2 * y + 1) * u * np.pi / 16)
                    * np.cos((2 * x + 1) * v * np.pi / 16)
                )
            want[y, x] = s + 128.0
    np.testing.assert_array_equal(
        img, np.clip(np.round(want), 0, 255).astype(np.uint8)
    )


def test_handbuilt_restart_markers():
    """DRI=1 with an RST0 between the two MCUs: predictors reset, so the
    same '+3' interval decodes to 131 in both blocks."""
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 1)
    buf = (
        b"\xff\xd8"
        + _dqt_all(8)
        + _sof0_gray(8, 16)
        + _dht(0, 0, _DC_BITS, [2])
        + _dht(1, 0, _AC_EOB_BITS, [0x00])
        + dri
        + _SOS_GRAY
        + bytes([0b00110111])
        + b"\xff\xd0"
        + bytes([0b00110111])
        + b"\xff\xd9"
    )
    img, _ = jpeg_decode(buf)
    np.testing.assert_array_equal(img, np.full((8, 16), 131, np.uint8))


def test_progressive_raises():
    buf = (
        b"\xff\xd8" + _dqt_all(8)
        + b"\xff\xc2" + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00"
    )
    with pytest.raises(NotImplementedError, match="baseline"):
        jpeg_decode(buf)


def test_truncated_raises():
    full = jpeg_encode(np.full((16, 16), 99, np.uint8), quality=85)
    with pytest.raises(ValueError):
        jpeg_decode(full[: len(full) // 2])
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x00\x11")


# ---------------------------------------------------------------------------
# encoder round trips


def test_flat_image_exact():
    """A flat image is DC-only at any quality → bit-exact round trip."""
    for v in (0, 31, 130, 255):
        img, _ = jpeg_decode(jpeg_encode(np.full((24, 17), v, np.uint8)))
        np.testing.assert_array_equal(img, np.full((24, 17), v, np.uint8))


def test_roundtrip_psnr_gray():
    """Smooth content at quality 90 clears the north rule's 40 dB lossy
    bar with wide margin."""
    yy, xx = np.mgrid[0:56, 0:72]
    g = np.clip(40 + yy * 1.5 + xx * 0.8, 0, 255).astype(np.uint8)
    img, info = jpeg_decode(jpeg_encode(g, quality=90))
    assert info.n_components == 1
    assert _psnr(g, img) >= 40.0


@pytest.mark.parametrize("ss", ["444", "420"])
def test_roundtrip_psnr_rgb(ss):
    yy, xx = np.mgrid[0:48, 0:40]
    base = np.clip(30 + yy * 2.0 + xx, 0, 255)
    c = np.stack(
        [base, np.clip(255 - base, 0, 255), np.clip(base * 0.5 + 64, 0, 255)],
        axis=-1,
    ).astype(np.uint8)
    img, info = jpeg_decode(jpeg_encode(c, quality=90, subsampling=ss))
    assert info.sampling == ss and img.shape == c.shape
    assert _psnr(c, img) >= 40.0


def test_encode_deterministic_and_ragged():
    rng = np.random.default_rng(7)
    r = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    b1 = jpeg_encode(r, quality=75, subsampling="420")
    b2 = jpeg_encode(r, quality=75, subsampling="420")
    assert b1 == b2
    img, _ = jpeg_decode(b1)
    assert img.shape == (13, 21, 3)


# ---------------------------------------------------------------------------
# engine wiring


def test_media_codec_jpeg_path():
    from hydro_raster_ray.stages.multimodal import MediaCodec

    g = np.full((10, 12), 77, np.uint8)
    buf = jpeg_encode(g)
    a = MediaCodec().decode(buf, 10, 12, "jpeg")
    assert a.dtype == np.float64 and a.shape == (10, 12)
    np.testing.assert_array_equal(a, 77.0)
    with pytest.raises(ValueError, match="row metadata"):
        MediaCodec().decode(buf, 11, 12, "jpeg")


def test_make_fake_jpegs_real_payloads():
    from hydro_raster_ray.stages.multimodal import make_fake_jpegs

    t1 = make_fake_jpegs(6, 24, 20)
    t2 = make_fake_jpegs(6, 24, 20)
    assert t1.equals(t2)  # deterministic — retry/resume safe
    for i in range(t1.num_rows):
        buf = t1["bytes"][i].as_py()
        assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
        img, _ = jpeg_decode(buf)
        assert img.shape[:2] == (
            t1["h"][i].as_py(), t1["w"][i].as_py()
        )
