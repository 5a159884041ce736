"""GIF codec tests: an external-truth byte stream (the canonical 35-byte
1×1 red GIF — container + LZW verified against bytes this repo did not
produce), LZW edge cases (KwKwK, 12-bit dict overflow, deferred clear),
the 4-pass interlace permutation, palettes, and the MediaCodec wiring."""

import numpy as np
import pytest

from hydro_raster_ray.gif import GifInfo, gif_decode, gif_encode

# the canonical minimal GIF: 1×1, 2-entry GCT (red, black), LZW mcs=2,
# data bytes 0x44 0x01 → CLEAR, index 0, END
RED_1X1 = bytes.fromhex(
    "47494638396101000100800000ff0000000000"
    "2c00000000010001000002024401003b".replace(" ", "")
)


def test_external_truth_1x1_red():
    img, info = gif_decode(RED_1X1)
    assert img.shape == (1, 1, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert info.version == "89a"
    assert info.transparent_index is None


def _rt(arr, palette=None):
    out, info = gif_decode(gif_encode(arr, palette=palette))
    truth = (palette if palette is not None
             else np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
             )[arr]
    np.testing.assert_array_equal(out, truth)
    assert (info.height, info.width) == arr.shape
    return out


def test_roundtrip_gray_gradient():
    yy, xx = np.mgrid[0:40, 0:33]
    _rt(((yy * 3 + xx * 5) % 256).astype(np.uint8))


def test_roundtrip_kwkwk_heavy():
    """Constant and short-period planes hammer the code==len(table)
    (KwKwK) decoder branch."""
    _rt(np.zeros((17, 19), np.uint8))
    _rt(np.tile(np.array([1, 1, 1, 1, 2, 2, 2], np.uint8), 100)[:700]
        .reshape(20, 35))


def test_roundtrip_dict_overflow():
    """>4096 LZW entries forces the mid-stream CLEAR + table rebuild."""
    a = (np.arange(200 * 300, dtype=np.int64) * 2654435761 % 251).astype(
        np.uint8).reshape(200, 300)
    _rt(a)


def test_roundtrip_palette():
    pal = np.stack(
        [(np.arange(64) * 4) % 256, (np.arange(64) * 7) % 256,
         (255 - np.arange(64) * 4) % 256], axis=1
    ).astype(np.uint8)
    yy, xx = np.mgrid[0:10, 0:11]
    _rt(((yy + xx) % 64).astype(np.uint8), palette=pal)


def test_interlace_permutation():
    """Encode the rows pre-permuted into GIF's 4-pass storage order, flip
    the interlace bit, and the decoder must hand back the display order."""
    h, w = 13, 7
    yy, xx = np.mgrid[0:h, 0:w]
    arr = ((yy * 11 + xx) % 256).astype(np.uint8)
    passes = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        passes.extend(range(start, h, step))
    stored = arr[np.asarray(passes)]
    buf = bytearray(gif_encode(stored))
    # image descriptor packed byte: 6 (header) + 7 (LSD) + 768 (GCT) + 9
    pk = 6 + 7 + 768 + 9
    assert buf[6 + 7 + 768] == 0x2C
    assert buf[pk] == 0
    buf[pk] = 0x40
    out, _ = gif_decode(bytes(buf))
    np.testing.assert_array_equal(out[..., 0], arr)


def test_transparency_index_parsed():
    """A Graphic Control Extension's transparency index is surfaced on
    the info object (not composited — documented scope)."""
    base = gif_encode(np.array([[3, 5]], np.uint8))
    gce = bytes([0x21, 0xF9, 0x04, 0x01, 0x00, 0x00, 0x05, 0x00])
    with_gce = base[: 6 + 7 + 768] + gce + base[6 + 7 + 768 :]
    out, info = gif_decode(with_gce)
    assert info.transparent_index == 5
    assert out[0, 0, 0] == 3 and out[0, 1, 0] == 5


def test_decode_error_paths():
    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode(b"PNG....")
    with pytest.raises(ValueError, match="no image data"):
        # header + LSD (no GCT) + trailer
        gif_decode(b"GIF89a" + bytes([1, 0, 1, 0, 0, 0, 0]) + b"\x3b")
    with pytest.raises(ValueError):
        gif_encode(np.zeros((2, 2), np.float64))  # wrong dtype
    with pytest.raises(ValueError, match="beyond palette"):
        gif_encode(np.array([[9]], np.uint8),
                   palette=np.zeros((4, 3), np.uint8))


def test_media_codec_gif_wiring():
    """fmt='gif' through MediaCodec: float64 RGB with metadata check."""
    from hydro_raster_ray.stages.multimodal import MediaCodec

    arr = (np.arange(12, dtype=np.uint8) * 9).reshape(3, 4)
    buf = gif_encode(arr)
    out = MediaCodec().decode(buf, 3, 4, "gif")
    assert out.dtype == np.float64 and out.shape == (3, 4, 3)
    with pytest.raises(ValueError, match="row metadata"):
        MediaCodec().decode(buf, 4, 3, "gif")


def test_repr_smoke():
    assert "GifInfo" in repr(GifInfo(2, 3, "89a", None))
