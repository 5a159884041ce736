"""REAL AVI container: hand-built RIFF streams pin the DIB traps
(bottom-up rows, 4-byte stride, palette application, word alignment);
roundtrips cover gray/RGB and the seek path. No av library anywhere."""

import struct

import numpy as np
import pytest

from hydro_raster_ray.avi import (
    avi_decode,
    avi_decode_frame,
    avi_encode,
    avi_frame_offsets,
)


def _chunk(fcc: bytes, payload: bytes) -> bytes:
    pad = b"\0" if len(payload) & 1 else b""
    return fcc + struct.pack("<I", len(payload)) + payload + pad


def _hand_avi_gray(frame_rows_bottom_up: bytes, w: int, h: int,
                   palette_red=None) -> bytes:
    """Assemble a 1-frame 8-bit AVI byte-by-byte, independent of
    avi_encode's layout (no idx1, different header field fills)."""
    bih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(
        frame_rows_bottom_up), 0, 0, 256, 0)
    ramp = np.arange(256, dtype=np.uint8) if palette_red is None \
        else np.asarray(palette_red, np.uint8)
    pal = np.stack([np.zeros(256, np.uint8), np.zeros(256, np.uint8),
                    ramp, np.zeros(256, np.uint8)], axis=1)  # B G R X
    strf = bih + pal.tobytes()
    strh = b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIII4H", 0, 0, 0, 0, 1, 25, 0, 1, 0, 0, 0, 0, 0, w, h)
    strl = _chunk(b"LIST", b"strl" + _chunk(b"strh", strh)
                  + _chunk(b"strf", strf))
    avih = struct.pack("<14I", 40000, 0, 0, 0, 1, 0, 1, 0, w, h,
                       0, 0, 0, 0)
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih) + strl)
    movi = _chunk(b"LIST", b"movi" + _chunk(b"00db", frame_rows_bottom_up))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_hand_built_bottom_up_and_stride():
    """Pencil: 2x2 frame with w=2 → stride 4 (2 pad bytes per row); rows
    stored BOTTOM-UP, so payload row0 is the image's LAST row."""
    # image rows: top [1, 2], bottom [3, 4] → stored bottom-first
    payload = bytes([3, 4, 0, 0]) + bytes([1, 2, 0, 0])
    arr, info = avi_decode(_hand_avi_gray(payload, 2, 2))
    np.testing.assert_array_equal(
        arr[0], np.array([[1, 2], [3, 4]], np.uint8))
    assert (info.width, info.height, info.n_frames, info.bits) == (2, 2, 1, 8)
    assert info.fps == 25.0


def test_hand_built_palette_applied():
    """A non-identity palette remaps indices through the RED quad channel
    (quads are stored B,G,R,X)."""
    pal = (np.arange(256, dtype=np.uint16) * 2 % 256).astype(np.uint8)
    payload = bytes([10, 20, 0, 0])
    arr, _ = avi_decode(_hand_avi_gray(payload, 2, 1, palette_red=pal))
    np.testing.assert_array_equal(arr[0], np.array([[20, 40]], np.uint8))


def test_roundtrip_gray_odd_width():
    """w=11 → stride 12: padding must be written and stripped."""
    g = (np.arange(5 * 7 * 11).reshape(5, 7, 11) % 256).astype(np.uint8)
    dec, info = avi_decode(avi_encode(g))
    np.testing.assert_array_equal(dec, g)
    assert info.n_frames == 5 and info.bits == 8


def test_roundtrip_rgb_bgr_order():
    """24-bit: pure-red pixels must survive (a BGR/RGB swap would turn
    them blue)."""
    f = np.zeros((2, 3, 3, 3), np.uint8)
    f[:, :, :, 0] = 200  # red channel
    dec, info = avi_decode(avi_encode(f))
    np.testing.assert_array_equal(dec, f)
    assert info.bits == 24


def test_seek_decode_matches_full():
    g = (np.arange(6 * 4 * 5).reshape(6, 4, 5) * 7 % 256).astype(np.uint8)
    buf = avi_encode(g, fps=10)
    full, info = avi_decode(buf)
    assert info.fps == 10.0
    for k in (0, 3, 5):
        np.testing.assert_array_equal(avi_decode_frame(buf, k), full[k])
    assert len(avi_frame_offsets(buf)) == 6
    with pytest.raises(ValueError):
        avi_decode_frame(buf, 6)


def test_unsupported_variants_raise():
    with pytest.raises(ValueError):
        avi_decode(b"RIFF\x04\x00\x00\x00WAVE")
    # compressed frame chunk (00dc) in movi
    g = np.zeros((1, 2, 2), np.uint8)
    buf = bytearray(avi_encode(g))
    i = buf.find(b"00db", buf.find(b"movi"))
    buf[i:i + 4] = b"00dc"
    with pytest.raises(NotImplementedError):
        avi_decode(bytes(buf))
    # non-BI_RGB biCompression
    buf2 = bytearray(avi_encode(g))
    j = buf2.find(b"strf")
    # biCompression sits 16 bytes into BITMAPINFOHEADER (after the
    # 8-byte chunk header)
    struct.pack_into("<I", buf2, j + 8 + 16, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError):
        avi_decode(bytes(buf2))


def test_word_alignment_odd_chunk():
    """A frame whose DIB payload is odd-sized never occurs (stride is a
    multiple of 4) — but the parser must still walk odd-size unknown
    chunks: splice a 3-byte JUNK chunk before movi."""
    g = (np.arange(2 * 2 * 4).reshape(2, 2, 4) % 256).astype(np.uint8)
    buf = bytearray(avi_encode(g))
    i = buf.find(b"LIST", buf.find(b"movi") - 8)
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc\0"
    out = bytes(buf[:i]) + junk + bytes(buf[i:])
    out = out[:4] + struct.pack("<I", len(out) - 8) + out[8:]
    dec, _ = avi_decode(out)
    np.testing.assert_array_equal(dec, g)
