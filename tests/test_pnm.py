"""PNM codec: hand-written header bytes (comments, whitespace forms,
the 16-bit big-endian trap) + roundtrips."""

import numpy as np
import pytest

from hydro_raster_ray.pnm import pnm_decode, pnm_encode


def test_hand_written_p2_with_comments():
    buf = b"P2 # a comment\n# full-line comment\n3 2\n255\n0 10 20\n30 40 50\n"
    np.testing.assert_array_equal(
        pnm_decode(buf), np.array([[0, 10, 20], [30, 40, 50]], np.uint8))


def test_hand_written_p5_16bit_big_endian():
    """maxval > 255 → 2-byte BIG-endian samples: bytes 01 00 = 256."""
    buf = b"P5\n2 1\n65535\n" + bytes([0x01, 0x00, 0x00, 0x02])
    got = pnm_decode(buf)
    np.testing.assert_array_equal(got, np.array([[256, 2]], np.uint16))
    assert got.dtype == np.uint16


def test_hand_written_p6_rgb():
    buf = b"P6\n1 2\n255\n" + bytes([255, 0, 0, 0, 0, 255])
    got = pnm_decode(buf)
    np.testing.assert_array_equal(
        got, np.array([[[255, 0, 0]], [[0, 0, 255]]], np.uint8))


def test_single_whitespace_after_maxval_is_payload_boundary():
    """The byte right after maxval's single whitespace IS pixel data —
    a 0x0A pixel value must not be eaten as header whitespace."""
    buf = b"P5\n1 2\n255\n" + bytes([0x0A, 7])
    np.testing.assert_array_equal(
        pnm_decode(buf), np.array([[10], [7]], np.uint8))


@pytest.mark.parametrize("ascii_form", [False, True])
def test_roundtrip_gray8(ascii_form):
    a = (np.arange(7 * 11).reshape(7, 11) * 5 % 256).astype(np.uint8)
    np.testing.assert_array_equal(
        pnm_decode(pnm_encode(a, ascii_form=ascii_form)), a)


def test_roundtrip_gray16_and_rgb():
    g16 = (np.arange(5 * 6).reshape(5, 6) * 4099 % 65536).astype(np.uint16)
    np.testing.assert_array_equal(pnm_decode(pnm_encode(g16)), g16)
    rgb = np.random.default_rng(5).integers(0, 256, (4, 3, 3), dtype=np.uint8)
    np.testing.assert_array_equal(pnm_decode(pnm_encode(rgb)), rgb)
    np.testing.assert_array_equal(
        pnm_decode(pnm_encode(rgb, ascii_form=True)), rgb)


def test_unsupported_and_invalid():
    with pytest.raises(NotImplementedError):
        pnm_decode(b"P4\n1 1\n\x00")
    with pytest.raises(ValueError):
        pnm_decode(b"GIF89a")
    with pytest.raises(ValueError):  # sample exceeds maxval
        pnm_decode(b"P2\n1 1\n10\n11\n")
    with pytest.raises(ValueError):
        pnm_decode(b"P5\n1 1\n0\n\x00")
