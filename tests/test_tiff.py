"""REAL TIFF codec: pencil-derived byte streams, spec-example anchors,
roundtrip matrix. No imaging library anywhere."""

import struct

import numpy as np
import pytest

from hydro_raster_ray.tiff import (
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    tiff_decode,
    tiff_encode,
)


def _hand_tiff_le(pixels: bytes, w: int, h: int) -> bytes:
    """Hand-assemble a minimal gray-8 uncompressed little-endian TIFF with
    the pixel DATA FIRST and the IFD at the END — the opposite layout from
    ``tiff_encode`` (IFD first), so a decode proves real offset-following,
    not shared layout assumptions."""
    e = "<"
    data_off = 8
    ifd_off = data_off + len(pixels)
    out = b"II" + struct.pack(e + "HI", 42, ifd_off) + pixels
    tags = [
        (256, 4, 1, w),          # ImageWidth
        (257, 4, 1, h),          # ImageLength
        (258, 3, 1, 8),          # BitsPerSample
        (259, 3, 1, 1),          # Compression: none
        (262, 3, 1, 1),          # Photometric: BlackIsZero
        (273, 4, 1, data_off),   # StripOffsets
        (277, 3, 1, 1),          # SamplesPerPixel
        (278, 4, 1, h),          # RowsPerStrip
        (279, 4, 1, len(pixels)),  # StripByteCounts
    ]
    body = struct.pack(e + "H", len(tags))
    for tag, ftype, count, val in tags:
        ch = {3: "H", 4: "I"}[ftype]
        packed = struct.pack(e + ch, val).ljust(4, b"\0")
        body += struct.pack(e + "HHI", tag, ftype, count) + packed
    return out + body + struct.pack(e + "I", 0)


def test_hand_built_minimal_tiff_le():
    """2x3 gray-8: decode must follow the header→IFD→strip offsets of a
    layout the encoder never produces."""
    px = bytes([10, 20, 30, 40, 50, 60])
    arr, info = tiff_decode(_hand_tiff_le(px, 3, 2))
    np.testing.assert_array_equal(
        arr, np.array([[10, 20, 30], [40, 50, 60]], np.uint8))
    assert info.byteorder == "II" and info.compression == 1


def test_hand_built_minimal_tiff_be():
    """Same IFD hand-built big-endian (MM): every multi-byte field swaps."""
    e = ">"
    px = bytes([1, 2, 3, 4])
    data_off = 8
    ifd_off = data_off + len(px)
    out = b"MM" + struct.pack(e + "HI", 42, ifd_off) + px
    tags = [(256, 4, 1, 2), (257, 4, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
            (262, 3, 1, 1), (273, 4, 1, data_off), (277, 3, 1, 1),
            (278, 4, 1, 2), (279, 4, 1, 4)]
    body = struct.pack(e + "H", len(tags))
    for tag, ftype, count, val in tags:
        ch = {3: "H", 4: "I"}[ftype]
        packed = struct.pack(e + ch, val)
        # MM: value is LEFT-justified in the 4-byte field (spec §2)
        body += struct.pack(e + "HHI", tag, ftype, count) + packed.ljust(4, b"\0")
    arr, info = tiff_decode(out + body + struct.pack(e + "I", 0))
    np.testing.assert_array_equal(arr, np.array([[1, 2], [3, 4]], np.uint8))
    assert info.byteorder == "MM"


def test_packbits_spec_example():
    """EXTERNAL anchor: the worked example from TIFF 6.0 §9 — both
    directions must reproduce the spec's exact bytes."""
    unpacked = bytes.fromhex(
        "AAAAAA80002AAAAAAAAA80002A22AAAAAAAAAAAAAAAAAAAA")
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    assert _packbits_decode(packed, len(unpacked)) == unpacked
    assert _packbits_encode(unpacked) == packed


def test_packbits_noop_128_and_long_runs():
    """0x80 headers are no-ops on decode; runs >128 split correctly."""
    assert _packbits_decode(b"\x80\x00A", 1) == b"A"
    data = b"z" * 300
    assert _packbits_decode(_packbits_encode(data), 300) == data


def test_lzw_hand_built_bitstream():
    """Pencil case [7,7,7,8] → codes [Clear=256, 7, 258, 8, EOI=257],
    9-bit MSB-first. Expected bytes derived by binary-STRING concatenation
    (an independent construction from the codec's shift arithmetic)."""
    bits = "".join(format(c, "09b") for c in (256, 7, 258, 8, 257))
    bits += "0" * (-len(bits) % 8)
    expect = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    assert _lzw_encode(b"\x07\x07\x07\x08") == expect
    assert _lzw_decode(expect, 4) == b"\x07\x07\x07\x08"


def test_lzw_kwkwk_case():
    """'ababa...' forces the code-not-yet-in-table (KwKwK) branch."""
    data = b"abababababab"
    assert _lzw_decode(_lzw_encode(data), len(data)) == data


def test_lzw_width_bump_parity():
    """Cross the 9→10 bit EarlyChange boundary: 256 distinct byte pairs
    add >253 table entries; writer and reader must bump in lockstep."""
    data = bytes(range(256)) * 4
    assert _lzw_decode(_lzw_encode(data), len(data)) == data


def test_lzw_dict_overflow_clear():
    """60 kB of incompressible bytes crosses the 4094-entry Clear reset."""
    data = np.random.default_rng(1).integers(
        0, 256, 60000, dtype=np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(data), len(data)) == data


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("bo", ["II", "MM"])
def test_roundtrip_gray8_multistrip(comp, bo):
    """Ragged last strip: 25 rows at rows_per_strip=7 → 4 strips (7/7/7/4)."""
    a = (np.arange(25 * 31).reshape(25, 31) % 256).astype(np.uint8)
    dec, info = tiff_decode(
        tiff_encode(a, compression=comp, byteorder=bo, rows_per_strip=7))
    np.testing.assert_array_equal(dec, a)
    assert dec.dtype == np.uint8


@pytest.mark.parametrize("comp", ["packbits", "lzw"])
def test_roundtrip_gray16_predictor_both_orders(comp):
    """16-bit + horizontal predictor: differencing happens on the SAMPLE
    grid before byte packing, in both byte orders."""
    a = (np.arange(25 * 31).reshape(25, 31) * 97 % 65536).astype(np.uint16)
    for bo in ("II", "MM"):
        dec, info = tiff_decode(tiff_encode(
            a, compression=comp, predictor=True, byteorder=bo,
            rows_per_strip=6))
        np.testing.assert_array_equal(dec, a)
        assert dec.dtype == np.uint16 and info.predictor == 2


def test_roundtrip_rgb8():
    a = np.random.default_rng(7).integers(0, 256, (37, 29, 3), dtype=np.uint8)
    for comp in ("none", "packbits", "lzw"):
        dec, _ = tiff_decode(tiff_encode(a, compression=comp))
        np.testing.assert_array_equal(dec, a)
        assert dec.shape == (37, 29, 3)


def test_predictor_hand_case():
    """Pencil: row [10, 13, 11] differenced is [10, 3, 254] (mod 256);
    hand-encode those bytes through LZW and decode with predictor=2."""
    a = np.array([[10, 13, 11]], np.uint8)
    buf = tiff_encode(a, compression="lzw", predictor=True)
    # the strip payload must be the LZW coding of the DIFFERENCED bytes
    strip = _lzw_encode(bytes([10, 3, 254]))
    assert strip in buf
    dec, _ = tiff_decode(buf)
    np.testing.assert_array_equal(dec, a)


def test_lzw_compresses_smooth_ramp():
    """The point of the codec: a smooth gradient shrinks (real entropy
    coding, not a stored-block fake)."""
    a = (np.arange(64 * 64).reshape(64, 64) % 256).astype(np.uint8)
    assert len(tiff_encode(a, "lzw", predictor=True)) < len(
        tiff_encode(a, "none")) / 3


def test_unsupported_variants_raise():
    a = np.zeros((4, 4), np.uint8)
    buf = bytearray(tiff_encode(a))
    # not a TIFF at all
    with pytest.raises(ValueError):
        tiff_decode(b"PK\x03\x04")
    # BigTIFF magic
    big = b"II" + struct.pack("<HI", 43, 8)
    with pytest.raises(NotImplementedError):
        tiff_decode(big + b"\0" * 16)
    # float32 gray / 16-bit RGB encodes are refused
    with pytest.raises(ValueError):
        tiff_encode(np.zeros((4, 4), np.float32))
    with pytest.raises(NotImplementedError):
        tiff_encode(np.zeros((4, 4, 3), np.uint16))
    with pytest.raises(ValueError):
        tiff_encode(np.zeros((4, 4), np.uint8), compression="none",
                    predictor=True)


def _patch_tag(buf: bytes, tag: int, new_val: int) -> bytes:
    """Rewrite a SHORT/LONG tag value inside an encoder-produced (II,
    IFD-at-8) TIFF, or append the tag if absent."""
    e = "<"
    n = struct.unpack_from(e + "H", buf, 8)[0]
    b = bytearray(buf)
    for i in range(n):
        base = 10 + 12 * i
        t, ftype, count = struct.unpack_from(e + "HHI", b, base)
        if t == tag:
            struct.pack_into(e + "I", b, base + 8, new_val)
            return bytes(b)
    raise AssertionError(f"tag {tag} not present to patch")


def test_decode_gate_tags():
    a = np.zeros((4, 4), np.uint8)
    buf = tiff_encode(a)
    with pytest.raises(NotImplementedError):  # planar config 2
        tiff_decode(_patch_tag(buf, 284, 2))
    with pytest.raises(NotImplementedError):  # float sample format
        tiff_decode(_patch_tag(buf, 339, 3))
    with pytest.raises(NotImplementedError):  # unknown compression (JPEG=7)
        tiff_decode(_patch_tag(buf, 259, 7))
