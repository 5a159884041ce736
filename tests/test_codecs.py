"""Codec round-trip, NODATA↔NaN, PSNR gate, phash stability."""

import numpy as np

from hydro_raster_ray import codecs, fixtures


def _sample(h=33, w=47):
    y, x = np.mgrid[0:h, 0:w]
    a = np.sin(x / 5.0) * 20.0 + np.cos(y / 3.0) * 7.0
    a[(x + y) % 11 == 0] = np.nan
    return a


def test_raw_f32_roundtrip_exact():
    a = _sample().astype(np.float32).astype(np.float64)
    buf = codecs.encode(a, "raw-f32")
    assert len(buf) == codecs.payload_nbytes("raw-f32", *a.shape)
    b = codecs.decode(buf, *a.shape, "raw-f32")
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
    np.testing.assert_array_equal(a[~np.isnan(a)], b[~np.isnan(b)])


def test_raw_u16_quantization_quality():
    a = _sample()
    b = codecs.roundtrip(a, "raw-u16")
    assert len(codecs.encode(a, "raw-u16")) == codecs.payload_nbytes("raw-u16", *a.shape)
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
    # 16-bit quantization over the sample's ~54-unit range: sub-millimeter
    np.testing.assert_allclose(a[~np.isnan(a)], b[~np.isnan(b)], atol=1e-2)
    # decoded values are float32-precision by contract → raw-f32 re-encode
    # of decoded data is bit-exact (value-preserving ops depend on this)
    c = codecs.roundtrip(b, "raw-f32")
    np.testing.assert_array_equal(b[~np.isnan(b)], c[~np.isnan(c)])


def test_qlossy_psnr_gate():
    a = _sample(64, 64)
    buf = codecs.encode(a, "qlossy")
    b = codecs.decode(buf, 64, 64, "qlossy")
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
    assert codecs.psnr(a, b) >= 40.0


def test_all_nan_tile():
    a = np.full((8, 8), np.nan)
    for fmt in codecs.FORMATS:
        b = codecs.decode(codecs.encode(a, fmt), 8, 8, fmt)
        assert np.isnan(b).all()


def test_constant_tile():
    a = np.full((8, 8), 3.25)
    for fmt in codecs.FORMATS:
        b = codecs.decode(codecs.encode(a, fmt), 8, 8, fmt)
        np.testing.assert_allclose(b, 3.25, atol=1e-6)


def test_phash_deterministic_and_distinct():
    a = _sample()
    b = _sample() + 1.0
    assert codecs.phash64(a) == codecs.phash64(a.copy())
    assert codecs.phash64(a) != codecs.phash64(b)


def test_fixture_truth_deterministic():
    s = fixtures.make_scheme(2, 2)
    t = fixtures.tiles_table(s)
    t2 = fixtures.tiles_table(s)
    assert t.equals(t2)  # byte-identical regeneration (retry determinism)
    for i in range(t.num_rows):
        row = {k: t[k][i].as_py() for k in t.column_names}
        z = codecs.decode(row["bytes"], row["h"], row["w"], row["fmt"])
        assert codecs.phash64(z) == row["phash"]
        # lossy re-encode of decoded truth stays within the PSNR gate
        assert codecs.psnr(z, codecs.roundtrip(z, row["fmt"])) >= 40.0


def test_fixture_qlossy_close_to_analytic():
    s = fixtures.make_scheme(4, 4)
    # tile_row=2 rows are qlossy
    raw = fixtures._raw_tile(s, 2, 1)
    truth = fixtures.tile_truth(s, 2, 1)
    assert codecs.psnr(raw, truth) >= 40.0


def test_md5_prefix32_matches_hashlib():
    """Vectorized single-block MD5 must equal hashlib bit-for-bit, incl.
    the empty string, the 55-byte single-block boundary, multi-block
    fallback rows, and multi-byte UTF-8."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from hydro_raster_ray.hashvec import md5_prefix32

    ids = (
        [f"tile_{i:05d}_{i % 97:05d}" for i in range(1000)]
        + ["", "a", "x" * 55, "y" * 56, "z" * 200, "héllo wörld", "日本語テスト"]
    )
    got = md5_prefix32(pa.array(ids, pa.string()))
    want = np.array(
        [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in ids],
        dtype=np.uint64,
    )
    assert (got == want).all()
    # large_string has int64 offsets — must not be misread as int32
    large = md5_prefix32(pa.array(ids, pa.large_string()))
    assert (large == want).all()
    # sliced array exercises the non-zero arr.offset path
    sliced = md5_prefix32(pa.array(ids, pa.large_string()).slice(3, 50))
    assert (sliced == want[3:53]).all()


def test_md5_hex_multiblock_matches_hashlib():
    """The multi-block vectorized MD5 must equal hashlib's hexdigest for
    lengths spanning every padding/block boundary, UTF-8 multibyte rows,
    large_string arrays, and slices."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from hydro_raster_ray.hashvec import md5_hex

    strs = (
        ["", "a", "x" * 55, "y" * 56, "z" * 63, "w" * 64, "q" * 119,
         "r" * 120, "s" * 128, "héllo wörld" * 30, "日本語テスト" * 100]
        + [f"doc {i} " + "lorem ipsum dolor " * (i % 37) for i in range(500)]
    )
    want = np.array([hashlib.md5(s.encode()).hexdigest() for s in strs])
    assert (md5_hex(pa.array(strs, pa.string())) == want).all()
    assert (md5_hex(pa.array(strs, pa.large_string())) == want).all()
    got = md5_hex(pa.array(strs, pa.large_string()).slice(7, 100))
    assert (got == want[7:107]).all()
    assert md5_hex(pa.array([], pa.string())).size == 0


def test_mix64_rows_matches_witness_scalar():
    """hashvec.mix64_rows (numpy uint64) must equal the witness's
    Python-int splitmix64 chain for random fixed-width rows."""
    import numpy as np

    from hydro_raster_ray.hashvec import mix64_rows
    from hydro_raster_ray.text.witness import _sm64

    rng = np.random.default_rng(7)
    mat = rng.integers(0, 1 << 63, size=(64, 4), dtype=np.uint64)
    mat[0] = 0  # all-zero row
    mat[1] = (1 << 63) + 12345  # high-bit values
    got = mix64_rows(mat)
    for i, row in enumerate(mat):
        h = 0
        for v in row:
            h = _sm64(h ^ int(v))
        assert int(got[i]) == h, i


def test_decode_f32_parity_all_codecs():
    """f32 planes are lossless by contract: decode(dtype=float32) equals the
    float64 decode bit-exactly for every f32-contract codec (the invariant
    the pixel hot paths rely on), and the raw-f32 fast path is zero-copy
    (read-only)."""
    import numpy as np

    from hydro_raster_ray.codecs import F32_CONTRACT_FORMATS, decode, encode

    rng = np.random.default_rng(7)
    a = rng.normal(42.0, 9.0, (33, 21))
    a[rng.random(a.shape) < 0.1] = np.nan
    for fmt in F32_CONTRACT_FORMATS:
        buf = encode(a, fmt)
        d64 = decode(buf, 33, 21, fmt)
        d32 = decode(buf, 33, 21, fmt, dtype=np.float32)
        assert d64.dtype == np.float64 and d32.dtype == np.float32
        np.testing.assert_array_equal(d32.astype(np.float64), d64)
        # re-encode parity: the f32 plane produces the same raw-f32 bytes
        assert encode(d32, "raw-f32") == encode(d64, "raw-f32")
    assert not decode(encode(a, "raw-f32"), 33, 21, "raw-f32",
                      dtype=np.float32).flags.writeable


def test_raw_f64_exact_integer_carveout():
    """raw-f64 is the exact-integer plane format: ids beyond f32's 2^24
    round-trip bit-exactly (they would merge under any f32-contract codec),
    NaN holes survive, and the f32 decode path refuses the fmt loudly."""
    import numpy as np
    import pytest

    from hydro_raster_ray import codecs

    ids = np.array(
        [[2**25 + 1, 2**25 + 2, 2**53 - 1], [0.0, np.nan, 85_000_001.0]]
    )
    buf = codecs.encode(ids, "raw-f64")
    assert len(buf) == codecs.payload_nbytes("raw-f64", 2, 3)
    back = codecs.decode(buf, 2, 3, "raw-f64")
    np.testing.assert_array_equal(back, ids)
    # adjacent big ids are DISTINCT here but merge under the f32 contract
    assert back[0, 0] != back[0, 1]
    assert np.float32(ids[0, 0]) == np.float32(ids[0, 1])
    with pytest.raises(ValueError, match="raw-f64"):
        codecs.decode(buf, 2, 3, "raw-f64", dtype=np.float32)
