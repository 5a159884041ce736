"""Hypothesis property tests for the engine's pure kernels.

Laws, not examples: codec round-trips and PSNR contracts over arbitrary
float grids (NaN holes included), map2sub∘sub2map identity over arbitrary
georeferences, scalar↔vector hash parity (splitmix64, MD5), and S2
scalar↔vector agreement with parent containment — the arithmetic every
distributed stage leans on. Derandomized so the gate is reproducible.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hydro_raster_ray import codecs, s2
from hydro_raster_ray.grid import GridSpec, map2sub, sub2map

SET = settings(max_examples=60, derandomize=True, deadline=None)

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False,
    width=32,
)


@st.composite
def grids(draw, max_side=12):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    vals = draw(
        st.lists(st.one_of(finite, st.just(np.nan)), min_size=h * w,
                 max_size=h * w)
    )
    return np.array(vals, dtype=np.float64).reshape(h, w)


@SET
@given(grids())
def test_raw_f32_roundtrip_is_f32_exact(a):
    out = codecs.decode(codecs.encode(a, "raw-f32"), *a.shape, "raw-f32")
    np.testing.assert_array_equal(out, a.astype(np.float32).astype(np.float64))


@SET
@given(grids())
def test_lossy_codecs_meet_psnr_and_idempotence(a):
    """qlossy/raw-u16/png16: NaN mask survives exactly, finite error obeys
    the PSNR≥40dB gate (skipped for near-constant grids where PSNR is
    ill-posed), and re-encoding a decoded grid is IDEMPOTENT (the decoded
    values are on the codec's own grid)."""
    for fmt in ("raw-u16", "qlossy", "png16"):
        out = codecs.decode(codecs.encode(a, fmt), *a.shape, fmt)
        np.testing.assert_array_equal(np.isnan(out), np.isnan(a))
        fin = np.isfinite(a)
        if fin.any():
            rng = np.ptp(a[fin])
            if rng > 1e-6:
                assert codecs.psnr(a, out) >= 40.0, fmt
        out2 = codecs.decode(codecs.encode(out, fmt), *a.shape, fmt)
        np.testing.assert_array_equal(out, out2, err_msg=fmt)


@SET
@given(
    st.integers(1, 500), st.integers(1, 500),
    st.floats(0.1, 100.0, allow_nan=False),
    st.floats(-1e6, 1e6, allow_nan=False),
    st.floats(-1e6, 1e6, allow_nan=False),
    st.data(),
)
def test_sub2map_map2sub_inverse(nrows, ncols, cs, xll, yll, data):
    g = GridSpec(nrows=nrows, ncols=ncols, xllcorner=xll, yllcorner=yll,
                 cellsize=cs, nodata=-9999.0)
    r = np.array([data.draw(st.integers(0, nrows - 1))])
    c = np.array([data.draw(st.integers(0, ncols - 1))])
    X, Y = sub2map(r, c, g)
    r2, c2 = map2sub(X, Y, g)
    assert r2[0] == r[0] and c2[0] == c[0]


@SET
@given(st.lists(st.integers(0, (1 << 64) - 1), min_size=1, max_size=50))
def test_splitmix64_vector_matches_scalar_witness(xs):
    from hydro_raster_ray.hashvec import splitmix64
    from hydro_raster_ray.text.witness import _sm64

    arr = np.array(xs, dtype=np.uint64)
    got = splitmix64(arr)
    want = np.array([_sm64(x) for x in xs], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


@SET
@given(st.lists(st.text(st.characters(min_codepoint=32, max_codepoint=126),
                        min_size=0, max_size=30),
                min_size=1, max_size=20))
def test_md5_hex_matches_hashlib(strs):
    import hashlib

    import pyarrow as pa

    from hydro_raster_ray.hashvec import md5_hex

    got = md5_hex(pa.array(strs, pa.string()))
    want = [hashlib.md5(s.encode()).hexdigest() for s in strs]
    assert list(got) == want


@SET
@given(st.floats(-179.9, 179.9, allow_nan=False),
       st.floats(-89.9, 89.9, allow_nan=False))
def test_s2_scalar_vector_parity_and_parent_containment(lng, lat):
    vec = int(s2.lnglat_to_leaf(np.array([lng]), np.array([lat]))[0])
    assert vec == s2.leaf_scalar(lng, lat)
    # parent is a prefix: re-deriving the leaf's level-14 parent from the
    # parent's OWN center must give the same level-14 cell
    p14 = int(s2.parent(np.array([vec], dtype=np.uint64), 14)[0])
    assert int(s2.level_of(np.array([p14], dtype=np.uint64))[0]) == 14
    # token round-trip
    tok = s2.token(np.array([p14], dtype=np.uint64))[0]
    assert s2.token_to_id(tok) == p14
    # the leaf's position is inside its parent: parent(leaf) stable under
    # re-leafing the parent center
    clng, clat = s2.leaf_to_lnglat(np.array([p14], dtype=np.uint64))
    releaf = int(s2.lnglat_to_leaf(clng, clat)[0])
    assert int(s2.parent(np.array([releaf], dtype=np.uint64), 14)[0]) == p14


@st.composite
def u8_images(draw, max_side=20):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    color = draw(st.booleans())
    n = h * w * (3 if color else 1)
    vals = draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    a = np.array(vals, dtype=np.uint8)
    return a.reshape(h, w, 3) if color else a.reshape(h, w)


def _ideal_420_reconstruction(img):
    """Best-possible 4:2:0 round-trip: exact YCbCr, 2x2-mean chroma
    downsample with edge-replication padding (the codec's scheme),
    nearest upsample, exact inverse — NO DCT/quantization anywhere.
    Any 4:2:0 codec's RGB error is bounded below by this."""
    x = img.astype(np.float64)
    y = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    cb = -0.168736 * x[..., 0] - 0.331264 * x[..., 1] + 0.5 * x[..., 2]
    cr = 0.5 * x[..., 0] - 0.418688 * x[..., 1] - 0.081312 * x[..., 2]
    h, w = y.shape

    def down_up(c):
        he, we = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        p = np.empty((he, we))
        p[:h, :w] = c
        p[h:, :w] = c[h - 1 : h, :]
        p[:, w:] = p[:, w - 1 : w]
        d = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4
        return np.repeat(np.repeat(d, 2, 0), 2, 1)[:h, :w]

    cb, cr = down_up(cb), down_up(cr)
    rec = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], -1
    )
    return np.clip(rec.round(), 0, 255)


@SET
@given(u8_images(), st.sampled_from(["444", "420"]))
def test_jpeg_roundtrip_shape_determinism_and_noise_floor(img, ss):
    """Laws of the baseline JPEG codec over ARBITRARY uint8 content:
    decode∘encode preserves shape and dtype; encoding is deterministic;
    and at quality 95 the error is bounded by laws that hold even for
    adversarial noise. For 4:4:4 that is a flat 28 dB RGB PSNR floor.
    For 4:2:0 a flat RGB floor is the WRONG law — per-pixel saturated
    chroma noise is unrecoverable after 2x2 chroma averaging no matter
    the quality (hypothesis found a case where the information-theoretic
    subsampling bound itself is 20 dB) — so the 4:2:0 laws are (a) the
    luma channel, which is never subsampled, keeps the 28 dB floor, and
    (b) RGB MSE stays within a constant factor of the exact-arithmetic
    subsampling bound: quantization adds little on top of what 4:2:0
    already destroyed."""
    from hydro_raster_ray.jpeg import jpeg_decode, jpeg_encode

    buf = jpeg_encode(img, quality=95, subsampling=ss)
    assert buf == jpeg_encode(img, quality=95, subsampling=ss)
    out, info = jpeg_decode(buf)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert (info.height, info.width) == img.shape[:2]

    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)

    if ss == "444" or img.ndim == 2:
        assert psnr(out, img) >= 28.0
    else:
        def luma(x):
            return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]

        assert psnr(luma(out), luma(img)) >= 28.0
        bound = np.mean((_ideal_420_reconstruction(img) - img.astype(float)) ** 2)
        mse = np.mean((out.astype(float) - img.astype(float)) ** 2)
        assert mse <= bound * 1.6 + 3.0, (mse, bound)
