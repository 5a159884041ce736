"""Multimodal columns: opaque binary payloads + typed metadata.

Generalizes the tile pipeline to arbitrary media: image / audio / video
payloads travel as ``binary`` columns with typed metadata (w, h, fmt /
sample_rate / n_frames), and decode / feature-extract / resize /
frame-sample run as actor-pool ``map_batches`` stages.

The media codec libraries (Pillow, opencv, ffmpeg) are NOT in this
container, so the codec boundary is isolated in ``MediaCodec``. PNG,
baseline JPEG, GIF, TIFF, WAV, G.711 mu-law and AVI decode FOR REAL via
the engine's own pure-stdlib codecs (``png.py``, ``jpeg.py``, ``gif.py``,
``tiff.py``, ``avi.py``), as do the ``raw-*``/``qlossy``/``pcm16le``/
``rawv-u8`` formats and the deterministic ``fake-*`` formats; formats
that genuinely require a native library (mp3, mp4/webm) raise
``NotImplementedError`` — the Ray-side plumbing (schema, batch size,
actor signature, output layout) is fully real and tested either way.

Scale notes: media rows are fat — stages default to small ``batch_size`` and
pyarrow batches (zero-copy payload views); feature extraction emits thin
rows (drop the payload as early as possible).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .. import codecs
from ..sources.tiles import TileSet
from .decode import _payload_views

__all__ = [
    "MediaCodec",
    "image_features",
    "resize_images",
    "sample_frames",
    "frame_motion",
    "make_fake_videos",
    "image_features_table",
    "make_fake_jpegs",
    "make_fake_gifs",
    "make_fake_tiffs",
    "tiff_fake_plane",
    "make_fake_avis",
    "avi_fake_frames",
    "make_fake_pnms",
    "augment_tiles",
    "audio_features",
    "audio_spectral_features",
    "make_fake_audio",
    "make_fake_wavs",
    "make_fake_mulaw",
    "mulaw_encode",
    "mulaw_decode",
]


class MediaCodec:
    """Codec boundary. ``decode(buf, meta) -> (h, w[, c]) float array``.

    - ``raw-f32`` / ``raw-u16`` / ``qlossy``: the engine's own codecs (real).
    - ``fake-rgb8``: deterministic stand-in "image" format — blake2b-seeded
      gradient, reproducible per payload (used to exercise pipelines without
      Pillow); decoding is real numpy work with the declared (h, w, 3) shape.
    - ``png``: REAL decode via the pure-stdlib codec (``png.py``) — gray /
      gray+alpha / RGB / RGBA / palette, 8- and 16-bit, all five filters.
    - ``jpeg``: REAL decode via the pure-stdlib baseline codec
      (``jpeg.py``) — Huffman + dequant + IDCT, gray/YCbCr, 4:4:4 /
      4:2:2 / 4:2:0, restart markers; progressive raises.
    - ``gif``: REAL decode via the pure-stdlib codec (``gif.py``) —
      variable-width LZW, global/local palettes, interlace; first frame.
    - ``tiff``: REAL decode via the pure-stdlib codec (``tiff.py``) —
      strips, LZW (EarlyChange) / PackBits / none, predictor, II and MM
      byte orders, 8/16-bit gray and RGB.
    - video ``avi`` (see ``decode_frame``/``decode_video``): REAL RIFF
      demux via ``avi.py`` — bottom-up DIB rows, stride padding, palette.
    """

    def decode(self, buf, h: int, w: int, fmt: str) -> np.ndarray:
        if fmt in codecs.FORMATS:
            return codecs.decode(buf, h, w, fmt)
        if fmt == "fake-rgb8":
            seed = int.from_bytes(
                hashlib.blake2b(bytes(buf[:64]), digest_size=8).digest(), "little"
            )
            yy, xx = np.mgrid[0:h, 0:w]
            base = ((xx * 3 + yy * 7 + seed) % 256).astype(np.float64)
            return np.stack([base, (base * 2) % 256, (base * 5) % 256], axis=-1)
        if fmt == "png":
            from ..png import png_decode

            img, _info = png_decode(buf)
            if img.shape[0] != h or img.shape[1] != w:
                raise ValueError(
                    f"png payload is {img.shape[:2]}, row metadata says {(h, w)}"
                )
            return img.astype(np.float64)
        if fmt == "jpeg":
            from ..jpeg import jpeg_decode

            img, _info = jpeg_decode(buf)
            if img.shape[0] != h or img.shape[1] != w:
                raise ValueError(
                    f"jpeg payload is {img.shape[:2]}, row metadata says {(h, w)}"
                )
            return img.astype(np.float64)
        if fmt == "gif":
            from ..gif import gif_decode

            img, _info = gif_decode(buf)
            if img.shape[0] != h or img.shape[1] != w:
                raise ValueError(
                    f"gif payload is {img.shape[:2]}, row metadata says {(h, w)}"
                )
            return img.astype(np.float64)
        if fmt == "tiff":
            from ..tiff import tiff_decode

            img, _info = tiff_decode(buf)
            if img.shape[0] != h or img.shape[1] != w:
                raise ValueError(
                    f"tiff payload is {img.shape[:2]}, row metadata says {(h, w)}"
                )
            return img.astype(np.float64)
        if fmt == "pnm":
            from ..pnm import pnm_decode

            img = pnm_decode(buf)
            if img.shape[0] != h or img.shape[1] != w:
                raise ValueError(
                    f"pnm payload is {img.shape[:2]}, row metadata says {(h, w)}"
                )
            return img.astype(np.float64)
        raise ValueError(f"unknown media fmt {fmt!r}")

    def decode_audio(self, buf, fmt: str) -> np.ndarray:
        """Decode an audio payload to a float64 sample vector in [-1, 1).

        - ``pcm16le``: interleaved-free mono 16-bit little-endian PCM — the
          frombuffer/scale below is the REAL decode for this container.
        - ``wav``: REAL RIFF/WAVE container decode via the stdlib ``wave``
          parser (chunk walk, fmt validation) — 8-bit unsigned and 16-bit
          signed PCM, any channel count (downmixed by channel mean).
        - ``mulaw``: REAL G.711 mu-law expansion (``mulaw_decode``).
        - real compressed codecs (mp3/ogg/flac): require an audio lib → stub.
        """
        if fmt == "pcm16le":
            return np.frombuffer(buf, dtype="<i2").astype(np.float64) / 32768.0
        if fmt == "wav":
            import io
            import wave

            with wave.open(io.BytesIO(bytes(buf)), "rb") as wf:
                nch = wf.getnchannels()
                width = wf.getsampwidth()
                frames = wf.readframes(wf.getnframes())
            if width == 2:
                x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
            elif width == 1:  # WAV 8-bit is unsigned, midpoint 128
                x = (
                    np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
                    - 128.0
                ) / 128.0
            else:
                raise NotImplementedError(
                    f"wav sample width {width} (24/32-bit) not supported"
                )
            if nch > 1:
                x = x.reshape(-1, nch).mean(axis=1)  # downmix to mono
            return x
        if fmt == "mulaw":
            return mulaw_decode(np.frombuffer(buf, dtype=np.uint8)) / 32768.0
        raise NotImplementedError(
            f"{fmt} audio decode requires an audio codec lib, not available "
            "here; plug one into MediaCodec.decode_audio"
        )

    def decode_frame(self, buf, h: int, w: int, fmt: str, frame_idx: int) -> np.ndarray:
        """Decode ONE frame of a video payload (the seek-then-decode path a
        real frame sampler performs).

        - ``rawv-u8``: frames stored back-to-back as h·w uint8 planes — the
          slice/reshape below is the REAL decode for this container.
        - real containers (mp4/webm): require ffmpeg → NotImplementedError.
        """
        if fmt == "rawv-u8":
            sz = h * w
            view = memoryview(buf)[frame_idx * sz : (frame_idx + 1) * sz]
            if len(view) != sz:
                raise ValueError(f"frame {frame_idx} out of range for payload")
            return np.frombuffer(view, dtype=np.uint8).astype(np.float64).reshape(h, w)
        if fmt == "avi":
            from ..avi import avi_decode_frame

            a = avi_decode_frame(buf, frame_idx)
            if a.shape[0] != h or a.shape[1] != w:
                raise ValueError(
                    f"avi frame is {a.shape[:2]}, row metadata says {(h, w)}"
                )
            return a.astype(np.float64)
        raise NotImplementedError(
            f"{fmt} frame decode requires ffmpeg/av, not available here; "
            "plug a real codec into MediaCodec.decode_frame"
        )

    def decode_video(self, buf, h: int, w: int, fmt: str) -> np.ndarray:
        """Decode a whole video payload to an (n_frames, h, w) uint8 cube —
        the sequential-scan path motion/shot analysis needs (every frame is
        read anyway, so one reshape beats n seek-decodes).

        - ``rawv-u8``: back-to-back planes → one zero-copy reshape.
        - real containers (mp4/webm): require ffmpeg → NotImplementedError.
        """
        if fmt == "rawv-u8":
            sz = h * w
            if len(buf) % sz:
                raise ValueError("payload length is not a whole frame count")
            return np.frombuffer(buf, dtype=np.uint8).reshape(-1, h, w)
        if fmt == "avi":
            from ..avi import avi_decode

            cube, _info = avi_decode(buf)
            if cube.shape[1] != h or cube.shape[2] != w:
                raise ValueError(
                    f"avi frames are {cube.shape[1:3]}, metadata says {(h, w)}"
                )
            return cube
        raise NotImplementedError(
            f"{fmt} video decode requires ffmpeg/av, not available here; "
            "plug a real codec into MediaCodec.decode_video"
        )


class _ImageFeatures:
    """Actor: decode once per row, emit thin feature rows (payload dropped)."""

    def __init__(self):
        self.codec = MediaCodec()  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = _payload_views(batch)
        ids = batch["image_id"].to_pylist()
        hs = batch["h"].to_pylist()
        ws = batch["w"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        out = {"image_id": [], "mean": [], "std": [], "p_low": [], "p_high": [],
               "edge_energy": []}
        for i in range(batch.num_rows):
            a = self.codec.decode(views[i], hs[i], ws[i], fmts[i])
            v = a[np.isfinite(a)]
            if v.size == 0:
                continue
            out["image_id"].append(ids[i])
            out["mean"].append(float(v.mean()))
            out["std"].append(float(v.std()))
            out["p_low"].append(float(np.percentile(v, 5)))
            out["p_high"].append(float(np.percentile(v, 95)))
            plane = a if a.ndim == 2 else a[..., 0]
            gx = np.diff(plane, axis=1)
            gy = np.diff(plane, axis=0)
            out["edge_energy"].append(
                float(np.nansum(gx * gx) + np.nansum(gy * gy))
            )
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "mean": pa.array(out["mean"], pa.float64()),
                "std": pa.array(out["std"], pa.float64()),
                "p_low": pa.array(out["p_low"], pa.float64()),
                "p_high": pa.array(out["p_high"], pa.float64()),
                "edge_energy": pa.array(out["edge_energy"], pa.float64()),
            }
        )


def image_features(ts: TileSet, concurrency: int = 4, batch_size: int = 32):
    """Per-image statistical features via an actor pool (codec built once
    per actor; small batches because rows are fat)."""
    from ..runtime import auto_pool

    return ts.ds.map_batches(
        _ImageFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=auto_pool(concurrency),
    )


def resize_images(ts: TileSet, factor: int, concurrency: int = 4):
    """Integer-factor nearest resize of every payload (decode → stride →
    re-encode raw-f32). The multimodal cousin of grid_resample_nearest."""
    from .decode import map_tiles

    class Resize:
        def __init__(self):
            self.codec = MediaCodec()

        def __call__(self, arr, info):
            return arr[::factor, ::factor]

    return map_tiles(
        ts, Resize, concurrency=concurrency, lossless=True, batch_size=32
    )


def image_features_table(
    ds: "ray.data.Dataset", concurrency: int = 4, batch_size: int = 32
):
    """``image_features`` over a plain image table (image_id, bytes, h, w,
    fmt) — e.g. a real-codec corpus (jpeg/png) rather than DEM tiles."""
    from ..runtime import auto_pool

    return ds.map_batches(
        _ImageFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=auto_pool(concurrency),
    )


def make_fake_jpegs(
    n_images: int, h: int, w: int, quality: int = 90
) -> pa.Table:
    """Deterministic REAL-jpeg image table (image_id, bytes, h, w, fmt):
    image i is the uint8 plane ``(2·row + 3·col + 17·i) mod 256`` —
    grayscale when ``i % 3 == 0``, RGB 4:4:4 when 1, RGB 4:2:0 when 2
    (channels are the plane, its transpose-ish shift, and its negative) —
    encoded with the engine's baseline codec (``jpeg.jpeg_encode``). Row
    sizes vary (``h+i%5``, ``w+i%7``) to exercise ragged MCU grids. Pure
    formula, no RNG."""
    from ..jpeg import jpeg_encode

    ids, bufs, hs, ws = [], [], [], []
    for i in range(n_images):
        hi, wi = h + i % 5, w + i % 7
        yy, xx = np.mgrid[0:hi, 0:wi]
        plane = ((2 * yy + 3 * xx + 17 * i) % 256).astype(np.uint8)
        if i % 3 == 0:
            img = plane
            buf = jpeg_encode(img, quality=quality)
        else:
            img = np.stack(
                [plane, (plane + 85) % 256, 255 - plane], axis=-1
            ).astype(np.uint8)
            buf = jpeg_encode(
                img, quality=quality,
                subsampling="444" if i % 3 == 1 else "420",
            )
        ids.append(f"j{i:04d}")
        bufs.append(buf)
        hs.append(hi)
        ws.append(wi)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "h": pa.array(hs, pa.int32()),
            "w": pa.array(ws, pa.int32()),
            "fmt": pa.array(["jpeg"] * n_images, pa.string()),
        }
    )


def make_fake_gifs(n_images: int, h: int, w: int) -> pa.Table:
    """Deterministic REAL-gif image table (image_id, bytes, h, w, fmt):
    image i is the index plane ``(3·row + 5·col + 11·i) mod P`` — gray
    ramp palette (P=256) for even i, a 64-entry synthetic RGB palette for
    odd i — encoded with the engine's LZW codec (``gif.gif_encode``).
    Sizes vary (``h+i%4``, ``w+i%5``). GIF is lossless, so truth IS the
    palette lookup of the index plane. Pure formula, no RNG."""
    from ..gif import gif_encode

    ids, bufs, hs, ws = [], [], [], []
    pal64 = np.stack(
        [
            (np.arange(64) * 4) % 256,
            (np.arange(64) * 7) % 256,
            (255 - np.arange(64) * 4) % 256,
        ],
        axis=1,
    ).astype(np.uint8)
    for i in range(n_images):
        hi, wi = h + i % 4, w + i % 5
        yy, xx = np.mgrid[0:hi, 0:wi]
        plane = (3 * yy + 5 * xx + 11 * i).astype(np.int64)
        if i % 2 == 0:
            buf = gif_encode((plane % 256).astype(np.uint8))
        else:
            buf = gif_encode((plane % 64).astype(np.uint8), palette=pal64)
        ids.append(f"g{i:04d}")
        bufs.append(buf)
        hs.append(hi)
        ws.append(wi)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "h": pa.array(hs, pa.int32()),
            "w": pa.array(ws, pa.int32()),
            "fmt": pa.array(["gif"] * n_images, pa.string()),
        }
    )


def tiff_fake_plane(i: int, h: int, w: int) -> np.ndarray:
    """The deterministic truth plane for ``make_fake_tiffs`` image ``i``
    (pure formula, shared by corpus generator and witness): gray-8 ramp,
    gray-16 ramp, or a 3-plane RGB stack, per the i%6 variant schedule."""
    hi, wi = h + i % 4, w + i % 5
    yy, xx = np.mgrid[0:hi, 0:wi]
    v = i % 6
    if v in (2, 4):  # 16-bit gray
        return ((137 * yy + 241 * xx + 4099 * i) % 65536).astype(np.uint16)
    base = (3 * yy + 5 * xx + 11 * i) % 256
    if v in (3, 5):  # RGB
        return np.stack(
            [base, (2 * base + 17) % 256, (5 * base + 31) % 256], axis=-1
        ).astype(np.uint8)
    return base.astype(np.uint8)


def make_fake_tiffs(n_images: int, h: int, w: int) -> pa.Table:
    """Deterministic REAL-tiff image table (image_id, bytes, h, w, fmt):
    image i is ``tiff_fake_plane(i)`` encoded with the engine's baseline
    TIFF writer (``tiff.tiff_encode``) under a rotating variant schedule
    that covers every decode path — compression none/LZW/PackBits, both
    byte orders, 8/16-bit gray and RGB, horizontal predictor, multi-strip
    (rows_per_strip=5 with ragged tails). TIFF is lossless, so truth IS
    the formula plane. Pure formula, no RNG."""
    from ..tiff import tiff_encode

    # (compression, predictor, byteorder) per i%6; dtype comes from the plane
    variants = [
        ("none", False, "II"),
        ("lzw", False, "MM"),
        ("lzw", True, "II"),
        ("packbits", False, "MM"),
        ("none", False, "MM"),
        ("lzw", False, "II"),
    ]
    ids, bufs, hs, ws = [], [], [], []
    for i in range(n_images):
        plane = tiff_fake_plane(i, h, w)
        comp, pred, bo = variants[i % 6]
        bufs.append(
            tiff_encode(plane, compression=comp, predictor=pred,
                        byteorder=bo, rows_per_strip=5)
        )
        ids.append(f"t{i:04d}")
        hs.append(plane.shape[0])
        ws.append(plane.shape[1])
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "h": pa.array(hs, pa.int32()),
            "w": pa.array(ws, pa.int32()),
            "fmt": pa.array(["tiff"] * n_images, pa.string()),
        }
    )


def make_fake_pnms(n_images: int, h: int, w: int) -> pa.Table:
    """Deterministic REAL-pnm image table: ``tiff_fake_plane`` planes (the
    shared formula) written through ``pnm.pnm_encode`` under a rotating
    form schedule — binary P5 gray-8/16, binary P6 RGB, ASCII P2/P3 —
    covering every decode path. Lossless, so truth IS the formula plane."""
    from ..pnm import pnm_encode

    ids, bufs, hs, ws = [], [], [], []
    for i in range(n_images):
        plane = tiff_fake_plane(i, h, w)
        ascii_form = i % 4 == 3
        if plane.dtype == np.uint16 and plane.ndim == 2:
            buf = pnm_encode(plane)  # P5 16-bit (big-endian)
        else:
            buf = pnm_encode(plane, ascii_form=ascii_form)
        ids.append(f"p{i:04d}")
        bufs.append(buf)
        hs.append(plane.shape[0])
        ws.append(plane.shape[1])
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "h": pa.array(hs, pa.int32()),
            "w": pa.array(ws, pa.int32()),
            "fmt": pa.array(["pnm"] * n_images, pa.string()),
        }
    )


def make_fake_videos(n_videos: int, h: int, w: int, n_frames: int) -> pa.Table:
    """Deterministic ``rawv-u8`` video table (video_id, bytes, h, w,
    n_frames, fmt): frame k of video v is the uint8 plane
    ``(3·col + 7·row + 11·k + 13·v) mod 256`` — pure formula, no RNG."""
    ids, bufs = [], []
    yy, xx = np.mgrid[0:h, 0:w]
    for v in range(n_videos):
        frames = [
            ((3 * xx + 7 * yy + 11 * k + 13 * v) % 256).astype(np.uint8)
            for k in range(n_frames)
        ]
        ids.append(f"v{v:04d}")
        bufs.append(b"".join(f.tobytes() for f in frames))
    return pa.table(
        {
            "video_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "h": pa.array([h] * n_videos, pa.int32()),
            "w": pa.array([w] * n_videos, pa.int32()),
            "n_frames": pa.array([n_frames] * n_videos, pa.int32()),
            "fmt": pa.array(["rawv-u8"] * n_videos, pa.string()),
        }
    )


def avi_fake_frames(v: int, h: int, w: int, n_frames: int) -> np.ndarray:
    """Truth frames for ``make_fake_avis`` video ``v`` (pure formula,
    shared by generator and witness): frame k is the uint8 plane
    ``(5·col + 3·row + 17·k + 29·v) mod 256``."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        ((5 * xx + 3 * yy + 17 * k + 29 * v) % 256).astype(np.uint8)
        for k in range(n_frames)
    ])


def make_fake_avis(n_videos: int, h: int, w: int, n_frames: int) -> pa.Table:
    """Deterministic REAL-avi video table: ``avi_fake_frames`` muxed with
    the engine's RIFF writer (``avi.avi_encode`` — bottom-up DIB rows,
    4-byte stride, 8-bit gray palette, idx1). Widths vary (``w + v%3``)
    so the stride-padding path is exercised. Lossless container, so truth
    IS the formula frame. Pure formula, no RNG."""
    from ..avi import avi_encode

    ids, bufs, hs, ws = [], [], [], []
    for v in range(n_videos):
        wv = w + v % 3
        bufs.append(avi_encode(avi_fake_frames(v, h, wv, n_frames)))
        ids.append(f"a{v:04d}")
        hs.append(h)
        ws.append(wv)
    return pa.table(
        {
            "video_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "h": pa.array(hs, pa.int32()),
            "w": pa.array(ws, pa.int32()),
            "n_frames": pa.array([n_frames] * n_videos, pa.int32()),
            "fmt": pa.array(["avi"] * n_videos, pa.string()),
        }
    )


class _FrameSampler:
    """Actor: seek-decode every ``every_n``-th frame of each video payload
    and emit thin per-frame feature rows (payload dropped immediately)."""

    def __init__(self, every_n: int):
        self.codec = MediaCodec()  # once per actor
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"video_id": [], "frame_idx": [], "mean": [], "std": []}
        bufs = batch["bytes"]
        for i in range(batch.num_rows):
            vid = batch["video_id"][i].as_py()
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            n = int(batch["n_frames"][i].as_py())
            fmt = batch["fmt"][i].as_py()
            buf = bufs[i].as_py()
            for k in range(0, n, self.every_n):
                a = self.codec.decode_frame(buf, h, w, fmt, k)
                out["video_id"].append(vid)
                out["frame_idx"].append(k)
                out["mean"].append(float(a.mean()))
                out["std"].append(float(a.std()))
        return pa.table(
            {
                "video_id": pa.array(out["video_id"], pa.string()),
                "frame_idx": pa.array(out["frame_idx"], pa.int64()),
                "mean": pa.array(out["mean"], pa.float64()),
                "std": pa.array(out["std"], pa.float64()),
            }
        )


def sample_frames(ds, every_n: int = 10, concurrency: int = 4, batch_size: int = 8):
    """Video frame sampling: rows are (video_id, bytes, h, w, n_frames,
    fmt); every ``every_n``-th frame is seek-decoded (``MediaCodec.
    decode_frame`` — real byte-range decode for ``rawv-u8``, pluggable
    ffmpeg for real containers) in an actor pool and reduced to thin
    per-frame feature rows. Video rows are the fattest payloads in the
    engine → small batch_size."""
    from ..runtime import auto_pool

    return ds.map_batches(
        _FrameSampler,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=auto_pool(concurrency),
        fn_constructor_kwargs={"every_n": every_n},
    )


def make_fake_audio(n_clips: int, sample_rate: int = 8000, seconds: float = 0.5) -> pa.Table:
    """Deterministic ``pcm16le`` audio table (audio_id, bytes, sample_rate,
    n_samples, fmt): clip c is a two-tone sine mix with formula-fixed
    frequencies — pure arithmetic, no RNG."""
    n = int(sample_rate * seconds)
    t = np.arange(n) / sample_rate
    ids, bufs = [], []
    for c in range(n_clips):
        f0 = 200.0 + 37.0 * c
        f1 = 900.0 + 53.0 * c
        x = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.25 * np.sin(2 * np.pi * f1 * t)
        ids.append(f"a{c:04d}")
        bufs.append((x * 32767.0).astype("<i2").tobytes())
    return pa.table(
        {
            "audio_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "sample_rate": pa.array([sample_rate] * n_clips, pa.int32()),
            "n_samples": pa.array([n] * n_clips, pa.int32()),
            "fmt": pa.array(["pcm16le"] * n_clips, pa.string()),
        }
    )


def _fake_wav_samples(c: int, sample_rate: int, seconds: float):
    """Quantized sample arrays for clip ``c`` of the wav corpus — the
    GENERATOR formula, shared with the fixture witness so the witness
    never touches the container or the ``wave`` parser. Clip kinds cycle
    mono-16 / stereo-16 / mono-8; returns (kind, channel arrays)."""
    n = int(sample_rate * seconds)
    t = np.arange(n) / sample_rate
    f0 = 150.0 + 41.0 * c
    f1 = 700.0 + 59.0 * c
    left = 0.55 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(2 * np.pi * f1 * t)
    kind = c % 3
    if kind == 0:  # mono 16-bit
        return kind, [(left * 32767.0).astype("<i2")]
    if kind == 1:  # stereo 16-bit: distinct L/R tones
        right = 0.4 * np.sin(2 * np.pi * f1 * t)
        return kind, [(left * 32767.0).astype("<i2"),
                      (right * 32767.0).astype("<i2")]
    # mono 8-bit unsigned (midpoint 128)
    return kind, [np.round(left * 127.0 + 128.0).astype(np.uint8)]


def make_fake_wavs(
    n_clips: int, sample_rate: int = 8000, seconds: float = 0.5
) -> pa.Table:
    """Deterministic REAL-WAV audio table (audio_id, bytes, sample_rate,
    n_samples, fmt='wav'): each clip is a two-tone mix with formula-fixed
    frequencies, containered through the stdlib ``wave`` writer. Clips
    cycle mono-16-bit / stereo-16-bit / mono-8-bit so the decode path's
    width and downmix branches all see real traffic."""
    import io
    import wave

    ids, bufs = [], []
    n = int(sample_rate * seconds)
    for c in range(n_clips):
        kind, chans = _fake_wav_samples(c, sample_rate, seconds)
        bio = io.BytesIO()
        with wave.open(bio, "wb") as wf:
            wf.setnchannels(len(chans))
            wf.setsampwidth(1 if kind == 2 else 2)
            wf.setframerate(sample_rate)
            if len(chans) == 1:
                wf.writeframes(chans[0].tobytes())
            else:
                inter = np.empty(n * len(chans), dtype=chans[0].dtype)
                for k, ch in enumerate(chans):
                    inter[k :: len(chans)] = ch
                wf.writeframes(inter.tobytes())
        ids.append(f"w{c:04d}")
        bufs.append(bio.getvalue())
    return pa.table(
        {
            "audio_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "sample_rate": pa.array([sample_rate] * n_clips, pa.int32()),
            "n_samples": pa.array([n] * n_clips, pa.int32()),
            "fmt": pa.array(["wav"] * n_clips, pa.string()),
        }
    )


def mulaw_decode(code: np.ndarray) -> np.ndarray:
    """REAL G.711 mu-law decode (ITU-T G.711, public standard): byte →
    16-bit-domain linear sample, vectorized. The canonical expansion:
    complement, split sign/exponent/mantissa, t = ((mant·8)+0x84)<<exp,
    linear = ±(t − 0x84). Range ±32124."""
    u = (~code.astype(np.int64)) & 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    t = ((mant << 3) + 0x84) << exp
    lin = t - 0x84
    return np.where(sign, -lin, lin).astype(np.float64)


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """REAL G.711 mu-law encode: int16-domain linear → byte, vectorized
    (bias 0x84, clip 32635, segment by highest set bit, complement)."""
    x = np.asarray(x, dtype=np.int64)
    sign = np.where(x < 0, 0x80, 0x00)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    # exponent: index of the highest set bit of mag >> 7 (0..7)
    exp = np.zeros_like(mag)
    for e in range(7, 0, -1):
        exp = np.where((mag >> (e + 7)) & 1, np.maximum(exp, e), exp)
    mant = (mag >> (exp + 3)) & 0x0F
    return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8)


def make_fake_mulaw(
    n_clips: int, sample_rate: int = 8000, seconds: float = 0.5
) -> pa.Table:
    """Deterministic REAL mu-law audio table (fmt='mulaw'): the wav
    corpus generator's mono two-tone mix, quantized to int16 and G.711
    mu-law companded."""
    ids, bufs = [], []
    n = int(sample_rate * seconds)
    t = np.arange(n) / sample_rate
    for c in range(n_clips):
        f0 = 170.0 + 37.0 * c
        f1 = 610.0 + 53.0 * c
        x = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.25 * np.sin(2 * np.pi * f1 * t)
        q = np.round(x * 32767.0).astype(np.int64)
        ids.append(f"m{c:04d}")
        bufs.append(mulaw_encode(q).tobytes())
    return pa.table(
        {
            "audio_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "sample_rate": pa.array([sample_rate] * n_clips, pa.int32()),
            "n_samples": pa.array([n] * n_clips, pa.int32()),
            "fmt": pa.array(["mulaw"] * n_clips, pa.string()),
        }
    )


class _AudioFeatures:
    """Actor: decode each clip once, emit thin rows (rms, peak,
    zero-crossing rate, dominant-bin frequency via numpy rfft)."""

    def __init__(self):
        self.codec = MediaCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"audio_id": [], "rms": [], "peak": [], "zcr": [], "dom_freq": []}
        for i in range(batch.num_rows):
            buf = batch["bytes"][i].as_py()
            sr = int(batch["sample_rate"][i].as_py())
            x = self.codec.decode_audio(buf, batch["fmt"][i].as_py())
            if x.size == 0:
                continue
            out["audio_id"].append(batch["audio_id"][i].as_py())
            out["rms"].append(float(np.sqrt((x * x).mean())))
            out["peak"].append(float(np.abs(x).max()))
            out["zcr"].append(float((np.diff(np.signbit(x)) != 0).mean()))
            spec = np.abs(np.fft.rfft(x))
            spec[0] = 0.0  # ignore DC
            out["dom_freq"].append(float(np.argmax(spec) * sr / x.size))
        return pa.table(
            {
                "audio_id": pa.array(out["audio_id"], pa.string()),
                "rms": pa.array(out["rms"], pa.float64()),
                "peak": pa.array(out["peak"], pa.float64()),
                "zcr": pa.array(out["zcr"], pa.float64()),
                "dom_freq": pa.array(out["dom_freq"], pa.float64()),
            }
        )


def audio_features(ds, concurrency: int = 4, batch_size: int = 16):
    """Per-clip audio features via an actor pool (codec once per actor,
    payloads dropped at the stage boundary)."""
    from ..runtime import auto_pool

    return ds.map_batches(
        _AudioFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=auto_pool(concurrency),
    )


class _SpectralFeatures:
    """Actor: framed STFT features per clip — the spectrogram kernel.
    Contract (shared verbatim with the fixture witness): 256-sample Hann
    frames, hop 128, full frames only; per-frame power = |rfft|²;
    centroid_mean averages the per-frame spectral centroid, band
    fractions split the clip-total power at 300/1500 Hz, rolloff85 is the
    lowest bin frequency reaching 85 % of clip-total power."""

    N = 256
    HOP = 128

    def __init__(self):
        self.codec = MediaCodec()
        self.win = np.hanning(self.N)

    def _features(self, x: np.ndarray, sr: int):
        n_frames = (x.size - self.N) // self.HOP + 1 if x.size >= self.N else 0
        if n_frames <= 0:
            return None
        idx = (
            np.arange(self.N)[None, :]
            + (np.arange(n_frames) * self.HOP)[:, None]
        )
        frames = x[idx] * self.win[None, :]
        p = np.abs(np.fft.rfft(frames, axis=1)) ** 2
        freqs = np.arange(p.shape[1]) * (sr / self.N)
        tot_f = p.sum(axis=1)
        centroid = float(((p @ freqs) / tot_f).mean())
        spec = p.sum(axis=0)
        tot = float(spec.sum())
        low = float(spec[freqs < 300.0].sum() / tot)
        mid = float(spec[(freqs >= 300.0) & (freqs < 1500.0)].sum() / tot)
        high = float(spec[freqs >= 1500.0].sum() / tot)
        roll = float(freqs[np.searchsorted(np.cumsum(spec), 0.85 * tot)])
        return n_frames, centroid, low, mid, high, roll

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"audio_id": [], "n_frames": [], "centroid_mean": [],
               "low_frac": [], "mid_frac": [], "high_frac": [],
               "rolloff85": []}
        for i in range(batch.num_rows):
            x = self.codec.decode_audio(
                batch["bytes"][i].as_py(), batch["fmt"][i].as_py()
            )
            f = self._features(x, int(batch["sample_rate"][i].as_py()))
            if f is None:
                continue
            out["audio_id"].append(batch["audio_id"][i].as_py())
            for k, v in zip(
                ("n_frames", "centroid_mean", "low_frac", "mid_frac",
                 "high_frac", "rolloff85"), f
            ):
                out[k].append(v)
        return pa.table(
            {
                "audio_id": pa.array(out["audio_id"], pa.string()),
                "n_frames": pa.array(out["n_frames"], pa.int64()),
                "centroid_mean": pa.array(out["centroid_mean"], pa.float64()),
                "low_frac": pa.array(out["low_frac"], pa.float64()),
                "mid_frac": pa.array(out["mid_frac"], pa.float64()),
                "high_frac": pa.array(out["high_frac"], pa.float64()),
                "rolloff85": pa.array(out["rolloff85"], pa.float64()),
            }
        )


def audio_spectral_features(ds, concurrency: int = 4, batch_size: int = 16):
    """Framed-STFT spectral features via an actor pool (window + codec
    built once per actor) — the spectrogram-shaped stage ``audio_features``
    (time-domain + one whole-clip FFT) does not cover."""
    from ..runtime import auto_pool

    return ds.map_batches(
        _SpectralFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=auto_pool(concurrency),
    )


class _FrameMotion:
    """Actor: full-scan decode each video and emit per-transition motion
    rows — SAD (sum of absolute pixel differences, EXACT integer on uint8
    planes) between consecutive frames, plus a shot-cut flag at a mean-
    per-pixel threshold. Payload dropped immediately; output is thin."""

    def __init__(self, cut_centi_px: int):
        self.codec = MediaCodec()  # once per actor
        self.cut_centi_px = cut_centi_px

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, idxs, sads, cuts = [], [], [], []
        for i in range(batch.num_rows):
            vid = batch["video_id"][i].as_py()
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            fmt = batch["fmt"][i].as_py()
            cube = self.codec.decode_video(batch["bytes"][i].as_py(), h, w, fmt)
            if cube.shape[0] < 2:
                continue
            d = np.abs(np.diff(cube.astype(np.int16), axis=0)).astype(np.int64)
            sad = d.sum(axis=(1, 2))  # exact: ≤ 255·h·w per transition
            # cut when mean |Δ| per pixel ≥ threshold/100 — kept as the
            # integer cross-multiplication 100·sad ≥ thr·n_px (no floats)
            cut = (100 * sad >= self.cut_centi_px * (h * w)).astype(np.int64)
            n = sad.size
            vids.extend([vid] * n)
            idxs.extend(range(1, n + 1))
            sads.extend(sad.tolist())
            cuts.extend(cut.tolist())
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "sad": pa.array(sads, pa.int64()),
                "cut": pa.array(cuts, pa.int64()),
            }
        )


def frame_motion(ds, cut_centi_px: int = 4000, concurrency: int = 4,
                 batch_size: int = 8):
    """Per-transition motion energy + shot-boundary detection over video
    rows (video_id, bytes, h, w, n_frames, fmt): consecutive-frame SAD is
    exact integer arithmetic on the uint8 planes, so the witness oracle
    hash-matches with no float hazard. Actor pool, small batches (video
    payloads are the fattest rows in the engine). Columns: video_id,
    frame_idx (the LATER frame of the pair), sad, cut."""
    from ..runtime import auto_pool

    return ds.map_batches(
        _FrameMotion,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=auto_pool(concurrency),
        fn_constructor_kwargs={"cut_centi_px": cut_centi_px},
    )


_AUG_OPS = ("fliplr", "flipud", "rot90")


def augment_tiles(ts: TileSet, op: str) -> TileSet:
    """Deterministic per-image augmentation (flip / 90° rotation) — the
    standard image-side training-data transform, applied per tile payload
    (each tile is an image row of the Lance-shaped table; this is an
    image op, NOT a mosaic-coordinate warp — georef metadata is carried
    unchanged). ``rot90`` transposes h×w. Pure per-tile map (``map_tiles``
    lossless path), stateless tasks, streams at any scale."""
    from .decode import map_tiles

    if op not in _AUG_OPS:
        raise ValueError(f"op must be one of {_AUG_OPS}, got {op!r}")
    fn = {
        "fliplr": np.fliplr,
        "flipud": np.flipud,
        "rot90": np.rot90,
    }[op]

    def apply(arr: np.ndarray, info) -> np.ndarray:
        return np.ascontiguousarray(fn(arr))

    return map_tiles(ts, apply, lossless=True)
