"""REAL AVI (RIFF) container codec for uncompressed DIB video — pure
stdlib + numpy.

Implements the public Microsoft AVI RIFF specification (``RIFF``/``AVI ``
form, ``hdrl`` list with ``avih``/``strl``/``strh``/``strf``, ``movi``
list of ``00db`` frame chunks, optional ``idx1`` index) with honest DIB
pixel semantics:

- 8-bit frames carry a 256-entry RGBQUAD palette in ``strf`` (identity
  gray ramp on encode; decode applies the palette's red channel — gray
  payloads stay gray);
- 24-bit frames are BGR;
- rows are stored BOTTOM-UP (positive ``biHeight``) with each row padded
  to a 4-byte boundary — the two classic DIB traps;
- chunks are word-aligned (odd sizes get a pad byte) per RIFF.

Out of scope (``NotImplementedError`` with the fourcc that triggered it):
compressed streams (``00dc`` with non-BI_RGB biCompression), multiple
video streams, ``indx``/OpenDML. Audio streams are skipped, not errors.

Reference-parity note: the reference engine leans on imageio/ffmpeg for
``make_mp4`` (SURVEY §2.2 — excluded as drawing/IO glue); this module is
the sandbox-native REAL container path used by ``stages/multimodal.py``'s
``MediaCodec`` (fmt="avi"). Tested in ``tests/test_avi.py`` against
hand-built byte streams (pencil-derived headers, bottom-up + stride
checks) and roundtrips.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["AviInfo", "avi_decode", "avi_decode_frame", "avi_encode",
           "avi_frame_offsets"]


class AviInfo:
    """Parsed container facts."""

    def __init__(self, width, height, n_frames, bits, fps):
        self.width = width
        self.height = height
        self.n_frames = n_frames
        self.bits = bits
        self.fps = fps

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return (f"AviInfo({self.width}x{self.height}x{self.n_frames} "
                f"bits={self.bits} fps={self.fps})")


def _chunks(buf: bytes, start: int, end: int):
    """Iterate (fourcc, payload_start, payload_size) over a chunk run."""
    pos = start
    while pos + 8 <= end:
        fcc = buf[pos:pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        yield fcc, pos + 8, size
        pos += 8 + size + (size & 1)  # RIFF word alignment


def _parse(buf: bytes):
    """Walk the container → (AviInfo, palette|None, [(off, size)] frames)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI: missing RIFF/AVI signature")
    end = min(len(buf), 8 + struct.unpack_from("<I", buf, 4)[0])
    width = height = n_frames = bits = None
    fps = 0.0
    palette = None
    frames: list[tuple[int, int]] = []
    vids_seen = 0

    def walk(lo: int, hi: int):
        nonlocal width, height, n_frames, bits, fps, palette, vids_seen
        for fcc, off, size in _chunks(buf, lo, hi):
            if fcc == b"LIST":
                ltype = buf[off:off + 4]
                if ltype in (b"hdrl", b"strl"):
                    walk(off + 4, off + size)
                elif ltype == b"movi":
                    for f2, o2, s2 in _chunks(buf, off + 4, off + size):
                        if f2[2:4] == b"db":
                            frames.append((o2, s2))
                        elif f2[2:4] == b"dc":
                            raise NotImplementedError(
                                "compressed AVI frame chunk "
                                f"{f2.decode('latin1')!r} not supported")
            elif fcc == b"avih":
                (usec, _mbps, _pad, _flags, total, _init, _nstr, _sbuf,
                 w, h) = struct.unpack_from("<10I", buf, off)
                width, height, n_frames = w, h, total
                fps = 1e6 / usec if usec else 0.0
            elif fcc == b"strh":
                if buf[off:off + 4] == b"vids":
                    vids_seen += 1
                    if vids_seen > 1:
                        raise NotImplementedError(
                            "multiple video streams not supported")
            elif fcc == b"strf" and bits is None:
                (bisize, _bw, _bh, _planes, bcount, bcomp) = struct.unpack_from(
                    "<IiiHHI", buf, off)
                if bcomp != 0:  # BI_RGB only
                    raise NotImplementedError(
                        f"biCompression={bcomp} (non-BI_RGB) not supported")
                bits = bcount
                if bits == 8:
                    pal = np.frombuffer(
                        buf, np.uint8, 256 * 4, off + bisize).reshape(256, 4)
                    palette = pal[:, 2].copy()  # red channel (BGRX quads)

    walk(12, end)
    if width is None or bits is None:
        raise ValueError("AVI missing avih/strf headers")
    if bits not in (8, 24):
        raise NotImplementedError(f"biBitCount={bits} not supported")
    if n_frames and len(frames) < n_frames:
        n_frames = len(frames)
    return AviInfo(width, height, len(frames), bits, fps), palette, frames


def avi_frame_offsets(buf) -> list[tuple[int, int]]:
    """(offset, size) of each ``00db`` frame payload — the seek index a
    sampler uses to decode a sparse frame subset without touching the
    rest of the payload."""
    return _parse(bytes(buf))[2]


def _decode_dib(view: bytes, w: int, h: int, bits: int,
                palette) -> np.ndarray:
    stride = ((w * (bits // 8)) + 3) & ~3  # rows pad to 4 bytes
    if len(view) < stride * h:
        raise ValueError("DIB frame chunk shorter than stride*height")
    rows = np.frombuffer(view, np.uint8, stride * h).reshape(h, stride)
    rows = rows[::-1]  # bottom-up storage
    if bits == 8:
        idx = rows[:, :w]
        return palette[idx] if palette is not None else idx.copy()
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def avi_decode(buf) -> tuple[np.ndarray, AviInfo]:
    """Decode every frame → (n, h, w) uint8 gray or (n, h, w, 3) RGB."""
    buf = bytes(buf)
    info, palette, frames = _parse(buf)
    out = np.stack([
        _decode_dib(buf[o:o + s], info.width, info.height, info.bits,
                    palette)
        for o, s in frames
    ]) if frames else np.zeros(
        (0, info.height, info.width), np.uint8)
    return out, info


def avi_decode_frame(buf, frame_idx: int) -> np.ndarray:
    """Seek-decode ONE frame (parses headers, slices only that chunk)."""
    buf = bytes(buf)
    info, palette, frames = _parse(buf)
    if not 0 <= frame_idx < len(frames):
        raise ValueError(f"frame {frame_idx} out of range ({len(frames)})")
    o, s = frames[frame_idx]
    return _decode_dib(buf[o:o + s], info.width, info.height, info.bits,
                       palette)


def avi_encode(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode (n, h, w) uint8 gray or (n, h, w, 3) uint8 RGB as an
    uncompressed-DIB AVI (identity gray palette for 8-bit, BGR bottom-up
    rows, 4-byte stride, idx1 index). Deterministic."""
    a = np.asarray(frames)
    if a.dtype != np.uint8:
        raise ValueError(f"frames must be uint8, got {a.dtype}")
    if a.ndim == 3:
        n, h, w = a.shape
        bits = 8
    elif a.ndim == 4 and a.shape[3] == 3:
        n, h, w = a.shape[:3]
        bits = 24
    else:
        raise ValueError(f"unsupported frame stack shape {a.shape}")
    stride = ((w * (bits // 8)) + 3) & ~3
    frame_bytes = stride * h

    def dib(frame: np.ndarray) -> bytes:
        rows = np.zeros((h, stride), np.uint8)
        if bits == 8:
            rows[:, :w] = frame[::-1]
        else:
            rows[:, : w * 3] = frame[::-1, :, ::-1].reshape(h, w * 3)
        return rows.tobytes()

    def chunk(fcc: bytes, payload: bytes) -> bytes:
        pad = b"\0" if len(payload) & 1 else b""
        return fcc + struct.pack("<I", len(payload)) + payload + pad

    # strf: BITMAPINFOHEADER (+ gray palette for 8-bit)
    bih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bits, 0, frame_bytes,
                      0, 0, 256 if bits == 8 else 0, 0)
    if bits == 8:
        ramp = np.arange(256, dtype=np.uint8)
        pal = np.stack([ramp, ramp, ramp, np.zeros(256, np.uint8)],
                       axis=1)  # BGRX
        bih += pal.tobytes()
    strh = b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIII4H", 0, 0, 0, 0, 1, fps, 0, n, frame_bytes,
        0xFFFFFFFF, 0, 0, 0, w, h)
    strl = chunk(b"LIST", b"strl" + chunk(b"strh", strh)
                 + chunk(b"strf", bih))
    avih = struct.pack("<14I", 1_000_000 // fps, frame_bytes * fps, 0,
                       0x10, n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strl)

    movi_payload = b"movi"
    idx = b""
    for k in range(n):
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += b"00db" + struct.pack("<III", 0x10, len(movi_payload),
                                     frame_bytes)
        movi_payload += chunk(b"00db", dib(a[k]))
    movi = chunk(b"LIST", movi_payload)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body
