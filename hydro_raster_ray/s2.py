"""Real S2 cell-id index (vectorized, pure numpy).

The north rule names an "H3/S2 index over tile footprints" as a first-class
mechanism; until round 4 the engine's Morton key (grid.py) stood in for it.
This module implements the genuine S2 scheme from the public s2geometry
specification: a point on the sphere maps to one of 6 cube faces, the face
square is subdivided as a quadtree to 30 levels, and leaf cells are ordered
along a face-continuous Hilbert curve so that nearby cells share long id
prefixes — exactly the property a spatial shuffle key needs (range-partition
by cell id ≈ spatial locality; parent(id, level) is a constant-time bucket).

Encoding layout (64-bit, per the public spec):
    id = face(3 bits) | hilbert position(2*level bits) | 1 | zeros
The lsb marks the level: leaf ids end in ...1, a level-L id has its lowest
set bit at position 2*(30-L).

Everything is vectorized over numpy arrays (30 fixed-iteration passes with
table gathers — no per-point Python). ``leaf_scalar`` is the deliberately
scalar per-point reference walk used by the driver-oracle witness.

Reference parity note: the reference toolkit (hydro-raster) has no spatial
index at all — tiles are addressed by array offsets (Raster.py:56-120); the
index family is the engine's scale contribution, per BASELINE.json.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "MAX_LEVEL",
    "lnglat_to_leaf",
    "leaf_to_lnglat",
    "parent",
    "level_of",
    "token",
    "token_to_id",
    "leaf_scalar",
    "face_ij_to_id",
    "id_to_face_ij",
]

MAX_LEVEL = 30
_POS_BITS = 2 * MAX_LEVEL + 1  # 61
_SWAP, _INVERT = 1, 2

# Hilbert state tables (public spec constants). kPosToIJ[orient][pos] gives
# the (i<<1|j) quadrant of curve position `pos` under `orient`; kIJtoPos is
# the per-orientation inverse; stepping into child `pos` XORs the orientation
# with kPosToOrientation[pos].
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.uint64
)
_IJ_TO_POS = np.array(
    [[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]], dtype=np.uint64
)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _SWAP | _INVERT], dtype=np.uint64)
# flattened for vectorized gathers: index = orient*4 + key
_IJ_TO_POS_FLAT = _IJ_TO_POS.ravel()
_POS_TO_IJ_FLAT = _POS_TO_IJ.ravel()


def _xyz_from_lnglat(lng_deg, lat_deg):
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)


def _face_uv_from_xyz(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(axis, [x, y, z])
    face = np.where(major >= 0, axis, axis + 3).astype(np.int64)
    # per-face (u, v) from the spec's face frames (see module docstring)
    u = np.empty_like(np.asarray(x, dtype=np.float64))
    v = np.empty_like(u)
    for f, (ue, ve) in enumerate(
        [
            (lambda: y / x, lambda: z / x),
            (lambda: -x / y, lambda: z / y),
            (lambda: -x / z, lambda: -y / z),
            (lambda: z / x, lambda: y / x),
            (lambda: z / y, lambda: -x / y),
            (lambda: -y / z, lambda: -x / z),
        ]
    ):
        m = face == f
        if np.any(m):
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face, u, v


def _st_from_uv(u):
    # quadratic projection (the spec default): equalizes cell areas.
    # np.where evaluates both branches: the untaken one can sqrt a negative.
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _uv_from_st(s):
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def _xyz_from_face_uv(face, u, v):
    one = np.ones_like(u)
    frames = [
        (one, u, v),
        (-u, one, v),
        (-u, -v, one),
        (-one, -v, -u),
        (v, -one, -u),
        (v, u, -one),
    ]
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, (fx, fy, fz) in enumerate(frames):
        m = face == f
        if np.any(m):
            x[m], y[m], z[m] = fx[m], fy[m], fz[m]
    n = np.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def face_ij_to_id(face, i, j) -> np.ndarray:
    """(face, i, j) leaf coordinates → 64-bit S2 leaf cell id (vectorized)."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    orient = face & np.uint64(_SWAP)
    pos = np.zeros_like(i)
    for k in range(MAX_LEVEL - 1, -1, -1):
        ij = (((i >> np.uint64(k)) & np.uint64(1)) << np.uint64(1)) | (
            (j >> np.uint64(k)) & np.uint64(1)
        )
        p = _IJ_TO_POS_FLAT[(orient << np.uint64(2)) | ij]
        pos = (pos << np.uint64(2)) | p
        orient ^= _POS_TO_ORIENT[p]
    return (face << np.uint64(_POS_BITS)) | (pos << np.uint64(1)) | np.uint64(1)


def id_to_face_ij(cell_id) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Leaf cell id → (face, i, j). Inverse of :func:`face_ij_to_id`."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    face = cid >> np.uint64(_POS_BITS)
    pos = (cid >> np.uint64(1)) & np.uint64((1 << (_POS_BITS - 1)) - 1)
    orient = face & np.uint64(_SWAP)
    i = np.zeros_like(pos)
    j = np.zeros_like(pos)
    for k in range(MAX_LEVEL - 1, -1, -1):
        p = (pos >> np.uint64(2 * k)) & np.uint64(3)
        ij = _POS_TO_IJ_FLAT[(orient << np.uint64(2)) | p]
        i = (i << np.uint64(1)) | (ij >> np.uint64(1))
        j = (j << np.uint64(1)) | (ij & np.uint64(1))
        orient ^= _POS_TO_ORIENT[p]
    return face, i, j


def lnglat_to_leaf(lng_deg, lat_deg) -> np.ndarray:
    """Longitude/latitude (degrees) → S2 leaf (level-30) cell ids."""
    x, y, z = _xyz_from_lnglat(lng_deg, lat_deg)
    face, u, v = _face_uv_from_xyz(x, y, z)
    lim = np.int64((1 << MAX_LEVEL) - 1)
    i = np.clip(np.floor(_st_from_uv(u) * (1 << MAX_LEVEL)).astype(np.int64), 0, lim)
    j = np.clip(np.floor(_st_from_uv(v) * (1 << MAX_LEVEL)).astype(np.int64), 0, lim)
    return face_ij_to_id(face, i, j)


def leaf_to_lnglat(cell_id) -> tuple[np.ndarray, np.ndarray]:
    """Leaf cell id → (lng_deg, lat_deg) of the leaf-cell center."""
    face, i, j = id_to_face_ij(cell_id)
    s = (i.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    x, y, z = _xyz_from_face_uv(face.astype(np.int64), _uv_from_st(s), _uv_from_st(t))
    lat = np.degrees(np.arcsin(np.clip(z, -1.0, 1.0)))
    lng = np.degrees(np.arctan2(y, x))
    return lng, lat


def level_of(cell_id) -> np.ndarray:
    cid = np.asarray(cell_id, dtype=np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    # position of the single set bit, via float log2 (exact ≤ 2^63)
    return (MAX_LEVEL - (np.log2(lsb.astype(np.float64)).astype(np.int64) >> 1)).astype(
        np.int64
    )


def parent(cell_id, level: int) -> np.ndarray:
    """Ancestor of each cell at `level` (level ≤ the cell's own level)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level {level} outside [0, {MAX_LEVEL}]")
    cid = np.asarray(cell_id, dtype=np.uint64)
    new_lsb = np.uint64(1 << (2 * (MAX_LEVEL - level)))
    return (cid & ~(new_lsb - np.uint64(1)) & ~new_lsb) | new_lsb


def token(cell_id) -> np.ndarray:
    """Canonical hex token: 16 hex digits with trailing zeros stripped."""
    cid = np.asarray(cell_id, dtype=np.uint64).ravel()
    out = np.empty(cid.size, dtype=object)
    for n, c in enumerate(cid):
        out[n] = format(int(c), "016x").rstrip("0") or "X"
    return out


def token_to_id(tok: str) -> int:
    if tok == "X":
        return 0
    return int(tok.ljust(16, "0"), 16)


def leaf_scalar(lng_deg: float, lat_deg: float) -> int:
    """Scalar per-point reference walk (the driver-oracle witness path).

    Deliberately written as plain Python floats + an explicit per-level
    state walk, independent of the vectorized gather pipeline above, so a
    vectorization bug (dtype overflow, wrong gather axis, clip off-by-one)
    diverges from it."""
    import math

    lng, lat = math.radians(lng_deg), math.radians(lat_deg)
    x = math.cos(lat) * math.cos(lng)
    y = math.cos(lat) * math.sin(lng)
    z = math.sin(lat)
    comps = [x, y, z]
    axis = max(range(3), key=lambda a: abs(comps[a]))
    face = axis if comps[axis] >= 0 else axis + 3
    if face == 0:
        u, v = y / x, z / x
    elif face == 1:
        u, v = -x / y, z / y
    elif face == 2:
        u, v = -x / z, -y / z
    elif face == 3:
        u, v = z / x, y / x
    elif face == 4:
        u, v = z / y, -x / y
    else:
        u, v = -y / z, -x / z

    def st(w: float) -> float:
        return 0.5 * math.sqrt(1 + 3 * w) if w >= 0 else 1 - 0.5 * math.sqrt(1 - 3 * w)

    lim = (1 << MAX_LEVEL) - 1
    i = min(max(int(math.floor(st(u) * (1 << MAX_LEVEL))), 0), lim)
    j = min(max(int(math.floor(st(v) * (1 << MAX_LEVEL))), 0), lim)
    swap = bool(face & 1)
    invert = False
    pos = 0
    for k in range(MAX_LEVEL - 1, -1, -1):
        bi, bj = (i >> k) & 1, (j >> k) & 1
        # explicit orientation cases instead of table gathers
        a, b = (bj, bi) if swap else (bi, bj)
        if invert:
            a, b = 1 - a, 1 - b
        # canonical order (0,0),(0,1),(1,1),(1,0) → gray-code position
        p = {(0, 0): 0, (0, 1): 1, (1, 1): 2, (1, 0): 3}[(a, b)]
        pos = (pos << 2) | p
        if p == 0:
            swap = not swap
        elif p == 3:
            swap, invert = not swap, not invert
    return (face << _POS_BITS) | (pos << 1) | 1
