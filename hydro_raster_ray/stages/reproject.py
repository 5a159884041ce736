"""Reproject: nearest-resampling warp to a new CRS (``Raster.py:695-733``).

The reference's ``Raster.reproject`` wraps ``rasterio.warp.reproject``
(nearest resampling) to a new EPSG. The engine formulation is the same
gather shuffle as ``regrid_nearest``/``resample`` with a PLUGGABLE
coordinate transform (no pyproj in this environment):

- the target grid is derived once on the driver by forward-projecting a
  boundary sample of the source extent (corners + edge midpoints capture
  curvature) and snapping a bbox at the requested cellsize;
- each source tile forward-projects its own boundary sample to find the
  target tiles it can feed, then for each one BACK-projects that target
  tile's boundary sample to slice the exact source sub-rectangle (+ a
  curvature margin) it must ship — the same minimal-fragment discipline as
  ``stages/resample.py``;
- ``groupby(target cell)`` assembles the window and the nearest gather
  runs per target tile: target cell centre → inverse transform → source
  ``map2sub`` (the reference's nearest convention) → value; cells mapping
  outside the source extent become NaN (the warp fill).

Transforms ship as (forward, inverse) function pairs; ``AffineTransform``
covers rotation/scale/translation (all SQL/witness-checkable), and
``web_mercator``/``inv_web_mercator`` give one real non-linear projection
(public spherical-Mercator formulas) for lon/lat-degree grids.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..codecs import decode, encode, phash64
from ..grid import GridSpec, TileScheme, map2sub, morton_encode, sub2map, tile_id
from ..sources.tiles import TileSet
from .decode import iter_tiles
from .mosaic import _frag_table

__all__ = [
    "AffineTransform",
    "TransverseMercator",
    "LambertConformalConic",
    "AlbersEqualArea",
    "bng_tmerc",
    "lambert93",
    "conus_albers",
    "utm_tmerc",
    "compose",
    "web_mercator",
    "inv_web_mercator",
    "epsg_transform",
    "crs_transform",
    "reproject",
    "reproject_epsg",
]

_R = 6378137.0  # spherical web-mercator radius


@dataclass(frozen=True)
class AffineTransform:
    """x' = a·x + b·y + c ; y' = d·x + e·y + f."""

    a: float
    b: float
    c: float
    d: float
    e: float
    f: float

    def __call__(self, x, y):
        return self.a * x + self.b * y + self.c, self.d * x + self.e * y + self.f

    def inverse(self) -> "AffineTransform":
        det = self.a * self.e - self.b * self.d
        ia, ib = self.e / det, -self.b / det
        id_, ie = -self.d / det, self.a / det
        return AffineTransform(
            ia, ib, -(ia * self.c + ib * self.f),
            id_, ie, -(id_ * self.c + ie * self.f),
        )

    @staticmethod
    def rotation(theta_deg: float, cx: float = 0.0, cy: float = 0.0) -> "AffineTransform":
        t = np.deg2rad(theta_deg)
        ct, st = float(np.cos(t)), float(np.sin(t))
        return AffineTransform(
            ct, -st, cx - ct * cx + st * cy, st, ct, cy - st * cx - ct * cy
        )


@dataclass(frozen=True)
class TransverseMercator:
    """Ellipsoidal transverse Mercator (the EPSG:27700 projection math —
    the reference's own sample CRS, ``Raster.py:773``), pure numpy.

    Standard published series (Ordnance Survey "A guide to coordinate
    systems in Great Britain", appendix C): ``forward`` maps geographic
    degrees (lon, lat) on the ellipsoid → grid eastings/northings;
    ``inverse`` maps back. Defaults are British National Grid on Airy 1830
    (this is the map-projection half of EPSG:27700; an OSGB36↔WGS84
    Helmert datum shift would compose in front of it and is out of scope).
    The inverse's meridional-arc iteration runs a FIXED count so results
    are bit-identical regardless of how cells are batched across tiles —
    the determinism requirement of the witness/oracle gate."""

    a: float = 6377563.396  # Airy 1830 semi-major
    b: float = 6356256.909  # Airy 1830 semi-minor
    f0: float = 0.9996012717  # central-meridian scale
    lat0: float = 49.0  # true origin (deg)
    lon0: float = -2.0
    e0: float = 400000.0  # false easting / northing
    n0: float = -100000.0
    iters: int = 10

    def _arc(self, phi: np.ndarray) -> np.ndarray:
        a, b = self.a, self.b
        n = (a - b) / (a + b)
        p0 = np.deg2rad(self.lat0)
        dp, sp = phi - p0, phi + p0
        return b * self.f0 * (
            (1 + n + 1.25 * n**2 + 1.25 * n**3) * dp
            - (3 * n + 3 * n**2 + 21 / 8 * n**3) * np.sin(dp) * np.cos(sp)
            + (15 / 8 * (n**2 + n**3)) * np.sin(2 * dp) * np.cos(2 * sp)
            - (35 / 24 * n**3) * np.sin(3 * dp) * np.cos(3 * sp)
        )

    def _nu_rho_eta2(self, phi: np.ndarray):
        a, b = self.a, self.b
        e2 = (a**2 - b**2) / a**2
        s2 = np.sin(phi) ** 2
        nu = a * self.f0 / np.sqrt(1 - e2 * s2)
        rho = a * self.f0 * (1 - e2) * (1 - e2 * s2) ** -1.5
        return nu, rho, nu / rho - 1

    def forward(self, lon, lat):
        phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
        lam = np.deg2rad(np.asarray(lon, dtype=np.float64))
        dl = lam - np.deg2rad(self.lon0)
        nu, rho, eta2 = self._nu_rho_eta2(phi)
        sp, cp, tp = np.sin(phi), np.cos(phi), np.tan(phi)
        I = self._arc(phi) + self.n0
        II = nu / 2 * sp * cp
        III = nu / 24 * sp * cp**3 * (5 - tp**2 + 9 * eta2)
        IIIA = nu / 720 * sp * cp**5 * (61 - 58 * tp**2 + tp**4)
        IV = nu * cp
        V = nu / 6 * cp**3 * (nu / rho - tp**2)
        VI = nu / 120 * cp**5 * (5 - 18 * tp**2 + tp**4 + 14 * eta2 - 58 * tp**2 * eta2)
        N = I + II * dl**2 + III * dl**4 + IIIA * dl**6
        E = self.e0 + IV * dl + V * dl**3 + VI * dl**5
        return E, N

    def inverse(self, E, N):
        E = np.asarray(E, dtype=np.float64)
        N = np.asarray(N, dtype=np.float64)
        af0 = self.a * self.f0
        phi = (N - self.n0) / af0 + np.deg2rad(self.lat0)
        for _ in range(self.iters):  # fixed count: batch-invariant
            phi = phi + (N - self.n0 - self._arc(phi)) / af0
        nu, rho, eta2 = self._nu_rho_eta2(phi)
        tp, sec = np.tan(phi), 1.0 / np.cos(phi)
        VII = tp / (2 * rho * nu)
        VIII = tp / (24 * rho * nu**3) * (5 + 3 * tp**2 + eta2 - 9 * tp**2 * eta2)
        IX = tp / (720 * rho * nu**5) * (61 + 90 * tp**2 + 45 * tp**4)
        X = sec / nu
        XI = sec / (6 * nu**3) * (nu / rho + 2 * tp**2)
        XII = sec / (120 * nu**5) * (5 + 28 * tp**2 + 24 * tp**4)
        XIIA = sec / (5040 * nu**7) * (61 + 662 * tp**2 + 1320 * tp**4 + 720 * tp**6)
        dE = E - self.e0
        lat = phi - VII * dE**2 + VIII * dE**4 - IX * dE**6
        lon = (
            np.deg2rad(self.lon0)
            + X * dE - XI * dE**3 + XII * dE**5 - XIIA * dE**7
        )
        return np.rad2deg(lon), np.rad2deg(lat)


bng_tmerc = TransverseMercator()  # EPSG:27700 projection constants


def utm_tmerc(zone: int, south: bool = False) -> TransverseMercator:
    """UTM zone as a ``TransverseMercator`` parameterization — WGS84
    ellipsoid, k0 = 0.9996, central meridian −183° + 6°·zone, false easting
    500 km, false northing 0 (north) / 10 000 km (south). Covers the
    dominant family of projected CRSs the reference warps between
    (``Raster.py:695-733``) with the same series math as BNG."""
    if not 1 <= int(zone) <= 60:
        raise ValueError(f"UTM zone must be 1..60, got {zone}")
    return TransverseMercator(
        a=6378137.0,
        b=6356752.314245,  # a·(1 − 1/298.257223563)
        f0=0.9996,
        lat0=0.0,
        lon0=-183.0 + 6.0 * int(zone),
        e0=500000.0,
        n0=10000000.0 if south else 0.0,
    )


@dataclass(frozen=True)
class LambertConformalConic:
    """Ellipsoidal Lambert conformal conic, two standard parallels —
    Snyder 1987 ("Map Projections: A Working Manual", USGS PP 1395, §15,
    eqs 14-15, 15-1..15-11; public literature), pure numpy. Together with
    the TM core this covers the second dominant projected-CRS family the
    reference warps between (``Raster.py:695-733``). Defaults are the
    RGF93 / Lambert-93 projection constants (EPSG:2154, GRS80 ellipsoid —
    projection math only, no datum shift, same scoping as BNG/UTM). The
    inverse's latitude iteration runs a FIXED count so results are
    bit-identical regardless of how cells are batched across tiles."""

    a: float = 6378137.0  # GRS80 semi-major
    b: float = 6356752.314140356  # GRS80 semi-minor
    sp1: float = 44.0  # standard parallels (deg)
    sp2: float = 49.0
    lat0: float = 46.5  # grid origin (deg)
    lon0: float = 3.0
    e0: float = 700000.0  # false easting / northing
    n0: float = 6600000.0
    iters: int = 12

    def _e(self) -> float:
        return float(np.sqrt(1.0 - (self.b / self.a) ** 2))

    def _m(self, phi):
        e = self._e()
        return np.cos(phi) / np.sqrt(1.0 - (e * np.sin(phi)) ** 2)

    def _t(self, phi):
        e = self._e()
        s = np.sin(phi)
        return np.tan(np.pi / 4.0 - phi / 2.0) / (
            (1.0 - e * s) / (1.0 + e * s)
        ) ** (e / 2.0)

    def _consts(self):
        p1, p2 = np.deg2rad(self.sp1), np.deg2rad(self.sp2)
        p0 = np.deg2rad(self.lat0)
        m1, m2 = self._m(p1), self._m(p2)
        t0, t1, t2 = self._t(p0), self._t(p1), self._t(p2)
        n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
        F = m1 / (n * t1**n)
        rho0 = self.a * F * t0**n
        return n, F, rho0

    def forward(self, lon, lat):
        phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
        lam = np.deg2rad(np.asarray(lon, dtype=np.float64))
        n, F, rho0 = self._consts()
        rho = self.a * F * self._t(phi) ** n
        th = n * (lam - np.deg2rad(self.lon0))
        return self.e0 + rho * np.sin(th), self.n0 + rho0 - rho * np.cos(th)

    def inverse(self, E, N):
        E = np.asarray(E, dtype=np.float64)
        N = np.asarray(N, dtype=np.float64)
        n, F, rho0 = self._consts()
        e = self._e()
        dx, dy = E - self.e0, rho0 - (N - self.n0)
        rho = np.sign(n) * np.sqrt(dx**2 + dy**2)
        th = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
        t = (rho / (self.a * F)) ** (1.0 / n)
        phi = np.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(self.iters):  # fixed count: batch-invariant
            s = e * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - s) / (1.0 + s)) ** (e / 2.0)
            )
        lam = th / n + np.deg2rad(self.lon0)
        return np.rad2deg(lam), np.rad2deg(phi)


@dataclass(frozen=True)
class AlbersEqualArea:
    """Ellipsoidal Albers equal-area conic, two standard parallels —
    Snyder 1987 §14 (eqs 3-12, 14-12..14-21, 3-16; public literature),
    pure numpy. The authalic complement of the conformal conic: the
    continental-statistics family (EPSG:5070-style CRSs). Defaults are
    the NAD83 / Conus Albers projection constants (EPSG:5070, GRS80 —
    projection math only, no datum shift). Fixed-count inverse iteration
    for batch invariance."""

    a: float = 6378137.0
    b: float = 6356752.314140356
    sp1: float = 29.5
    sp2: float = 45.5
    lat0: float = 23.0
    lon0: float = -96.0
    e0: float = 0.0
    n0: float = 0.0
    iters: int = 12

    def _e2(self) -> float:
        return float(1.0 - (self.b / self.a) ** 2)

    def _m(self, phi):
        e2 = self._e2()
        return np.cos(phi) / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)

    def _q(self, phi):
        e2 = self._e2()
        e = np.sqrt(e2)
        s = np.sin(phi)
        return (1.0 - e2) * (
            s / (1.0 - e2 * s**2)
            - (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
        )

    def _consts(self):
        p1, p2 = np.deg2rad(self.sp1), np.deg2rad(self.sp2)
        p0 = np.deg2rad(self.lat0)
        m1, m2 = self._m(p1), self._m(p2)
        q0, q1, q2 = self._q(p0), self._q(p1), self._q(p2)
        n = (m1**2 - m2**2) / (q2 - q1)
        C = m1**2 + n * q1
        rho0 = self.a * np.sqrt(C - n * q0) / n
        return n, C, rho0

    def forward(self, lon, lat):
        phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
        lam = np.deg2rad(np.asarray(lon, dtype=np.float64))
        n, C, rho0 = self._consts()
        rho = self.a * np.sqrt(C - n * self._q(phi)) / n
        th = n * (lam - np.deg2rad(self.lon0))
        return self.e0 + rho * np.sin(th), self.n0 + rho0 - rho * np.cos(th)

    def inverse(self, E, N):
        E = np.asarray(E, dtype=np.float64)
        N = np.asarray(N, dtype=np.float64)
        n, C, rho0 = self._consts()
        e2 = self._e2()
        e = np.sqrt(e2)
        dx, dy = E - self.e0, rho0 - (N - self.n0)
        rho = np.sqrt(dx**2 + dy**2)
        th = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
        q = (C - (rho * n / self.a) ** 2) / n
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        for _ in range(self.iters):  # Snyder eq. 3-16, fixed count
            s = np.sin(phi)
            phi = phi + (1.0 - e2 * s**2) ** 2 / (2.0 * np.cos(phi)) * (
                q / (1.0 - e2)
                - s / (1.0 - e2 * s**2)
                + (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
            )
        lam = th / n + np.deg2rad(self.lon0)
        return np.rad2deg(lam), np.rad2deg(phi)


@dataclass(frozen=True)
class PolarStereographic:
    """Ellipsoidal polar stereographic, standard-parallel form (Snyder
    1987 §21 eqs 21-33..21-41 / EPSG "variant B"; public literature),
    pure numpy — the polar-region family (NSIDC sea-ice and Antarctic
    grids, EPSG:3413/3031-style CRSs; projection math only, no datum
    shift, same scoping as the TM/conic families). ``lat_ts`` < 0 selects
    the south aspect (internally the north formulas at mirrored latitude
    with the northing sign flipped — the variant-B axis convention:
    north aspect N decreases toward ``lon0``, south aspect N increases
    toward ``lon0``). Conformal, so validated like the conic families by
    invariants: exact round-trips, unit scale on the standard parallel,
    isotropic local scale, pole → grid origin. Fixed-count inverse
    iteration for batch invariance."""

    a: float = 6378137.0  # WGS84 semi-major
    b: float = 6356752.314245179  # WGS84 semi-minor
    lat_ts: float = 70.0  # standard parallel (deg; sign picks the aspect)
    lon0: float = -45.0
    e0: float = 0.0
    n0: float = 0.0
    iters: int = 12

    def _e(self) -> float:
        return float(np.sqrt(1.0 - (self.b / self.a) ** 2))

    def _t(self, phi):
        e = self._e()
        s = np.sin(phi)
        return np.tan(np.pi / 4.0 - phi / 2.0) / (
            (1.0 - e * s) / (1.0 + e * s)
        ) ** (e / 2.0)

    def _consts(self):
        sg = -1.0 if self.lat_ts < 0 else 1.0
        pc = np.deg2rad(sg * self.lat_ts)  # positive in both aspects
        e = self._e()
        mc = np.cos(pc) / np.sqrt(1.0 - (e * np.sin(pc)) ** 2)
        return sg, float(mc), float(self._t(pc))

    def forward(self, lon, lat):
        phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
        lam = np.deg2rad(np.asarray(lon, dtype=np.float64))
        sg, mc, tc = self._consts()
        rho = self.a * mc * self._t(sg * phi) / tc
        th = lam - np.deg2rad(self.lon0)
        return self.e0 + rho * np.sin(th), self.n0 - sg * rho * np.cos(th)

    def inverse(self, E, N):
        E = np.asarray(E, dtype=np.float64)
        N = np.asarray(N, dtype=np.float64)
        sg, mc, tc = self._consts()
        e = self._e()
        dx = E - self.e0
        dy = sg * (self.n0 - N)
        rho = np.sqrt(dx**2 + dy**2)
        t = rho * tc / (self.a * mc)
        phi = np.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(self.iters):  # fixed count: batch-invariant
            s = e * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - s) / (1.0 + s)) ** (e / 2.0)
            )
        lam = np.arctan2(dx, dy) + np.deg2rad(self.lon0)
        return np.rad2deg(lam), np.rad2deg(sg * phi)


lambert93 = LambertConformalConic()  # EPSG:2154 projection constants
conus_albers = AlbersEqualArea()  # EPSG:5070 projection constants
nsidc_north = PolarStereographic()  # EPSG:3413 projection constants
antarctic_south = PolarStereographic(lat_ts=-71.0, lon0=0.0)  # EPSG:3031


def compose(outer, inner):
    """Coordinate-transform composition ``(x, y) → outer(*inner(x, y))`` —
    e.g. projected→projected warps via geographic coordinates:
    ``fwd = compose(utm.forward, bng.inverse)``."""

    def h(x, y):
        return outer(*inner(x, y))

    return h


def _ident(x, y):
    return x, y


# ---------------------------------------------------------------------------
# EPSG parameter registry — public EPSG-registry projection parameters for
# the four implemented families, so ``epsg_transform`` is table-driven
# rather than a handful of if-branches (the reference warps between
# arbitrary EPSG codes via PROJ, ``Raster.py:695-733``; the engine covers
# the same families data-driven). Projection math only (module-wide
# scoping): codes on non-WGS84 datums use their own ellipsoid, but no
# Helmert shift is applied.

_ELLIPSOIDS = {
    "WGS84": (6378137.0, 6356752.314245179),
    "GRS80": (6378137.0, 6356752.314140356),
    "Airy1830": (6377563.396, 6356256.909),
    "AiryModified": (6377340.189, 6356034.448),
    "Intl1924": (6378388.0, 6356911.9461279465),
    "Clarke1866": (6378206.4, 6356583.8),
}

# Transverse Mercator: code → (ellipsoid, k0, lat0, lon0, FE, FN)
_EPSG_TM = {
    27700: ("Airy1830", 0.9996012717, 49.0, -2.0, 400000.0, -100000.0),
    2157: ("GRS80", 0.99982, 53.5, -8.0, 600000.0, 750000.0),  # Irish TM
    29902: ("AiryModified", 1.000035, 53.5, -8.0, 200000.0, 250000.0),
    2193: ("GRS80", 0.9996, 0.0, 173.0, 1600000.0, 10000000.0),  # NZTM2000
    2180: ("GRS80", 0.9993, 0.0, 19.0, 500000.0, -5300000.0),  # Poland CS92
}
# Lambert conformal conic (2SP): code → (ellipsoid, sp1, sp2, lat0, lon0,
# FE, FN)
_EPSG_LCC = {
    2154: ("GRS80", 44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0),
    3978: ("GRS80", 49.0, 77.0, 49.0, -95.0, 0.0, 0.0),  # Canada Atlas
    31370: (  # Belge Lambert 72 (pole-origin 2SP; projection only)
        "Intl1924", 51.16666723333333, 49.8333339, 90.0,
        4.367486666666666, 150000.013, 5400088.438,
    ),
}
for _i in range(9):  # RGF93 conic-conformal zones CC42..CC50
    _lat = 42.0 + _i
    _EPSG_LCC[3942 + _i] = (
        "GRS80", _lat - 0.75, _lat + 0.75, _lat, 3.0,
        1700000.0, 1200000.0 + _i * 1000000.0,
    )
# Albers equal-area (2SP): code → (ellipsoid, sp1, sp2, lat0, lon0, FE, FN)
_EPSG_ALBERS = {
    5070: ("GRS80", 29.5, 45.5, 23.0, -96.0, 0.0, 0.0),
    3577: ("GRS80", -18.0, -36.0, 0.0, 132.0, 0.0, 0.0),  # GDA94 Australia
    3310: ("GRS80", 34.0, 40.5, 0.0, -120.0, 0.0, -4000000.0),  # California
}
# Polar stereographic (variant B): code → (ellipsoid, lat_ts, lon0, FE, FN)
_EPSG_STEREO = {
    3413: ("WGS84", 70.0, -45.0, 0.0, 0.0),  # NSIDC Sea Ice North
    3031: ("WGS84", -71.0, 0.0, 0.0, 0.0),  # Antarctic Polar Stereographic
    3976: ("WGS84", -70.0, 0.0, 0.0, 0.0),  # NSIDC Sea Ice South
    3995: ("WGS84", 71.0, 0.0, 0.0, 0.0),  # Arctic Polar Stereographic
}
# UTM zone ranges: (lo, hi, ellipsoid, first zone, south)
_EPSG_UTM_RANGES = (
    (32601, 32660, "WGS84", 1, False),
    (32701, 32760, "WGS84", 1, True),
    (25828, 25838, "GRS80", 28, False),  # ETRS89 / UTM 28N..38N
    (26901, 26923, "GRS80", 1, False),  # NAD83 / UTM 1N..23N
    (26701, 26722, "Clarke1866", 1, False),  # NAD27 / UTM 1N..22N
)


def epsg_transform(code: int):
    """(forward, inverse) between geographic degrees (lon, lat) and EPSG
    ``code``'s native coordinates, table-driven over the implemented
    projection families: 4326 (geographic), 3857 (spherical web
    mercator), the UTM zone ranges in ``_EPSG_UTM_RANGES``, and every
    code registered in ``_EPSG_TM`` / ``_EPSG_LCC`` / ``_EPSG_ALBERS`` /
    ``_EPSG_STEREO`` (public EPSG parameters; extend those dicts for
    further codes of the same families). This is the engine's analog of
    the reference's arbitrary-EPSG warp entry point
    (``Raster.py:695-733``); codes of unimplemented families raise with
    that scoping stated."""
    code = int(code)
    if code == 4326:
        return _ident, _ident
    if code == 3857:
        return web_mercator, inv_web_mercator
    for lo, hi, ell, z0, south in _EPSG_UTM_RANGES:
        if lo <= code <= hi:
            a, b = _ELLIPSOIDS[ell]
            t = TransverseMercator(
                a=a, b=b, f0=0.9996, lat0=0.0,
                lon0=-183.0 + 6.0 * (z0 + code - lo),
                e0=500000.0, n0=10000000.0 if south else 0.0,
            )
            return t.forward, t.inverse
    if code in _EPSG_TM:
        ell, k0, lat0, lon0, fe, fn = _EPSG_TM[code]
        a, b = _ELLIPSOIDS[ell]
        t = TransverseMercator(
            a=a, b=b, f0=k0, lat0=lat0, lon0=lon0, e0=fe, n0=fn
        )
        return t.forward, t.inverse
    if code in _EPSG_LCC:
        ell, sp1, sp2, lat0, lon0, fe, fn = _EPSG_LCC[code]
        a, b = _ELLIPSOIDS[ell]
        t = LambertConformalConic(
            a=a, b=b, sp1=sp1, sp2=sp2, lat0=lat0, lon0=lon0, e0=fe, n0=fn
        )
        return t.forward, t.inverse
    if code in _EPSG_ALBERS:
        ell, sp1, sp2, lat0, lon0, fe, fn = _EPSG_ALBERS[code]
        a, b = _ELLIPSOIDS[ell]
        t = AlbersEqualArea(
            a=a, b=b, sp1=sp1, sp2=sp2, lat0=lat0, lon0=lon0, e0=fe, n0=fn
        )
        return t.forward, t.inverse
    if code in _EPSG_STEREO:
        ell, lat_ts, lon0, fe, fn = _EPSG_STEREO[code]
        a, b = _ELLIPSOIDS[ell]
        t = PolarStereographic(
            a=a, b=b, lat_ts=lat_ts, lon0=lon0, e0=fe, n0=fn
        )
        return t.forward, t.inverse
    raise ValueError(
        f"EPSG:{code} is outside the registered codes of the supported "
        "projection families (geographic, web mercator, transverse "
        "Mercator/UTM, Lambert conformal conic, Albers equal-area, polar "
        "stereographic) — add its parameters to the _EPSG_* registry "
        "tables; datum-shifted CRSs need a Helmert step composed in "
        "front (out of scope per SURVEY §2.4)"
    )


def crs_transform(src_epsg: int, dst_epsg: int):
    """(fwd, inv) mapping ``src_epsg`` native coords ↔ ``dst_epsg`` native
    coords, composed through geographic degrees."""
    sf, si = epsg_transform(src_epsg)
    df, di = epsg_transform(dst_epsg)
    return compose(df, si), compose(sf, di)


def web_mercator(lon, lat):
    """WGS84 degrees → spherical web-mercator metres (EPSG:3857 formulas)."""
    x = _R * np.deg2rad(lon)
    y = _R * np.log(np.tan(np.pi / 4.0 + np.deg2rad(lat) / 2.0))
    return x, y


def inv_web_mercator(x, y):
    lon = np.rad2deg(x / _R)
    lat = np.rad2deg(2.0 * np.arctan(np.exp(y / _R)) - np.pi / 2.0)
    return lon, lat


def _boundary_sample(x0, x1, y0, y1, n: int = 5):
    """n×n sample of a bbox including its boundary."""
    xs = np.linspace(x0, x1, n)
    ys = np.linspace(y0, y1, n)
    X, Y = np.meshgrid(xs, ys)
    return X.ravel(), Y.ravel()


def target_grid_for(
    src: GridSpec, fwd, new_cellsize: float, crs: str = "custom"
) -> GridSpec:
    """Destination grid: forward-project the source extent boundary, snap
    the bbox outward at the new cellsize (``rasterio.warp`` convention of
    covering the full reprojected footprint)."""
    e = src.extent
    bx, by = _boundary_sample(e[0], e[1], e[2], e[3], 9)
    tx, ty = fwd(bx, by)
    ncols = int(np.ceil((tx.max() - tx.min()) / new_cellsize))
    nrows = int(np.ceil((ty.max() - ty.min()) / new_cellsize))
    return GridSpec(
        ncols=ncols,
        nrows=nrows,
        xllcorner=float(tx.min()),
        yllcorner=float(ty.min()),
        cellsize=float(new_cellsize),
        nodata=src.nodata,
        crs=crs,
    )


def reproject(
    ts: TileSet,
    fwd,
    inv,
    new_cellsize: float,
    crs: str = "custom",
    tile_h: int = 64,
    tile_w: int = 64,
    margin: int = 3,
    shuffle_blocks: int | None = None,
    exchange: str = "files",
) -> TileSet:
    """Warp the mosaic into the CRS defined by ``fwd``/``inv`` (forward =
    source→target coords), nearest resampling, NaN fill.

    ``exchange="files"`` (default) routes fragments through the map-side
    bucket-file exchange (``stages/exchange.py`` — no sort barrier
    throttling the emit stage; measured 1.2-2× on the bench warp);
    ``"sort"`` keeps Ray's groupby shuffle (the fallback when no
    cluster-shared exchange directory exists)."""
    src = ts.grid
    new_spec = target_grid_for(src, fwd, new_cellsize, crs)
    target = TileScheme(grid=new_spec, tile_h=tile_h, tile_w=tile_w)
    grid = ts.grid

    def emit(batch: pa.Table) -> pa.Table:
        out = []
        # f32 planes: lossless by codec contract, raw-f32 decodes zero-copy
        for info, arr in iter_tiles(batch, grid, dtype=np.float32):
            # forward-project this tile's footprint → candidate target tiles
            sx0 = src.xllcorner + info.gc0 * src.cellsize
            sy1 = src.yllcorner + (src.nrows - info.gr0) * src.cellsize
            sx1 = sx0 + info.w * src.cellsize
            sy0 = sy1 - info.h * src.cellsize
            bx, by = _boundary_sample(sx0, sx1, sy0, sy1, 5)
            tx, ty = fwd(bx, by)
            pad = margin * new_spec.cellsize
            tr0, tc0 = map2sub(
                np.array([tx.min() - pad, tx.max() + pad]),
                np.array([ty.max() + pad, ty.min() - pad]),
                new_spec,
            )
            t_rows = np.arange(
                max(0, int(tr0.min()) // tile_h),
                min((new_spec.nrows - 1) // tile_h, int(tr0.max()) // tile_h) + 1,
            )
            t_cols = np.arange(
                max(0, int(tc0.min()) // tile_w),
                min((new_spec.ncols - 1) // tile_w, int(tc0.max()) // tile_w) + 1,
            )
            for utr in t_rows:
                for utc in t_cols:
                    # back-project the target tile footprint → needed source
                    # sub-rectangle (+ margin)
                    th, tw = target.tile_shape(int(utr), int(utc))
                    ttr0, ttc0 = target.tile_origin_rc(int(utr), int(utc))
                    gx0 = new_spec.xllcorner + ttc0 * new_spec.cellsize
                    gy1 = new_spec.yllcorner + (new_spec.nrows - ttr0) * new_spec.cellsize
                    gx1 = gx0 + tw * new_spec.cellsize
                    gy0 = gy1 - th * new_spec.cellsize
                    qx, qy = _boundary_sample(gx0, gx1, gy0, gy1, 5)
                    sxq, syq = inv(qx, qy)
                    rr, cc = map2sub(
                        np.array([sxq.min(), sxq.max()]),
                        np.array([syq.max(), syq.min()]),
                        src,
                    )
                    r_lo = max(int(rr.min()) - margin, info.gr0)
                    r_hi = min(int(rr.max()) + margin + 1, info.gr0 + info.h)
                    c_lo = max(int(cc.min()) - margin, info.gc0)
                    c_hi = min(int(cc.max()) + margin + 1, info.gc0 + info.w)
                    if r_hi <= r_lo or c_hi <= c_lo:
                        continue
                    frag = arr[
                        r_lo - info.gr0 : r_hi - info.gr0,
                        c_lo - info.gc0 : c_hi - info.gc0,
                    ]
                    out.append(
                        {
                            "tkey": int(morton_encode(int(utr), int(utc))),
                            "t_tr": int(utr),
                            "t_tc": int(utc),
                            "prio": 0,
                            "fr0": 0,
                            "fc0": 0,
                            "fh": frag.shape[0],
                            "fw": frag.shape[1],
                            "payload": encode(np.ascontiguousarray(frag), "raw-f32"),
                            "src_r0": r_lo,
                            "src_c0": c_lo,
                        }
                    )
        return _frag_table(out)

    def build(g: pa.Table) -> pa.Table:
        t_tr = int(g["t_tr"][0].as_py())
        t_tc = int(g["t_tc"][0].as_py())
        th, tw = target.tile_shape(t_tr, t_tc)
        tr0, tc0 = target.tile_origin_rc(t_tr, t_tc)
        # seed rows (fh == 0) exist so every target tile is built, even ones
        # entirely outside the warped source footprint (NaN fill)
        real = np.nonzero(g["fh"].to_numpy(zero_copy_only=False) > 0)[0]
        r0s = g["src_r0"].to_numpy(zero_copy_only=False)[real]
        c0s = g["src_c0"].to_numpy(zero_copy_only=False)[real]
        fhs = g["fh"].to_numpy(zero_copy_only=False)[real]
        fws = g["fw"].to_numpy(zero_copy_only=False)[real]
        if real.size:
            win_r0 = int(r0s.min())
            win_c0 = int(c0s.min())
            # f32 window + canvas: the warp is a nearest GATHER (value-
            # preserving), so f32 planes are bit-exact and halve the traffic
            win = np.full(
                (int((r0s + fhs).max()) - win_r0, int((c0s + fws).max()) - win_c0),
                np.nan,
                dtype=np.float32,
            )
            for k, i in enumerate(real):
                frag = decode(
                    g["payload"][int(i)].as_py(), int(fhs[k]), int(fws[k]), "raw-f32",
                    dtype=np.float32,
                )
                win[
                    int(r0s[k]) - win_r0 : int(r0s[k]) - win_r0 + int(fhs[k]),
                    int(c0s[k]) - win_c0 : int(c0s[k]) - win_c0 + int(fws[k]),
                ] = frag
        else:
            win_r0 = win_c0 = 0
            win = np.full((0, 0), np.nan, dtype=np.float32)
        # nearest gather: target cell centres → inverse → source map2sub
        X, Y = sub2map(np.arange(tr0, tr0 + th), np.arange(tc0, tc0 + tw), new_spec)
        XX, YY = np.meshgrid(X, Y)
        sxq, syq = inv(XX.ravel(), YY.ravel())
        rr, cc = map2sub(sxq, syq, src)
        valid = (rr >= 0) & (rr < src.nrows) & (cc >= 0) & (cc < src.ncols)
        rw = rr - win_r0
        cw = cc - win_c0
        in_win = valid & (rw >= 0) & (rw < win.shape[0]) & (cw >= 0) & (cw < win.shape[1])
        canvas = np.full(th * tw, np.nan, dtype=np.float32)
        canvas[in_win] = win[rw[in_win], cw[in_win]]
        canvas = canvas.reshape(th, tw)
        img = tile_id(t_tr, t_tc)
        buf = encode(canvas, "raw-f32")
        truth = decode(buf, th, tw, "raw-f32")
        return pa.table(
            {
                "image_id": pa.array([img], pa.string()),
                "bytes": pa.array([buf], pa.binary()),
                "w": pa.array([tw], pa.int32()),
                "h": pa.array([th], pa.int32()),
                "fmt": pa.array(["raw-f32"], pa.string()),
                "caption": pa.array(
                    [f"DEM tile {img} cellsize={new_spec.cellsize} crs={new_spec.crs}"],
                    pa.string(),
                ),
                "phash": pa.array([phash64(truth)], pa.int64()),
                "tile_row": pa.array([t_tr], pa.int32()),
                "tile_col": pa.array([t_tc], pa.int32()),
                "gr0": pa.array([tr0], pa.int32()),
                "gc0": pa.array([tc0], pa.int32()),
                "cell": pa.array([int(morton_encode(t_tr, t_tc))], pa.int64()),
            }
        )

    # seed every target tile so empty (all-NaN) tiles are still produced
    import ray.data

    seeds = []
    for utr in range(target.n_tile_rows):
        for utc in range(target.n_tile_cols):
            seeds.append(
                {
                    "tkey": int(morton_encode(utr, utc)),
                    "t_tr": utr,
                    "t_tc": utc,
                    "prio": 0,
                    "fr0": 0,
                    "fc0": 0,
                    "fh": 0,
                    "fw": 0,
                    "payload": b"",
                    "src_r0": 0,
                    "src_c0": 0,
                }
            )
    seed_ds = ray.data.from_arrow(_frag_table(seeds))
    frags = ts.ds.map_batches(emit, batch_format="pyarrow", batch_size=None).union(
        seed_ds
    )
    if exchange == "files":
        from .exchange import fragment_exchange

        built = fragment_exchange(frags, build, key="tkey")
        return TileSet(ds=built, grid=new_spec)
    if shuffle_blocks is None:
        from .cc import auto_shuffle_blocks

        shuffle_blocks = auto_shuffle_blocks(floor=64)
    frags = frags.repartition(shuffle_blocks)
    built = frags.groupby("tkey").map_groups(build, batch_format="pyarrow")
    return TileSet(ds=built, grid=new_spec)


def reproject_epsg(
    ts: TileSet,
    src_epsg: int,
    dst_epsg: int,
    new_cellsize: float,
    **kw,
) -> TileSet:
    """Warp between two EPSG CRSs by code — the reference's
    ``Raster.reproject(dst_crs)`` API shape (``Raster.py:695-733``) over the
    engine's supported projection families (see ``epsg_transform``)."""
    fwd, inv = crs_transform(src_epsg, dst_epsg)
    return reproject(ts, fwd, inv, new_cellsize, crs=f"EPSG:{int(dst_epsg)}", **kw)
