"""CRS registry + from-scratch projection math (no PROJ in this
environment).

Reference contract: OGRCoordinateTransformation (ogr/ogrct.cpp:2263)
transforms between arbitrary CRS pairs via PROJ. Our v2 surface covers
the pairs the engine's operators use, routed through a lon/lat hub:

  EPSG:4326          identity hub
  EPSG:3857          spherical web-mercator (geo/mercator.py — the
                     gdal2tiles formulas, bit-stable across numpy/
                     Column/SQL forms)
  EPSG:326xx/327xx   WGS84 UTM north/south zones — ellipsoidal
                     transverse Mercator by the Krüger/Karney series
                     (C.F.F. Karney, "Transverse Mercator with an
                     accuracy of a few nanometers", J. Geodesy 85,
                     2011; series to n^4, sub-mm for |λ−λ0| ≤ 3°),
                     implemented from the published formulas.

All functions are vectorized numpy (float64), used inside Arrow-batched
tile tasks; adding a CRS is registering two functions.
"""

from __future__ import annotations

import numpy as np

from . import mercator

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_E = np.sqrt(_F * (2.0 - _F))
_N = _F / (2.0 - _F)
_K0 = 0.9996
_E0 = 500000.0
_N0_SOUTH = 10000000.0

# Krüger/Karney alpha (forward) and beta (inverse) series, terms to n^4
_n = _N
_ALPHA = (
    _n / 2.0 - 2.0 * _n**2 / 3.0 + 5.0 * _n**3 / 16.0 + 41.0 * _n**4 / 180.0,
    13.0 * _n**2 / 48.0 - 3.0 * _n**3 / 5.0 + 557.0 * _n**4 / 1440.0,
    61.0 * _n**3 / 240.0 - 103.0 * _n**4 / 140.0,
    49561.0 * _n**4 / 161280.0,
)
_BETA = (
    _n / 2.0 - 2.0 * _n**2 / 3.0 + 37.0 * _n**3 / 96.0 - _n**4 / 360.0,
    _n**2 / 48.0 + _n**3 / 15.0 - 437.0 * _n**4 / 1440.0,
    17.0 * _n**3 / 480.0 - 37.0 * _n**4 / 840.0,
    4397.0 * _n**4 / 161280.0,
)
_ABAR = _A / (1.0 + _n) * (1.0 + _n**2 / 4.0 + _n**4 / 64.0)


def utm_zone_lon0(zone: int) -> float:
    return -183.0 + 6.0 * zone


class _TM:
    """Generic ellipsoidal Transverse Mercator (Krüger/Karney series,
    same math as the UTM path but with arbitrary ellipsoid, central
    meridian/latitude, scale, and false origin — the EPSG:27700 class
    the reference reaches through PROJ's tmerc). Datum shifts need
    grid files PROJ itself lacks here, so — like the LCC/Albers
    registries above — the native ellipsoidal lon/lat is the hub
    coordinate (documented ballpark-hub policy)."""

    def __init__(self, a: float, f: float, lon0: float, lat0: float,
                 k0: float, e0: float, n0: float):
        self.a, self.f = a, f
        self.lon0, self.lat0, self.k0 = lon0, lat0, k0
        self.e = np.sqrt(f * (2.0 - f))
        n = f / (2.0 - f)
        self.alpha = (
            n / 2.0 - 2.0 * n**2 / 3.0 + 5.0 * n**3 / 16.0
            + 41.0 * n**4 / 180.0,
            13.0 * n**2 / 48.0 - 3.0 * n**3 / 5.0 + 557.0 * n**4 / 1440.0,
            61.0 * n**3 / 240.0 - 103.0 * n**4 / 140.0,
            49561.0 * n**4 / 161280.0,
        )
        self.beta = (
            n / 2.0 - 2.0 * n**2 / 3.0 + 37.0 * n**3 / 96.0 - n**4 / 360.0,
            n**2 / 48.0 + n**3 / 15.0 - 437.0 * n**4 / 1440.0,
            17.0 * n**3 / 480.0 - 37.0 * n**4 / 840.0,
            4397.0 * n**4 / 161280.0,
        )
        self.abar = a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0)
        self.e0 = e0
        # false northing measured from lat0's meridian arc (xi at lam=0)
        xi0 = 0.0
        if lat0 != 0.0:
            xi0 = float(self._xi_eta(np.array([lon0]),
                                     np.array([lat0]))[0][0])
        self.n0_eff = n0 - k0 * self.abar * xi0

    def _xi_eta(self, lon, lat):
        lam = np.radians(np.asarray(lon, np.float64) - self.lon0)
        phi = np.radians(np.asarray(lat, np.float64))
        s = np.sin(phi)
        t = np.sinh(np.arctanh(s) - self.e * np.arctanh(self.e * s))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
        xi = xi_p.copy()
        eta = eta_p.copy()
        for j, a in enumerate(self.alpha, start=1):
            xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
            eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
        return xi, eta

    def forward(self, lon, lat):
        xi, eta = self._xi_eta(lon, lat)
        E = self.e0 + self.k0 * self.abar * eta
        Nn = self.k0 * self.abar * xi + self.n0_eff
        return E, Nn

    def inverse(self, E, Nn):
        e = self.e
        xi = (np.asarray(Nn, np.float64) - self.n0_eff) \
            / (self.k0 * self.abar)
        eta = (np.asarray(E, np.float64) - self.e0) / (self.k0 * self.abar)
        xi_p = xi.copy()
        eta_p = eta.copy()
        for j, b in enumerate(self.beta, start=1):
            xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2
                                       + np.cos(xi_p) ** 2)
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        # invert tau' = tau * sqrt(1+sigma^2) - sigma * sqrt(1+tau^2) by
        # Newton iteration (Karney 2011, eq. 19-21)
        tau = tau_p / np.sqrt(1.0 - e * e)  # first guess
        for _ in range(6):
            sig = np.sinh(e * np.arctanh(e * tau / np.sqrt(1.0 + tau * tau)))
            taup_of = (tau * np.sqrt(1.0 + sig * sig)
                       - sig * np.sqrt(1.0 + tau * tau))
            dtau = ((tau_p - taup_of) * (1.0 + (1.0 - e * e) * tau * tau)
                    / ((1.0 - e * e)
                       * np.sqrt((1.0 + taup_of ** 2) * (1.0 + tau * tau))))
            tau = tau + dtau
        phi = np.arctan(tau)
        return np.degrees(lam) + self.lon0, np.degrees(phi)


# UTM = the WGS84 parameterization of the generic TM (zone-dependent
# lon0; the two instances below share every series coefficient, so the
# delegation is bit-identical to the historical UTM-only code path —
# pinned by test_crs.py and the warp CRS gate)
_TM_UTM_N = _TM(_A, _F, 0.0, 0.0, _K0, _E0, 0.0)
_TM_UTM_S = _TM(_A, _F, 0.0, 0.0, _K0, _E0, _N0_SOUTH)


def lonlat_to_utm_np(lon: np.ndarray, lat: np.ndarray, zone: int,
                     south: bool = False):
    """WGS84 lon/lat (deg) -> UTM easting/northing (m)."""
    p = _TM_UTM_S if south else _TM_UTM_N
    return p.forward(np.asarray(lon, np.float64)
                     - utm_zone_lon0(zone), lat)


def utm_to_lonlat_np(E: np.ndarray, Nn: np.ndarray, zone: int,
                     south: bool = False):
    """UTM easting/northing (m) -> WGS84 lon/lat (deg)."""
    p = _TM_UTM_S if south else _TM_UTM_N
    lon, lat = p.inverse(E, Nn)
    return lon + utm_zone_lon0(zone), lat


#: named Transverse Mercator CRSes beyond UTM (ellipsoid, lon0, lat0,
#: k0, false easting/northing — EPSG registry parameters)
TM_REGISTRY: dict[str, _TM] = {
    # OSGB36 / British National Grid (Airy 1830; Helmert datum step
    # to WGS84 in DATUM_REGISTRY below — OSTN15 grid shifts, ~±3.5 m
    # better, are documented out of scope)
    "27700": _TM(6377563.396, 1.0 / 299.3249646, -2.0, 49.0,
                 0.9996012717, 400000.0, -100000.0),
    # NZGD2000 / New Zealand Transverse Mercator (GRS80)
    "2193": _TM(6378137.0, 1.0 / 298.257222101, 173.0,
                0.0, 0.9996, 1600000.0, 10000000.0),
    # ETRS89 / Poland CS92 (GRS80)
    "2180": _TM(6378137.0, 1.0 / 298.257222101, 19.0, 0.0, 0.9993,
                500000.0, -5300000.0),
}


# --------------------------------------------------- datum (Helmert)
#
# 7-parameter Helmert shift to/from WGS84 in geocentric cartesian
# space (EPSG method 9606, position-vector convention) — the step the
# reference delegates to PROJ's +towgs84= pipeline (ogr/ogrct.cpp:2263).
# NZGD2000/ETRS89-class datums are zero-shift vs WGS84 at this
# accuracy tier and stay unregistered; grid-shift files (OSTN15,
# NTv2) are out of scope, so EPSG:27700 lands within the published
# ±3.5 m Helmert envelope instead of ~100 m off.

#: fixed-point iterations for ECEF -> geodetic latitude (error factor
#: ~e2/2 per pass: < 1e-13 rad after 6 for h ~= 0); the SQL oracle
#: mirrors this count exactly
ECEF_ITERS = 6


def geodetic_to_ecef(lon, lat, a, e2):
    """(lon, lat) deg at h=0 on ellipsoid (a, e2) -> ECEF (3, n)."""
    lam = np.radians(np.asarray(lon, np.float64))
    phi = np.radians(np.asarray(lat, np.float64))
    sphi = np.sin(phi)
    cphi = np.cos(phi)
    nu = a / np.sqrt(1.0 - e2 * sphi * sphi)
    return np.stack([nu * cphi * np.cos(lam), nu * cphi * np.sin(lam),
                     nu * (1.0 - e2) * sphi])


def ecef_to_geodetic(v, a, e2):
    """ECEF (3, n) -> (lon, lat) deg on ellipsoid (a, e2); the height
    is discarded (lon/lat are invariant along the ellipsoid normal)."""
    x, y, z = v
    p = np.hypot(x, y)
    phi = np.arctan2(z, p * (1.0 - e2))
    for _ in range(ECEF_ITERS):
        sphi = np.sin(phi)
        nu = a / np.sqrt(1.0 - e2 * sphi * sphi)
        phi = np.arctan2(z + e2 * nu * sphi, p)
    return np.degrees(np.arctan2(y, x)), np.degrees(phi)


class _Helmert:
    """source-datum <-> WGS84: forward is the linearized
    position-vector map X' = (1+s)R X + t; the inverse uses the EXACT
    algebraic inverse of that same matrix (not negated parameters), so
    roundtrips close to float precision (the residual is the dropped
    WGS84 height re-entering through the ~4e-6 rad rotation — sub-mm)."""

    def __init__(self, a: float, f: float, tx: float, ty: float,
                 tz: float, rx: float, ry: float, rz: float,
                 s_ppm: float):
        self.a = a
        self.e2 = f * (2.0 - f)
        rx, ry, rz = (np.radians(r / 3600.0) for r in (rx, ry, rz))
        self.m = (1.0 + s_ppm * 1e-6) * np.array(
            [[1.0, -rz, ry], [rz, 1.0, -rx], [-ry, rx, 1.0]])
        self.mi = np.linalg.inv(self.m)
        self.t = np.array([tx, ty, tz])

    def to_wgs84(self, lon, lat):
        v = geodetic_to_ecef(lon, lat, self.a, self.e2)
        w = self.m @ v + self.t[:, None]
        return ecef_to_geodetic(w, _A, _E * _E)

    def from_wgs84(self, lon, lat):
        w = geodetic_to_ecef(lon, lat, _A, _E * _E)
        v = self.mi @ (w - self.t[:, None])
        return ecef_to_geodetic(v, self.a, self.e2)


#: datum steps keyed by the TM_REGISTRY code they refine
DATUM_REGISTRY: dict[str, _Helmert] = {
    # OSGB36 -> WGS84, EPSG transformation 1314 (the OS "Guide to
    # coordinate systems in Great Britain" Annex values, reversed)
    "27700": _Helmert(6377563.396, 1.0 / 299.3249646,
                      446.448, -125.157, 542.060,
                      0.1502, 0.2470, 0.8421, -20.4894),
}


# ------------------------------------------------------- LCC (2SP)
#
# Lambert Conformal Conic, two standard parallels, ellipsoidal — the
# closed-form Snyder formulas (Map Projections: A Working Manual,
# USGS PP 1395, pp. 107-109; the reference reaches the same math via
# PROJ's lcc, driven by ogr/ogrct.cpp:2263). Registered codes:
#   EPSG:3978  NAD83 / Canada Atlas Lambert (GRS80; 49/77, origin 49,-95)
#   EPSG:2154  RGF93 / Lambert-93          (GRS80; 44/49, origin 46.5,3)
# Datum shift NAD83/RGF93 <-> WGS84 is below 2 m and undefined without
# a grid; like PROJ's ballpark hub we treat the ellipsoidal lon/lat as
# the hub coordinate (GRS80 vs WGS84 flattening differs at 1e-10).

_GRS80_F = 1.0 / 298.257222101


def wrap_lon(lon):
    """Normalize longitude to [-180, 180) — PROJ does this inside its
    inverse; conic/azimuthal inverses natively emit lon0 +- n*180
    ranges that can cross the antimeridian. The EXACT float form
    lon - 360*floor((lon+180)/360) is mirrored verbatim by
    queries_raster's SQL oracles so both engines round identically
    (a no-op returning lon - 0.0 == lon bitwise when already in
    range)."""
    return lon - 360.0 * np.floor((lon + 180.0) / 360.0)


class _LCC:
    def __init__(self, lat1: float, lat2: float, lat0: float, lon0: float,
                 e0: float, n0: float, a: float = _A, f: float = _GRS80_F):
        self.a, self.e = a, float(np.sqrt(f * (2.0 - f)))
        self.lon0, self.e0, self.n0 = lon0, e0, n0
        e = self.e
        p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))

        def m(p):
            return np.cos(p) / np.sqrt(1.0 - (e * np.sin(p)) ** 2)

        def t(p):
            return (np.tan(np.pi / 4.0 - p / 2.0)
                    / ((1.0 - e * np.sin(p)) / (1.0 + e * np.sin(p)))
                    ** (e / 2.0))

        self.t_of = t
        if abs(lat1 - lat2) < 1e-12:
            self.n = float(np.sin(p1))
        else:
            self.n = float((np.log(m(p1)) - np.log(m(p2)))
                           / (np.log(t(p1)) - np.log(t(p2))))
        self.F = float(m(p1) / (self.n * t(p1) ** self.n))
        self.rho0 = float(self.a * self.F * t(p0) ** self.n)

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, np.float64) - self.lon0)
        phi = np.radians(np.asarray(lat, np.float64))
        rho = self.a * self.F * self.t_of(phi) ** self.n
        th = self.n * lam
        return (self.e0 + rho * np.sin(th),
                self.n0 + self.rho0 - rho * np.cos(th))

    def inverse(self, E, Nn):
        dx = np.asarray(E, np.float64) - self.e0
        dy = self.rho0 - (np.asarray(Nn, np.float64) - self.n0)
        sgn = 1.0 if self.n >= 0 else -1.0
        rho = sgn * np.sqrt(dx * dx + dy * dy)
        th = np.arctan2(sgn * dx, sgn * dy)
        tp = (rho / (self.a * self.F)) ** (1.0 / self.n)
        lam = th / self.n
        phi = np.pi / 2.0 - 2.0 * np.arctan(tp)
        for _ in range(8):
            es = self.e * np.sin(phi)
            phi = (np.pi / 2.0
                   - 2.0 * np.arctan(tp * ((1.0 - es) / (1.0 + es))
                                     ** (self.e / 2.0)))
        return wrap_lon(np.degrees(lam) + self.lon0), np.degrees(phi)


LCC_REGISTRY: dict[str, _LCC] = {
    "3978": _LCC(lat1=49.0, lat2=77.0, lat0=49.0, lon0=-95.0,
                 e0=0.0, n0=0.0),
    "2154": _LCC(lat1=44.0, lat2=49.0, lat0=46.5, lon0=3.0,
                 e0=700000.0, n0=6600000.0),
}


# ------------------------------------------ Albers Equal-Area Conic
#
# Ellipsoidal 2SP — Snyder PP 1395 pp. 98-103 (eqs 14-3/4, 3-12,
# 14-12a); the reference reaches it via PROJ's aea (ogr/ogrct.cpp).
# The projection is built on the AUTHALIC latitude function q(phi);
# the inverse solves q(phi) = q by the fixed Newton step of Snyder
# eq 3-16 (iteration count pinned so numpy and a SQL mirror agree).
# Registered:
#   EPSG:5070  NAD83 / Conus Albers (lat1 29.5N, lat2 45.5N,
#              lat0 23N, lon0 -96, GRS80)


class _Albers:
    def __init__(self, lat1: float, lat2: float, lat0: float, lon0: float,
                 e0: float, n0: float, a: float = _A, f: float = _GRS80_F):
        self.a, self.e = a, float(np.sqrt(f * (2.0 - f)))
        self.e2 = float(f * (2.0 - f))
        self.lon0, self.e0, self.n0 = lon0, e0, n0
        e, e2 = self.e, self.e2
        p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))

        def m(p):
            return np.cos(p) / np.sqrt(1.0 - (e * np.sin(p)) ** 2)

        def q(p):   # Snyder 3-12
            s = np.sin(p)
            return (1.0 - e2) * (s / (1.0 - e2 * s * s)
                                 - (1.0 / (2.0 * e))
                                 * np.log((1.0 - e * s) / (1.0 + e * s)))

        self.q_of = q
        self.n = float((m(p1) ** 2 - m(p2) ** 2) / (q(p2) - q(p1)))
        self.C = float(m(p1) ** 2 + self.n * q(p1))
        self.rho0 = float(a * np.sqrt(self.C - self.n * q(p0)) / self.n)
        #: q at the pole — |q| <= q_pole; used to clamp asin args
        self.q_pole = float(q(np.pi / 2.0))

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, np.float64) - self.lon0)
        phi = np.radians(np.asarray(lat, np.float64))
        rho = self.a * np.sqrt(self.C - self.n * self.q_of(phi)) / self.n
        th = self.n * lam
        return (self.e0 + rho * np.sin(th),
                self.n0 + self.rho0 - rho * np.cos(th))

    def inverse(self, E, Nn):
        e, e2 = self.e, self.e2
        dx = np.asarray(E, np.float64) - self.e0
        dy = self.rho0 - (np.asarray(Nn, np.float64) - self.n0)
        sgn = 1.0 if self.n >= 0 else -1.0
        rho = sgn * np.sqrt(dx * dx + dy * dy)
        th = np.arctan2(sgn * dx, sgn * dy)
        qv = (self.C - (rho * self.n / self.a) ** 2) / self.n
        lam = th / self.n
        # seed: authalic-sphere latitude (Snyder 14-19 analog)
        phi = np.arcsin(np.clip(qv / self.q_pole, -1.0, 1.0))
        for _ in range(10):   # Snyder 3-16 Newton step, fixed count
            s = np.sin(phi)
            phi = phi + ((1.0 - e2 * s * s) ** 2 / (2.0 * np.cos(phi))
                         * (qv / (1.0 - e2) - s / (1.0 - e2 * s * s)
                            + (1.0 / (2.0 * e))
                            * np.log((1.0 - e * s) / (1.0 + e * s))))
        return wrap_lon(np.degrees(lam) + self.lon0), np.degrees(phi)


ALBERS_REGISTRY: dict[str, _Albers] = {
    "5070": _Albers(lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0,
                    e0=0.0, n0=0.0),
}


# ------------------------------------------ Polar Stereographic (B)
#
# Variant B (standard parallel), ellipsoidal — Snyder PP 1395
# pp. 160-162 / EPSG Guidance Note 7-2 §3.2.4; the reference reaches
# it via PROJ's stere (ogr/ogrct.cpp). Shares the conformal-latitude
# t(phi) function with LCC above. Registered codes:
#   EPSG:3413  WGS84 / NSIDC Sea Ice Polar Stereographic North
#              (lat_ts 70N, lon0 -45)
#   EPSG:3031  WGS84 / Antarctic Polar Stereographic
#              (lat_ts 71S, lon0 0)


class _PolarStereo:
    def __init__(self, lat_ts: float, lon0: float, e0: float, n0: float,
                 south: bool, a: float = _A, f: float = _F):
        self.a, self.e = a, float(np.sqrt(f * (2.0 - f)))
        self.lon0, self.e0, self.n0, self.south = lon0, e0, n0, south
        e = self.e

        def t(p):
            return (np.tan(np.pi / 4.0 - p / 2.0)
                    / ((1.0 - e * np.sin(p)) / (1.0 + e * np.sin(p)))
                    ** (e / 2.0))

        self.t_of = t
        pts = np.radians(abs(lat_ts))
        m_ts = np.cos(pts) / np.sqrt(1.0 - (e * np.sin(pts)) ** 2)
        # rho = a * m_ts / t_ts * t(phi)  (Snyder 21-34)
        self.rho_c = float(a * m_ts / t(pts))

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, np.float64) - self.lon0)
        phi = np.radians(np.asarray(lat, np.float64))
        if self.south:
            phi = -phi
        rho = self.rho_c * self.t_of(phi)
        x = rho * np.sin(lam)
        y = -rho * np.cos(lam)
        if self.south:
            y = -y
        return self.e0 + x, self.n0 + y

    def inverse(self, E, Nn):
        dx = np.asarray(E, np.float64) - self.e0
        dy = np.asarray(Nn, np.float64) - self.n0
        if self.south:
            dy = -dy
        rho = np.sqrt(dx * dx + dy * dy)
        tp = rho / self.rho_c
        lam = np.arctan2(dx, -dy)
        phi = np.pi / 2.0 - 2.0 * np.arctan(tp)
        for _ in range(8):
            es = self.e * np.sin(phi)
            phi = (np.pi / 2.0
                   - 2.0 * np.arctan(tp * ((1.0 - es) / (1.0 + es))
                                     ** (self.e / 2.0)))
        if self.south:
            phi = -phi
        return wrap_lon(np.degrees(lam) + self.lon0), np.degrees(phi)


def _pstereo_lat_of_rho(p: "_PolarStereo", rho: np.ndarray) -> np.ndarray:
    """Latitude (north-frame degrees) at projected radius rho — the
    same 8-step conformal-latitude iteration as _PolarStereo.inverse."""
    tp = rho / p.rho_c
    phi = np.pi / 2.0 - 2.0 * np.arctan(tp)
    for _ in range(8):
        es = p.e * np.sin(phi)
        phi = (np.pi / 2.0
               - 2.0 * np.arctan(tp * ((1.0 - es) / (1.0 + es))
                                 ** (p.e / 2.0)))
    return np.degrees(phi)


def pstereo_rect_lonlat_bounds(p: "_PolarStereo",
                               x0: np.ndarray, x1: np.ndarray,
                               y0: np.ndarray, y1: np.ndarray):
    """EXACT lon/lat bounds of axis-aligned projected rectangles
    [x0,x1]x[y0,y1] under the polar-stereographic inverse (vectorized
    over rectangles). Needed because the inverse is polar around the
    pole: per-axis extremes of a warp's source coordinates sit in the
    rectangle INTERIOR when it contains the pole or crosses the
    antimeridian ray, where corner/edge sampling (warp._dep_ranges's
    generic path) provably under-brackets.

    Geometry: lat is monotone in radius rho, so its extremes are the
    rectangle's min/max distance to the pole; the bearing
    theta = atan2(dx, -dy) is monotone along any straight segment not
    through the pole (d theta/dt has the constant sign of p0 x v), so
    absent a branch-cut crossing its extremes are at corners.

    Returns (lon_lo, lon_hi, lat_lo, lat_hi, wrap); wrap=True marks
    rectangles containing the pole or crossing the lon0+180 cut —
    their longitude range is the full circle."""
    ax0 = np.asarray(x0, np.float64) - p.e0
    ax1 = np.asarray(x1, np.float64) - p.e0
    dy0 = np.asarray(y0, np.float64) - p.n0
    dy1 = np.asarray(y1, np.float64) - p.n0
    if p.south:   # north-frame dy' = -dy
        dy0, dy1 = -dy1, -dy0

    def _minabs(a, b):
        return np.where((a <= 0.0) & (b >= 0.0), 0.0,
                        np.minimum(np.abs(a), np.abs(b)))

    rho_min = np.hypot(_minabs(ax0, ax1), _minabs(dy0, dy1))
    rho_max = np.hypot(np.maximum(np.abs(ax0), np.abs(ax1)),
                       np.maximum(np.abs(dy0), np.abs(dy1)))
    lat_hi = _pstereo_lat_of_rho(p, rho_min)
    lat_lo = _pstereo_lat_of_rho(p, rho_max)
    if p.south:
        lat_lo, lat_hi = -lat_hi, -lat_lo

    x_spans0 = (ax0 <= 0.0) & (ax1 >= 0.0)
    pole_in = x_spans0 & (dy0 <= 0.0) & (dy1 >= 0.0)
    # atan2 branch cut: the ray {dx = 0, -dy' < 0}, i.e. lon0 + 180
    cut_cross = x_spans0 & (dy1 > 0.0)
    wrap = pole_in | cut_cross

    ths = [np.arctan2(cx, -cy) for cx in (ax0, ax1) for cy in (dy0, dy1)]
    th_lo = np.minimum.reduce(ths)
    th_hi = np.maximum.reduce(ths)
    lon_lo = wrap_lon(np.degrees(th_lo) + p.lon0)
    lon_hi = wrap_lon(np.degrees(th_hi) + p.lon0)
    # endpoint wrapping inverted the interval -> it crosses +-180
    wrap = wrap | (lon_lo > lon_hi)
    return lon_lo, lon_hi, lat_lo, lat_hi, wrap


def polar_of(crs: str):
    """The _PolarStereo instance for an azimuthal CRS code, else None
    (warp._dep_ranges uses this to pick the exact-sector dep path)."""
    return PSTEREO_REGISTRY.get(_parse(crs))


PSTEREO_REGISTRY: dict[str, _PolarStereo] = {
    "3413": _PolarStereo(lat_ts=70.0, lon0=-45.0, e0=0.0, n0=0.0,
                         south=False),
    "3031": _PolarStereo(lat_ts=-71.0, lon0=0.0, e0=0.0, n0=0.0,
                         south=True),
}


def _parse(crs: str):
    c = crs.upper().replace("EPSG:", "")
    return c


def to_lonlat_np(crs: str, x: np.ndarray, y: np.ndarray):
    c = _parse(crs)
    if c == "4326":
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    if c == "3857":
        return mercator.meters_to_lonlat_np(x, y)
    if c.startswith("326") and len(c) == 5:
        return utm_to_lonlat_np(x, y, int(c[3:]), south=False)
    if c.startswith("327") and len(c) == 5:
        return utm_to_lonlat_np(x, y, int(c[3:]), south=True)
    if c in LCC_REGISTRY:
        return LCC_REGISTRY[c].inverse(x, y)
    if c in PSTEREO_REGISTRY:
        return PSTEREO_REGISTRY[c].inverse(x, y)
    if c in ALBERS_REGISTRY:
        return ALBERS_REGISTRY[c].inverse(x, y)
    if c in TM_REGISTRY:
        lon, lat = TM_REGISTRY[c].inverse(x, y)
        d = DATUM_REGISTRY.get(c)
        return d.to_wgs84(lon, lat) if d else (lon, lat)
    raise NotImplementedError(f"CRS {crs} not registered (geo/crs.py)")


def from_lonlat_np(crs: str, lon: np.ndarray, lat: np.ndarray):
    c = _parse(crs)
    if c == "4326":
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    if c == "3857":
        return mercator.lonlat_to_meters_np(
            lon, np.clip(lat, -mercator.MERCATOR_MAX_LAT,
                         mercator.MERCATOR_MAX_LAT))
    if c.startswith("326") and len(c) == 5:
        return lonlat_to_utm_np(lon, lat, int(c[3:]), south=False)
    if c.startswith("327") and len(c) == 5:
        return lonlat_to_utm_np(lon, lat, int(c[3:]), south=True)
    if c in LCC_REGISTRY:
        return LCC_REGISTRY[c].forward(lon, lat)
    if c in PSTEREO_REGISTRY:
        return PSTEREO_REGISTRY[c].forward(lon, lat)
    if c in ALBERS_REGISTRY:
        return ALBERS_REGISTRY[c].forward(lon, lat)
    if c in TM_REGISTRY:
        d = DATUM_REGISTRY.get(c)
        if d:
            lon, lat = d.from_wgs84(lon, lat)
        return TM_REGISTRY[c].forward(lon, lat)
    raise NotImplementedError(f"CRS {crs} not registered (geo/crs.py)")


def transform_np(src_crs: str, dst_crs: str, x: np.ndarray, y: np.ndarray):
    """src -> dst through the lon/lat hub (OGRCreateCoordinate-
    Transformation analog for the registered CRS set)."""
    if _parse(src_crs) == _parse(dst_crs):
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    lon, lat = to_lonlat_np(src_crs, x, y)
    return from_lonlat_np(dst_crs, lon, lat)
