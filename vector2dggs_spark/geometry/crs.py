"""Minimal CRS support (SURVEY G1) — vectorized numpy transforms.

The reference accepts any source CRS and an optional projected cut CRS
(``common.py:529-579``: reproject -> katana in CRS units -> indexers in
EPSG:4326).  This container has no pyproj, so the engine ships exact
from-scratch transforms for the CRS families the reference's tests and
typical deployments use:

* EPSG:4326 (identity hub)
* EPSG:3857 WebMercator (published spherical formulas)
* Ellipsoidal Transverse Mercator via the Krüger series (published in
  the EPSG/OGP guidance notes and standard geodesy texts; 4th-order
  series, sub-mm over a UTM zone) — covering every UTM zone
  (EPSG:326xx / 327xx) and named TM definitions such as EPSG:2193
  (NZTM2000 — the reference project's home CRS).

All functions are array-in / array-out; the inverse latitude solve is a
Newton iteration on the conformal-latitude relation (converges to
machine precision in <=5 steps), so no inverse series coefficients are
needed.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_WGS84 = (6378137.0, 1.0 / 298.257223563)
_GRS80 = (6378137.0, 1.0 / 298.257222101)


@dataclass(frozen=True)
class TransverseMercator:
    a: float
    f: float
    lon0_deg: float
    lat0_deg: float
    k0: float
    false_e: float
    false_n: float

    def __post_init__(self):
        n = self.f / (2.0 - self.f)
        object.__setattr__(self, "_n", n)
        object.__setattr__(
            self,
            "_A",
            self.a / (1 + n) * (1 + n**2 / 4 + n**4 / 64),
        )
        object.__setattr__(
            self,
            "_alpha",
            (
                n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180,
                13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440,
                61 * n**3 / 240 - 103 * n**4 / 140,
                49561 * n**4 / 161280,
            ),
        )
        object.__setattr__(
            self,
            "_beta",
            (
                n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360,
                n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440,
                17 * n**3 / 480 - 37 * n**4 / 840,
                4397 * n**4 / 161280,
            ),
        )
        e = np.sqrt(self.f * (2 - self.f))
        object.__setattr__(self, "_e", e)
        # meridian distance of the latitude of origin (series on 2φ)
        if self.lat0_deg:
            xi0, _ = self._conformal(np.array([np.radians(self.lat0_deg)]), np.array([0.0]))
            m0 = xi0[0]
            for j, al in enumerate(self._alpha, 1):
                m0 += al * np.sin(2 * j * xi0[0])
            object.__setattr__(self, "_m0", float(self._A * m0))
        else:
            object.__setattr__(self, "_m0", 0.0)

    # φ, λ' (radians) -> (ξ', η') conformal coordinates
    def _conformal(self, lat, dlon):
        e = self._e
        s = np.sin(lat)
        t = np.sinh(np.arctanh(s) - e * np.arctanh(e * s))
        xi_p = np.arctan2(t, np.cos(dlon))
        eta_p = np.arcsinh(np.sin(dlon) / np.sqrt(t * t + np.cos(dlon) ** 2))
        return xi_p, eta_p

    def forward(self, lon_deg, lat_deg):
        lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
        dlon = np.radians(np.asarray(lon_deg, dtype=np.float64) - self.lon0_deg)
        xi, eta = self._conformal(lat, dlon)
        x = xi.copy()
        y = eta.copy()
        for j, al in enumerate(self._alpha, 1):
            x = x + al * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            y = y + al * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        E = self.false_e + self.k0 * self._A * y
        N = self.false_n + self.k0 * self._A * x - self.k0 * self._m0
        return E, N

    # series/Newton domain: |eta| = 3.2 is ~20,000 km from the central
    # meridian (half the circumference) — any easting beyond it is a bad
    # coordinate, and sinh(2j·eta) overflows soon after, so reject it
    # explicitly instead of propagating NaN (ADVICE r02)
    _MAX_ETA = 3.2
    _MAX_XI = 2.0  # |xi| = pi/2 is the pole; 2.0 leaves series headroom

    def inverse(self, E, N):
        xi = (np.asarray(N, dtype=np.float64) - self.false_n + self.k0 * self._m0) / (
            self.k0 * self._A
        )
        eta = (np.asarray(E, dtype=np.float64) - self.false_e) / (self.k0 * self._A)
        bad = ~np.isfinite(eta) | ~np.isfinite(xi) | (np.abs(eta) > self._MAX_ETA) | (
            np.abs(xi) > self._MAX_XI
        )
        if np.any(bad):
            i = int(np.argmax(np.atleast_1d(bad)))
            raise ValueError(
                "TransverseMercator.inverse: coordinate out of the projection "
                f"domain (first offender index {i}: "
                f"E={np.atleast_1d(E)[i]!r}, N={np.atleast_1d(N)[i]!r}; "
                f"|eta|<={self._MAX_ETA}, |xi|<={self._MAX_XI} required)"
            )
        xi_p = xi.copy()
        eta_p = eta.copy()
        for j, be in enumerate(self._beta, 1):
            xi_p = xi_p - be * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p = eta_p - be * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        lon = self.lon0_deg + np.degrees(np.arctan2(np.sinh(eta_p), np.cos(xi_p)))
        # normalize to [-180, 180): a central meridian near the
        # antimeridian (NZTM lon0=173 covering the Chatham Islands)
        # legitimately yields lon0 + dlon > 180, which would otherwise
        # clamp to the 180 boundary downstream (round-3 bug fix)
        lon = np.mod(lon + 180.0, 360.0) - 180.0
        tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
        # Newton solve τ(φ) = τ' on the conformal relation
        e = self._e
        tau = tau_p.copy()
        for _ in range(6):
            sigma = np.sinh(e * np.arctanh(e * tau / np.sqrt(1 + tau * tau)))
            f_tau = tau * np.sqrt(1 + sigma * sigma) - sigma * np.sqrt(1 + tau * tau)
            dtau = (
                (tau_p - f_tau)
                * (1 + (1 - e * e) * tau * tau)
                / ((1 - e * e) * np.sqrt((1 + f_tau * f_tau) * (1 + tau * tau)))
            )
            tau = tau + dtau
        lat = np.degrees(np.arctan(tau))
        return lon, lat


class WebMercator:
    R = 6378137.0

    def forward(self, lon_deg, lat_deg):
        lon = np.asarray(lon_deg, dtype=np.float64)
        lat = np.clip(np.asarray(lat_deg, dtype=np.float64), -85.06, 85.06)
        x = np.radians(lon) * self.R
        y = self.R * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
        return x, y

    def inverse(self, x, y):
        lon = np.degrees(np.asarray(x, dtype=np.float64) / self.R)
        lon = np.mod(lon + 180.0, 360.0) - 180.0
        lat = np.degrees(2 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / self.R)) - np.pi / 2)
        return lon, lat


class Identity:
    def forward(self, lon, lat):
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)

    inverse = forward


@dataclass(frozen=True)
class AzimuthalEquidistant:
    """Spherical azimuthal equidistant (published formulas; the
    reference's antimeridian fixture is a 200km square in an AEQD
    centred on the antimeridian at the equator —
    tests/classes/antimeridian.py:22-35)."""

    lon0_deg: float
    lat0_deg: float
    R: float = 6371008.8  # mean earth radius

    def forward(self, lon_deg, lat_deg):
        lam = np.radians(np.asarray(lon_deg, dtype=np.float64) - self.lon0_deg)
        phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
        phi0 = np.radians(self.lat0_deg)
        cosc = np.clip(
            np.sin(phi0) * np.sin(phi) + np.cos(phi0) * np.cos(phi) * np.cos(lam), -1, 1
        )
        c = np.arccos(cosc)
        k = np.where(c > 1e-12, c / np.maximum(np.sin(c), 1e-300), 1.0)
        x = self.R * k * np.cos(phi) * np.sin(lam)
        y = self.R * k * (np.cos(phi0) * np.sin(phi) - np.sin(phi0) * np.cos(phi) * np.cos(lam))
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        phi0 = np.radians(self.lat0_deg)
        rho = np.hypot(x, y)
        c = rho / self.R
        with np.errstate(invalid="ignore"):
            phi = np.where(
                rho > 1e-12,
                np.arcsin(np.clip(np.cos(c) * np.sin(phi0) + y * np.sin(c) * np.cos(phi0) / np.maximum(rho, 1e-300), -1, 1)),
                phi0,
            )
            lam = np.where(
                rho > 1e-12,
                np.arctan2(
                    x * np.sin(c),
                    rho * np.cos(c) * np.cos(phi0) - y * np.sin(c) * np.sin(phi0),
                ),
                0.0,
            )
        lon = self.lon0_deg + np.degrees(lam)
        lon = np.mod(lon + 180.0, 360.0) - 180.0
        return lon, np.degrees(phi)


_NAMED = {
    4326: lambda: Identity(),
    3857: lambda: WebMercator(),
    # NZTM2000 (published definition: GRS80, lat0 0, lon0 173, k0 0.9996,
    # FE 1.6e6, FN 1e7) — the reference project's national grid
    2193: lambda: TransverseMercator(*_GRS80, 173.0, 0.0, 0.9996, 1_600_000.0, 10_000_000.0),
}


def get_crs(code):
    """EPSG integer (or 'EPSG:n' string) -> transform object with
    vectorized ``forward(lon, lat) -> (x, y)`` / ``inverse(x, y)``.
    A transform object passes through unchanged (custom projections,
    e.g. an AzimuthalEquidistant instance)."""
    if hasattr(code, "forward") and hasattr(code, "inverse"):
        return code
    if isinstance(code, str):
        code = int(code.upper().replace("EPSG:", ""))
    if code in _NAMED:
        return _NAMED[code]()
    if 32601 <= code <= 32660:  # UTM north
        zone = code - 32600
        return TransverseMercator(*_WGS84, zone * 6 - 183, 0.0, 0.9996, 500_000.0, 0.0)
    if 32701 <= code <= 32760:  # UTM south
        zone = code - 32700
        return TransverseMercator(
            *_WGS84, zone * 6 - 183, 0.0, 0.9996, 500_000.0, 10_000_000.0
        )
    raise ValueError(
        f"unsupported CRS EPSG:{code} (supported: 4326, 3857, 2193, UTM 326xx/327xx)"
    )


def transform_geom(geom, fn):
    """Apply ``fn(x_array, y_array) -> (x, y)`` to every coordinate of a
    parsed geometry tuple (gtype, parts) — same structure out."""
    gtype, parts = geom
    if gtype == "Point":
        x, y = fn(np.array([parts[0]]), np.array([parts[1]]))
        return (gtype, np.array([float(x[0]), float(y[0])]))
    if gtype in ("LineString",):
        arr = np.asarray(parts)
        x, y = fn(arr[:, 0], arr[:, 1])
        return (gtype, np.stack([x, y], axis=1))
    if gtype == "Polygon":
        out = []
        for ring in parts:
            arr = np.asarray(ring)
            x, y = fn(arr[:, 0], arr[:, 1])
            out.append(np.stack([x, y], axis=1))
        return (gtype, out)
    if gtype in ("MultiPoint", "MultiLineString", "MultiPolygon"):
        sub = gtype[5:]
        return (gtype, [transform_geom((sub, p), fn)[1] for p in parts])
    if gtype == "GeometryCollection":
        return (gtype, [transform_geom(g, fn) for g in parts])
    raise ValueError(f"unsupported geometry type for CRS transform: {gtype}")
