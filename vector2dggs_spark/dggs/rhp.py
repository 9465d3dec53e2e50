"""rHEALPix-style DGGS backend — pure-numpy, vectorized.

Reproduces the semantics of the reference's rHP indexer
(``/root/reference/vector2dggs/indexers/rhpvectorindexer.py``, which
delegates to rhppandas/rhealpixdggs):

* cell IDs are prefix-hierarchical strings ``{N|O|P|Q|R|S}{d...}`` with
  digits 0-8 (row-major, top-left origin, 3x3 subdivision per level),
* parent = string prefix (``rhpvectorindexer.py:52-57``),
* polygon fill = planar centroid-inside (``rhpvectorindexer.py:28-33``),
* compaction = complete 9-sibling merge to fixpoint
  (``rhpvectorindexer.py:87-101``).

Projection: the (r)HEALPix equal-area projection (Calabretta & Roukema
2007; Gibb, Raichev & Speth, "The rHEALPix DGGS"), H=4/K=3, built from
the published closed-form equations.  Latitudes are converted
geodetic→authalic (WGS84, standard Snyder series) before projection so
cells are equal-area on the ellipsoid, like rhealpixdggs' WGS84 ellipsoid
instance.  Planar layout (north_square=0, south_square=0):

        x: -pi ........ -pi/2 ....... 0 ....... pi/2 ....... pi
    y= 3pi/4  +-----+
              |  N  |
    y=  pi/4  +-----+-----+-----+-----+
              |  O  |  P  |  Q  |  R  |
    y= -pi/4  +-----+-----+-----+-----+
              |  S  |
    y=-3pi/4  +-----+

This backend is planar (GEODESIC=False): antimeridian-crossing
geometries must be split first, exactly like the reference's gate
(``vectorindexer.py:14-19``, ``common.py:712-722``).
"""
from __future__ import annotations

import numpy as np

FACES = "NOPQRS"
MIN_RES = 0
MAX_RES = 15
GEODESIC = False

_PI = np.pi
_PHI0 = np.arcsin(2.0 / 3.0)  # equatorial/polar boundary latitude
# WGS84
_E2 = 0.00669437999014132
_E4 = _E2 * _E2
_E6 = _E4 * _E2

# geodetic -> authalic series coefficients (Snyder 1987, eq. 3-18)
_A2 = -(_E2 / 3.0 + 31.0 * _E4 / 180.0 + 59.0 * _E6 / 560.0)
_A4 = 17.0 * _E4 / 360.0 + 61.0 * _E6 / 1260.0
_A6 = -383.0 * _E6 / 45360.0
# authalic -> geodetic inverse series (Snyder 1987, eq. 3-18 inverse)
_B2 = _E2 / 3.0 + 31.0 * _E4 / 180.0 + 517.0 * _E6 / 5040.0
_B4 = 23.0 * _E4 / 360.0 + 251.0 * _E6 / 3780.0
_B6 = 761.0 * _E6 / 45360.0

_NORTH_CENTER = (-3.0 * _PI / 4.0, _PI / 2.0)
_SOUTH_CENTER = (-3.0 * _PI / 4.0, -_PI / 2.0)


def geodetic_to_authalic(phi: np.ndarray) -> np.ndarray:
    return phi + _A2 * np.sin(2 * phi) + _A4 * np.sin(4 * phi) + _A6 * np.sin(6 * phi)


def authalic_to_geodetic(beta: np.ndarray) -> np.ndarray:
    return beta + _B2 * np.sin(2 * beta) + _B4 * np.sin(4 * beta) + _B6 * np.sin(6 * beta)


# ---------------------------------------------------------------- projection
def project(lon_deg, lat_deg, authalic: bool = True):
    """(lon, lat) degrees -> rHEALPix planar (x, y), vectorized."""
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lam = np.mod(lam + _PI, 2 * _PI) - _PI  # wrap to [-pi, pi)
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    if authalic:
        phi = geodetic_to_authalic(phi)
    phi = np.clip(phi, -_PI / 2, _PI / 2)

    x = np.array(lam, dtype=np.float64, copy=True)
    y = (3.0 * _PI / 8.0) * np.sin(phi)

    sphi = np.sin(phi)
    north = sphi > 2.0 / 3.0
    south = sphi < -2.0 / 3.0
    for mask, sgn, (cx, cy) in ((north, 1.0, _NORTH_CENTER), (south, -1.0, _SOUTH_CENTER)):
        if not mask.any():
            continue
        lm = lam[mask]
        k = np.clip(np.floor((lm + _PI) / (_PI / 2.0)), 0, 3).astype(np.int64)
        lam_c = -3.0 * _PI / 4.0 + k * (_PI / 2.0)
        sigma = np.sqrt(3.0 * (1.0 - sgn * sphi[mask]))
        # HEALPix polar coords relative to the quadrant apex (lam_c, sgn*pi/2)
        rx = (lm - lam_c) * sigma
        ry = -sgn * (_PI / 4.0) * sigma  # apex y - point y, signed toward equator
        # rotate quadrant k into the cap square: CCW by k*90 deg (north),
        # CW by k*90 deg (south)
        ang = sgn * k * (_PI / 2.0)
        ca, sa = np.cos(ang), np.sin(ang)
        rx2 = ca * rx - sa * ry
        ry2 = sa * rx + ca * ry
        x[mask] = cx + rx2
        y[mask] = cy + ry2
    return x, y


def unproject(x, y, authalic: bool = True):
    """planar (x, y) -> (lon, lat) degrees, vectorized."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lam = np.array(x, copy=True)
    beta = np.arcsin(np.clip(y / (3.0 * _PI / 8.0), -1.0, 1.0))

    north = y > _PI / 4.0
    south = y < -_PI / 4.0
    for mask, sgn, (cx, cy) in ((north, 1.0, _NORTH_CENTER), (south, -1.0, _SOUTH_CENTER)):
        if not mask.any():
            continue
        rx = x[mask] - cx
        ry = y[mask] - cy
        # which quarter-triangle: rotate back by k*90 until the point is in
        # the triangle nearest the equator (apex at cap center)
        k = np.full(rx.shape, -1, dtype=np.int64)
        rx_b, ry_b = rx.copy(), ry.copy()
        for kk in (0, 1, 2, 3):
            ang = -sgn * kk * (_PI / 2.0)
            ca, sa = np.cos(ang), np.sin(ang)
            rx_t = ca * rx - sa * ry
            ry_t = sa * rx + ca * ry
            take = (k < 0) & _in_base_triangle(rx_t, ry_t, sgn)
            rx_b = np.where(take, rx_t, rx_b)
            ry_b = np.where(take, ry_t, ry_b)
            k = np.where(take, kk, k)
        k = np.where(k < 0, 0, k)
        lam_c = -3.0 * _PI / 4.0 + k * (_PI / 2.0)
        sigma = np.abs(ry_b) * 4.0 / _PI  # |apex_y - y| / (pi/4)
        sb = sgn * (1.0 - sigma * sigma / 3.0)
        beta[mask] = np.arcsin(np.clip(sb, -1.0, 1.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            lam_m = lam_c + np.where(sigma > 0, rx_b / np.where(sigma > 0, sigma, 1.0), 0.0)
        lam[mask] = lam_m
    lat = beta if not authalic else authalic_to_geodetic(beta)
    lon = np.degrees(np.mod(lam + _PI, 2 * _PI) - _PI)
    return lon, np.degrees(lat)


def _in_base_triangle(rx, ry, sgn):
    """True if the point lies in the cap's quarter-triangle adjacent to the
    equator (apex at cap center): ry on equator side, |rx| <= |ry|."""
    rye = -sgn * ry  # positive toward equator
    return (rye >= -1e-12) & (np.abs(rx) <= rye + 1e-12)


# ---------------------------------------------------------------- cells
def _face_uv(x, y):
    """planar -> (face index 0..5, u, v) with u,v in [0,1) from the face's
    top-left corner (v increases downward — row-major digit order)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    face = np.empty(x.shape, dtype=np.int64)
    x0 = np.empty(x.shape)
    ytop = np.empty(x.shape)
    north = y > _PI / 4.0
    south = y < -_PI / 4.0
    eq = ~north & ~south
    face[north] = 0
    x0[north] = -_PI
    ytop[north] = 3.0 * _PI / 4.0
    face[south] = 5
    x0[south] = -_PI
    ytop[south] = -_PI / 4.0
    keq = np.clip(np.floor((x[eq] + _PI) / (_PI / 2.0)), 0, 3).astype(np.int64)
    face[eq] = 1 + keq
    x0[eq] = -_PI + keq * (_PI / 2.0)
    ytop[eq] = _PI / 4.0
    side = _PI / 2.0
    u = np.clip((x - x0) / side, 0.0, 1.0 - 1e-15)
    v = np.clip((ytop - y) / side, 0.0, 1.0 - 1e-15)
    return face, u, v


_FACE_BYTES = np.frombuffer(b"NOPQRS", dtype=np.uint8)


def point_to_cell(lat, lon, res: int) -> np.ndarray:
    """Vectorized (lat, lon) -> rHP cell strings at resolution ``res``."""
    x, y = project(np.atleast_1d(lon), np.atleast_1d(lat))
    face, u, v = _face_uv(x, y)
    n = face.shape[0]
    chars = np.empty((n, res + 1), dtype=np.uint8)
    chars[:, 0] = _FACE_BYTES[face]
    uu, vv = u.copy(), v.copy()
    for i in range(res):
        uu = uu * 3.0
        vv = vv * 3.0
        cu = np.clip(np.floor(uu), 0, 2).astype(np.int64)
        cv = np.clip(np.floor(vv), 0, 2).astype(np.int64)
        uu -= cu
        vv -= cv
        chars[:, i + 1] = ord("0") + (3 * cv + cu).astype(np.uint8)
    return chars.view(f"S{res + 1}").ravel().astype(str)


def cell_to_uv(cells) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """cells -> (face, u, v) of cell *centers* in face units + res."""
    cells = np.atleast_1d(np.asarray(cells, dtype=str))
    res = len(cells[0]) - 1
    b = cells.astype(f"S{res + 1}").view(np.uint8).reshape(-1, res + 1)
    face = np.searchsorted(_FACE_BYTES, b[:, 0])
    u = np.zeros(len(cells))
    v = np.zeros(len(cells))
    scale = 1.0
    for i in range(res):
        d = (b[:, i + 1] - ord("0")).astype(np.int64)
        scale /= 3.0
        u += (d % 3) * scale
        v += (d // 3) * scale
    u += scale / 2.0
    v += scale / 2.0
    return face, u, v, res


def cell_center(cells) -> tuple[np.ndarray, np.ndarray]:
    """cells -> (lat, lon) degrees of centers."""
    face, u, v, _ = cell_to_uv(cells)
    x, y = _face_origin(face)
    lon, lat = unproject(x + u * (_PI / 2.0), y - v * (_PI / 2.0))
    return lat, lon


def _face_origin(face: np.ndarray):
    """face index -> (x_left, y_top) planar coords."""
    x0 = np.where(face == 0, -_PI, np.where(face == 5, -_PI, -_PI + (face - 1) * (_PI / 2.0)))
    ytop = np.where(face == 0, 3.0 * _PI / 4.0, np.where(face == 5, -_PI / 4.0, _PI / 4.0))
    return x0, ytop


def parent(cells, parent_res: int) -> np.ndarray:
    """String-prefix parent (reference rhpvectorindexer.py:52-57)."""
    cells = np.atleast_1d(np.asarray(cells, dtype=str))
    return np.array([c[: parent_res + 1] for c in cells], dtype=str)


def children(cell: str, res: int) -> list[str]:
    k = res + 1 - len(cell)
    if k < 0:
        raise ValueError("res coarser than cell")
    out = [cell]
    for _ in range(k):
        out = [c + d for c in out for d in "012345678"]
    return out


def compact(cells: set[str]) -> set[str]:
    """Complete 9-sibling merge to fixpoint (rhpvectorindexer.py:87-101)."""
    cur = set(cells)
    changed = True
    while changed:
        changed = False
        by_parent: dict[str, set[str]] = {}
        for c in cur:
            if len(c) > 1:
                by_parent.setdefault(c[:-1], set()).add(c)
        for p, kids in by_parent.items():
            if len(kids) == 9:
                cur -= kids
                cur.add(p)
                changed = True
    return cur


def cell_width_deg(res: int) -> float:
    """Approximate angular cell width at a resolution (equatorial)."""
    return 90.0 / (3**res)


def grid_disk(cells, res: int, k: int) -> np.ndarray:
    """(n, (2k+1)^2) neighbor disks via angular stepping from centers.

    Used by kNN ring expansion (SURVEY.md J3).  Steps at HALF the
    nominal cell width so locally-shrunken cells (HEALPix distortion)
    cannot fall between samples; the matching conservative termination
    bound lives in RhpBackend.ring_guarantee_deg.
    """
    lat, lon = cell_center(np.atleast_1d(cells))
    step = cell_width_deg(res) / 2.0
    offs = np.arange(-k, k + 1, dtype=np.float64) * step
    dl, dn = np.meshgrid(offs, offs, indexing="ij")
    lat_n = np.clip(lat[:, None] + dl.ravel()[None, :], -90.0, 90.0)
    lon_n = np.mod(lon[:, None] + dn.ravel()[None, :] + 180.0, 360.0) - 180.0
    flat = point_to_cell(lat_n.ravel(), lon_n.ravel(), res)
    return flat.reshape(lat_n.shape)


def polyfill(rings: list[np.ndarray], res: int) -> np.ndarray:
    """Cells whose center is inside the polygon (planar centroid fill,
    reference rhpvectorindexer.py:28-33 semantics).

    Candidates: planar grid cells covering the projected (densified)
    polygon boundary bbox; centers inverse-projected and PIP-tested in
    lon/lat space in one vectorized pass.
    """
    from vector2dggs_spark.geometry.kernels import points_in_polygon

    dens = _densify(rings[0], max_step=cell_width_deg(res) / 2.0)
    x, y = project(dens[:, 0], dens[:, 1])
    side = _PI / 2.0 / (3**res)
    lo_x, hi_x = x.min() - side, x.max() + side
    lo_y, hi_y = y.min() - side, y.max() + side
    ix = np.arange(np.floor((lo_x + _PI) / side), np.floor((hi_x + _PI) / side) + 1)
    iy = np.arange(np.floor((lo_y + 3 * _PI / 4) / side), np.floor((hi_y + 3 * _PI / 4) / side) + 1)
    if ix.size * iy.size > 25_000_000:
        raise ValueError("rhp polyfill bbox too large; bisect the geometry first")
    gx, gy = np.meshgrid(ix, iy, indexing="ij")
    cx = -_PI + (gx.ravel() + 0.5) * side
    cy = -3 * _PI / 4 + (gy.ravel() + 0.5) * side
    keep = (cx >= -_PI) & (cx < _PI) & (cy > -3 * _PI / 4) & (cy < 3 * _PI / 4)
    # cap squares only exist over x in [-pi, -pi/2]
    caps = (np.abs(cy) > _PI / 4) & (cx >= -_PI / 2)
    keep &= ~caps
    cx, cy = cx[keep], cy[keep]
    if cx.size == 0:
        return np.array([], dtype=str)
    lon_c, lat_c = unproject(cx, cy)
    inside = points_in_polygon(lon_c, lat_c, rings)
    if not inside.any():
        return np.array([], dtype=str)
    return point_to_cell(lat_c[inside], lon_c[inside], res)


def linetrace(coords: np.ndarray, res: int) -> np.ndarray:
    """Cells touched along each segment (dense-sample supercover on the
    rHP grid; deterministic — reference rhpvectorindexer.py:35-45 dedup
    semantics preserved by unique())."""
    step = cell_width_deg(res) / 4.0
    samples = [_densify(coords[i : i + 2], max_step=step) for i in range(len(coords) - 1)]
    pts = np.concatenate(samples) if samples else coords
    cells = point_to_cell(pts[:, 1], pts[:, 0], res)
    _, idx = np.unique(cells, return_index=True)
    return cells[np.sort(idx)]


def _densify(coords: np.ndarray, max_step: float) -> np.ndarray:
    out = [coords[:1]]
    for i in range(len(coords) - 1):
        a, b = coords[i], coords[i + 1]
        n = max(int(np.ceil(max(abs(b[0] - a[0]), abs(b[1] - a[1])) / max_step)), 1)
        t = np.linspace(0, 1, n + 1)[1:]
        out.append(a[None, :] + t[:, None] * (b - a)[None, :])
    return np.concatenate(out)
