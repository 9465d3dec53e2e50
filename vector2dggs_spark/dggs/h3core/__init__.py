"""H3 v4 cell math — vectorized numpy reimplementation from the
published algorithm (uber/h3, Apache-2.0; public knowledge), with
base-cell tables derived geometrically at import (see tables.py).

Validated against published H3 test vectors (tests/test_h3.py):
latlng→cell reproduces libh3 bit-for-bit at the tested locations and
resolutions; parent/children/compact are exact bit operations on the
H3 index layout.

KNOWN LIMITATION: the pentagon "leading K-digit" orientation adjustment
(which needs libh3's cwOffsetPent data) is not applied, so cells inside
the 12 pentagon base cells may differ from libh3 in digit orientation;
hexagon base cells (110 of 122, covering the test fixtures) are exact.

Index layout (H3 v4): bit 63 reserved=0 | 62-59 mode=1 | 58-56 reserved
| 55-52 resolution | 51-45 base cell | 44-0 fifteen 3-bit digits
(digit for res r at bits 3·(15-r)..3·(15-r)+2; unused digits = 7).
"""
from __future__ import annotations

import numpy as np

from vector2dggs_spark.dggs.h3core import tables as T

MIN_RES, MAX_RES = 0, 15
MODE_CELL = np.uint64(1) << np.uint64(59)
_U = np.uint64

# digit rotation tables (rotating the direction vector by ±60°)
_ROT_CCW = np.array([0, 5, 3, 1, 6, 4, 2, 7], dtype=np.uint64)
# ccw: K(1)->IK(5), J(2)->JK(3), JK(3)->K(1), I(4)->IJ(6), IK(5)->I(4), IJ(6)->J(2)
_ROT_CW = np.zeros(8, dtype=np.uint64)
for _d in range(7):
    _ROT_CW[_ROT_CCW[_d]] = _d
_ROT_CW[7] = 7

_UNIT_VECS = np.array(
    [(0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1), (1, 0, 0), (1, 0, 1), (1, 1, 0)],
    dtype=np.int64,
)
_DIGIT_LOOKUP = np.full((2, 2, 2), -1, dtype=np.int64)
for _d, (_i, _j, _k) in enumerate(_UNIT_VECS):
    _DIGIT_LOOKUP[_i, _j, _k] = _d

# fold transforms flattened to arrays: for face f, edge e (opposite
# corner e), neighbor face + rotation k + 2x2 R + T
_EDGE_AXES = {0: (1, 2), 1: (0, 2), 2: (0, 1)}  # edge e spans corners of these axes
_FOLD_FACE = np.zeros((20, 3), dtype=np.int64)
_FOLD_K = np.zeros((20, 3), dtype=np.int64)
_FOLD_R = np.zeros((20, 3, 2, 2))
_FOLD_T = np.zeros((20, 3, 2))


def _corner_xy(a):
    c = {0: (2, 0, 0), 1: (0, 2, 0), 2: (0, 0, 2)}[a]
    i, j = c[0] - c[2], c[1] - c[2]
    return np.array([i - 0.5 * j, j * T.M_SIN60])


_CORNERS_XY = np.stack([_corner_xy(a) for a in range(3)])
_TRI_CEN = _CORNERS_XY.mean(axis=0)
# outward edge normals (edge e connects corners _EDGE_AXES[e])
_EDGE_N = np.zeros((3, 2))
_EDGE_A = np.zeros((3, 2))
for _e in range(3):
    _a, _b = _EDGE_AXES[_e]
    A, B = _CORNERS_XY[_a], _CORNERS_XY[_b]
    n = np.array([-(B - A)[1], (B - A)[0]])
    if n @ (_TRI_CEN - A) > 0:
        n = -n  # make it outward
    _EDGE_N[_e] = n / np.linalg.norm(n)
    _EDGE_A[_e] = A

def _tri_bary(P):
    v0 = _CORNERS_XY[1] - _CORNERS_XY[0]
    v1 = _CORNERS_XY[2] - _CORNERS_XY[0]
    v2 = np.asarray(P) - _CORNERS_XY[0]
    den = v0[0] * v1[1] - v1[0] * v0[1]
    a = (v2[0] * v1[1] - v1[0] * v2[1]) / den
    b = (v0[0] * v2[1] - v2[0] * v0[1]) / den
    return a, b


def _in_tri(P, eps=1e-9):
    a, b = _tri_bary(P)
    return a >= -eps and b >= -eps and a + b <= 1 + eps


for _f in range(20):
    _assigned = 0
    for _g in T.ADJ[_f]:
        _k, _R, _Tv = T.FOLDS[(_f, _g)]
        # which LOCAL edge of f does this fold cross?  The one whose
        # outward-nudged midpoint folds to a point inside the triangle
        # (edge coordinates differ between the two faces' frames, so a
        # midpoint-invariance test would be wrong).
        for _e in range(3):
            _a, _b = _EDGE_AXES[_e]
            mid = (_CORNERS_XY[_a] + _CORNERS_XY[_b]) / 2
            probe = mid + 0.05 * _EDGE_N[_e] * np.linalg.norm(_CORNERS_XY[_a] - _CORNERS_XY[_b])
            folded = _R @ probe + _Tv
            if not _in_tri(probe) and _in_tri(folded):
                _FOLD_FACE[_f, _e] = _g
                _FOLD_K[_f, _e] = _k
                _FOLD_R[_f, _e] = _R
                _FOLD_T[_f, _e] = _Tv
                _assigned += 1
                break
    assert _assigned == 3, f"face {_f}: only {_assigned} fold edges assigned"


# ------------------------------------------------------------- ijk (vectorized)
def _ijk_normalize(i, j, k):
    m = np.minimum(np.minimum(i, j), k)
    return i - m, j - m, k - m


def _ijk_to_hex2d(i, j, k):
    ii = i - k
    jj = j - k
    return ii - 0.5 * jj, jj * T.M_SIN60


def _hex2d_to_ijk(x, y):
    """Vectorized port of h3 _hex2dToCoordIJK (nearest hex center)."""
    a1 = np.abs(x)
    a2 = np.abs(y)
    x2 = a2 / T.M_SIN60
    x1 = a1 + x2 / 2.0
    m1 = np.floor(x1).astype(np.int64)
    m2 = np.floor(x2).astype(np.int64)
    r1 = x1 - m1
    r2 = x2 - m2

    i = np.empty_like(m1)
    j = np.empty_like(m2)
    # r1 < 0.5 branch
    b = r1 < 0.5
    bb = b & (r1 < 1.0 / 3.0)
    i = np.where(bb, m1, i)
    j = np.where(bb, np.where(r2 < (1.0 + r1) / 2.0, m2, m2 + 1), j)
    bb = b & (r1 >= 1.0 / 3.0)
    j = np.where(bb, np.where(r2 < (1.0 - r1), m2, m2 + 1), j)
    i = np.where(bb, np.where(((1.0 - r1) <= r2) & (r2 < 2.0 * r1), m1 + 1, m1), i)
    # r1 >= 0.5 branch
    b = ~(r1 < 0.5)
    bb = b & (r1 < 2.0 / 3.0)
    j = np.where(bb, np.where(r2 < (1.0 - r1), m2, m2 + 1), j)
    i = np.where(bb, np.where((2.0 * r1 - 1.0 < r2) & (r2 < 1.0 - r1), m1, m1 + 1), i)
    bb = b & (r1 >= 2.0 / 3.0)
    i = np.where(bb, m1 + 1, i)
    j = np.where(bb, np.where(r2 < r1 / 2.0, m2, m2 + 1), j)

    # fold across axes
    neg_x = x < 0.0
    even_j = (j % 2) == 0
    axisi = np.where(even_j, j // 2, (j + 1) // 2)
    diff = i - axisi
    i = np.where(neg_x, np.where(even_j, i - 2 * diff, i - (2 * diff + 1)), i)
    neg_y = y < 0.0
    i = np.where(neg_y, i - (2 * j + 1) // 2, i)
    j = np.where(neg_y, -j, j)
    k = np.zeros_like(i)
    return _ijk_normalize(i, j, k)


def _up_ap7(i, j, k):
    ii = i - k
    jj = j - k
    return _ijk_normalize(
        np.round((3 * ii - jj) / 7.0).astype(np.int64),
        np.round((ii + 2 * jj) / 7.0).astype(np.int64),
        np.zeros_like(i),
    )


def _up_ap7r(i, j, k):
    ii = i - k
    jj = j - k
    return _ijk_normalize(
        np.round((2 * ii + jj) / 7.0).astype(np.int64),
        np.round((3 * jj - ii) / 7.0).astype(np.int64),
        np.zeros_like(i),
    )


def _down_ap7(i, j, k):
    return _ijk_normalize(3 * i + j, 3 * j + k, i + 3 * k)


def _down_ap7r(i, j, k):
    return _ijk_normalize(3 * i + k, i + 3 * j, j + 3 * k)


# ------------------------------------------------------------- forward
def _geo_to_hex2d(lat, lon, face, res):
    fc = T.FACE_CENTER_GEO[face]
    fclat, fclon = fc[:, 0], fc[:, 1]
    cosr = np.sin(fclat) * np.sin(lat) + np.cos(fclat) * np.cos(lat) * np.cos(lon - fclon)
    r = np.arccos(np.clip(cosr, -1.0, 1.0))
    az = np.arctan2(
        np.cos(lat) * np.sin(lon - fclon),
        np.cos(fclat) * np.sin(lat) - np.sin(fclat) * np.cos(lat) * np.cos(lon - fclon),
    )
    theta = np.mod(T.FACE_AXES_AZ[face, 0] - np.mod(az, 2 * np.pi), 2 * np.pi)
    if res % 2 == 1:
        theta = np.mod(theta - T.M_AP7_ROT_RADS, 2 * np.pi)
    rr = np.tan(r) / T.RES0_U_GNOMONIC
    rr = rr * (T.M_SQRT7 ** res)
    return rr * np.cos(theta), rr * np.sin(theta)


def latlng_to_cell(lat_deg, lon_deg, res: int) -> np.ndarray:
    """Vectorized (lat°, lon°) -> uint64 H3 cell index at ``res``."""
    lat = np.radians(np.atleast_1d(np.asarray(lat_deg, dtype=np.float64)))
    lon = np.radians(np.atleast_1d(np.asarray(lon_deg, dtype=np.float64)))
    xyz = np.stack([np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon), np.sin(lat)], axis=1)
    face = np.argmax(xyz @ T.FACE_XYZ.T, axis=1)
    x, y = _geo_to_hex2d(lat, lon, face, res)
    i, j, k = _hex2d_to_ijk(x, y)

    digits = np.full((lat.shape[0], 16), 7, dtype=np.uint64)
    for r in range(res, 0, -1):
        li, lj, lk = i, j, k
        if r % 2 == 1:
            i, j, k = _up_ap7(i, j, k)
            ci, cj, ck = _down_ap7(i, j, k)
        else:
            i, j, k = _up_ap7r(i, j, k)
            ci, cj, ck = _down_ap7r(i, j, k)
        di, dj, dk = _ijk_normalize(li - ci, lj - cj, lk - ck)
        digits[:, r] = _DIGIT_LOOKUP[di, dj, dk]

    ic = np.clip(i, 0, 2)
    jc = np.clip(j, 0, 2)
    kc = np.clip(k, 0, 2)
    bc = T.BASE_CELL_TABLE[face, ic, jc, kc].astype(np.uint64)
    rots = T.CCW_ROT_TABLE[face, ic, jc, kc]

    v = MODE_CELL | (_U(res) << _U(52)) | (bc << _U(45))
    digit_bits = np.zeros_like(v)
    for r in range(1, 16):
        digit_bits |= digits[:, r] << _U(3 * (15 - r))
    # apply per-cell ccw rotations to the digit payload
    for rot in range(1, 6):
        m = rots >= rot
        if not m.any():
            continue
        rotated = np.zeros_like(digit_bits[m])
        sub = digit_bits[m]
        for r in range(1, 16):
            d = (sub >> _U(3 * (15 - r))) & _U(7)
            rotated |= _ROT_CCW[d.astype(np.int64)] << _U(3 * (15 - r))
        digit_bits[m] = rotated
    return v | digit_bits


# ------------------------------------------------------------- inverse
def _cells_to_substrate_ijk(cells: np.ndarray):
    """cells -> (face, i, j, k, sub) integer lattice coords on the home
    face in a class-II grid ('substrate' = res+1 for class-III cells)."""
    res = get_resolution(cells)
    if not np.all(res == res[0]):
        raise ValueError("mixed resolutions in batch")
    r0 = int(res[0])
    bc = ((cells >> _U(45)) & _U(127)).astype(np.int64)
    face = T.HOME_FACE[bc].copy()
    i = T.HOME_IJK[bc, 0].copy()
    j = T.HOME_IJK[bc, 1].copy()
    k = T.HOME_IJK[bc, 2].copy()
    for r in range(1, r0 + 1):
        if r % 2 == 1:
            i, j, k = _down_ap7(i, j, k)
        else:
            i, j, k = _down_ap7r(i, j, k)
        d = ((cells >> _U(3 * (15 - r))) & _U(7)).astype(np.int64)
        u = _UNIT_VECS[d]
        i, j, k = _ijk_normalize(i + u[:, 0], j + u[:, 1], k + u[:, 2])
    sub = r0
    if r0 % 2 == 1:  # class III -> class II substrate one res down
        i, j, k = _down_ap7r(i, j, k)
        sub = r0 + 1
    return face, i, j, k, sub


def _substrate_to_geo(face, i, j, k, sub):
    x, y = _ijk_to_hex2d(i.astype(np.float64), j.astype(np.float64), k.astype(np.float64))
    scale = T.M_SQRT7 ** sub
    return _hex2d_res0_to_geo(face, x / scale, y / scale)


def cell_to_latlng(cells) -> tuple[np.ndarray, np.ndarray]:
    """cells (uint64) -> (lat°, lon°) of centers, vectorized."""
    cells = np.atleast_1d(np.asarray(cells, dtype=np.uint64))
    face, i, j, k, sub = _cells_to_substrate_ijk(cells)
    return _substrate_to_geo(face, i, j, k, sub)


# ------------------------------------------------------------- bit ops
def get_resolution(cells) -> np.ndarray:
    cells = np.atleast_1d(np.asarray(cells, dtype=np.uint64))
    return ((cells >> _U(52)) & _U(15)).astype(np.int64)


def base_cell(cells) -> np.ndarray:
    cells = np.atleast_1d(np.asarray(cells, dtype=np.uint64))
    return ((cells >> _U(45)) & _U(127)).astype(np.int64)


def cell_to_parent(cells, parent_res: int) -> np.ndarray:
    """Pure bit op (SURVEY.md C4)."""
    cells = np.atleast_1d(np.asarray(cells, dtype=np.uint64))
    res_mask = _U(15) << _U(52)
    fill = _U((1 << (3 * (15 - parent_res))) - 1)
    return (cells & ~res_mask) | (_U(parent_res) << _U(52)) | fill


def cell_to_center_child(cells, child_res: int) -> np.ndarray:
    cells = np.atleast_1d(np.asarray(cells, dtype=np.uint64))
    res = get_resolution(cells)
    if not np.all(res <= child_res):
        raise ValueError("child_res coarser than cell")
    res_mask = _U(15) << _U(52)
    out = (cells & ~res_mask) | (_U(child_res) << _U(52))
    # zero the digits between res+1..child_res (they are currently 7)
    for r in range(1, 16):
        m = (res < r) & (r <= child_res)
        if m.any():
            out[m] &= ~(_U(7) << _U(3 * (15 - r)))
    return out


def is_pentagon(cells) -> np.ndarray:
    cells = np.atleast_1d(np.asarray(cells, dtype=np.uint64))
    bc = base_cell(cells)
    pent = T.IS_PENTAGON[bc]
    res = get_resolution(cells)
    # pentagon cell = pentagon base cell with all-zero digits
    allzero = np.ones(len(cells), dtype=bool)
    for r in range(1, 16):
        d = (cells >> _U(3 * (15 - r))) & _U(7)
        allzero &= (d == 0) | (r > res)
    return pent & allzero


def cell_to_children(cell: int, child_res: int) -> list[int]:
    """All descendants at child_res (pentagon K-subsequence skipped)."""
    cell = int(cell)
    res = int(get_resolution([cell])[0])
    if child_res < res:
        raise ValueError("child_res coarser than cell")
    out = [cell]
    for r in range(res + 1, child_res + 1):
        nxt = []
        for c in out:
            pent = bool(is_pentagon([c])[0])
            base = (c & ~(0xF << 52)) | (r << 52)
            base &= ~(7 << (3 * (15 - r)))
            for d in range(7):
                if pent and d == 1:
                    continue
                nxt.append(base | (d << (3 * (15 - r))))
        out = nxt
    return out


def compact_cells(cells) -> set[int]:
    """Complete-sibling merge to a fixpoint (H3 compactCells semantics)."""
    cur = {int(c) for c in np.asarray(list(cells), dtype=np.uint64)}
    changed = True
    while changed:
        changed = False
        by_parent: dict[int, set[int]] = {}
        for c in cur:
            res = (c >> 52) & 15
            if res == 0:
                continue
            p = int(cell_to_parent([c], res - 1)[0])
            by_parent.setdefault(p, set()).add(c)
        for p, kids in by_parent.items():
            need = 6 if bool(is_pentagon([p])[0]) else 7
            if len(kids) == need:
                cur -= kids
                cur.add(p)
                changed = True
    return cur


# ------------------------------------------------------------- tokens
def to_token(cells) -> np.ndarray:
    cells = np.atleast_1d(np.asarray(cells, dtype=np.uint64))
    return np.array([format(int(c), "x") for c in cells], dtype=str)


def from_token(tokens) -> np.ndarray:
    return np.array([np.uint64(int(t, 16)) for t in np.atleast_1d(tokens)], dtype=np.uint64)


# ------------------------------------------------------------- traversal
def neighbors(cells) -> np.ndarray:
    """(n, 6) matrix of neighbor cells (duplicates possible at pentagons).

    Computed geometrically: each cell's six lattice-adjacent centers are
    unfolded to geo and re-encoded — exact for hexagons, and robust at
    face boundaries because encode picks the canonical cell."""
    cells = np.atleast_1d(np.asarray(cells, dtype=np.uint64))
    res = int(get_resolution(cells)[0])
    out = np.empty((len(cells), 6), dtype=np.uint64)
    face, i, j, k, sub = _cells_to_substrate_ijk(cells)
    for d in range(1, 7):
        u = _UNIT_VECS[d]
        if sub > res:
            # class III: a res-r unit step expressed in substrate coords
            # via the linear down-aperture map
            oi, oj, ok = _down_ap7r(
                np.array([u[0]]), np.array([u[1]]), np.array([u[2]])
            )
            oi, oj, ok = int(oi[0]), int(oj[0]), int(ok[0])
        else:
            oi, oj, ok = int(u[0]), int(u[1]), int(u[2])
        ni, nj, nk = _ijk_normalize(i + oi, j + oj, k + ok)
        nlat, nlon = _substrate_to_geo(face, ni, nj, nk, sub)
        out[:, d - 1] = latlng_to_cell(nlat, nlon, res)
    return out


def _hex2d_res0_to_geo(face, x, y):
    face = face.copy()
    x = x.copy()
    y = y.copy()
    for _ in range(4):
        s = np.stack(
            [(np.stack([x, y], 1) - _EDGE_A[e]) @ _EDGE_N[e] for e in range(3)], axis=1
        )
        outm = s.max(axis=1) > 1e-12
        if not outm.any():
            break
        e = s.argmax(axis=1)
        fo = face[outm]
        eo = e[outm]
        P = np.stack([x[outm], y[outm]], axis=1)
        P2 = np.einsum("nab,nb->na", _FOLD_R[fo, eo], P) + _FOLD_T[fo, eo]
        x[outm] = P2[:, 0]
        y[outm] = P2[:, 1]
        face[outm] = _FOLD_FACE[fo, eo]
    r = np.sqrt(x * x + y * y)
    theta = np.arctan2(y, x)
    rr = np.arctan(r * T.RES0_U_GNOMONIC)
    az = np.mod(T.FACE_AXES_AZ[face, 0] - theta, 2 * np.pi)
    fclat = T.FACE_CENTER_GEO[face, 0]
    fclon = T.FACE_CENTER_GEO[face, 1]
    sinlat = np.clip(
        np.sin(fclat) * np.cos(rr) + np.cos(fclat) * np.sin(rr) * np.cos(az), -1, 1
    )
    lat2 = np.arcsin(sinlat)
    lon2 = fclon + np.arctan2(
        np.sin(az) * np.sin(rr) * np.cos(fclat), np.cos(rr) - np.sin(fclat) * sinlat
    )
    return np.degrees(lat2), np.degrees(np.mod(lon2 + np.pi, 2 * np.pi) - np.pi)


def grid_disk(cells, k: int) -> list[np.ndarray]:
    """Per-cell disk (self + rings 1..k) via BFS over ``neighbors``."""
    cells = np.atleast_1d(np.asarray(cells, dtype=np.uint64))
    disks = [set([int(c)]) for c in cells]
    frontier = [set([int(c)]) for c in cells]
    for _ in range(k):
        flat = []
        owners = []
        for idx, fr in enumerate(frontier):
            for c in fr:
                flat.append(c)
                owners.append(idx)
        if not flat:
            break
        nb = neighbors(np.array(flat, dtype=np.uint64))
        new_frontier = [set() for _ in cells]
        for row, owner in zip(nb, owners):
            for c in row:
                ci = int(c)
                if ci not in disks[owner]:
                    disks[owner].add(ci)
                    new_frontier[owner].add(ci)
        frontier = new_frontier
    return [np.array(sorted(d), dtype=np.uint64) for d in disks]


def cell_boundary(cells) -> tuple[np.ndarray, np.ndarray]:
    """cells -> (lat, lon) arrays of shape (n, 6): hexagon vertices.

    Each vertex is the lattice centroid of the cell and two consecutive
    neighbors ((c + n_i + n_{i+1})/3 — exact in the gnomonic plane),
    unfolded across face edges like cell centers.  Pentagon cells get a
    degenerate 6th vertex (duplicate), consistent with the documented
    pentagon limitation."""
    cells = np.atleast_1d(np.asarray(cells, dtype=np.uint64))
    res = int(get_resolution(cells)[0])
    face, i, j, k, sub = _cells_to_substrate_ijk(cells)
    # neighbor offsets in substrate units, sorted by angle
    offs = []
    for d in range(1, 7):
        u = _UNIT_VECS[d]
        if sub > res:
            oi, oj, ok = _down_ap7r(np.array([u[0]]), np.array([u[1]]), np.array([u[2]]))
            offs.append((int(oi[0]), int(oj[0]), int(ok[0])))
        else:
            offs.append((int(u[0]), int(u[1]), int(u[2])))
    xy = [np.array(_ijk_to_hex2d(np.float64(o[0]), np.float64(o[1]), np.float64(o[2]))) for o in offs]
    order = np.argsort([np.arctan2(v[1], v[0]) for v in xy])
    cx, cy = _ijk_to_hex2d(i.astype(np.float64), j.astype(np.float64), k.astype(np.float64))
    scale = T.M_SQRT7 ** sub
    lat_out = np.empty((len(cells), 6))
    lon_out = np.empty((len(cells), 6))
    for vi in range(6):
        o1 = xy[order[vi]]
        o2 = xy[order[(vi + 1) % 6]]
        # vertex = (center + n1 + n2)/3 where n = center + offset
        vx = cx + (o1[0] + o2[0]) / 3.0
        vy = cy + (o1[1] + o2[1]) / 3.0
        la, lo = _hex2d_res0_to_geo(face.copy(), vx / scale, vy / scale)
        lat_out[:, vi] = la
        lon_out[:, vi] = lo
    return lat_out, lon_out


def grid_path_cells(a: int, b: int) -> np.ndarray:
    """Cells on the hex-grid line from ``a`` to ``b`` (inclusive) — the
    h3 gridPathCells shape: linear interpolation between the two centers
    with per-sample rounding to the containing cell.  Same-home-face
    pairs interpolate in the shared gnomonic (substrate hex2d) frame —
    exactly the hex-line construction; cross-face pairs interpolate the
    geodesic chord (the reference's own gridPathCells also degrades for
    distant cells)."""
    va = np.array([a], dtype=np.uint64)
    vb = np.array([b], dtype=np.uint64)
    res = int(get_resolution(va)[0])
    fa, ia, ja, ka, sub = _cells_to_substrate_ijk(va)
    fb, ib, jb, kb, _ = _cells_to_substrate_ijk(vb)
    step = T.M_SQRT7 if sub > res else 1.0  # res-cell spacing in substrate units
    if int(fa[0]) == int(fb[0]):
        xa, ya = _ijk_to_hex2d(float(ia[0]), float(ja[0]), float(ka[0]))
        xb, yb = _ijk_to_hex2d(float(ib[0]), float(jb[0]), float(kb[0]))
        n = max(int(np.ceil(np.hypot(xb - xa, yb - ya) / step)), 1)
        t = np.linspace(0.0, 1.0, 2 * n + 1)  # 2x oversample: < 1/2 cell/step
        xs = (xa + (xb - xa) * t) / (T.M_SQRT7 ** sub)
        ys = (ya + (yb - ya) * t) / (T.M_SQRT7 ** sub)
        lat, lon = _hex2d_res0_to_geo(np.full(len(xs), int(fa[0])), xs, ys)
    else:
        la, lo = cell_to_latlng(va)
        lb, lob = cell_to_latlng(vb)
        n = 256
        t = np.linspace(0, 1, n)
        lat = la[0] + (lb[0] - la[0]) * t
        lon = lo[0] + (lob[0] - lo[0]) * t
    cells = latlng_to_cell(lat, lon, res)
    _, idx = np.unique(cells, return_index=True)
    return cells[np.sort(idx)]


def mean_center_spacing_deg(res: int) -> float:
    """Empirical min center-to-center spacing (degrees) at a resolution —
    used for kNN ring guarantees and polyfill disk sizing."""
    c = latlng_to_cell([-44.0], [-176.4], res)
    nb = neighbors(c)
    lat0, lon0 = cell_to_latlng(c)
    nlat, nlon = cell_to_latlng(nb[0])
    d = np.sqrt((nlat - lat0[0]) ** 2 + (nlon - lon0[0]) ** 2)
    return float(d.min())
