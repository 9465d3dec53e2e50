"""A5 pentagonal DGGS backend (SURVEY.md C17/C18) — from scratch.

Mirrors the reference's A5 surface (``vector2dggs/indexers/
a5vectorindexer.py:16-103``: lonlat_to_cell / polygon_to_cells /
line_string_to_cells / cell_to_parent / cell_to_children / compact /
u64↔hex tokens) re-derived from the published A5 construction
(a5geo.org, github.com/felixpalmer/a5: dodecahedron projection,
pentagon faces split into five quintants, aperture-4 hierarchy,
64-bit cell ids).

Construction used here (documented deviation — the upstream a5
library's exact Hilbert anchor layout and bit values are not
reproducible without the library, so like the S2 backend this is
structurally faithful, not bit-parity):

* 12 dodecahedron faces = Voronoi regions of the 12 icosahedron
  vertex directions (standard (0, ±1, ±φ) icosahedron).  Under
  gnomonic projection each face's Voronoi region is EXACTLY a regular
  pentagon in the face's tangent plane (the Voronoi boundary planes
  pass through the origin, so they project to straight lines), so the
  partition below is exact.
* each pentagon splits into 5 quintant triangles (apex at the face
  center, base between adjacent pentagon vertices = icosahedron face
  center directions).
* below the quintant, an aperture-4 triangle quadtree: each triangle
  splits into 4 (three corner triangles + the point-reflected middle),
  2 bits per level — matching A5's published aperture-4 hierarchy
  (cell areas divide by 4 per resolution, reference constants.py
  A5_CELL_AREA_M2_BY_LEVEL).

Cell id layout (u64): bits 63-60 face | 59-57 quintant | 2 bits per
level, level lv's digit at bits [57-2(lv-1), 58-2(lv-1)] | a single
marker 1 bit directly below the last digit at bit 56-2(res-1)
(S2-style: the marker position encodes the resolution, making parent a
pure bit operation — native in Spark SQL).  res 0 = face (marker at
bit 59), res 1 = quintant, res r>=2 adds r-1 digits.
Tokens are 16-char zero-padded lowercase hex.
"""
from __future__ import annotations

import numpy as np

MIN_RES, MAX_RES = 0, 29
GEODESIC = True

_PHI = (1.0 + np.sqrt(5.0)) / 2.0


def _icosahedron():
    verts = []
    for a, b in ((1.0, _PHI), (-1.0, _PHI), (1.0, -_PHI), (-1.0, -_PHI)):
        verts.append((0.0, a, b))
        verts.append((a, b, 0.0))
        verts.append((b, 0.0, a))
    v = np.array(verts)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


FACE_XYZ = _icosahedron()  # (12, 3) dodecahedron face centers

# icosahedron faces = triples of mutually-adjacent vertices; their
# normalized centroids are the 20 dodecahedron vertices
_adj = FACE_XYZ @ FACE_XYZ.T
_pairs = _adj > 0.4  # cos(63.43°) ≈ 0.447: adjacent vertices
_tris = []
for _i in range(12):
    for _j in range(_i + 1, 12):
        if not _pairs[_i, _j]:
            continue
        for _k in range(_j + 1, 12):
            if _pairs[_i, _k] and _pairs[_j, _k]:
                _tris.append((_i, _j, _k))
assert len(_tris) == 20
DODECA_VERT = np.array([FACE_XYZ[list(t)].mean(axis=0) for t in _tris])
DODECA_VERT /= np.linalg.norm(DODECA_VERT, axis=1, keepdims=True)

# tangent frames + quintant geometry per face
_E1 = np.zeros((12, 3))
_E2 = np.zeros((12, 3))
_AZ0 = np.zeros(12)
_RHO = float(np.tan(np.arccos(np.clip(FACE_XYZ[0] @ DODECA_VERT.T, -1, 1)).min()))
for _f in range(12):
    c = FACE_XYZ[_f]
    ref = np.array([0.0, 0.0, 1.0]) if abs(c[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
    e1 = ref - (ref @ c) * c
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(c, e1)
    _E1[_f], _E2[_f] = e1, e2
    # the five pentagon vertices of this face
    d = DODECA_VERT @ c
    vs = DODECA_VERT[np.argsort(-d)[:5]]
    proj = vs / (vs @ c)[:, None]  # gnomonic
    az = np.arctan2(proj @ e2, proj @ e1)
    _AZ0[_f] = np.sort(np.mod(az, 2 * np.pi))[0]
    # vertices are equally spaced by 72° (regular pentagon)
    sp = np.diff(np.sort(np.mod(az - _AZ0[_f], 2 * np.pi)))
    assert np.allclose(sp, 2 * np.pi / 5, atol=1e-9)

_SECTOR = 2 * np.pi / 5
_U = np.uint64


def _marker_pos(res: int) -> int:
    return 59 if res == 0 else 56 - 2 * (res - 1)


def get_resolution(cells) -> np.ndarray:
    cells = np.atleast_1d(np.asarray(cells, dtype=np.uint64))
    lsb = (cells & (~cells + _U(1))).astype(np.uint64)
    pos = np.zeros(len(cells), dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (_U(1) << _U(shift))
        pos[m] += shift
        v[m] >>= _U(shift)
    return np.where(pos == 59, 0, (56 - pos) // 2 + 1)


def _vert_xy(face, q):
    a1 = _AZ0[face] + q * _SECTOR
    a2 = a1 + _SECTOR
    return (
        _RHO * np.cos(a1),
        _RHO * np.sin(a1),
        _RHO * np.cos(a2),
        _RHO * np.sin(a2),
    )


def lonlat_to_cell(lat_deg, lon_deg, res: int) -> np.ndarray:
    """Vectorized (lat°, lon°) -> u64 A5 cell at ``res``."""
    lat = np.radians(np.atleast_1d(np.asarray(lat_deg, dtype=np.float64)))
    lon = np.radians(np.atleast_1d(np.asarray(lon_deg, dtype=np.float64)))
    xyz = np.stack([np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon), np.sin(lat)], 1)
    face = np.argmax(xyz @ FACE_XYZ.T, axis=1)
    c = FACE_XYZ[face]
    p = xyz / np.maximum((xyz * c).sum(1), 1e-12)[:, None]
    x = (p * _E1[face]).sum(1)
    y = (p * _E2[face]).sum(1)
    out = _U(0) | (face.astype(np.uint64) << _U(60))
    if res == 0:
        return out | (_U(1) << _U(59))
    theta = np.mod(np.arctan2(y, x) - _AZ0[face], 2 * np.pi)
    q = np.minimum((theta / _SECTOR).astype(np.int64), 4)
    out |= q.astype(np.uint64) << _U(57)
    if res >= 2:
        v1x, v1y, v2x, v2y = _vert_xy(face, q)
        det = v1x * v2y - v2x * v1y
        s = (x * v2y - v2x * y) / det
        t = (v1x * y - x * v1y) / det
        for lv in range(2, res + 1):
            s = s * 2.0
            t = t * 2.0
            d = np.zeros(len(s), dtype=np.uint64)
            apex = s + t <= 1.0
            mb = ~apex & (s >= 1.0)
            mc = ~apex & ~mb & (t >= 1.0)
            mid = ~apex & ~mb & ~mc
            d[apex] = 1
            d[mb] = 2
            d[mc] = 3
            s = np.where(mb, s - 1.0, s)
            t = np.where(mc, t - 1.0, t)
            s2 = np.where(mid, 1.0 - s, s)
            t2 = np.where(mid, 1.0 - t, t)
            s, t = s2, t2
            out |= d << _U(57 - 2 * (lv - 1))
    return out | (_U(1) << _U(_marker_pos(res)))


def cell_to_lonlat(cells) -> tuple[np.ndarray, np.ndarray]:
    """cells -> (lon°, lat°) centers (centroid of the cell triangle in
    its local frame), vectorized; mixed resolutions allowed."""
    cells = np.atleast_1d(np.asarray(cells, dtype=np.uint64))
    res = get_resolution(cells)
    face = (cells >> _U(60)).astype(np.int64)
    q = ((cells >> _U(57)) & _U(7)).astype(np.int64)
    # accumulate the inverse transforms finest -> coarsest
    s = np.full(len(cells), 1.0 / 3.0)
    t = np.full(len(cells), 1.0 / 3.0)
    maxr = int(res.max()) if len(res) else 0
    for lv in range(maxr, 1, -1):
        m = res >= lv
        if not m.any():
            continue
        d = ((cells >> _U(57 - 2 * (lv - 1))) & _U(3)).astype(np.int64)
        sm, tm, dm = s[m], t[m], d[m]
        ns = np.where(dm == 1, sm / 2, np.where(dm == 2, (sm + 1) / 2, np.where(dm == 3, sm / 2, (1 - sm) / 2)))
        nt = np.where(dm == 1, tm / 2, np.where(dm == 2, tm / 2, np.where(dm == 3, (tm + 1) / 2, (1 - tm) / 2)))
        s[m], t[m] = ns, nt
    # res 1 cell center: quintant triangle centroid; res 0: face center
    r0 = res == 0
    v1x, v1y, v2x, v2y = _vert_xy(face, q)
    x = s * v1x + t * v2x
    y = s * v1y + t * v2y
    x = np.where(r0, 0.0, x)
    y = np.where(r0, 0.0, y)
    p = FACE_XYZ[face] + x[:, None] * _E1[face] + y[:, None] * _E2[face]
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    lat = np.degrees(np.arcsin(np.clip(p[:, 2], -1, 1)))
    lon = np.degrees(np.arctan2(p[:, 1], p[:, 0]))
    return lon, lat


def cell_to_parent(cells, parent_res: int) -> np.ndarray:
    """Pure bit op: clear everything below the parent marker, set it."""
    cells = np.atleast_1d(np.asarray(cells, dtype=np.uint64))
    pos = _marker_pos(parent_res)
    keep = ~_U((1 << (pos + 1)) - 1)
    return (cells & keep) | (_U(1) << _U(pos))


def cell_to_children(cell: int, child_res: int) -> list[int]:
    """All descendants at ``child_res`` (5 quintants under res 0, 4
    triangle children per level below)."""
    cell = int(cell)
    res = int(get_resolution([cell])[0])
    if child_res <= res:
        return [cell]
    base = cell & ~(1 << _marker_pos(res))  # strip marker
    out = [base]
    for lv in range(res + 1, child_res + 1):
        nxt = []
        if lv == 1:
            for c in out:
                nxt.extend(c | (qq << 57) for qq in range(5))
        else:
            sh = 57 - 2 * (lv - 1)
            for c in out:
                nxt.extend(c | (dd << sh) for dd in range(4))
        out = nxt
    mk = 1 << _marker_pos(child_res)
    return [c | mk for c in out]


def compact(cells) -> set[int]:
    """Merge complete sibling sets bottom-up (4 triangles; 5 quintants
    at the res-1 level) — the reference a5.compact role.

    Pure-int bit math per cell (c & -c locates the marker; the parent
    is two masks) — the r05 form called 1-element numpy
    get_resolution()/cell_to_parent() per cell (~20-75 us each, the
    q60 pipeline's dominant compaction cost).  Identical merges."""
    cur = {int(c) for c in cells}
    if not cur:
        return cur

    def _res(c: int) -> int:
        pos = (c & -c).bit_length() - 1
        return 0 if pos == 59 else (56 - pos) // 2 + 1

    res_of = {c: _res(c) for c in cur}
    for res in range(max(res_of.values()), 0, -1):
        need = 5 if res == 1 else 4
        ppos = _marker_pos(res - 1)
        keep = ~((1 << (ppos + 1)) - 1)
        by_parent: dict[int, list[int]] = {}
        for c in cur:
            if res_of[c] == res:
                by_parent.setdefault((c & keep) | (1 << ppos), []).append(c)
        for p, kids in by_parent.items():
            if len(kids) == need:
                cur -= set(kids)
                cur.add(p)
                res_of[p] = res - 1
    return cur


def to_token(cells) -> np.ndarray:
    # bulk C hex via binascii over the big-endian byte view (fixed
    # 16-digit tokens, no strip) — same speedup as the s2 encoder
    import binascii

    cells = np.atleast_1d(np.asarray(cells, dtype=np.uint64))
    hx = binascii.hexlify(cells.astype(">u8").tobytes())
    arr = np.frombuffer(hx, dtype="S16")
    return np.array([t.decode() for t in arr], dtype=object)


def from_token(tokens) -> np.ndarray:
    return np.array([int(t, 16) for t in np.atleast_1d(np.asarray(tokens, dtype=str))], dtype=np.uint64)


def cell_width_deg(res: int) -> float:
    """Angular cell diameter bound: the pentagon circumdiameter halves
    per level below res 1."""
    base = 2.0 * np.degrees(np.arctan(_RHO))
    return base / (1 << res) if res else base


def polyfill(rings: list[np.ndarray], res: int) -> np.ndarray:
    """Fixed-res cells whose center lies inside the polygon (the
    engine's uniform center-containment modality; the reference wraps
    a5.polygon_to_cells + uncompact the same way)."""
    from vector2dggs_spark.geometry.kernels import points_in_polygon

    ext = rings[0]
    w = cell_width_deg(res)
    # sample grid fine enough that every candidate cell (triangle
    # inradius ≈ 0.25·w) contains at least one sample
    step = max(w * 0.33, 1e-9)
    gx = np.arange(ext[:, 0].min() - w, ext[:, 0].max() + w + step, step)
    gy = np.arange(ext[:, 1].min() - w, ext[:, 1].max() + w + step, step)
    if gx.size * gy.size > 30_000_000:
        raise ValueError("a5 polyfill bbox too large at this res; bisect first")
    mx, my = np.meshgrid(gx, gy, indexing="ij")
    cand = np.unique(lonlat_to_cell(my.ravel(), mx.ravel(), res))
    lon_c, lat_c = cell_to_lonlat(cand)
    inside = points_in_polygon(lon_c, lat_c, rings)
    return to_token(cand[inside])


def linetrace(coords: np.ndarray, res: int) -> np.ndarray:
    """Dense-sample the polyline at sub-cell spacing, dedup keep-first
    (reference line_string_to_cells role)."""
    step = cell_width_deg(res) / 4.0
    pts = [coords[:1]]
    for a, b in zip(coords[:-1], coords[1:]):
        n = max(int(np.ceil(max(abs(b[0] - a[0]), abs(b[1] - a[1])) / step)), 1)
        tt = np.linspace(0, 1, n + 1)[1:]
        pts.append(a[None, :] + tt[:, None] * (b - a)[None, :])
    pts = np.concatenate(pts)
    cells = to_token(lonlat_to_cell(pts[:, 1], pts[:, 0], res))
    _, idx = np.unique(cells, return_index=True)
    return cells[np.sort(idx)]


def grid_disk(cells, res: int, k: int) -> np.ndarray:
    """(n, (2k+1)²) neighbor matrix by angular stepping from centers
    (kNN ring-expansion primitive, same approach as the S2 backend)."""
    v = from_token(np.atleast_1d(cells)) if np.asarray(cells).dtype.kind in "UO" else np.atleast_1d(cells).astype(np.uint64)
    lon, lat = cell_to_lonlat(v)
    step = cell_width_deg(res) / 2.0
    offs = np.arange(-k, k + 1, dtype=np.float64) * step
    dl, dn = np.meshgrid(offs, offs, indexing="ij")
    lat_n = np.clip(lat[:, None] + dl.ravel()[None, :], -90.0, 90.0)
    lon_n = np.mod(lon[:, None] + dn.ravel()[None, :] + 180.0, 360.0) - 180.0
    flat = to_token(lonlat_to_cell(lat_n.ravel(), lon_n.ravel(), res))
    return flat.reshape(lat_n.shape)
