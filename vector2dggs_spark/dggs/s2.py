"""S2-style DGGS backend — pure-numpy port of the published S2 cell-ID
construction (s2geometry.io; Apache-2.0 reference implementation):

* six cube faces (largest-|axis| selection, the canonical face→XYZ
  frames), quadratic UV↔ST projection,
* 30-level Hilbert curve position bits built from the canonical base
  tables (kPosToIJ / kPosToOrientation) via the standard 4-bit lookup
  generation,
* 64-bit cell IDs ``face(3) | position(2·level) | sentinel``, tokens =
  hex with trailing zeros stripped (face cells are "1","3","5","7","9","b").

Semantics mirror the reference's S2 indexer
(``/root/reference/vector2dggs/indexers/s2vectorindexer.py``): polygon
fill is a fixed-level covering post-filtered to cells whose CENTER lies
inside the polygon (s2vectorindexer.py:92-157 + 190-199) — implemented
directly as fixed-level ij-range enumeration + vectorized PIP, which
yields exactly that set; linetrace is fixed-level cells along the line
(s2vectorindexer.py:201-218, dense-sample approximation); parent is a
pure bit op with token re-encode (s2vectorindexer.py:51-62); compaction
merges complete 4-sibling sets (NormalizeS2CellUnion semantics,
s2vectorindexer.py:229-241).

Structural invariants are tested (tests/test_s2.py); bit-parity with
libs2 is expected from the shared construction but not vector-verified
in this container (no s2 library available).
"""
from __future__ import annotations

import numpy as np

MIN_RES = 0
MAX_RES = 30
GEODESIC = True  # covering is computed on the sphere
_MAX = 30
_U = np.uint64

_SWAP, _INVERT = 1, 2
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)

# 4-bit lookup tables (generated exactly like s2geometry's InitLookupCell)
_LOOKUP_POS = np.zeros(1 << 10, dtype=np.int64)
_LOOKUP_IJ = np.zeros(1 << 10, dtype=np.int64)


def _init_lookup(level, i, j, orig_orient, pos, orient):
    if level == 4:
        ij = (i << 4) | j
        _LOOKUP_POS[(ij << 2) | orig_orient] = (pos << 2) | orient
        _LOOKUP_IJ[(pos << 2) | orig_orient] = (ij << 2) | orient
        return
    for p in range(4):
        ij = _POS_TO_IJ[orient][p]
        _init_lookup(
            level + 1,
            (i << 1) | (ij >> 1),
            (j << 1) | (ij & 1),
            orig_orient,
            (pos << 2) | p,
            orient ^ _POS_TO_ORIENT[p],
        )


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)


# ------------------------------------------------------------ face / uv / st
def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    # negative axis -> face + 3
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f in range(6):
        m = face == f
        if not m.any():
            continue
        if f == 0:
            u[m], v[m] = y[m] / x[m], z[m] / x[m]
        elif f == 1:
            u[m], v[m] = -x[m] / y[m], z[m] / y[m]
        elif f == 2:
            u[m], v[m] = -x[m] / z[m], -y[m] / z[m]
        elif f == 3:
            u[m], v[m] = z[m] / x[m], y[m] / x[m]
        elif f == 4:
            u[m], v[m] = z[m] / y[m], -x[m] / y[m]
        else:
            u[m], v[m] = -y[m] / z[m], -x[m] / z[m]
    return face.astype(np.int64), u, v


def _face_uv_to_xyz(face, u, v):
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f in range(6):
        m = face == f
        if not m.any():
            continue
        if f == 0:
            x[m], y[m], z[m] = 1.0, u[m], v[m]
        elif f == 1:
            x[m], y[m], z[m] = -u[m], 1.0, v[m]
        elif f == 2:
            x[m], y[m], z[m] = -u[m], -v[m], 1.0
        elif f == 3:
            x[m], y[m], z[m] = -1.0, -v[m], -u[m]
        elif f == 4:
            x[m], y[m], z[m] = v[m], -1.0, -u[m]
        else:
            x[m], y[m], z[m] = v[m], u[m], -1.0
    return x, y, z


def _uv_to_st(u):
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_uv(s):
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))
    )


# ------------------------------------------------------------ cell ids
def _from_face_ij(face, i, j):
    """(face, leaf i, leaf j) -> level-30 (leaf) cell id, vectorized."""
    n = face.astype(np.uint64) << _U(60)
    bits = (face & _SWAP).astype(np.int64)
    pos = np.zeros(face.shape, dtype=np.uint64)
    for k in range(7, -1, -1):
        i4 = (i >> (4 * k)) & 15
        j4 = (j >> (4 * k)) & 15
        out = _LOOKUP_POS[(((i4 << 4) | j4) << 2) | bits]
        pos |= (out >> 2).astype(np.uint64) << _U(8 * k)
        bits = out & 3
    # i, j are 30-bit, so the 8 nibble steps produce 60 position bits
    # (the top step's nibbles have 2 leading zero bits each)
    return ((face.astype(np.uint64) << _U(60)) | pos) * _U(2) + _U(1)


def _to_face_ij(cells):
    """cell ids (any level) -> (face, leaf i, leaf j of the id's position)."""
    cells = cells.astype(np.uint64)
    face = (cells >> _U(61)).astype(np.int64)
    pos = ((cells >> _U(1)) & ((_U(1) << _U(60)) - _U(1)))  # 60 position bits
    bits = (face & _SWAP).astype(np.int64)
    i = np.zeros(face.shape, dtype=np.int64)
    j = np.zeros(face.shape, dtype=np.int64)
    for k in range(7, -1, -1):
        p8 = ((pos >> _U(8 * k)) & _U(255)).astype(np.int64)
        out = _LOOKUP_IJ[(p8 << 2) | bits]
        ij = out >> 2
        i |= (ij >> 4) << (4 * k)
        j |= (ij & 15) << (4 * k)
        bits = out & 3
    return face, i, j


def get_level(cells) -> np.ndarray:
    cells = np.asarray(cells, dtype=np.uint64)
    lsb_pos = np.zeros(cells.shape, dtype=np.int64)
    v = cells
    # count trailing zero bits
    for b in (32, 16, 8, 4, 2, 1):
        m = (v & ((_U(1) << _U(b)) - _U(1))) == 0
        lsb_pos = np.where(m, lsb_pos + b, lsb_pos)
        v = np.where(m, v >> _U(b), v)
    return _MAX - lsb_pos // 2


def parent(cells, level: int) -> np.ndarray:
    cells = np.asarray(cells, dtype=np.uint64)
    lsb = _U(1) << _U(2 * (_MAX - level))
    return (cells & ~(lsb - _U(1)) & ~lsb) | lsb


def children(cell: int, level: int) -> list[int]:
    """All descendants at ``level`` (child_begin/child_end walk — C12/A4)."""
    cell = int(cell)
    cur = int(get_level(np.array([cell], dtype=np.uint64))[0])
    out = [cell]
    for lv in range(cur + 1, level + 1):
        lsb = 1 << (2 * (_MAX - lv))
        nxt = []
        for c in out:
            old_lsb = c & (-c if c > 0 else c)
            old_lsb = c & ((~c) + 1)
            start = c - old_lsb + lsb
            nxt.extend(start + q * (lsb << 1) for q in range(4))
        out = nxt
    return out


def compact(cells: set[int]) -> set[int]:
    """Complete 4-sibling merge to fixpoint (NormalizeS2CellUnion).

    Pure-int bit math per cell: the r05 form called get_level()/parent()
    on 1-element numpy arrays per cell per iteration (~75 us/cell — 6
    np.where rounds each), which made compaction the dominant cost of
    the q59 pipeline (25 s of 33 s profiled); c & -c IS the level
    marker, and the parent is two masks away.  Identical merge results.
    """
    cur = set(int(c) for c in cells)
    changed = True
    while changed:
        changed = False
        by_parent: dict[int, set[int]] = {}
        for c in cur:
            lsb = c & -c  # position-lsb encodes the level
            if lsb >= 1 << (2 * _MAX):
                continue  # level 0 has no parent
            lsbp = lsb << 2
            # == parent(c, level-1): clear bits below the parent marker
            p = (c & ~((lsbp << 1) - 1)) | lsbp
            by_parent.setdefault(p, set()).add(c)
        for p, kids in by_parent.items():
            if len(kids) == 4:
                cur -= kids
                cur.add(p)
                changed = True
    return cur


# ------------------------------------------------------------ tokens
def to_token(cells) -> np.ndarray:
    # bulk C hex of the whole array (binascii over the big-endian byte
    # view), then a cheap per-token bytes.rstrip — measured 2.4x faster
    # than format(int(c), "016x") per cell, and to_token was 80% of the
    # s2 polyfill kernel (r06 profile).  Identical tokens.
    import binascii

    cells = np.atleast_1d(np.asarray(cells, dtype=np.uint64))
    hx = binascii.hexlify(cells.astype(">u8").tobytes())
    arr = np.frombuffer(hx, dtype="S16")
    return np.array([t.rstrip(b"0").decode() or "X" for t in arr], dtype=str)


def from_token(tokens) -> np.ndarray:
    return np.array(
        [np.uint64(int(t.ljust(16, "0"), 16)) for t in np.atleast_1d(tokens)],
        dtype=np.uint64,
    )


# ------------------------------------------------------------ geo
def latlng_to_cell(lat_deg, lon_deg, level: int) -> np.ndarray:
    lat = np.radians(np.atleast_1d(np.asarray(lat_deg, dtype=np.float64)))
    lon = np.radians(np.atleast_1d(np.asarray(lon_deg, dtype=np.float64)))
    x = np.cos(lat) * np.cos(lon)
    y = np.cos(lat) * np.sin(lon)
    z = np.sin(lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    s, t = _uv_to_st(u), _uv_to_st(v)
    i = np.clip((s * (1 << _MAX)).astype(np.int64), 0, (1 << _MAX) - 1)
    j = np.clip((t * (1 << _MAX)).astype(np.int64), 0, (1 << _MAX) - 1)
    leaf = _from_face_ij(face, i, j)
    return parent(leaf, level) if level < _MAX else leaf


def cell_to_latlng(cells) -> tuple[np.ndarray, np.ndarray]:
    cells = np.atleast_1d(np.asarray(cells, dtype=np.uint64))
    face, i, j = _to_face_ij(cells)
    # the id's position marks the center leaf: st of the cell center
    level = get_level(cells)
    size = np.int64(1) << (2 * 0)  # leaf step
    cell_size = np.int64(1) << (_MAX - level)
    # snap leaf ij to the cell's base corner, then take the center
    base_i = (i >> (_MAX - level)) << (_MAX - level)
    base_j = (j >> (_MAX - level)) << (_MAX - level)
    s = (base_i + cell_size / 2.0) / float(1 << _MAX)
    t = (base_j + cell_size / 2.0) / float(1 << _MAX)
    u, v = _st_to_uv(s), _st_to_uv(t)
    x, y, z = _face_uv_to_xyz(face, u, v)
    r = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(np.clip(z / r, -1, 1)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


def cell_bounds_st(cells):
    """(face, s_lo, t_lo, s_hi, t_hi) of each cell."""
    cells = np.atleast_1d(np.asarray(cells, dtype=np.uint64))
    face, i, j = _to_face_ij(cells)
    level = get_level(cells)
    cell_size = np.int64(1) << (_MAX - level)
    base_i = (i >> (_MAX - level)) << (_MAX - level)
    base_j = (j >> (_MAX - level)) << (_MAX - level)
    n = float(1 << _MAX)
    return face, base_i / n, base_j / n, (base_i + cell_size) / n, (base_j + cell_size) / n


def polyfill(rings: list[np.ndarray], level: int) -> np.ndarray:
    """Fixed-level cells whose center lies inside the polygon — exactly
    the reference's cover-then-center-test output (SURVEY.md C9)."""
    from vector2dggs_spark.geometry.kernels import points_in_polygon

    ext = rings[0]
    # densify boundary, project to faces, take ij ranges per face
    pts = _densify_ring(ext)
    lat = np.radians(pts[:, 1])
    lon = np.radians(pts[:, 0])
    x = np.cos(lat) * np.cos(lon)
    y = np.cos(lat) * np.sin(lon)
    z = np.sin(lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    out = []
    shift = _MAX - level
    for f in np.unique(face):
        m = face == f
        s, t = _uv_to_st(u[m]), _uv_to_st(v[m])
        ci = np.clip((s * (1 << _MAX)).astype(np.int64) >> shift, 0, (1 << level) - 1)
        cj = np.clip((t * (1 << _MAX)).astype(np.int64) >> shift, 0, (1 << level) - 1)
        ri = np.arange(ci.min(), ci.max() + 1)
        rj = np.arange(cj.min(), cj.max() + 1)
        if ri.size * rj.size > 25_000_000:
            raise ValueError("s2 polyfill range too large; bisect the geometry first")
        gi, gj = np.meshgrid(ri, rj, indexing="ij")
        leaf_i = (gi.ravel() << shift) + (1 << shift) // 2
        leaf_j = (gj.ravel() << shift) + (1 << shift) // 2
        s_c = (leaf_i + 0.5) / float(1 << _MAX)
        t_c = (leaf_j + 0.5) / float(1 << _MAX)
        uu, vv = _st_to_uv(s_c), _st_to_uv(t_c)
        fx, fy, fz = _face_uv_to_xyz(np.full(uu.shape, f), uu, vv)
        r = np.sqrt(fx * fx + fy * fy + fz * fz)
        clat = np.degrees(np.arcsin(np.clip(fz / r, -1, 1)))
        clon = np.degrees(np.arctan2(fy, fx))
        inside = points_in_polygon(clon, clat, rings)
        if inside.any():
            ids = _from_face_ij(
                np.full(inside.sum(), f, dtype=np.int64),
                (gi.ravel()[inside] << shift),
                (gj.ravel()[inside] << shift),
            )
            out.append(parent(ids, level))
    if not out:
        return np.array([], dtype=str)
    return to_token(np.unique(np.concatenate(out)))


def linetrace(coords: np.ndarray, level: int) -> np.ndarray:
    """Fixed-level cells along the polyline (dense-sample; reference
    S2Polyline covering semantics approximated — SURVEY.md C10)."""
    step = cell_width_deg(level) / 4.0
    pts = [coords[:1]]
    for a, b in zip(coords[:-1], coords[1:]):
        n = max(int(np.ceil(max(abs(b[0] - a[0]), abs(b[1] - a[1])) / step)), 1)
        t = np.linspace(0, 1, n + 1)[1:]
        pts.append(a[None, :] + t[:, None] * (b - a)[None, :])
    pts = np.concatenate(pts)
    cells = to_token(latlng_to_cell(pts[:, 1], pts[:, 0], level))
    _, idx = np.unique(cells, return_index=True)
    return cells[np.sort(idx)]


def cell_width_deg(level: int) -> float:
    """Approximate cell angular width (face spans 90°, 2^level cells)."""
    return 90.0 / (1 << level)


def grid_disk(cells, level: int, k: int) -> np.ndarray:
    """(n, (2k+1)^2) neighbor matrix by angular stepping from centers.
    Steps at HALF the nominal cell width so corner-region cells (S2
    quadratic-transform shrinkage) cannot fall between samples; the
    matching conservative bound is S2Backend.ring_guarantee_deg."""
    lat, lon = cell_to_latlng(from_token(np.atleast_1d(cells)) if np.asarray(cells).dtype.kind == "U" else np.atleast_1d(cells))
    step = cell_width_deg(level) / 2.0
    offs = np.arange(-k, k + 1, dtype=np.float64) * step
    dl, dn = np.meshgrid(offs, offs, indexing="ij")
    lat_n = np.clip(lat[:, None] + dl.ravel()[None, :], -90.0, 90.0)
    lon_n = np.mod(lon[:, None] + dn.ravel()[None, :] + 180.0, 360.0) - 180.0
    flat = to_token(latlng_to_cell(lat_n.ravel(), lon_n.ravel(), level))
    return flat.reshape(lat_n.shape)


def _densify_ring(ring: np.ndarray, n_per_edge: int = 16) -> np.ndarray:
    out = [ring[:1]]
    for a, b in zip(ring[:-1], ring[1:]):
        t = np.linspace(0, 1, n_per_edge + 1)[1:]
        out.append(a[None, :] + t[:, None] * (b - a)[None, :])
    return np.concatenate(out)
