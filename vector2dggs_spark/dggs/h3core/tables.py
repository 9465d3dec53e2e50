"""H3 icosahedron constants and geometrically-derived base-cell tables.

The 20 face centers and face i/j/k-axis azimuths below are the published
H3 core-library orientation constants (uber/h3, Apache-2.0 — public
knowledge; faceijk.c).  Everything else — the 122 base cells, their home
(face, ijk) anchors, the per-(face, ijk) base-cell + rotation lookup, and
the inter-face fold transforms — is DERIVED from those constants at
import time by pure geometry:

1. face triangle corners sit at ijk = 2·e_axis (tan(vertex_dist) /
   RES0_U_GNOMONIC == 2 exactly),
2. fold maps between adjacent faces are the rigid lattice motions fixing
   the two shared vertices,
3. base cells = res-0 lattice points folded into face triangles, deduped
   (122), numbered by descending latitude (pentagons land exactly at the
   canonical indices 4,14,…,117 — a 12-point checksum),
4. each cell's home rep is its k==0 lattice rep (min face); per-face
   rotations come from composed fold rotations.

Validated against the published H3 test vectors in
tests/test_h3.py (e.g. (37.77527…, -122.41831…, 9) → 8928308280fffff).
"""
from __future__ import annotations

import os
from math import atan2, cos, pi, sin

import numpy as np

FACE_CENTER_GEO = np.array(
    [
        (0.803582649718989942, 1.248397419617396099),
        (1.307747883455638156, 2.536945009877921159),
        (1.054751253523952054, -1.347517358900396623),
        (0.600191595538186799, -0.450603909469755746),
        (0.491715428198773866, 0.401988202911306943),
        (0.172745327415618701, 1.678146885280433686),
        (0.605929321571350690, 2.953923329812411617),
        (0.427370518328979641, -1.888876200336285401),
        (-0.079066118549212831, -0.733429513380867741),
        (-0.230961644455383637, 0.506495587332349035),
        (0.079066118549212831, 2.408163140208925497),
        (0.230961644455383637, -2.635097066257444203),
        (-0.172745327415618701, -1.463445768309359553),
        (-0.605929321571350690, -0.187669323777381622),
        (-0.427370518328979641, 1.252716453253507838),
        (-0.600191595538186799, 2.690988744120037492),
        (-0.491715428198773866, -2.739604450678486295),
        (-0.803582649718989942, -1.893195233972397139),
        (-1.307747883455638156, -0.604647643711872080),
        (-1.054751253523952054, 1.794075294689396615),
    ]
)
FACE_AXES_AZ = np.array(
    [
        (5.619958268523939882, 3.525563166130744542, 1.431168063737548730),
        (5.760339081714187279, 3.665943979320991689, 1.571548876927796127),
        (0.780213654393430055, 4.969003859179821079, 2.874608756786625655),
        (0.430469363979999913, 4.619259568766391033, 2.524864466373195467),
        (6.130269123335111400, 4.035874020941915804, 1.941478918548720291),
        (2.692877706530642877, 0.598482604137447119, 4.787272808923838195),
        (2.982963003477243874, 0.888567901084048369, 5.077358105870439581),
        (3.532912002790141181, 1.438516900396945656, 5.627307105183336758),
        (3.494305004259568154, 1.399909901866372864, 5.588700106652763840),
        (3.003214169499538391, 0.908819067106342928, 5.097609271892733906),
        (5.930472956509811562, 3.836077854116616219, 1.741682751723420374),
        (0.138378484090254847, 4.327168688876645809, 2.232773586483450311),
        (0.448714947059150361, 4.637505151845541521, 2.543110049452346000),
        (0.158629650112549365, 4.347419854898940135, 2.253024752505744869),
        (5.891865957979238535, 3.797470855586043194, 1.703075753192847583),
        (2.711123289609793325, 0.616728187216597771, 4.805518392002988683),
        (3.294508837434268316, 1.200113735041072948, 5.388903939827463911),
        (3.804819692245439833, 1.710424589852244509, 5.899214794638635400),
        (3.664438879055192436, 1.570043776661997111, 5.758833981448388003),
        (2.361378999196363184, 0.266983896803167583, 4.455774101589558636),
    ]
)
RES0_U_GNOMONIC = 0.38196601125010500003
M_SQRT7 = 2.6457513110645905905016157536392604257102
M_AP7_ROT_RADS = 0.333473172251832115336090755351601070065900389
M_SIN60 = 0.8660254037844386467637231707529361834714

FACE_XYZ = np.stack(
    [
        np.cos(FACE_CENTER_GEO[:, 0]) * np.cos(FACE_CENTER_GEO[:, 1]),
        np.cos(FACE_CENTER_GEO[:, 0]) * np.sin(FACE_CENTER_GEO[:, 1]),
        np.sin(FACE_CENTER_GEO[:, 0]),
    ],
    axis=1,
)

_CORNER_IJK = {0: (2, 0, 0), 1: (0, 2, 0), 2: (0, 0, 2)}


# -------------------------------------------------- scalar helpers (derivation)
def _norm_ijk(c):
    i, j, k = c
    if i < 0:
        j -= i
        k -= i
        i = 0
    if j < 0:
        i -= j
        k -= j
        j = 0
    if k < 0:
        i -= k
        j -= k
        k = 0
    return (i, j, k)


def _ijk_to_hex2d(c):
    i = c[0] - c[2]
    j = c[1] - c[2]
    return (i - 0.5 * j, j * M_SIN60)


def _az_dist(lat1, lon1, az, r):
    sinlat = sin(lat1) * cos(r) + cos(lat1) * sin(r) * cos(az)
    sinlat = max(-1.0, min(1.0, sinlat))
    lat2 = np.arcsin(sinlat)
    lon2 = lon1 + atan2(sin(az) * sin(r) * cos(lat1), cos(r) - sin(lat1) * sinlat)
    return lat2, (lon2 + pi) % (2 * pi) - pi


def _hex2d_to_geo_res0(x, y, face):
    r = (x * x + y * y) ** 0.5
    if r < 1e-16:
        return FACE_CENTER_GEO[face][0], FACE_CENTER_GEO[face][1]
    theta = atan2(y, x)
    r = np.arctan(r * RES0_U_GNOMONIC)
    az = (FACE_AXES_AZ[face][0] - theta) % (2 * pi)
    return _az_dist(FACE_CENTER_GEO[face][0], FACE_CENTER_GEO[face][1], az, r)


def _rot_mat(k):
    th = k * pi / 3
    return np.array([[cos(th), -sin(th)], [sin(th), cos(th)]])


def _derive():
    # vertices per (face, axis) -> 12 vertex ids
    vert_list: list[tuple[float, float]] = []
    vkey: dict[tuple[int, int], int] = {}

    def _pkey(lat, lon):
        return (round(lat, 7), round(lon % (2 * pi), 7))

    vindex: dict = {}
    for f in range(20):
        for a in range(3):
            lat, lon = _hex2d_to_geo_res0(*_ijk_to_hex2d(_CORNER_IJK[a]), f)
            key = _pkey(lat, lon)
            if key not in vindex:
                vindex[key] = len(vert_list)
                vert_list.append((lat, lon))
            vkey[(f, a)] = vindex[key]
    assert len(vert_list) == 12

    face_verts = {f: {vkey[(f, a)] for a in range(3)} for f in range(20)}
    adj: dict[int, dict[int, tuple[int, int]]] = {}
    for f in range(20):
        adj[f] = {}
        for g in range(20):
            if f != g and len(face_verts[f] & face_verts[g]) == 2:
                adj[f][g] = tuple(sorted(face_verts[f] & face_verts[g]))
    assert all(len(v) == 3 for v in adj.values())

    corner_xy = {a: np.array(_ijk_to_hex2d(_CORNER_IJK[a])) for a in range(3)}

    def vert_xy(face, vid):
        for a in range(3):
            if vkey[(face, a)] == vid:
                return corner_xy[a]
        raise KeyError

    folds: dict[tuple[int, int], tuple[int, np.ndarray, np.ndarray]] = {}
    for f in range(20):
        for g, (v1, v2) in adj[f].items():
            A_f, B_f = vert_xy(f, v1), vert_xy(f, v2)
            A_g, B_g = vert_xy(g, v1), vert_xy(g, v2)
            d_f, d_g = B_f - A_f, B_g - A_g
            ang = atan2(d_g[1], d_g[0]) - atan2(d_f[1], d_f[0])
            k = round((ang % (2 * pi)) / (pi / 3)) % 6
            R = _rot_mat(k)
            T = A_g - R @ A_f
            assert np.allclose(R @ B_f + T, B_g, atol=1e-9)
            folds[(f, g)] = (k, R, T)

    C = [corner_xy[a] for a in range(3)]
    v0 = C[1] - C[0]
    v1 = C[2] - C[0]
    den = v0[0] * v1[1] - v1[0] * v0[1]

    def in_triangle(P, eps=1e-9):
        v2 = P - C[0]
        a = (v2[0] * v1[1] - v1[0] * v2[1]) / den
        b = (v0[0] * v2[1] - v2[0] * v0[1]) / den
        return a >= -eps and b >= -eps and a + b <= 1 + eps

    cen = (C[0] + C[1] + C[2]) / 3

    def fold_step(face, P):
        """one fold across whichever edge P lies beyond; None if inside."""
        for g in adj[face]:
            va, vb = adj[face][g]
            A, B = vert_xy(face, va), vert_xy(face, vb)
            n = np.array([-(B - A)[1], (B - A)[0]])
            if (n @ (P - A)) * (n @ (cen - A)) < -1e-9:
                k, R, T = folds[(face, g)]
                return g, R @ P + T, k
        return None

    def fold_to_inside(face, P):
        rot = 0
        for _ in range(4):
            if in_triangle(P):
                return face, P, rot
            step = fold_step(face, P)
            if step is None:
                return face, P, rot
            face, P, k = step
            rot += k
        return face, P, rot

    # canonical cells
    cells: list[tuple[float, float]] = []
    cindex: dict = {}
    canon: dict[tuple[int, tuple], int] = {}
    inside_reps: dict[int, set] = {}
    for f in range(20):
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    c = _norm_ijk((i, j, k))
                    face, P, _ = fold_to_inside(f, np.array(_ijk_to_hex2d(c), dtype=float))
                    lat, lon = _hex2d_to_geo_res0(P[0], P[1], face)
                    key = _pkey(lat, lon)
                    if key not in cindex:
                        cindex[key] = len(cells)
                        cells.append((lat, lon))
                    idx = cindex[key]
                    canon[(f, c)] = idx
                    if in_triangle(np.array(_ijk_to_hex2d(c), dtype=float)):
                        inside_reps.setdefault(idx, set()).add((f, c))
    assert len(cells) == 122, len(cells)

    order = sorted(range(122), key=lambda i: (-cells[i][0], cells[i][1]))
    cell_num = {idx: n for n, idx in enumerate(order)}

    vert_keys = {_pkey(lat, lon) for lat, lon in vert_list}
    pentagons = sorted(
        cell_num[cindex[k]] for k in vert_keys
    )
    assert pentagons == [4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117], pentagons

    # home rep: the k==0 lattice rep, min face (validated against the
    # published baseCellData head entries)
    home: dict[int, tuple[int, tuple]] = {}
    for idx, reps in inside_reps.items():
        k0 = sorted((f, c) for f, c in reps if c[2] == 0)
        home[idx] = k0[0] if k0 else sorted(reps)[0]

    def fold_rot_to_home(f, c, idx):
        hf, hc = home[idx]
        target = np.array(_ijk_to_hex2d(hc))
        P = np.array(_ijk_to_hex2d(c), dtype=float)
        face, rot = f, 0
        for _ in range(5):
            if face == hf and np.allclose(P, target, atol=1e-6):
                return rot % 6
            if hf in adj[face]:
                k, R, T = folds[(face, hf)]
                if np.allclose(R @ P + T, target, atol=1e-6):
                    return (rot + k) % 6
            step = fold_step(face, P)
            if step is None:
                return rot % 6
            face, P, k = step
            rot += k
        return rot % 6

    base_cell = np.zeros((20, 3, 3, 3), dtype=np.int64)
    ccw_rot = np.zeros((20, 3, 3, 3), dtype=np.int64)
    for f in range(20):
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    c = _norm_ijk((i, j, k))
                    idx = canon[(f, c)]
                    base_cell[f, i, j, k] = cell_num[idx]
                    ccw_rot[f, i, j, k] = fold_rot_to_home(f, c, idx)

    # per base cell: home face + ijk, pentagon flag, center geo
    home_face = np.zeros(122, dtype=np.int64)
    home_ijk = np.zeros((122, 3), dtype=np.int64)
    is_pent = np.zeros(122, dtype=bool)
    center_geo = np.zeros((122, 2))
    for idx in range(122):
        pass
    for idx, (lat, lon) in enumerate(cells):
        n = cell_num[idx]
        hf, hc = home[idx]
        home_face[n] = hf
        home_ijk[n] = hc
        is_pent[n] = _pkey(lat, lon) in vert_keys
        center_geo[n] = (lat, lon)

    return {
        "adj": adj,
        "folds": folds,
        "base_cell": base_cell,
        "ccw_rot": ccw_rot,
        "home_face": home_face,
        "home_ijk": home_ijk,
        "is_pentagon": is_pent,
        "center_geo": center_geo,
        "in_triangle": in_triangle,
        "fold_step": fold_step,
    }


_CACHE_VERSION = 1
_CACHE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), f"_tables_cache_v{_CACHE_VERSION}.npz"
)


def _load_or_derive():
    """The derivation costs ~0.7 s of CPU — paid once, cached to an npz
    next to the package so every Spark Python worker loads it in
    milliseconds instead of re-deriving under contention."""
    if os.path.exists(_CACHE_PATH):
        try:
            z = np.load(_CACHE_PATH, allow_pickle=False)
            folds = {}
            src = z["fold_src"]
            for idx in range(src.shape[0]):
                f, g, k = int(src[idx, 0]), int(src[idx, 1]), int(src[idx, 2])
                folds[(f, g)] = (k, z["fold_R"][idx], z["fold_T"][idx])
            adj: dict[int, dict] = {f: {} for f in range(20)}
            for (f, g) in folds:
                adj[f][g] = ()
            return {
                "adj": adj,
                "folds": folds,
                "base_cell": z["base_cell"],
                "ccw_rot": z["ccw_rot"],
                "home_face": z["home_face"],
                "home_ijk": z["home_ijk"],
                "is_pentagon": z["is_pentagon"],
                "center_geo": z["center_geo"],
            }
        except Exception:
            pass
    t = _derive()
    try:
        src = np.array([(f, g, t["folds"][(f, g)][0]) for f, g in t["folds"]], dtype=np.int64)
        np.savez(
            _CACHE_PATH,
            fold_src=src,
            fold_R=np.stack([t["folds"][(int(a), int(b))][1] for a, b, _ in src]),
            fold_T=np.stack([t["folds"][(int(a), int(b))][2] for a, b, _ in src]),
            base_cell=t["base_cell"],
            ccw_rot=t["ccw_rot"],
            home_face=t["home_face"],
            home_ijk=t["home_ijk"],
            is_pentagon=t["is_pentagon"],
            center_geo=t["center_geo"],
        )
    except OSError:
        pass  # read-only package dir: derive every time
    return t


_T = _load_or_derive()
ADJ = _T["adj"]
FOLDS = _T["folds"]
BASE_CELL_TABLE = _T["base_cell"]
CCW_ROT_TABLE = _T["ccw_rot"]
HOME_FACE = _T["home_face"]
HOME_IJK = _T["home_ijk"]
IS_PENTAGON = _T["is_pentagon"]
BASE_CENTER_GEO = _T["center_geo"]
PENTAGON_CELLS = frozenset(np.nonzero(IS_PENTAGON)[0].tolist())
