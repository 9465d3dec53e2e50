"""A5 point→cell encode as layered cross-engine SQL.

Independent formulation of the engine's A5 construction, mirrored
operation-for-operation from ``dggs.a5.lonlat_to_cell``: dodecahedron
face argmax (12 Voronoi directions), gnomonic tangent-plane projection,
quintant selection by azimuth, barycentric aperture-4 triangle walk,
and the ``face|quintant|digits|marker`` u64 assembly — evaluating
identically in Spark SQL and DuckDB (q34's oracle; same pattern as
functions/h3sql.py and sqlgen.rhp/s2_select_sql).

Signed BIGINT stands in for u64: faces 8-11 set the sign bit, so the id
is assembled as ``(face-16)*2^60`` for those (two's complement), like
the S2 generator.  Tokens are plain 16-nibble zero-padded hex, no
stripping.
"""
from __future__ import annotations

import numpy as np

from vector2dggs_spark.functions.sqlgen import dlit


def a5_select_sql(
    source_sql: str,
    lat: str,
    lon: str,
    res: int,
    keep_cols: list[str],
    out: str = "cell",
) -> str:
    """A5 point→token at ``res`` (>=2) over ``source_sql``.

    Pure dialect-portable SQL (no hex parsing needed), so ONE string
    serves both engines.
    """
    from vector2dggs_spark.dggs import a5 as A

    if not 2 <= res <= A.MAX_RES:
        raise ValueError("res must be 2..29 for the SQL formulation")

    RAD = dlit(np.pi / 180.0)
    TWO_PI = dlit(2.0 * np.pi)
    SECTOR = dlit(2.0 * np.pi / 5.0)
    RHO = dlit(A._RHO)
    layers: list[list[str]] = []

    layers.append([f"(({lat}) * {RAD}) AS __phi", f"(({lon}) * {RAD}) AS __lam"])
    layers.append([
        "(cos(__phi) * cos(__lam)) AS __px",
        "(cos(__phi) * sin(__lam)) AS __py",
        "sin(__phi) AS __pz",
    ])
    dots = [
        f"(((__px * {dlit(A.FACE_XYZ[f, 0])}) + (__py * {dlit(A.FACE_XYZ[f, 1])}))"
        f" + (__pz * {dlit(A.FACE_XYZ[f, 2])})) AS __d{f}"
        for f in range(12)
    ]
    layers.append(["__px", "__py", "__pz"] + dots)
    gmax = "greatest(" + ", ".join(f"__d{f}" for f in range(12)) + ")"
    face_arms = " ".join(f"WHEN __d{f} >= {gmax} THEN {f}" for f in range(11))
    layers.append([
        "__px", "__py", "__pz",
        f"(CASE {face_arms} ELSE 11 END) AS __face",
    ])

    def fc(vals) -> str:
        arms = " ".join(f"WHEN {f} THEN {dlit(vals[f])}" for f in range(12))
        return f"(CASE __face {arms} END)"

    # gnomonic to the face tangent plane: p = xyz/max(dot, 1e-12);
    # x = p.e1, y = p.e2  (3-term sums left-to-right, like numpy)
    den = (
        f"greatest(((__px * {fc(A.FACE_XYZ[:, 0])}) + (__py * {fc(A.FACE_XYZ[:, 1])}))"
        f" + (__pz * {fc(A.FACE_XYZ[:, 2])}), {dlit(1e-12)})"
    )
    layers.append([
        "__face",
        f"(((__px / {den}) * {fc(A._E1[:, 0])}) + ((__py / {den}) * {fc(A._E1[:, 1])})"
        f" + ((__pz / {den}) * {fc(A._E1[:, 2])})) AS __gx",
        f"(((__px / {den}) * {fc(A._E2[:, 0])}) + ((__py / {den}) * {fc(A._E2[:, 1])})"
        f" + ((__pz / {den}) * {fc(A._E2[:, 2])})) AS __gy",
    ])
    # quintant from azimuth; q = min(floor(theta/sector), 4)
    theta = (
        f"((atan2(__gy, __gx) - {fc(A._AZ0)})"
        f" - {TWO_PI} * floor((atan2(__gy, __gx) - {fc(A._AZ0)}) / {TWO_PI}))"
    )
    layers.append([
        "__face", "__gx", "__gy",
        f"least(cast(floor({theta} / {SECTOR}) as bigint), 4) AS __q",
    ])
    # quintant triangle vertices + barycentric (s, t)
    a1 = f"({fc(A._AZ0)} + __q * {SECTOR})"
    layers.append([
        "__face", "__gx", "__gy", "__q",
        f"({RHO} * cos({a1})) AS __v1x",
        f"({RHO} * sin({a1})) AS __v1y",
        f"({RHO} * cos({a1} + {SECTOR})) AS __v2x",
        f"({RHO} * sin({a1} + {SECTOR})) AS __v2y",
    ])
    layers.append([
        "__face", "__q",
        "((__gx * __v2y - __v2x * __gy) / (__v1x * __v2y - __v2x * __v1y)) AS __s",
        "((__v1x * __gy - __gx * __v1y) / (__v1x * __v2y - __v2x * __v1y)) AS __t",
    ])
    # aperture-4 triangle walk, one layer per level (doubled coords;
    # branch order matches the kernel: apex, s-corner, t-corner, middle)
    one = dlit(1.0)
    two = dlit(2.0)
    layers.append(["__face", "__q", "__s", "__t", "cast(0 as bigint) AS __db"])
    for lv in range(2, res + 1):
        sh = 1 << (57 - 2 * (lv - 1))
        S, T = f"(__s * {two})", f"(__t * {two})"
        d = (
            f"(CASE WHEN {S} + {T} <= {one} THEN 1"
            f" WHEN {S} >= {one} THEN 2 WHEN {T} >= {one} THEN 3 ELSE 0 END)"
        )
        layers.append([
            "__face", "__q",
            f"(CASE WHEN {S} + {T} <= {one} THEN {S}"
            f" WHEN {S} >= {one} THEN {S} - {one}"
            f" WHEN {T} >= {one} THEN {S} ELSE {one} - {S} END) AS __s",
            f"(CASE WHEN {S} + {T} <= {one} THEN {T}"
            f" WHEN {S} >= {one} THEN {T}"
            f" WHEN {T} >= {one} THEN {T} - {one} ELSE {one} - {T} END) AS __t",
            f"(__db + {d} * {sh}) AS __db",
        ])
    marker = 1 << A._marker_pos(res)
    layers.append([
        "((CASE WHEN __face >= 8 THEN __face - 16 ELSE __face END)"
        f" * {1 << 60} + __q * {1 << 57} + __db + {marker}) AS __id",
    ])
    # shift+mask nibbles (NOT mod-div: faces 8-11 make __id negative,
    # and the top slot's 2^64 modulus would overflow BIGINT anyway);
    # masking after the arithmetic shift is sign-safe in both engines
    nibbles = " || ".join(
        f"substring('0123456789abcdef', cast((__id >> {4 * k}) & 15 as int) + 1, 1)"
        for k in range(15, -1, -1)
    )
    keep = ", ".join(keep_cols)
    kp = f"{keep}, " if keep_cols else ""
    q = source_sql
    for lyr in layers:
        q = f"SELECT {kp}{', '.join(lyr)} FROM ({q}) __l"
    return f"SELECT {kp}{nibbles} AS {out} FROM ({q}) __r"
