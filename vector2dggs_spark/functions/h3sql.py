"""H3 point→cell encode as layered cross-engine SQL.

An INDEPENDENT formulation of the H3 construction mirrored
operation-for-operation from ``dggs.h3core.latlng_to_cell`` (itself the
published libh3 algorithm): icosahedron face argmax, gnomonic hex2d,
nearest-hex-center cube rounding, the aperture-7 up/down digit walk,
base-cell + rotation lookups, pentagon K-axis sector fix, and the
``mode|res|base|digits`` bit assembly — emitted as layered nested
SELECTs that evaluate identically in Spark SQL and DuckDB.

Two roles (same pattern as sqlgen.rhp_select_sql / s2_select_sql):

* the DuckDB oracle for the numpy kernel (q33) — H3's first hard
  independent cross-formulation signal beyond the published test
  vectors;
* a fully-native WholeStageCodegen H3 point path in Spark — the
  BASELINE.json headline metric is literally "H3 cell-IDs emitted/sec
  at resolution 9", and with this the dominant document class (points)
  never leaves the JVM for the headline backend either.

Layering rule (measured on the rHP generator: lateral aliases are
inlined PER REFERENCE by both optimizers — ~3× tree growth per chained
level, 148 s for 10 k rows): every expression references only columns
of the previous layer.

Determinism: the only cross-engine/cross-formulation divergence is
≤1-ulp libm trig; every branch point (face argmax, cube-round branch
tests, the ``round((3i-j)/7)`` aperture steps) sits ≥1e-4 away from any
generic point's value (integer/7 is provably never exactly half-integer
in binary, so all rounding conventions agree and ``floor(x+0.5)``
replicates ``np.round`` everywhere).
"""
from __future__ import annotations

import numpy as np

from vector2dggs_spark.functions.sqlgen import dlit


def _tables():
    from vector2dggs_spark.dggs import h3core as H
    from vector2dggs_spark.dggs.h3core import tables as T

    return H, T


def _hex_table(vals, width: int) -> str:
    return "".join(format(int(v), f"0{width}x") for v in vals)


def _h3_point_layers(lat: str, lon: str, res: int, dialect: str):
    """Layered select lists + the final token expression.

    Layer count is kept MINIMAL (~39 at res 9, down from 91): each
    materialized Project costs an UnsafeRow copy per row when the plan
    runs un-fused, and a deep fused pipeline pushes the single
    WholeStageCodegen method past HotSpot's huge-method JIT limit (the
    measured cliff: a 12-layer prefix ran 12x slower the moment its
    fused method crossed the threshold — see session.py's
    -XX:-DontCompileHugeMethods note).  Expressions inline same-layer
    subtrees over previous-layer COLUMN references only; codegen CSE
    dedups the textual repetition.
    """
    if not 0 < res <= 15:
        raise ValueError("res must be 1..15")
    H, T = _tables()
    PT = H._pent_tables()

    if dialect == "spark":
        def hx(e3: str) -> str:
            return f"cast(conv({e3}, 16, 10) as bigint)"
    else:
        def hx(e3: str) -> str:
            return f"(('0x' || {e3})::BIGINT)"

    RAD = dlit(np.pi / 180.0)
    TWO_PI = dlit(2.0 * np.pi)
    one = dlit(1.0)
    two = dlit(2.0)
    layers: list[list[str]] = []

    # ---- radians + unit vector --------------------------------------
    layers.append([f"(({lat}) * {RAD}) AS __phi", f"(({lon}) * {RAD}) AS __lam"])
    layers.append([
        "__phi", "__lam",
        "(cos(__phi) * cos(__lam)) AS __px",
        "(cos(__phi) * sin(__lam)) AS __py",
        "sin(__phi) AS __pz",
    ])
    # ---- face argmax: 20 dots, then first-max-wins CASE (== np.argmax)
    dots = [
        f"(((__px * {dlit(T.FACE_XYZ[f, 0])}) + (__py * {dlit(T.FACE_XYZ[f, 1])}))"
        f" + (__pz * {dlit(T.FACE_XYZ[f, 2])})) AS __d{f}"
        for f in range(20)
    ]
    layers.append(["__phi", "__lam"] + dots)
    gmax = "greatest(" + ", ".join(f"__d{f}" for f in range(20)) + ")"
    face_arms = " ".join(f"WHEN __d{f} >= {gmax} THEN {f}" for f in range(19))
    layers.append([
        "__phi", "__lam",
        f"(CASE {face_arms} ELSE 19 END) AS __face",
    ])

    # ---- per-face constants -----------------------------------------
    def face_case(vals) -> str:
        arms = " ".join(f"WHEN {f} THEN {dlit(vals[f])}" for f in range(20))
        return f"(CASE __face {arms} END)"

    layers.append([
        "__phi", "__lam", "__face",
        f"{face_case(T.FACE_CENTER_GEO[:, 0])} AS __fla",
        f"{face_case(T.FACE_CENTER_GEO[:, 1])} AS __flo",
        f"{face_case(T.FACE_AXES_AZ[:, 0])} AS __az0",
    ])
    # ---- gnomonic hex2d ---------------------------------------------
    layers.append([
        "__face", "__az0",
        "((sin(__fla) * sin(__phi)) + ((cos(__fla) * cos(__phi)) * cos(__lam - __flo))) AS __cosr",
        "atan2(cos(__phi) * sin(__lam - __flo),"
        " (cos(__fla) * sin(__phi)) - ((sin(__fla) * cos(__phi)) * cos(__lam - __flo))) AS __azm",
    ])
    layers.append([
        "__face",
        f"acos(least(greatest(__cosr, -{one}), {one})) AS __r",
        # theta = mod(az0 - mod(az, 2pi), 2pi)   [np.mod: floor form]
        f"((__az0 - (__azm - {TWO_PI} * floor(__azm / {TWO_PI})))"
        f" - {TWO_PI} * floor((__az0 - (__azm - {TWO_PI} * floor(__azm / {TWO_PI}))) / {TWO_PI})) AS __th0",
    ])
    if res % 2 == 1:
        th = (f"((__th0 - {dlit(T.M_AP7_ROT_RADS)})"
              f" - {TWO_PI} * floor((__th0 - {dlit(T.M_AP7_ROT_RADS)}) / {TWO_PI}))")
    else:
        th = "__th0"
    scale = dlit(float(T.M_SQRT7**res))
    layers.append([
        "__face",
        f"((tan(__r) / {dlit(T.RES0_U_GNOMONIC)}) * {scale}) AS __rr",
        f"{th} AS __th",
    ])
    layers.append([
        "__face",
        "(__rr * cos(__th)) AS __hx",
        "(__rr * sin(__th)) AS __hy",
    ])
    # ---- hex2d -> nearest hex center ijk (libh3 cube rounding) ------
    # x1 = |x| + (|y|/sin60)/2, x2 = |y|/sin60   (inlined; CSE dedups)
    x2 = f"(abs(__hy) / {dlit(T.M_SIN60)})"
    x1 = f"(abs(__hx) + {x2} / {two})"
    layers.append([
        "__face", "__hx", "__hy",
        f"cast(floor({x1}) as bigint) AS __m1",
        f"cast(floor({x2}) as bigint) AS __m2",
        f"({x1} - cast(floor({x1}) as bigint)) AS __r1",
        f"({x2} - cast(floor({x2}) as bigint)) AS __r2",
    ])
    h, t1, t2 = dlit(0.5), dlit(1.0 / 3.0), dlit(2.0 / 3.0)
    layers.append([
        "__face", "__hx", "__hy",
        f"(CASE WHEN __r1 < {h} THEN"
        f"  (CASE WHEN __r1 < {t1} THEN __m1"
        f"        WHEN ({one} - __r1) <= __r2 AND __r2 < {two} * __r1 THEN __m1 + 1"
        f"        ELSE __m1 END)"
        f" ELSE"
        f"  (CASE WHEN __r1 < {t2} THEN"
        f"     (CASE WHEN {two} * __r1 - {one} < __r2 AND __r2 < {one} - __r1 THEN __m1 ELSE __m1 + 1 END)"
        f"   ELSE __m1 + 1 END) END) AS __i",
        f"(CASE WHEN __r1 < {h} THEN"
        f"  (CASE WHEN __r1 < {t1} THEN"
        f"     (CASE WHEN __r2 < ({one} + __r1) / {two} THEN __m2 ELSE __m2 + 1 END)"
        f"   ELSE (CASE WHEN __r2 < ({one} - __r1) THEN __m2 ELSE __m2 + 1 END) END)"
        f" ELSE"
        f"  (CASE WHEN __r1 < {t2} THEN"
        f"     (CASE WHEN __r2 < ({one} - __r1) THEN __m2 ELSE __m2 + 1 END)"
        f"   ELSE (CASE WHEN __r2 < __r1 / {two} THEN __m2 ELSE __m2 + 1 END) END) END) AS __j",
    ])
    # negative-x fold (axisi = j//2 or (j+1)//2, j >= 0 pre-fold)
    jh = f"cast(floor(__j / {two}) as bigint)"
    jh1 = f"cast(floor((__j + 1) / {two}) as bigint)"
    layers.append([
        "__face", "__hy", "__j",
        "(CASE WHEN __hx < cast(0.0 as double) THEN"
        f" (CASE WHEN __j % 2 = 0 THEN __i - 2 * (__i - {jh})"
        f" ELSE __i - (2 * (__i - {jh1}) + 1) END)"
        " ELSE __i END) AS __i",
    ])
    layers.append([
        "__face",
        f"(CASE WHEN __hy < cast(0.0 as double) THEN __i - cast(floor((2 * __j + 1) / {two}) as bigint) ELSE __i END) AS __i",
        "(CASE WHEN __hy < cast(0.0 as double) THEN -__j ELSE __j END) AS __j",
    ])
    mn = "least(least(__i, __j), 0)"
    layers.append([
        "__face",
        f"(__i - {mn}) AS __i", f"(__j - {mn}) AS __j", f"(-({mn})) AS __k",
    ])
    # ---- aperture-7 digit walk, res .. 1 (2 layers per level) -------
    db0 = (1 << 45) - 1
    layers.append(["__face", "__i", "__j", "__k", f"cast({db0} as bigint) AS __db"])
    half = "cast(0.5 as double)"
    seven = "cast(7.0 as double)"
    for r in range(res, 0, -1):
        sh = 1 << (3 * (15 - r))
        if r % 2 == 1:  # up_ap7 / down_ap7
            ni = f"cast(floor((3 * (__i - __k) - (__j - __k)) / {seven} + {half}) as bigint)"
            nj = f"cast(floor(((__i - __k) + 2 * (__j - __k)) / {seven} + {half}) as bigint)"
            downs = ("3 * __i + __j", "3 * __j + __k", "__i + 3 * __k")
        else:  # up_ap7r / down_ap7r
            ni = f"cast(floor((2 * (__i - __k) + (__j - __k)) / {seven} + {half}) as bigint)"
            nj = f"cast(floor((3 * (__j - __k) - (__i - __k)) / {seven} + {half}) as bigint)"
            downs = ("3 * __i + __k", "__i + 3 * __j", "__j + 3 * __k")
        # layer A: pre-step ijk renamed, up-projected + normalized ijk
        L = f"least(least({ni}, {nj}), 0)"
        layers.append([
            "__face", "__db",
            "__i AS __li", "__j AS __lj", "__k AS __lk",
            f"({ni} - {L}) AS __i",
            f"({nj} - {L}) AS __j",
            f"(-({L})) AS __k",
        ])
        # layer B: digit from (l - down(up)) normalized; db slot update
        cm = f"least(least({downs[0]}, {downs[1]}), {downs[2]})"
        e0 = f"(__li - (({downs[0]}) - {cm}))"
        e1 = f"(__lj - (({downs[1]}) - {cm}))"
        e2 = f"(__lk - (({downs[2]}) - {cm}))"
        em = f"least(least({e0}, {e1}), {e2})"
        digit = f"(4 * ({e0} - {em}) + 2 * ({e1} - {em}) + ({e2} - {em}))"
        layers.append([
            "__face", "__i", "__j", "__k",
            f"(__db + ({digit} - 7) * {sh}) AS __db",
        ])
    # ---- base cell + rotation count ---------------------------------
    bc_tab = _hex_table(T.BASE_CELL_TABLE.reshape(-1), 2)
    rot_tab = _hex_table(T.CCW_ROT_TABLE.reshape(-1), 1)
    bk = ("(((__face * 3 + cast(least(greatest(__i, 0), 2) as int)) * 3"
          " + cast(least(greatest(__j, 0), 2) as int)) * 3"
          " + cast(least(greatest(__k, 0), 2) as int))")
    bc_sub = hx(f"substring('{bc_tab}', {bk} * 2 + 1, 2)")
    rot_sub = hx(f"substring('{rot_tab}', {bk} + 1, 1)")
    layers.append([
        "__face", "__db",
        f"{bc_sub} AS __bc",
        f"{rot_sub} AS __hrot",
    ])
    # ---- digit rotations --------------------------------------------
    ccw = np.array(H._ROT_CCW, dtype=np.int64)
    cw = np.array(H._ROT_CW, dtype=np.int64)
    comp = np.zeros((6, 8), dtype=np.int64)
    comp[0] = np.arange(8)
    for t in range(1, 6):
        comp[t] = ccw[comp[t - 1]]
    comp_tab = _hex_table(comp.reshape(-1), 1)
    ccw_tab = _hex_table(ccw, 1)
    cw_tab = _hex_table(cw, 1)
    pent_tab = "".join("1" if v else "0" for v in T.IS_PENTAGON)
    prot_tab = _hex_table(np.asarray(PT["rot"]).reshape(-1), 1)
    kfix_tab = _hex_table((np.asarray(PT["kfix"]).reshape(-1) + 1), 1)
    pent = f"(substring('{pent_tab}', cast(__bc as int) + 1, 1) = '1')"
    layers.append([
        "__db", "__bc",
        f"{pent} AS __pent",
        "cast(CASE WHEN " + pent + " THEN "
        + hx(f"substring('{prot_tab}', cast(__bc as int) * 20 + __face + 1, 1)")
        + " ELSE __hrot END as int) AS __rt",
        "(CASE WHEN " + pent + " THEN "
        + hx(f"substring('{kfix_tab}', cast(__bc as int) * 20 + __face + 1, 1)")
        + " - 1 ELSE 0 END) AS __kf",
    ])
    # raw digits + CCW^rt-rotated digits in one layer each
    d_ex = [
        f"cast((__db - (__db % {1 << (3 * (15 - r))})) % {1 << (3 * (15 - r) + 3)}"
        f" / {1 << (3 * (15 - r))} as int) AS __g{r}"
        for r in range(1, res + 1)
    ]
    layers.append(["__db", "__bc", "__pent", "__rt", "__kf"] + d_ex)
    d_map = [
        hx(f"substring('{comp_tab}', __rt * 8 + __g{r} + 1, 1)") + f" AS __h{r}"
        for r in range(1, res + 1)
    ]
    layers.append(["__db", "__bc", "__pent", "__kf"]
                  + [f"__g{r}" for r in range(1, res + 1)] + d_map)
    # pentagon K-sector fix: leading nonzero post-rotation digit == 1
    lead = "(CASE " + " ".join(
        f"WHEN __h{r} <> 0 THEN __h{r}" for r in range(1, res + 1)
    ) + " ELSE 0 END)"
    fx = f"(__pent AND {lead} = 1)"
    d_fix = [
        f"(CASE WHEN {fx} AND __kf > 0 THEN "
        + hx(f"substring('{ccw_tab}', __h{r} + 1, 1)")
        + f" WHEN {fx} AND __kf < 0 THEN "
        + hx(f"substring('{cw_tab}', __h{r} + 1, 1)")
        + f" ELSE __h{r} END) AS __h{r}"
        for r in range(1, res + 1)
    ]
    layers.append(["__db", "__bc"] + [f"__g{r}" for r in range(1, res + 1)] + d_fix)
    delta = " + ".join(
        f"(__h{r} - __g{r}) * {1 << (3 * (15 - r))}" for r in range(1, res + 1)
    )
    head = (1 << 59) | (res << 52)
    layers.append([
        f"({head} + __bc * {1 << 45} + __db + ({delta})) AS __id",
    ])
    nibbles = " || ".join(
        f"substring('0123456789abcdef', cast((__id - (__id % {1 << (4 * k)}))"
        f" % {1 << (4 * k + 4)} / {1 << (4 * k)} as int) + 1, 1)"
        for k in range(14, -1, -1)
    )
    return layers, f"regexp_replace({nibbles}, '^0+', '')"


def h3_select_sql(
    source_sql: str,
    lat: str,
    lon: str,
    res: int,
    keep_cols: list[str],
    dialect: str = "spark",
    out: str = "cell",
) -> str:
    """H3 point→token at ``res`` over ``source_sql`` (both dialects)."""
    layers, cell = _h3_point_layers(lat, lon, res, dialect)
    keep = ", ".join(keep_cols)
    kp = f"{keep}, " if keep_cols else ""
    q = source_sql
    for lyr in layers:
        q = f"SELECT {kp}{', '.join(lyr)} FROM ({q}) __l"
    return f"SELECT {kp}{cell} AS {out} FROM ({q}) __r"


def h3_cells_df(df, lat: str, lon: str, res: int, keep_cols: list[str], out: str = "cell"):
    """Native Spark H3 point encode over a DataFrame — zero Python in
    the hot loop (the headline backend's point path stays inside
    WholeStageCodegen).  ``lat``/``lon`` are SQL snippets over ``df``."""
    layers, cell = _h3_point_layers(lat, lon, res, "spark")
    for lyr in layers:
        df = df.selectExpr(*keep_cols, *lyr)
    return df.selectExpr(*keep_cols, f"{cell} AS {out}")
