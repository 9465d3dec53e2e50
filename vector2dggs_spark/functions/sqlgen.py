"""Cross-engine SQL expression generators.

``geohash_sql`` emits ONE SQL scalar expression string — pure integer
bit arithmetic (quantize → Morton bit-spread → base32) — that evaluates
identically in Spark SQL *and* DuckDB.  In Spark it compiles into
WholeStageCodegen (zero Python, zero UDF): this is the engine's native
fast path for point indexing at scale, and it doubles as the DuckDB
oracle for the driver's correctness gate.

The reference's geohash encode is a per-row C call
(``geohashvectorindexer.py:58-72``); here the same closed form
(quantize + interleave, dggs/geohash.py) is expressed as columnar SQL.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

# 64-bit Morton spread masks (standard bit-twiddling constants), emitted
# as decimal literals so both SQL dialects parse them.
_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_sql(v: str, nbits: int) -> str:
    """Expression spreading the low ``nbits`` of ``v`` to even positions."""
    expr = f"({v})"
    for shift, mask in _SPREAD:
        if shift >= 2 * nbits:
            continue  # no-op for small widths
        expr = f"((({expr}) | (({expr}) << {shift})) & {mask})"
    return expr


def dlit(x: float) -> str:
    """A fractional literal as a DOUBLE in both dialects.

    Bare ``-44.4`` parses as DECIMAL in Spark *and* DuckDB, but their
    decimal arithmetic then diverges (Spark truncates intermediate
    scale); an explicit double cast pins both to IEEE-754 semantics."""
    return f"cast({x!r} as double)"


def quantize_sql(coord: str, offset: float, extent: float, nbits: int) -> str:
    n = 1 << nbits
    raw = f"cast(floor((({coord}) + {dlit(offset)}) / {dlit(extent)} * {n}) as bigint)"
    return f"least(greatest({raw}, 0), {n - 1})"


def geohash_code_sql(lat: str, lon: str, precision: int) -> str:
    """The 5·p-bit interleaved integer code as a SQL expression."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total - lon_bits
    lon_q = quantize_sql(lon, 180.0, 360.0, lon_bits)
    lat_q = quantize_sql(lat, 90.0, 180.0, lat_bits)
    s_lon = _spread_sql(lon_q, lon_bits)
    s_lat = _spread_sql(lat_q, lat_bits)
    if lon_bits == lat_bits:  # even precision: MSB is a lon bit at 2j+1
        return f"((({s_lon}) << 1) | ({s_lat}))"
    # odd precision: lon bit j at 2j, lat bit j at 2j+1
    return f"(({s_lon}) | (({s_lat}) << 1))"


def geohash_sql(lat: str, lon: str, precision: int) -> str:
    """Base32 geohash string as a SQL scalar expression (both dialects)."""
    code = geohash_code_sql(lat, lon, precision)
    chars = []
    for i in range(precision):
        shift = 5 * (precision - 1 - i)
        idx = f"(cast((({code}) >> {shift}) & 31 as int) + 1)"
        chars.append(f"substring('{ALPHABET}', {idx}, 1)")
    return "(" + " || ".join(chars) + ")"


def geohash_select_sql(
    source_sql: str,
    lat: str,
    lon: str,
    precision: int,
    keep_cols: list[str],
    out: str = "cell",
) -> str:
    """Linear-size geohash encode via staged lateral column aliases
    (supported by Spark SQL and DuckDB alike).

    The single-expression ``geohash_sql`` doubles in textual size per
    bit-spread step (Catalyst parse + codegen cost grows with it); the
    staged form keeps the plan small — the engine's preferred shape for
    hot native point indexing."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total - lon_bits
    stages = [
        f"{quantize_sql(lon, 180.0, 360.0, lon_bits)} AS __ln",
        f"{quantize_sql(lat, 90.0, 180.0, lat_bits)} AS __lt",
    ]
    ln, lt = "__ln", "__lt"
    for idx, (shift, mask) in enumerate(_SPREAD):
        if shift < 2 * lon_bits:
            stages.append(f"(({ln} | ({ln} << {shift})) & {mask}) AS __ln{idx}")
            ln = f"__ln{idx}"
        if shift < 2 * lat_bits:
            stages.append(f"(({lt} | ({lt} << {shift})) & {mask}) AS __lt{idx}")
            lt = f"__lt{idx}"
    if lon_bits == lat_bits:
        stages.append(f"((({ln}) << 1) | ({lt})) AS __code")
    else:
        stages.append(f"(({ln}) | (({lt}) << 1)) AS __code")
    chars = []
    for i in range(precision):
        shift = 5 * (precision - 1 - i)
        chars.append(
            f"substring('{ALPHABET}', cast((__code >> {shift}) & 31 as int) + 1, 1)"
        )
    keep = ", ".join(keep_cols)
    keep_prefix = f"{keep}, " if keep_cols else ""
    return (
        f"SELECT {keep_prefix}{' || '.join(chars)} AS {out} FROM ("
        f"SELECT {keep_prefix}{', '.join(stages)} FROM ({source_sql}) __src) __g"
    )


def geohash_code_select_sql(
    source_sql: str,
    lat: str,
    lon: str,
    precision: int,
    keep_cols: list[str],
    out: str = "code",
) -> str:
    """Like ``geohash_select_sql`` but emits the 5·p-bit INTEGER code —
    the engine's internal cell representation for the hottest paths.

    Strings allocate 10 objects per row and bound JVM throughput at high
    core counts (allocation/GC bandwidth); the integer code is pure
    register math, and ``parent`` is ``code >> 5·(p-k)``.  Materialize
    base32 tokens only at output boundaries via ``geohash_token_sql``."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total - lon_bits
    stages = [
        f"{quantize_sql(lon, 180.0, 360.0, lon_bits)} AS __ln",
        f"{quantize_sql(lat, 90.0, 180.0, lat_bits)} AS __lt",
    ]
    ln, lt = "__ln", "__lt"
    for idx, (shift, mask) in enumerate(_SPREAD):
        if shift < 2 * lon_bits:
            stages.append(f"(({ln} | ({ln} << {shift})) & {mask}) AS __ln{idx}")
            ln = f"__ln{idx}"
        if shift < 2 * lat_bits:
            stages.append(f"(({lt} | ({lt} << {shift})) & {mask}) AS __lt{idx}")
            lt = f"__lt{idx}"
    if lon_bits == lat_bits:
        code = f"((({ln}) << 1) | ({lt}))"
    else:
        code = f"(({ln}) | (({lt}) << 1))"
    keep = ", ".join(keep_cols)
    keep_prefix = f"{keep}, " if keep_cols else ""
    return (
        f"SELECT {keep_prefix}{code} AS {out} FROM ("
        f"SELECT {keep_prefix}{', '.join(stages)} FROM ({source_sql}) __src) __g"
    )


def geohash_token_sql(code: str, precision: int) -> str:
    """Integer code -> base32 token (output-boundary materialization)."""
    chars = []
    for i in range(precision):
        shift = 5 * (precision - 1 - i)
        chars.append(
            f"substring('{ALPHABET}', cast((({code}) >> {shift}) & 31 as int) + 1, 1)"
        )
    return "(" + " || ".join(chars) + ")"


def geohash_col(lat: str, lon: str, precision: int) -> Column:
    """Native Spark Column for geohash encode — WholeStageCodegen, no UDF.

    ``lat``/``lon`` are SQL snippets (column names or expressions)."""
    return F.expr(geohash_sql(lat, lon, precision))


# ------------------------------------------------------------ rHP point encode
def _rhp_point_layers(lat: str, lon: str, res: int) -> tuple[list[list[str]], str]:
    """Layered select lists for the rHP point->cell encode + the final
    cell expression.

    Mirrors ``dggs.rhp.point_to_cell`` operation-for-operation — same
    double literals (authalic series, π multiples), same wrap, same
    sequential ×3 digit fold — so the only cross-formulation divergence
    is ≤1-ulp libm ``sin``/``cos``, far below the distance of any
    generic point to a cell boundary.

    Layered (each expression references only COLUMNS of the previous
    layer, never a same-layer alias) because lateral aliases are inlined
    per-reference by both Spark and DuckDB, which makes the chained ×3
    digit fold grow ~3× per level (measured: 148 s for 10 k rows in
    DuckDB); the layered form keeps the expression tree linear (<0.1 s).
    """
    from vector2dggs_spark.dggs import rhp

    PI = dlit(rhp._PI)
    TWO_PI = dlit(2.0 * rhp._PI)
    HPI = dlit(rhp._PI / 2.0)
    QPI = dlit(rhp._PI / 4.0)
    C38 = dlit(3.0 * rhp._PI / 8.0)
    N34 = dlit(-3.0 * rhp._PI / 4.0)
    RAD = dlit(rhp._PI / 180.0)
    TT = dlit(2.0 / 3.0)
    UMAX = dlit(1.0 - 1e-15)

    layers: list[list[str]] = []
    layers.append([f"(({lat}) * {RAD}) AS __phi", f"(({lon}) * {RAD}) AS __lm0"])
    # wrap to [-pi, pi) (sign-safe floor form == np.mod(x+pi, 2pi)-pi);
    # geodetic -> authalic latitude (Snyder series), clamped like the kernel
    layers.append([
        f"(__lm0 - {TWO_PI} * floor((__lm0 + {PI}) / {TWO_PI})) AS __lam",
        f"least(greatest(__phi + {dlit(rhp._A2)} * sin(__phi * {dlit(2.0)})"
        f" + {dlit(rhp._A4)} * sin(__phi * {dlit(4.0)})"
        f" + {dlit(rhp._A6)} * sin(__phi * {dlit(6.0)}), -{HPI}), {HPI}) AS __ba",
    ])
    layers.append(["__lam", "sin(__ba) AS __sphi"])
    layers.append([
        "__lam",
        "__sphi",
        f"(CASE WHEN __sphi > {TT} THEN {dlit(1.0)}"
        f" WHEN __sphi < -{TT} THEN {dlit(-1.0)} ELSE {dlit(0.0)} END) AS __sgn",
    ])
    # polar-cap branch (numpy project() masked path, replicated literally)
    layers.append([
        "__lam",
        "__sphi",
        "__sgn",
        f"least(greatest(floor((__lam + {PI}) / {HPI}), 0), 3) AS __k",
        f"sqrt({dlit(3.0)} * ({dlit(1.0)} - __sgn * __sphi)) AS __sig",
    ])
    layers.append([
        "__lam",
        "__sphi",
        "__sgn",
        f"((__lam - ({N34} + __k * {HPI})) * __sig) AS __rx",
        f"(((-__sgn) * {QPI}) * __sig) AS __ry",
        f"cos((__sgn * __k) * {HPI}) AS __cca",
        f"sin((__sgn * __k) * {HPI}) AS __ssa",
    ])
    layers.append([
        f"(CASE WHEN __sgn = {dlit(0.0)} THEN __lam"
        f" ELSE {N34} + (__cca * __rx - __ssa * __ry) END) AS __x",
        f"(CASE WHEN __sgn = {dlit(0.0)} THEN {C38} * __sphi"
        f" ELSE __sgn * {HPI} + (__ssa * __rx + __cca * __ry) END) AS __y",
    ])
    # planar -> (face, u, v) from the face's top-left corner
    layers.append([
        "__x",
        "__y",
        f"(CASE WHEN __y > {QPI} THEN 0 WHEN __y < -{QPI} THEN 5"
        f" ELSE 1 + cast(least(greatest(floor((__x + {PI}) / {HPI}), 0), 3) as int)"
        " END) AS __face",
    ])
    layers.append([
        "__x",
        "__y",
        "__face",
        f"(CASE WHEN __face = 0 OR __face = 5 THEN -{PI}"
        f" ELSE -{PI} + (__face - 1) * {HPI} END) AS __x0",
        f"(CASE WHEN __face = 0 THEN {dlit(3.0 * rhp._PI / 4.0)}"
        f" WHEN __face = 5 THEN -{QPI} ELSE {QPI} END) AS __yt",
    ])
    layers.append([
        "__face",
        f"least(greatest((__x - __x0) / {HPI}, {dlit(0.0)}), {UMAX}) AS __u",
        f"least(greatest((__yt - __y) / {HPI}, {dlit(0.0)}), {UMAX}) AS __v",
    ])
    # sequential base-3 digit fold — EXACTLY the kernel's multiply/
    # subtract order (u*3 rounds once per level; integer subtract exact)
    carried: list[str] = ["__face"]
    for i in range(1, res + 1):
        layers.append(
            list(carried) + [f"(__u * {dlit(3.0)}) AS __uu", f"(__v * {dlit(3.0)}) AS __vv"]
        )
        prev = list(carried)
        carried.append(f"__cu{i}")
        carried.append(f"__cv{i}")
        layers.append(
            prev
            + [
                f"least(greatest(cast(floor(__uu) as int), 0), 2) AS __cu{i}",
                f"least(greatest(cast(floor(__vv) as int), 0), 2) AS __cv{i}",
                "(__uu - least(greatest(cast(floor(__uu) as int), 0), 2)) AS __u",
                "(__vv - least(greatest(cast(floor(__vv) as int), 0), 2)) AS __v",
            ]
        )
    from vector2dggs_spark.dggs import rhp as _r

    digits = [
        f"substring('012345678', 3 * __cv{i} + __cu{i} + 1, 1)" for i in range(1, res + 1)
    ]
    cell = " || ".join([f"substring('{_r.FACES}', __face + 1, 1)"] + digits)
    return layers, cell


def rhp_select_sql(
    source_sql: str,
    lat: str,
    lon: str,
    res: int,
    keep_cols: list[str],
    out: str = "cell",
) -> str:
    """rHEALPix point→cell as layered nested-SELECT SQL (Spark *and*
    DuckDB dialects).  Doubles as the independent DuckDB oracle for the
    numpy kernel (driver correctness gate, q30) and a fully-native
    WholeStageCodegen rHP point path in Spark SQL."""
    keep = ", ".join(keep_cols)
    kp = f"{keep}, " if keep_cols else ""
    layers, cell = _rhp_point_layers(lat, lon, res)
    q = source_sql
    for lyr in layers:
        q = f"SELECT {kp}{', '.join(lyr)} FROM ({q}) __l"
    return f"SELECT {kp}{cell} AS {out} FROM ({q}) __r"


def rhp_cells_df(df, lat: str, lon: str, res: int, keep_cols: list[str], out: str = "cell"):
    """Native Spark rHP point encode over a DataFrame — zero Python in
    the hot loop (the second backend, after geohash, whose point path is
    pure JVM expression work).  ``lat``/``lon`` are SQL snippets over
    ``df``'s columns."""
    layers, cell = _rhp_point_layers(lat, lon, res)
    for lyr in layers:
        df = df.selectExpr(*keep_cols, *lyr)
    return df.selectExpr(*keep_cols, f"{cell} AS {out}")


# ------------------------------------------------------------ S2 point encode
def s2_select_sql(
    source_sql: str,
    lat: str,
    lon: str,
    level: int,
    keep_cols: list[str],
    dialect: str = "spark",
    out: str = "cell",
) -> str:
    """S2 point->cell-token as layered nested-SELECT SQL (Spark or DuckDB
    dialect — they differ only in the hex-literal parse).

    An INDEPENDENT formulation of the published S2 construction
    (cube-face selection, quadratic UV<->ST, 30-level Hilbert position
    via the canonical 4-bit lookup, ``face(3)|pos(2*level)|sentinel`` id,
    hex token with trailing zeros stripped) mirroring
    ``dggs.s2.latlng_to_cell`` operation-for-operation.  Used as the
    DuckDB oracle for the numpy kernel (q31) — the only cross-engine
    divergence is <=1-ulp libm trig, far below any generic point's
    distance to a cell boundary.

    The Hilbert nibble lookup (1024 x 10-bit values) is encoded as a
    3072-char hex string indexed by ``(i4<<4 | j4)<<2 | bits``; signed
    BIGINT stands in for uint64 (faces 4/5 set the sign bit; nibble
    extraction masks after the arithmetic shift, id assembly uses
    (face-8)*2^61 to stay in signed range — Spark ANSI mode and DuckDB
    both reject << overflow).
    """
    from vector2dggs_spark.dggs import s2 as S

    if dialect == "spark":
        def hx(expr3: str) -> str:
            return f"cast(conv({expr3}, 16, 10) as bigint)"
    else:
        def hx(expr3: str) -> str:
            return f"(('0x' || {expr3})::BIGINT)"

    lookup_hex = "".join(format(int(v), "03x") for v in S._LOOKUP_POS)
    RAD = dlit(3.141592653589793 / 180.0)
    MAXN = 1 << 30

    keep = ", ".join(keep_cols)
    kp = f"{keep}, " if keep_cols else ""
    layers: list[list[str]] = []
    layers.append([f"(({lat}) * {RAD}) AS __phi", f"(({lon}) * {RAD}) AS __lmb"])
    layers.append([
        "(cos(__phi) * cos(__lmb)) AS __cx",
        "(cos(__phi) * sin(__lmb)) AS __cy",
        "sin(__phi) AS __cz",
    ])
    # largest-|axis| face selection, exactly the kernel's nested wheres
    layers.append([
        "__cx", "__cy", "__cz",
        "(CASE WHEN abs(__cx) >= abs(__cy) THEN"
        " (CASE WHEN abs(__cx) >= abs(__cz) THEN 0 ELSE 2 END)"
        " ELSE (CASE WHEN abs(__cy) >= abs(__cz) THEN 1 ELSE 2 END) END) AS __f0",
    ])
    layers.append([
        "__cx", "__cy", "__cz", "__f0",
        "(CASE __f0 WHEN 0 THEN __cx WHEN 1 THEN __cy ELSE __cz END) AS __mj",
    ])
    layers.append([
        "__cx", "__cy", "__cz",
        "(CASE WHEN __mj < cast(0.0 as double) THEN __f0 + 3 ELSE __f0 END) AS __face",
    ])
    # canonical face frames (u, v)
    layers.append([
        "__face",
        "(CASE __face"
        " WHEN 0 THEN __cy / __cx WHEN 1 THEN -__cx / __cy WHEN 2 THEN -__cx / __cz"
        " WHEN 3 THEN __cz / __cx WHEN 4 THEN __cz / __cy ELSE -__cy / __cz END) AS __u",
        "(CASE __face"
        " WHEN 0 THEN __cz / __cx WHEN 1 THEN __cz / __cy WHEN 2 THEN -__cy / __cz"
        " WHEN 3 THEN __cy / __cx WHEN 4 THEN -__cx / __cy ELSE -__cx / __cz END) AS __v",
    ])
    # quadratic UV -> ST
    half, one, three = dlit(0.5), dlit(1.0), dlit(3.0)
    layers.append([
        "__face",
        f"(CASE WHEN __u >= cast(0.0 as double) THEN {half} * sqrt({one} + {three} * __u)"
        f" ELSE {one} - {half} * sqrt({one} - {three} * __u) END) AS __s",
        f"(CASE WHEN __v >= cast(0.0 as double) THEN {half} * sqrt({one} + {three} * __v)"
        f" ELSE {one} - {half} * sqrt({one} - {three} * __v) END) AS __t",
    ])
    layers.append([
        "__face",
        f"least(greatest(cast(floor(__s * {dlit(float(MAXN))}) as bigint), 0), {MAXN - 1}) AS __i",
        f"least(greatest(cast(floor(__t * {dlit(float(MAXN))}) as bigint), 0), {MAXN - 1}) AS __j",
    ])
    layers.append(["__face", "__i", "__j", "cast(0 as bigint) AS __pos",
                   "cast(__face & 1 as bigint) AS __bits"])
    # 8 nibble steps of the Hilbert lookup, most-significant first
    for k in range(7, -1, -1):
        sh = 4 * k
        key = (f"((((__i >> {sh}) & 15) * 64) + (((__j >> {sh}) & 15) * 4) + __bits)"
               if sh else "(((__i & 15) * 64) + ((__j & 15) * 4) + __bits)")
        layers.append(["__face", "__i", "__j", "__pos", "__bits", f"{key} AS __key"])
        o = hx(f"substring('{lookup_hex}', __key * 3 + 1, 3)")
        layers.append([
            "__face", "__i", "__j",
            f"(__pos + ((({o}) >> 2) * {1 << (8 * k)})) AS __pos",
            f"(({o}) & 3) AS __bits",
        ])
    # leaf id -> parent at `level` (signed-bigint id assembly)
    lsb = 1 << (2 * (30 - level))
    layers.append([
        "((CASE WHEN __face >= 4 THEN __face - 8 ELSE __face END)"
        f" * {1 << 61} + __pos * 2 + 1) AS __leaf",
    ])
    layers.append([f"((__leaf & {-(2 * lsb)}) + {lsb}) AS __id"] if level < 30
                  else ["__leaf AS __id"])
    nibbles = " || ".join(
        f"substring('0123456789abcdef', cast((__id >> {4 * k}) & 15 as int) + 1, 1)"
        for k in range(15, -1, -1)
    )
    q = source_sql
    for lyr in layers:
        q = f"SELECT {kp}{', '.join(lyr)} FROM ({q}) __l"
    return (
        f"SELECT {kp}regexp_replace({nibbles}, '0+$', '') AS {out} "
        f"FROM ({q}) __r"
    )


# ------------------------------------------------------------ tile helpers
def tile_ref_sql(z: int, x: str, y: str) -> str:
    """tile://z/x/y string from integer tile coords (both dialects)."""
    return f"('tile://{z}/' || cast({x} as string) || '/' || cast({y} as string))"


def tile_center_lon_sql(z: int, x: str) -> str:
    n = 1 << z
    return f"({dlit(-180.0)} + (({x}) + {dlit(0.5)}) * {dlit(360.0 / n)})"


def tile_center_lat_idx_sql(z: int, y: str) -> str:
    """Linear (equirectangular) tile-row center latitude — exact double
    arithmetic shared by both engines (used for oracle-checked tile
    tables; the slippy WebMercator version lives in sources.documents)."""
    n = 1 << z
    return f"({dlit(90.0)} - (({y}) + {dlit(0.5)}) * {dlit(180.0 / n)})"


# ------------------------------------------------------------ derived tables
# Deterministic synthetic point/tile tables derived from the driver's
# TPC-H-ish tables with double-exact arithmetic — the shared substrate
# for oracle-checked DGGS queries (CORRECTNESS gate).
def derived_points_sql(table: str = "events", id_col: str = "event_id") -> str:
    lat = f"({dlit(-44.4)} + ({id_col} % 700) * {dlit(0.001)})"
    lon = f"({dlit(-176.6)} + (({id_col} * 7) % 400) * {dlit(0.001)})"
    return (
        f"SELECT {id_col} AS point_id, {lat} AS lat, {lon} AS lon FROM {table}"
    )


def derived_points_global_sql(table: str = "events", id_col: str = "event_id") -> str:
    """Deterministic GLOBAL point spread (all six rHP faces, all four
    polar-cap quadrants, both hemispheres) — exact double arithmetic.

    Step sizes are generic decimals, so no point lands within ~1e-4° of
    any face/cell boundary (cross-engine trig disagrees at ~1e-16)."""
    lat = f"({dlit(-84.9)} + ({id_col} % 171) * {dlit(0.997)})"
    lon = f"({dlit(-179.8)} + (({id_col} * 7) % 360) * {dlit(0.999)})"
    return (
        f"SELECT {id_col} AS point_id, {lat} AS lat, {lon} AS lon FROM {table}"
    )


def derived_tiles_sql(table: str = "supplier", id_col: str = "s_suppkey") -> str:
    """Deterministic z=10 equirectangular tiles inside the fixture window.

    The z=10 linear tile grid (360/1024° × 180/1024°) coincides exactly
    with geohash precision-4 cells, so tile↔cell assignment is a pure
    grid identity both engines can compute."""
    z = 10
    x = f"(9 + ({id_col} % 2))"
    y = f"(760 + ({id_col} % 6))"
    return (
        f"SELECT {tile_ref_sql(z, x, y)} AS media_ref, "
        f"{tile_center_lon_sql(z, x)} AS tile_lon, "
        f"{tile_center_lat_idx_sql(z, y)} AS tile_lat FROM {table}"
    )
