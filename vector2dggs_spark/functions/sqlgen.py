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
