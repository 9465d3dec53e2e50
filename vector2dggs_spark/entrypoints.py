"""Driver-contract queries: Spark implementations + DuckDB oracles.

Each entry in ``QUERIES`` maps a name to ``(spark_fn, oracle_sql)``.
``spark_fn(spark, sf_dir) -> DataFrame``; ``oracle_sql`` is ANSI SQL
DuckDB runs over the same parquet tables (pre-registered views), or
``None`` for ops that are not SQL-expressible (DGGS polyfill/linetrace/
compaction over the synthesized interleaved documents table) — those get
the driver's rows-only check and are covered cell-exactly by the pytest
suites instead.

Cross-engine determinism rules used throughout (see functions/sqlgen.py):
* every fractional literal is pinned to DOUBLE (decimal-literal
  arithmetic diverges between engines),
* money aggregates go through exact DECIMAL(18,2) sums, cast to double
  once at the end (float summation order is engine-dependent),
* rank/row_number cast to INT, list sizes to BIGINT in both dialects,
* float folds are left-to-right sequential in both engines.
"""
from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vector2dggs_spark.functions import sqlgen as G

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

PTS = G.derived_points_sql("events", "event_id")
TILES = G.derived_tiles_sql("supplier", "s_suppkey")
# staged (linear-size) geohash encodes — identical output to the
# single-expression form, far cheaper to parse/codegen
PTS_CELL6 = G.geohash_select_sql(PTS, "lat", "lon", 6, ["point_id"], out="cell")
PTS_CELL4 = G.geohash_select_sql(PTS, "lat", "lon", 4, ["point_id"], out="cell4")
TILES_CELL4 = G.geohash_select_sql(
    TILES, "tile_lat", "tile_lon", 4, ["media_ref"], out="cell4"
)


def load_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the corpus tables as temp views (idempotent).

    Memoized per (session, sf_dir): every query fn calls this, and a
    redundant re-registration costs ~0.65 s of driver-side parquet
    schema reads (10 tables x ~65 ms) while changing nothing — the
    views are name-identical definitions over static files.  No DATA is
    cached; only the view registration is skipped.  Switching sf_dir on
    the same session re-registers."""
    if getattr(spark, "_v2dggs_views_sf", None) == sf_dir:
        return
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    spark._v2dggs_views_sf = sf_dir


def _shared(sql: str) -> tuple[Callable, str]:
    """A query whose Spark text and DuckDB oracle are the SAME string."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_views(spark, sf_dir)
        return spark.sql(sql)

    return fn, sql


def _dialects(spark_sql: str, duck_sql: str) -> tuple[Callable, str]:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_views(spark, sf_dir)
        return spark.sql(spark_sql)

    return fn, duck_sql


# ---------------------------------------------------------------- relational
Q01 = _shared(
    """
SELECT l_returnflag, l_linestatus,
       cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
       cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_base_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= cast('1998-09-02' as date)
GROUP BY l_returnflag, l_linestatus
"""
)

Q02 = _shared(
    """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         cast(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) as int) AS rn
  FROM orders) t
WHERE rn <= 3
"""
)

# ---------------------------------------------------------------- DGGS (shared SQL)
Q03 = _shared(
    f"""
WITH cells AS ({PTS_CELL6})
SELECT cell, count(*) AS n_points
FROM cells GROUP BY 1
"""
)

Q04 = _shared(
    f"""
WITH cells AS ({PTS_CELL6})
SELECT substring(cell, 1, 3) AS parent_cell,
       count(*) AS n_points,
       count(distinct cell) AS n_cells
FROM cells GROUP BY 1
"""
)

Q05 = _shared(
    f"""
WITH pc AS ({PTS_CELL4}),
tc AS (SELECT DISTINCT media_ref, cell4 FROM ({TILES_CELL4}) __t)
SELECT pc.point_id, tc.media_ref
FROM pc JOIN tc ON pc.cell4 = tc.cell4
"""
)

# ---------------------------------------------------------------- kNN (J3)
_KNN_K = 5
_KNN_ORACLE = f"""
WITH pts AS ({PTS}), q AS (SELECT * FROM pts WHERE point_id < 30),
c AS (
  SELECT q.point_id AS query_id, t.point_id AS target_id,
         ((q.lat - t.lat) * (q.lat - t.lat) +
          (q.lon - t.lon) * (q.lon - t.lon)) AS dist_sq
  FROM q CROSS JOIN pts t)
SELECT query_id, target_id, dist_sq, rank FROM (
  SELECT query_id, target_id, dist_sq,
         cast(row_number() OVER (PARTITION BY query_id
                                 ORDER BY dist_sq, target_id) as int) AS rank
  FROM c) r
WHERE rank <= {_KNN_K}
"""


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.joins import knn

    load_views(spark, sf_dir)
    pts = spark.sql(PTS)
    queries = pts.where(F.col("point_id") < 30).withColumnRenamed("point_id", "query_id")
    targets = pts.withColumnRenamed("point_id", "target_id")
    out = knn(queries, targets, get_backend("geohash"), res=6, k=_KNN_K)
    return out.select("query_id", "target_id", "dist_sq", "rank")


Q06 = (_q_knn, _KNN_ORACLE)

# kNN with great-circle (haversine) ranking — the global-corpus metric
# (VERDICT r02 #6).  Both engines evaluate the same expression tree;
# outputs are rounded to mm, far above the ~1-ulp trig disagreement.
_HAV = (
    f"{G.dlit(2.0)} * asin(sqrt("
    "sin((radians(t.lat) - radians(q.lat)) / 2) * sin((radians(t.lat) - radians(q.lat)) / 2)"
    " + cos(radians(q.lat)) * cos(radians(t.lat))"
    " * sin((radians(t.lon) - radians(q.lon)) / 2) * sin((radians(t.lon) - radians(q.lon)) / 2)"
    f")) * {G.dlit(6371008.8)}"
)
_KNN_HAV_ORACLE = f"""
WITH pts AS ({PTS}), q AS (SELECT * FROM pts WHERE point_id < 30),
c AS (
  SELECT q.point_id AS query_id, t.point_id AS target_id, {_HAV} AS dist_m
  FROM q CROSS JOIN pts t)
SELECT query_id, target_id, round(dist_m, 3) AS dist_m, rank FROM (
  SELECT query_id, target_id, dist_m,
         cast(row_number() OVER (PARTITION BY query_id
                                 ORDER BY dist_m, target_id) as int) AS rank
  FROM c) r
WHERE rank <= {_KNN_K}
"""


def _q_knn_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.joins import knn

    load_views(spark, sf_dir)
    pts = spark.sql(PTS)
    queries = pts.where(F.col("point_id") < 30).withColumnRenamed("point_id", "query_id")
    targets = pts.withColumnRenamed("point_id", "target_id")
    out = knn(queries, targets, get_backend("geohash"), res=6, k=_KNN_K,
              metric="haversine")
    return out.select(
        "query_id", "target_id", F.round("dist_m", 3).alias("dist_m"), "rank"
    )


Q27 = (_q_knn_haversine, _KNN_HAV_ORACLE)

# Fixed-radius spatial range join (distance join) — kNN's sibling
# operator (operators/joins.py:range_join): cover + refine with a
# PLAN-TIME ring count from the backend guarantee, one cell equi-join,
# exact-distance filter.  Planar degree metric = arithmetic-only, so
# the brute-force DuckDB oracle reproduces every double bit-for-bit.
_RANGE_RADIUS_DEG = 0.06


def _q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.joins import range_join

    load_views(spark, sf_dir)
    pts = spark.sql(PTS)
    queries = pts.where(F.col("point_id") < 40).withColumnRenamed("point_id", "query_id")
    targets = pts.withColumnRenamed("point_id", "target_id")
    out = range_join(queries, targets, get_backend("geohash"), res=5,
                     radius=_RANGE_RADIUS_DEG)
    return out.select("query_id", "target_id", "dist_sq")


_SQDD = ("((q.lat - t.lat) * (q.lat - t.lat)"
         " + (q.lon - t.lon) * (q.lon - t.lon))")
_RANGE_ORACLE = f"""
WITH pts AS ({PTS}), q AS (SELECT * FROM pts WHERE point_id < 40)
SELECT q.point_id AS query_id, t.point_id AS target_id,
       {_SQDD} AS dist_sq
FROM q CROSS JOIN pts t
WHERE {_SQDD} <= {G.dlit(_RANGE_RADIUS_DEG * _RANGE_RADIUS_DEG)}
"""

Q63 = (_q_range_join, _RANGE_ORACLE)

# ---------------------------------------------------------------- dedup / text
Q07 = _shared(
    """
SELECT md5(props) AS props_hash, min(event_id) AS keep_event_id, count(*) AS dup_count
FROM events GROUP BY 1
"""
)

Q08 = _dialects(
    "SELECT doc_id, md5(lower(regexp_replace(text, ' +', ' '))) AS fingerprint FROM documents",
    "SELECT doc_id, md5(lower(regexp_replace(text, ' +', ' ', 'g'))) AS fingerprint FROM documents",
)

Q09 = _dialects(
    """
WITH t AS (SELECT doc_id, split(text, ' ') AS toks FROM documents)
SELECT doc_id, cast(size(toks) as bigint) AS n_tokens,
       cast(size(array_distinct(toks)) as bigint) AS n_uniq
FROM t
""",
    """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id, cast(len(toks) as bigint) AS n_tokens,
       cast(len(list_distinct(toks)) as bigint) AS n_uniq
FROM t
""",
)

_D = G.dlit
_QUALITY_EXPR = (
    f"least({_D(1.0)}, n_tokens / {_D(100.0)}) * {_D(0.5)}"
    f" + (n_uniq / cast(n_tokens as double)) * {_D(0.5)}"
)
Q10 = _dialects(
    f"""
WITH t AS (SELECT doc_id, split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, cast(size(toks) as bigint) AS n_tokens,
             cast(size(array_distinct(toks)) as bigint) AS n_uniq FROM t)
SELECT doc_id, {_QUALITY_EXPR} AS quality_score FROM s
""",
    f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, cast(len(toks) as bigint) AS n_tokens,
             cast(len(list_distinct(toks)) as bigint) AS n_uniq FROM t)
SELECT doc_id, {_QUALITY_EXPR} AS quality_score FROM s
""",
)

_STOP = "('the', 'a', 'of', 'to', 'and')"
Q11 = _dialects(
    f"""
WITH t AS (SELECT doc_id, split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id,
             cast(size(filter(toks, x -> x in {_STOP})) as bigint) AS n_stop,
             cast(size(toks) as bigint) AS n_tokens FROM t)
SELECT doc_id, n_stop / cast(n_tokens as double) AS en_score,
       CASE WHEN n_stop / cast(n_tokens as double) >= {_D(0.05)}
            THEN 'en' ELSE 'other' END AS pred_lang
FROM s
""",
    f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id,
             cast(len(list_filter(toks, x -> x in {_STOP})) as bigint) AS n_stop,
             cast(len(toks) as bigint) AS n_tokens FROM t)
SELECT doc_id, n_stop / cast(n_tokens as double) AS en_score,
       CASE WHEN n_stop / cast(n_tokens as double) >= {_D(0.05)}
            THEN 'en' ELSE 'other' END AS pred_lang
FROM s
""",
)

# MinHash LSH near-dup candidates: word 3-gram shingles hashed ONCE
# (md5 -> 48-bit int), then 16 linear-permutation min-hashes (the
# standard (a*h+b) mod p family — pure integer math both engines agree
# on exactly), banded 4x4.
_MH_P = 2305843009213693951  # 2^61 - 1 (Mersenne prime)
_MH_PERMS = [(2 * j + 3, 104729 * (j + 1)) for j in range(16)]


def _minhash_bands_cte(dialect: str) -> str:
    """The shared WITH-chain ending at ``b(doc_id, band, bv)`` — the
    banded MinHash signature table both q12 (candidate pairs) and q39
    (greedy LSH dedup) build on."""
    if dialect == "spark":
        toks = "split(text, ' ')"
        # one row per shingle (codegen'd Generate) hashed ONCE, then the
        # 16 permutation-mins as a hash AGGREGATE (partial min map-side,
        # guide §2.3/§4.1).  The round-1..5 form folded a 16-field
        # named_struct per shingle through aggregate()/transform():
        # Catalyst evaluates higher-order-function lambdas per element
        # in INTERPRETED mode (no whole-stage codegen inside lambdas),
        # and slice()+named_struct() allocate per shingle — measured 6x
        # slower than this relational restatement at bench scale
        # (OPTIMIZATION_r06.md).  Same md5/permutation arithmetic, same
        # multiset of shingle hashes per doc => identical minima.
        # toks[i] is 0-based subscript; the 1-based shingle index i maps
        # to slice(toks, i, 3) == (toks[i-1], toks[i], toks[i+1]).
        shingle = (
            "cast(conv(substring(md5(concat_ws(' ', toks[i - 1], toks[i], toks[i + 1])), 1, 12), 16, 10) as bigint)"
        )
        mins = ", ".join(
            f"min((h * {a} + {b}) % {_MH_P}) AS m{j}"
            for j, (a, b) in enumerate(_MH_PERMS)
        )
        bands = (
            "LATERAL VIEW explode(array(0, 1, 2, 3)) x AS band"
        )
        bv = (
            "CASE band "
            + " ".join(
                f"WHEN {i} THEN concat_ws('|', m{4*i}, m{4*i+1}, m{4*i+2}, m{4*i+3})"
                for i in range(4)
            )
            + " END"
        )
        return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
f AS (SELECT doc_id, toks FROM t WHERE size(toks) >= 3),
e AS (SELECT doc_id, {shingle} AS h
      FROM f LATERAL VIEW explode(sequence(1, size(toks) - 2)) g AS i),
m AS (SELECT doc_id, {mins} FROM e GROUP BY doc_id),
b AS (SELECT doc_id, band, {bv} AS bv FROM m {bands})"""
    shingles = (
        "[('0x' || substr(md5(array_to_string(toks[i:i+2], ' ')), 1, 12))::BIGINT "
        "for i in range(1, len(toks) - 1)]"
    )
    mins = ", ".join(
        f"list_aggregate([(h * {a} + {b}) % {_MH_P} for h in hs], 'min') AS m{j}"
        for j, (a, b) in enumerate(_MH_PERMS)
    )
    bv = (
        "CASE band "
        + " ".join(
            f"WHEN {i} THEN concat_ws('|', m{4*i}, m{4*i+1}, m{4*i+2}, m{4*i+3})"
            for i in range(4)
        )
        + " END"
    )
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 3),
s AS (SELECT doc_id, {shingles} AS hs FROM f),
m AS (SELECT doc_id, {mins} FROM s),
b AS (SELECT doc_id, band, {bv} AS bv FROM m, range(0, 4) r(band))"""


def _minhash_sql(dialect: str) -> str:
    return f"""{_minhash_bands_cte(dialect)}
SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
FROM b a JOIN b c ON a.band = c.band AND a.bv = c.bv AND a.doc_id < c.doc_id
GROUP BY 1, 2
"""


def _lsh_dedup_sql(dialect: str) -> str:
    """Greedy LSH dedup — the operation a training pipeline actually
    runs over near-dup candidates: each band bucket is won by its
    smallest doc_id, and a document is KEPT iff it wins all four of its
    buckets (losing any bucket means an earlier document shares a band;
    chains collapse transitively because the dropped doc still holds
    its other buckets).  Deterministic pure-SQL semantics in both
    engines; documents too short to shingle (<3 tokens) carry no bands
    and are trivially kept."""
    short = ("size(toks) < 3" if dialect == "spark" else "len(toks) < 3")
    return f"""{_minhash_bands_cte(dialect)},
w AS (SELECT band, bv, min(doc_id) AS winner FROM b GROUP BY 1, 2),
kept AS (
  SELECT b.doc_id
  FROM b JOIN w ON b.band = w.band AND b.bv = w.bv
  GROUP BY b.doc_id
  HAVING sum(CASE WHEN b.doc_id = w.winner THEN 1 ELSE 0 END) = 4)
SELECT doc_id FROM kept
UNION ALL
SELECT doc_id FROM t WHERE {short}
"""


Q12 = _dialects(_minhash_sql("spark"), _minhash_sql("duckdb"))
Q39 = _dialects(_lsh_dedup_sql("spark"), _lsh_dedup_sql("duckdb"))

# ANN: brute-force cosine top-10 vs query vector 0; sequential double
# folds keep both engines bit-identical, rank on the exact value.
Q13 = _dialects(
    f"""
WITH q AS (SELECT transform(embedding, x -> cast(x as double)) AS qe
           FROM embeddings WHERE vec_id = 0),
d AS (SELECT vec_id, transform(embedding, x -> cast(x as double)) AS de FROM embeddings),
s AS (SELECT vec_id,
        aggregate(zip_with(de, qe, (x, y) -> x * y), cast(0.0 as double), (a, v) -> a + v) AS dot,
        aggregate(transform(de, x -> x * x), cast(0.0 as double), (a, v) -> a + v) AS nd,
        aggregate(transform(qe, x -> x * x), cast(0.0 as double), (a, v) -> a + v) AS nq
      FROM d CROSS JOIN q)
SELECT vec_id, round(dot / (sqrt(nd) * sqrt(nq)), 6) AS cos_sim, rnk FROM (
  SELECT vec_id, dot, nd, nq,
         cast(row_number() OVER (ORDER BY dot / (sqrt(nd) * sqrt(nq)) DESC, vec_id) as int) AS rnk
  FROM s) r
WHERE rnk <= 10
""",
    f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
d AS (SELECT vec_id, embedding::DOUBLE[] AS de FROM embeddings),
s AS (SELECT vec_id,
        list_reduce([de[i] * qe[i] for i in range(1, len(de) + 1)], (a, b) -> a + b) AS dot,
        list_reduce([de[i] * de[i] for i in range(1, len(de) + 1)], (a, b) -> a + b) AS nd,
        list_reduce([qe[i] * qe[i] for i in range(1, len(qe) + 1)], (a, b) -> a + b) AS nq
      FROM d CROSS JOIN q)
SELECT vec_id, round(dot / (sqrt(nd) * sqrt(nq)), 6) AS cos_sim, rnk FROM (
  SELECT vec_id, dot, nd, nq,
         cast(row_number() OVER (ORDER BY dot / (sqrt(nd) * sqrt(nq)) DESC, vec_id) as int) AS rnk
  FROM s) r
WHERE rnk <= 10
""",
)


# ------------------------------------------ polyfill pipeline WITH oracle
# The flagship geohash pipeline (prepare -> katana -> polyfill -> dedup ->
# parent), hash-checked end-to-end vs DuckDB (VERDICT r02 #3).  The
# corpus is derived from `events` with double-exact SQL arithmetic:
# 60% POINT docs (exercising the native zero-shuffle branch) and 40%
# axis-aligned rectangles (every ~400th one 0.25° — large enough that
# katana MUST bisect it at threshold 0.01 deg²).  Axis-aligned rects
# make the oracle exact: the center-inside test is two strict interval
# checks, and rect edges are generic doubles so a cell center can never
# sit on a boundary or katana cut line (exact-equality measure zero).
_GEO_RES, _GEO_PARENT = 6, 3


def _geo_corpus_sql(table: str = "events", id_col: str = "event_id",
                    big_deg: float = 0.25) -> str:
    """doc_id, kind, lon/lat (centers), x0/y0/x1/y1 (rect bounds) —
    IDENTICAL text in both dialects; all fractional literals pinned to
    double so the WKT Spark builds and the bounds DuckDB tests are the
    same IEEE-754 values.  ``big_deg``: side of every ~400th 'hot' rect
    (0.25 forces katana at threshold 0.01; 0.8 additionally completes
    res-5 AND res-4 sibling sets for the compaction oracle while staying
    below the 1.4° res-3 cell, so the floor never triggers)."""
    lat = f"({G.dlit(-44.4)} + ({id_col} % 700) * {G.dlit(0.001)})"
    lon = f"({G.dlit(-176.6)} + (({id_col} * 7) % 400) * {G.dlit(0.001)})"
    big = f"{id_col} % 397 = 0"
    w = f"(CASE WHEN {big} THEN {G.dlit(big_deg)} ELSE {G.dlit(0.004)} + ({id_col} % 7) * {G.dlit(0.004)} END)"
    h = f"(CASE WHEN {big} THEN {G.dlit(big_deg)} ELSE {G.dlit(0.004)} + ({id_col} % 5) * {G.dlit(0.005)} END)"
    return f"""
SELECT doc_id, kind, lon, lat,
       (lon - w * {G.dlit(0.5)}) AS x0, (lat - h * {G.dlit(0.5)}) AS y0,
       (lon + w * {G.dlit(0.5)}) AS x1, (lat + h * {G.dlit(0.5)}) AS y1
FROM (
  SELECT ('g' || cast({id_col} as string)) AS doc_id,
         (CASE WHEN {id_col} % 5 < 3 THEN 'point' ELSE 'rect' END) AS kind,
         {lat} AS lat, {lon} AS lon, {w} AS w, {h} AS h
  FROM {table}) __c
"""


def _q_polyfill(spark: SparkSession, sf_dir: str, big_deg: float = 0.25,
                compact: bool = False) -> DataFrame:
    from pyspark.sql import functions as F

    from vector2dggs_spark import index

    load_views(spark, sf_dir)
    corpus = spark.sql(_geo_corpus_sql(big_deg=big_deg))
    s = lambda c: F.col(c).cast("string")  # noqa: E731 — Java shortest-repr
    # round-trips exactly through the numpy WKT parse
    point_wkt = F.concat(F.lit("POINT ("), s("lon"), F.lit(" "), s("lat"), F.lit(")"))
    rect_wkt = F.concat(
        F.lit("POLYGON (("),
        s("x0"), F.lit(" "), s("y0"), F.lit(", "),
        s("x1"), F.lit(" "), s("y0"), F.lit(", "),
        s("x1"), F.lit(" "), s("y1"), F.lit(", "),
        s("x0"), F.lit(" "), s("y1"), F.lit(", "),
        s("x0"), F.lit(" "), s("y0"), F.lit("))"),
    )
    wkt = F.when(F.col("kind") == "point", point_wkt).otherwise(rect_wkt)
    docs = corpus.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("geometry").alias("kind"),
                wkt.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    r = index(spark, docs, dggs="geohash", resolution=_GEO_RES,
              parent_res=_GEO_PARENT, cut_threshold_deg2=0.01, compact=compact)
    return r.cells


def _polyfill_cells_with(big_deg: float) -> str:
    """The shared WITH-chain producing ``allc(doc_id, cell)`` — DuckDB
    restatement of the whole pipeline: point encode (shared
    bit-arithmetic SQL) + per-rect cell enumeration via correlated
    generate_series + strict center-inside test.  Index bounds, centers
    and the inside test are the SAME double expressions the numpy
    kernels evaluate (dggs/geohash.py:217-239), so the match is exact."""
    from vector2dggs_spark.dggs.geohash import cell_dims

    dlat, dlon = cell_dims(_GEO_RES)
    pts = G.geohash_select_sql(
        "SELECT doc_id, lat, lon FROM geo WHERE kind = 'point'",
        "lat", "lon", _GEO_RES, ["doc_id"], out="cell",
    )
    rc = G.geohash_select_sql(
        "SELECT doc_id, clat, clon FROM ins",
        "clat", "clon", _GEO_RES, ["doc_id"], out="cell",
    )
    p = _GEO_PARENT
    return f"""
WITH geo AS ({_geo_corpus_sql(big_deg=big_deg)}),
rects AS (SELECT doc_id, x0, y0, x1, y1 FROM geo WHERE kind = 'rect'),
cx AS (SELECT doc_id, x0, y0, x1, y1,
              unnest(generate_series(
                cast(floor((x0 + {G.dlit(180.0)}) / {G.dlit(dlon)}) as bigint),
                cast(floor((x1 + {G.dlit(180.0)}) / {G.dlit(dlon)}) as bigint))) AS ix
       FROM rects),
cxy AS (SELECT doc_id, x0, y0, x1, y1, ix,
               unnest(generate_series(
                 cast(floor((y0 + {G.dlit(90.0)}) / {G.dlit(dlat)}) as bigint),
                 cast(floor((y1 + {G.dlit(90.0)}) / {G.dlit(dlat)}) as bigint))) AS iy
        FROM cx),
ctr AS (SELECT doc_id, x0, y0, x1, y1,
               ({G.dlit(-180.0)} + (ix + {G.dlit(0.5)}) * {G.dlit(dlon)}) AS clon,
               ({G.dlit(-90.0)} + (iy + {G.dlit(0.5)}) * {G.dlit(dlat)}) AS clat
        FROM cxy),
ins AS (SELECT doc_id, clat, clon FROM ctr
        WHERE clon > x0 AND clon < x1 AND clat > y0 AND clat < y1),
allc AS (SELECT doc_id, cell FROM ({pts}) __p
         UNION ALL SELECT doc_id, cell FROM ({rc}) __r)"""


_FINAL_SELECT = f"""
SELECT cell AS geohash_{_GEO_RES:02d}, doc_id,
       substring(cell, 1, {_GEO_PARENT}) AS geohash_{_GEO_PARENT:02d}
FROM {{src}}
"""


def _polyfill_oracle_sql(big_deg: float = 0.25) -> str:
    return _polyfill_cells_with(big_deg) + _FINAL_SELECT.format(src="allc")


def _compaction_oracle_sql(big_deg: float = 0.8) -> str:
    """Compaction (A2) in SQL: iteratively replace complete 32-sibling
    sets by their parent (geohash merge is a pure prefix group-by), per
    feature.  A res-k set is complete iff all 32 children were MERGED at
    k+1, so each level only inspects the previous level's merge output —
    exactly the reference's iterate-until-fixed-point.  The corpus'
    largest rect (0.8°) completes res-5 and res-4 sets but can never
    cover a 1.4° res-3 cell, so the parent_res floor provably never
    re-expands (floor semantics stay pinned by q15's golden).  Output
    rows = per-doc compacted cell set — the same row-shrink semantics as
    compact_cells_df's designated-child relabel projected onto
    (cell, doc_id, parent)."""
    return (
        _polyfill_cells_with(big_deg)
        + """,
g5 AS (SELECT doc_id, substring(cell, 1, 5) AS p, count(*) AS n
       FROM allc GROUP BY 1, 2),
m5 AS (SELECT doc_id, p FROM g5 WHERE n = 32),
k6 AS (SELECT a.doc_id, a.cell FROM allc a
       LEFT JOIN m5 ON m5.doc_id = a.doc_id AND m5.p = substring(a.cell, 1, 5)
       WHERE m5.p IS NULL),
g4 AS (SELECT doc_id, substring(p, 1, 4) AS p, count(*) AS n
       FROM m5 GROUP BY 1, 2),
m4 AS (SELECT doc_id, p FROM g4 WHERE n = 32),
k5 AS (SELECT a.doc_id, a.p AS cell FROM m5 a
       LEFT JOIN m4 ON m4.doc_id = a.doc_id AND m4.p = substring(a.p, 1, 4)
       WHERE m4.p IS NULL),
g3 AS (SELECT doc_id, substring(p, 1, 3) AS p, count(*) AS n
       FROM m4 GROUP BY 1, 2),
m3 AS (SELECT doc_id, p FROM g3 WHERE n = 32),
k4 AS (SELECT a.doc_id, a.p AS cell FROM m4 a
       LEFT JOIN m3 ON m3.doc_id = a.doc_id AND m3.p = substring(a.p, 1, 3)
       WHERE m3.p IS NULL),
comp AS (SELECT doc_id, cell FROM k6
         UNION ALL SELECT doc_id, cell FROM k5
         UNION ALL SELECT doc_id, cell FROM k4
         UNION ALL SELECT doc_id, p AS cell FROM m3)"""
        + _FINAL_SELECT.format(src="comp")
    )


def _q_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector2dggs_spark import index
    from vector2dggs_spark.sources.documents import documents_df

    docs = documents_df(spark, 800, seed=42)
    r = index(spark, docs, dggs="geohash", resolution=6, parent_res=3,
              cut_threshold_deg2=0.01, compact=True)
    return r.cells


def _q_rhp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector2dggs_spark import index
    from vector2dggs_spark.sources.documents import documents_df

    docs = documents_df(spark, 800, seed=42)
    r = index(spark, docs, dggs="rhp", resolution=5, parent_res=2)
    return r.cells


def _q_h3_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector2dggs_spark import index
    from vector2dggs_spark.sources.documents import documents_df

    docs = documents_df(spark, 800, seed=42)
    r = index(spark, docs, dggs="h3", resolution=8, parent_res=3)
    return r.cells


def _q_knn_h3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN is exact regardless of DGGS backend, so the H3 ring-expansion
    variant shares the brute-force oracle with the geohash one."""
    from pyspark.sql import functions as F

    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.joins import knn

    load_views(spark, sf_dir)
    pts = spark.sql(PTS)
    queries = pts.where(F.col("point_id") < 30).withColumnRenamed("point_id", "query_id")
    targets = pts.withColumnRenamed("point_id", "target_id")
    out = knn(queries, targets, get_backend("h3"), res=7, k=_KNN_K)
    return out.select("query_id", "target_id", "dist_sq", "rank")


from vector2dggs_spark.functions import textops as X

Q19 = _dialects(X.simhash_pairs_sql("spark"), X.simhash_pairs_sql("duckdb"))
Q25 = _dialects(
    X.jaccard_ngram_pairs_sql("spark"), X.jaccard_ngram_pairs_sql("duckdb")
)
Q20 = _dialects(
    X.embedding_near_dup_sql("spark"), X.embedding_near_dup_sql("duckdb")
)
Q21 = _dialects(X.ann_ivf_sql("spark"), X.ann_ivf_sql("duckdb"))
# multi-probe variant: each query also searches the 8 Hamming-1 buckets
Q29 = _dialects(
    X.ann_ivf_multiprobe_sql("spark"), X.ann_ivf_multiprobe_sql("duckdb")
)
# scale path for q20: banded candidate generation (equi-join), exact
# cosine post-filter — output ⊆ q20, recall pinned in test_entry_contract
Q26 = _dialects(
    X.embedding_near_dup_lsh_sql("spark"), X.embedding_near_dup_lsh_sql("duckdb")
)


def _q_near_dup_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q26's semantics on the PRODUCTION Arrow path: one numpy matmul
    per batch for the 64 plane dots (Catalyst higher-order folds are
    interpreted per element and stop scaling at high core counts —
    measured 0.33 normalized efficiency at local[32], BENCH/BASELINE.md
    job D), band equi-join + vectorized cosine refilter.  Shares q26's
    DuckDB oracle, so the Arrow operator is held to the same hash-exact
    bar as the SQL formulation."""
    from vector2dggs_spark.operators.embeddings import near_dup_lsh

    load_views(spark, sf_dir)
    return near_dup_lsh(spark.table("embeddings"))


Q32 = (_q_near_dup_arrow, X.embedding_near_dup_lsh_sql("duckdb"))


def _q_s2_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector2dggs_spark import index
    from vector2dggs_spark.sources.documents import documents_df

    docs = documents_df(spark, 800, seed=42)
    r = index(spark, docs, dggs="s2", resolution=13, parent_res=7)
    return r.cells


def _q_a5_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 pentagonal pipeline (SURVEY C17/C18; reference
    tests/classes/a5.py scenario at res 17 / parent offset 6)."""
    from vector2dggs_spark import index
    from vector2dggs_spark.sources.documents import documents_df

    docs = documents_df(spark, 800, seed=42)
    r = index(spark, docs, dggs="a5", resolution=14, parent_res=8)
    return r.cells


# ---------------------------------------------------------------- rHP point index
# Global point spread -> rHP cells at res 6.  Spark runs the PRODUCTION
# numpy kernel (dggs/rhp.py point_to_cell, Arrow-batched); the oracle is
# an independently-generated pure-SQL formulation of the same HEALPix
# projection + authalic series + base-3 digit fold (sqlgen.rhp_select_sql)
# evaluated by DuckDB — a hard external signal for the C5-C7 cell math
# that previously had only golden-hash pipeline checks (q16).
_PTS_GLOBAL = G.derived_points_global_sql("events", "event_id")
_RHP_RES = 6
_RHP_ORACLE = f"""
WITH cells AS ({G.rhp_select_sql(_PTS_GLOBAL, "lat", "lon", _RHP_RES, ["point_id"])})
SELECT point_id, cell, substring(cell, 1, 4) AS parent_cell FROM cells
"""


def _q_rhp_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.udfs import point_to_cell_udf

    load_views(spark, sf_dir)
    pts = spark.sql(_PTS_GLOBAL)
    enc = point_to_cell_udf(get_backend("rhp"), _RHP_RES)
    return pts.select(
        "point_id",
        enc("lat", "lon").alias("cell"),
    ).withColumn("parent_cell", F.substring("cell", 1, 4))


Q30 = (_q_rhp_point, _RHP_ORACLE)

# ---------------------------------------------------------------- S2 point index
# Same pattern for S2 (VERDICT r02 residual #1: S2 needed a hard
# independent signal): Spark runs the production numpy kernel; DuckDB
# evaluates an independently-formulated SQL version of the published S2
# construction (cube face -> quadratic ST -> 30-level Hilbert lookup ->
# parent bit math -> token).  Level 13 matches the q23 pipeline.
_S2_LEVEL = 13
_S2_ORACLE = f"""
WITH cells AS ({G.s2_select_sql(_PTS_GLOBAL, "lat", "lon", _S2_LEVEL, ["point_id"], dialect="duckdb")})
SELECT point_id, cell FROM cells
"""


def _q_s2_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.udfs import point_to_cell_udf

    load_views(spark, sf_dir)
    pts = spark.sql(_PTS_GLOBAL)
    enc = point_to_cell_udf(get_backend("s2"), _S2_LEVEL)
    return pts.select("point_id", enc("lat", "lon").alias("cell"))


Q31 = (_q_s2_point, _S2_ORACLE)

# ---------------------------------------------------------------- H3 point index
# The headline backend (BASELINE metric: "H3 cell-IDs emitted/sec at
# resolution 9") gets the same treatment: Spark runs the production
# numpy kernel; DuckDB evaluates an independently-formulated layered SQL
# version of the full H3 construction (face argmax, gnomonic hex2d,
# cube rounding, aperture-7 digit walk, base-cell/rotation lookups,
# pentagon K-sector fix) — functions/h3sql.py.
_H3_RES = 9


def _h3_oracle() -> str:
    from vector2dggs_spark.functions.h3sql import h3_select_sql

    return f"""
WITH cells AS ({h3_select_sql(_PTS_GLOBAL, "lat", "lon", _H3_RES, ["point_id"], dialect="duckdb")})
SELECT point_id, cell FROM cells
"""


def _q_h3_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.udfs import point_to_cell_udf

    load_views(spark, sf_dir)
    pts = spark.sql(_PTS_GLOBAL)
    enc = point_to_cell_udf(get_backend("h3"), _H3_RES)
    return pts.select("point_id", enc("lat", "lon").alias("cell"))


Q33 = (_q_h3_point, _h3_oracle())

# ---------------------------------------------------------------- A5 point index
# Last backend to get the treatment — every backend's point path now
# has an independent cross-formulation SQL oracle.  Res 14 matches the
# q24 pipeline.  (A5's construction is this repo's own documented
# layout — the oracle guards the kernel against implementation bugs,
# like q31's role for S2.)
_A5_RES = 14


def _a5_oracle() -> str:
    from vector2dggs_spark.functions.a5sql import a5_select_sql

    return f"""
WITH cells AS ({a5_select_sql(_PTS_GLOBAL, "lat", "lon", _A5_RES, ["point_id"])})
SELECT point_id, cell FROM cells
"""


def _q_a5_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.udfs import point_to_cell_udf

    load_views(spark, sf_dir)
    pts = spark.sql(_PTS_GLOBAL)
    enc = point_to_cell_udf(get_backend("a5"), _A5_RES)
    return pts.select("point_id", enc("lat", "lon").alias("cell"))


Q34 = (_q_a5_point, _a5_oracle())


# ------------------------------------------------- points pipelines (all backends)
# End-to-end pipeline oracles for the four backends whose polyfill
# pipelines are rows-only (q16/q18/q23/q24): a points-only corpus flows
# through the REAL pipeline (span extraction -> native or Arrow point
# encode -> dedup -> parent), and DuckDB recomputes the expected cell
# table with the independent encode SQL.  WKT coordinates are written
# with cast(double as string) (Java shortest-repr) so the pipeline's
# regexp parse recovers bit-identical doubles.
# Parent columns: rhp/s2/a5 parents are re-encodes of the same point at
# parent_res (exact — the coarse digits of a fine encode replay the
# identical float ops); H3's aperture-7 hierarchy is NOT spatially
# nested, so its parent comes from the id bit math, like the engine's.
def _points_docs(spark: SparkSession):
    from pyspark.sql import functions as F

    pts = spark.sql(_PTS_GLOBAL)
    s = lambda c: F.col(c).cast("string")  # noqa: E731
    wkt = F.concat(F.lit("POINT ("), s("lon"), F.lit(" "), s("lat"), F.lit(")"))
    return pts.select(
        F.col("point_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("geometry").alias("kind"),
                wkt.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )


def _q_points_pipeline(dggs: str, res: int, parent_res: int):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from vector2dggs_spark import index

        load_views(spark, sf_dir)
        r = index(spark, _points_docs(spark), dggs=dggs, resolution=res,
                  parent_res=parent_res)
        return r.cells

    return fn


def _points_pipeline_oracle(dggs: str, res: int, parent_res: int) -> str:
    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.functions.a5sql import a5_select_sql
    from vector2dggs_spark.functions.h3sql import h3_select_sql

    b = get_backend(dggs)
    cell_col, parent_col = b.col_name(res), b.col_name(parent_res)
    did = "cast(point_id as varchar) AS doc_id"
    if dggs == "rhp":
        enc = G.rhp_select_sql(_PTS_GLOBAL, "lat", "lon", res, ["point_id"])
        return (f"SELECT cell AS {cell_col}, {did}, "
                f"substring(cell, 1, {parent_res + 1}) AS {parent_col} "
                f"FROM ({enc}) c")
    if dggs == "s2":
        enc = G.s2_select_sql(_PTS_GLOBAL, "lat", "lon", res, ["point_id"], dialect="duckdb")
        pnc = G.s2_select_sql(_PTS_GLOBAL, "lat", "lon", parent_res, ["point_id"],
                              dialect="duckdb", out="parent")
        return (f"SELECT c.cell AS {cell_col}, cast(c.point_id as varchar) AS doc_id, "
                f"p.parent AS {parent_col} "
                f"FROM ({enc}) c JOIN ({pnc}) p ON c.point_id = p.point_id")
    if dggs == "a5":
        enc = a5_select_sql(_PTS_GLOBAL, "lat", "lon", res, ["point_id"])
        pnc = a5_select_sql(_PTS_GLOBAL, "lat", "lon", parent_res, ["point_id"], out="parent")
        return (f"SELECT c.cell AS {cell_col}, cast(c.point_id as varchar) AS doc_id, "
                f"p.parent AS {parent_col} "
                f"FROM ({enc}) c JOIN ({pnc}) p ON c.point_id = p.point_id")
    # h3: parent by id bit math (aperture-7 is not spatially nested, so
    # a parent-res re-encode would differ near child-cell boundaries)
    enc = h3_select_sql(_PTS_GLOBAL, "lat", "lon", res, ["point_id"], dialect="duckdb")
    fill = (1 << (3 * (15 - parent_res))) - 1
    pid = (f"((('0x' || cell)::BIGINT | {fill}) - {(res - parent_res) << 52})")
    nib = " || ".join(
        f"substring('0123456789abcdef', cast((__p >> {4 * k}) & 15 as int) + 1, 1)"
        for k in range(14, -1, -1)
    )
    return (f"SELECT cell AS {cell_col}, {did}, "
            f"regexp_replace({nib}, '^0+', '') AS {parent_col} "
            f"FROM (SELECT point_id, cell, {pid} AS __p FROM ({enc}) c) h")


Q35 = (_q_points_pipeline("rhp", 5, 2), _points_pipeline_oracle("rhp", 5, 2))
Q36 = (_q_points_pipeline("h3", 8, 3), _points_pipeline_oracle("h3", 8, 3))
Q37 = (_q_points_pipeline("s2", 13, 7), _points_pipeline_oracle("s2", 13, 7))
Q38 = (_q_points_pipeline("a5", 14, 8), _points_pipeline_oracle("a5", 14, 8))


def _q_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: tile media refs -> decode (stub, mapInPandas)
    -> frame features (one-to-many mapInPandas) -> exploded scalar
    projection.  The stub's md5 math is SQL-expressible, so this query
    has a full DuckDB oracle despite running through Arrow UDFs."""
    from pyspark.sql import functions as F

    from vector2dggs_spark.operators.media import decode_media, extract_frame_features

    load_views(spark, sf_dir)
    media = spark.sql(f"SELECT DISTINCT media_ref FROM ({TILES}) __m")
    feats = extract_frame_features(decode_media(media))
    return feats.select(
        "media_ref",
        "width",
        "height",
        "format",
        "n_frames",
        "frame",
        F.posexplode("features").alias("dim", "value"),
    ).withColumn("value", F.col("value").cast("double"))


def _hexbyte(h: str, i: int | str) -> str:
    """DuckDB: byte ``i`` (0-based) of an md5 hex string as INT."""
    pos = f"({i}) * 2 + 1" if isinstance(i, str) else str(i * 2 + 1)
    return f"('0x' || substr({h}, {pos}, 2))::INT"


_MEDIA_ORACLE = f"""
WITH media AS (SELECT DISTINCT media_ref FROM ({TILES}) __m),
dec AS (
  SELECT media_ref,
         256 + {_hexbyte('md5(media_ref)', 0)} * 4 AS width,
         256 + {_hexbyte('md5(media_ref)', 1)} * 4 AS height,
         CASE ({_hexbyte('md5(media_ref)', 2)} % 3)
           WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
         1 + ({_hexbyte('md5(media_ref)', 3)} % 4) AS n_frames
  FROM media),
fr AS (
  SELECT d.*, f.frame FROM dec d,
       (SELECT unnest([0, 1, 2, 3]) AS frame) f
  WHERE f.frame < d.n_frames)
SELECT media_ref, width, height, format, n_frames, frame,
       cast(dm.dim AS int) AS dim,
       cast({_hexbyte("md5(media_ref || '#' || cast(frame AS varchar))", 'dm.dim')}
            AS double) / cast(256.0 AS double) AS value
FROM fr, (SELECT unnest(range(16)) AS dim) dm
"""


_RHPC_RES, _RHPC_PARENT = 6, 3


def _rhp_rect_corpus_sql(table: str = "events", id_col: str = "event_id") -> str:
    """Axis-aligned rects wholly inside the rHEALPix equatorial zone
    (face O) — IDENTICAL text in both dialects.  Small rects span 2-5
    res-6 cells per axis (0.123°); every ~397th 'big' rect is 2.5°,
    which guarantees at least one complete aligned res-5 (0.37°) AND
    res-4 (1.11°) sibling block but can never cover a res-3 cell
    (3.33°), so the parent_res=3 floor provably never re-expands."""
    lat = f"({G.dlit(-20.8)} + ({id_col} % 700) * {G.dlit(0.001)})"
    lon = f"({G.dlit(-176.6)} + (({id_col} * 7) % 400) * {G.dlit(0.001)})"
    big = f"{id_col} % 397 = 0"
    w = f"(CASE WHEN {big} THEN {G.dlit(2.5)} ELSE {G.dlit(0.25)} + ({id_col} % 7) * {G.dlit(0.05)} END)"
    h = f"(CASE WHEN {big} THEN {G.dlit(2.5)} ELSE {G.dlit(0.25)} + ({id_col} % 5) * {G.dlit(0.06)} END)"
    return f"""
SELECT doc_id,
       (lon - w * {G.dlit(0.5)}) AS x0, (lat - h * {G.dlit(0.5)}) AS y0,
       (lon + w * {G.dlit(0.5)}) AS x1, (lat + h * {G.dlit(0.5)}) AS y1
FROM (
  SELECT ('R' || cast({id_col} as string)) AS doc_id,
         {lat} AS lat, {lon} AS lon, {w} AS w, {h} AS h
  FROM {table}) __r
"""


def _q_rhp_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q41 — REAL pipeline (polyfill + compaction) on the rHP backend
    over a SQL-derived rect corpus; the 9-sibling analog of q28
    (VERDICT r03 #4: pins A2/A3 on a second cell geometry with a full
    DuckDB oracle instead of a golden hash)."""
    from pyspark.sql import functions as F

    from vector2dggs_spark import index

    load_views(spark, sf_dir)
    corpus = spark.sql(_rhp_rect_corpus_sql())
    s = lambda c: F.col(c).cast("string")  # noqa: E731 — Java shortest-repr
    rect_wkt = F.concat(
        F.lit("POLYGON (("),
        s("x0"), F.lit(" "), s("y0"), F.lit(", "),
        s("x1"), F.lit(" "), s("y0"), F.lit(", "),
        s("x1"), F.lit(" "), s("y1"), F.lit(", "),
        s("x0"), F.lit(" "), s("y1"), F.lit(", "),
        s("x0"), F.lit(" "), s("y0"), F.lit("))"),
    )
    docs = corpus.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("geometry").alias("kind"),
                rect_wkt.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    r = index(spark, docs, dggs="rhp", resolution=_RHPC_RES,
              parent_res=_RHPC_PARENT, cut_threshold_deg2=0, compact=True)
    return r.cells


def _rhp_compaction_oracle_sql() -> str:
    """DuckDB restatement of the rHP polyfill + compaction: candidate
    cells enumerated on the projected equatorial grid (generate_series
    with a safety margin — extra candidates fail the strict inside
    test), centers inverse-projected with the SAME double expressions
    the numpy kernel evaluates (dggs/rhp.py:unproject equatorial
    branch: asin + authalic-to-geodetic series), strict center-in-rect,
    re-encode through the shared layered HEALPix SQL (q30's proven
    generator), then the 9-sibling iterative merge replayed as chained
    prefix GROUP BYs (q28's construction, aperture 9)."""
    from vector2dggs_spark.dggs import rhp as R

    res, p = _RHPC_RES, _RHPC_PARENT
    side = R._PI / 2.0 / (3**res)
    d = G.dlit
    rad = d(0.017453292519943295)   # np.radians multiplier
    deg = d(57.29577951308232)      # np.degrees multiplier
    # forward authalic projection for the candidate bbox (margin +-2
    # absorbs any float discrepancy with the kernel's densified bbox)
    def fwd_y(latcol: str) -> str:
        phi = f"({latcol} * {rad})"
        beta = (
            f"({phi} + {d(R._A2)} * sin({d(2.0)} * {phi})"
            f" + {d(R._A4)} * sin({d(4.0)} * {phi})"
            f" + {d(R._A6)} * sin({d(6.0)} * {phi}))"
        )
        return f"({d(3.0 * R._PI / 8.0)} * sin({beta}))"

    enc = G.rhp_select_sql(
        "SELECT doc_id, clat, clon FROM ins", "clat", "clon", res, ["doc_id"]
    )
    beta_c = f"asin(cy / {d(3.0 * R._PI / 8.0)})"
    lat_series = (
        f"(__b + {d(R._B2)} * sin({d(2.0)} * __b)"
        f" + {d(R._B4)} * sin({d(4.0)} * __b)"
        f" + {d(R._B6)} * sin({d(6.0)} * __b))"
    )
    return f"""
WITH rect AS ({_rhp_rect_corpus_sql()}),
pb AS (SELECT doc_id, x0, y0, x1, y1,
              (x0 * {rad}) AS qx0, (x1 * {rad}) AS qx1,
              {fwd_y('y0')} AS qy0, {fwd_y('y1')} AS qy1
       FROM rect),
cx AS (SELECT doc_id, x0, y0, x1, y1, qy0, qy1,
              unnest(generate_series(
                cast(floor((qx0 + {d(R._PI)}) / {d(side)}) as bigint) - 2,
                cast(floor((qx1 + {d(R._PI)}) / {d(side)}) as bigint) + 2)) AS ix
       FROM pb),
cxy AS (SELECT doc_id, x0, y0, x1, y1, ix,
               unnest(generate_series(
                 cast(floor((qy0 + {d(3.0 * R._PI / 4.0)}) / {d(side)}) as bigint) - 2,
                 cast(floor((qy1 + {d(3.0 * R._PI / 4.0)}) / {d(side)}) as bigint) + 2)) AS iy
        FROM cx),
ctr0 AS (SELECT doc_id, x0, y0, x1, y1,
                ({d(-R._PI)} + (ix + {d(0.5)}) * {d(side)}) AS cx,
                ({d(-3.0 * R._PI / 4.0)} + (iy + {d(0.5)}) * {d(side)}) AS cy
         FROM cxy),
ctr AS (SELECT doc_id, x0, y0, x1, y1,
               (cx * {deg}) AS clon,
               ({lat_series} * {deg}) AS clat
        FROM (SELECT doc_id, x0, y0, x1, y1, cx, cy, {beta_c} AS __b FROM ctr0) __t),
ins AS (SELECT doc_id, clat, clon FROM ctr
        WHERE clon > x0 AND clon < x1 AND clat > y0 AND clat < y1),
allc AS ({enc}),
g5 AS (SELECT doc_id, substring(cell, 1, {res}) AS pr, count(*) AS n
       FROM allc GROUP BY 1, 2),
m5 AS (SELECT doc_id, pr FROM g5 WHERE n = 9),
k6 AS (SELECT a.doc_id, a.cell FROM allc a
       LEFT JOIN m5 ON m5.doc_id = a.doc_id AND m5.pr = substring(a.cell, 1, {res})
       WHERE m5.pr IS NULL),
g4 AS (SELECT doc_id, substring(pr, 1, {res - 1}) AS pr, count(*) AS n
       FROM m5 GROUP BY 1, 2),
m4 AS (SELECT doc_id, pr FROM g4 WHERE n = 9),
k5 AS (SELECT a.doc_id, a.pr AS cell FROM m5 a
       LEFT JOIN m4 ON m4.doc_id = a.doc_id AND m4.pr = substring(a.pr, 1, {res - 1})
       WHERE m4.pr IS NULL),
g3 AS (SELECT doc_id, substring(pr, 1, {res - 2}) AS pr, count(*) AS n
       FROM m4 GROUP BY 1, 2),
m3 AS (SELECT doc_id, pr FROM g3 WHERE n = 9),
k4 AS (SELECT a.doc_id, a.pr AS cell FROM m4 a
       LEFT JOIN m3 ON m3.doc_id = a.doc_id AND m3.pr = substring(a.pr, 1, {res - 2})
       WHERE m3.pr IS NULL),
comp AS (SELECT doc_id, cell FROM k6
         UNION ALL SELECT doc_id, cell FROM k5
         UNION ALL SELECT doc_id, cell FROM k4
         UNION ALL SELECT doc_id, pr AS cell FROM m3)
SELECT cell AS rhp_{res:02d}, doc_id, substring(cell, 1, {p + 1}) AS rhp_{p:02d}
FROM comp
"""


# --------------------------------------------- H3 polyfill oracle (q47)
# VERDICT r04 #1: the flagship backend's flagship operation (reference
# h3vectorindexer.py:16-18,30-33 — H3 v4 'containment: center' polygon
# fill) finally gets an end-to-end DuckDB oracle.  Construction: the
# rect corpus is confined to the interior of ONE icosahedron face, so
# every res-6 cell center in play is the image of one integer lattice
# point (I, J) of that face's hex grid.  The oracle enumerates the
# lattice range from the forward-projected rect corners (+5-cell
# margin; extra candidates fail the strict inside test for free, q41's
# pattern), inverse-projects each lattice point to its center lat/lng
# with the SAME double ops as h3core._hex2d_res0_to_geo (no face folds
# needed — out-of-face lattice points land outside the face triangle,
# hence outside the rect, and are filtered), keeps centers strictly
# inside the rect, and re-encodes them through the PROVEN layered q33
# encode SQL (any point well inside a cell encodes to that cell, so
# meter-level center agreement is more than enough for the id while
# the strict inside test only needs ~1e-12 agreement vs the kernel on
# generic rect boundaries).  Parent = id bit math (q36's formula;
# aperture-7 is not spatially nested).
_H3PF_RES, _H3PF_PARENT, _H3PF_FACE = 6, 3, 8


def _h3_rect_corpus_sql(table: str = "events", id_col: str = "event_id") -> str:
    """Axis-aligned rects wholly inside icosahedron face 8 (center
    -4.53°, -42.02° — mid-Atlantic, no pentagon base cells within the
    window, antimeridian far away) — IDENTICAL text in both dialects.
    Rects are 0.2-0.5° wide, centers within ±2.7° of the face center
    (face inradius ≈ 20°, so the whole corpus is deeply interior)."""
    lat = f"({G.dlit(-6.9)} + ({id_col} % 480) * {G.dlit(0.01)})"
    lon = f"({G.dlit(-44.4)} + (({id_col} * 7) % 480) * {G.dlit(0.01)})"
    w = f"({G.dlit(0.2)} + ({id_col} % 7) * {G.dlit(0.05)})"
    h = f"({G.dlit(0.2)} + ({id_col} % 5) * {G.dlit(0.06)})"
    return f"""
SELECT doc_id,
       (lon - w * {G.dlit(0.5)}) AS x0, (lat - h * {G.dlit(0.5)}) AS y0,
       (lon + w * {G.dlit(0.5)}) AS x1, (lat + h * {G.dlit(0.5)}) AS y1
FROM (
  SELECT ('H' || cast({id_col} as string)) AS doc_id,
         {lat} AS lat, {lon} AS lon, {w} AS w, {h} AS h
  FROM {table} WHERE {id_col} % 29 = 0) __r
"""


def _q_h3_polyfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q47 — REAL pipeline (H3 polygon polyfill, C1) over the
    face-local SQL-derived rect corpus."""
    from pyspark.sql import functions as F

    from vector2dggs_spark import index

    load_views(spark, sf_dir)
    corpus = spark.sql(_h3_rect_corpus_sql())
    s = lambda c: F.col(c).cast("string")  # noqa: E731 — Java shortest-repr
    rect_wkt = F.concat(
        F.lit("POLYGON (("),
        s("x0"), F.lit(" "), s("y0"), F.lit(", "),
        s("x1"), F.lit(" "), s("y0"), F.lit(", "),
        s("x1"), F.lit(" "), s("y1"), F.lit(", "),
        s("x0"), F.lit(" "), s("y1"), F.lit(", "),
        s("x0"), F.lit(" "), s("y0"), F.lit("))"),
    )
    docs = corpus.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("geometry").alias("kind"),
                rect_wkt.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    r = index(spark, docs, dggs="h3", resolution=_H3PF_RES,
              parent_res=_H3PF_PARENT, cut_threshold_deg2=0)
    return r.cells


def _h3_enum_ctes(corpus_sql: str) -> tuple[str, str]:
    """The q47 construction as reusable pieces: returns (ctes, enc) —
    the ``WITH rect .. ins`` chain enumerating every res-``_H3PF_RES``
    cell whose center is strictly inside its rect, and the layered
    encode select producing (doc_id, cell) from it."""
    import numpy as np

    from vector2dggs_spark.dggs.h3core import tables as T
    from vector2dggs_spark.functions.h3sql import h3_select_sql

    res, face = _H3PF_RES, _H3PF_FACE
    assert res % 2 == 0  # even res: no M_AP7_ROT_RADS term in theta
    fla = float(T.FACE_CENTER_GEO[face, 0])
    flo = float(T.FACE_CENTER_GEO[face, 1])
    az0 = float(T.FACE_AXES_AZ[face, 0])
    sc = float(T.M_SQRT7 ** res)
    res0u = float(T.RES0_U_GNOMONIC)
    d = G.dlit
    rad, deg = d(np.pi / 180.0), d(180.0 / np.pi)
    TWO_PI, PI = d(2 * np.pi), d(np.pi)
    S32 = d(np.sqrt(3.0) / 2.0)

    def fwd_ij(xc: str, yc: str) -> tuple[str, str]:
        """Corner (lon=xc, lat=yc in degrees) -> fractional axial I, J
        (the forward _geo_to_hex2d ops, face fixed)."""
        phi = f"(({yc}) * {rad})"
        lam = f"(({xc}) * {rad})"
        cosr = (f"(sin({d(fla)})*sin({phi})"
                f" + cos({d(fla)})*cos({phi})*cos({lam} - {d(flo)}))")
        r = f"acos(least(greatest({cosr}, {d(-1.0)}), {d(1.0)}))"
        az = (f"atan2(cos({phi})*sin({lam} - {d(flo)}),"
              f" cos({d(fla)})*sin({phi})"
              f" - sin({d(fla)})*cos({phi})*cos({lam} - {d(flo)}))")
        azm = f"({az} - {TWO_PI} * floor({az} / {TWO_PI}))"
        th = (f"(({d(az0)} - {azm})"
              f" - {TWO_PI} * floor(({d(az0)} - {azm}) / {TWO_PI}))")
        rr = f"((tan({r}) / {d(res0u)}) * {d(sc)})"
        x = f"({rr} * cos({th}))"
        y = f"({rr} * sin({th}))"
        J = f"({y} / {S32})"
        return f"({x} + {J} / {d(2.0)})", J

    Is, Js = zip(*[fwd_ij(cx, cy) for cx, cy in
                   (("x0", "y0"), ("x1", "y0"), ("x1", "y1"), ("x0", "y1"))])
    imin = f"cast(floor(least({', '.join(Is)})) as bigint) - 5"
    imax = f"cast(ceil(greatest({', '.join(Is)})) as bigint) + 5"
    jmin = f"cast(floor(least({', '.join(Js)})) as bigint) - 5"
    jmax = f"cast(ceil(greatest({', '.join(Js)})) as bigint) + 5"

    enc = h3_select_sql("SELECT doc_id, clat, clon FROM ins", "clat", "clon",
                        res, ["doc_id"], dialect="duckdb")
    lon2 = (f"({d(flo)} + atan2(sin(az)*sin(rr)*cos({d(fla)}),"
            f" cos(rr) - sin({d(fla)})*sinlat) + {PI})")
    ctes = f"""
WITH rect AS ({corpus_sql}),
rng AS (SELECT doc_id, x0, y0, x1, y1,
               {imin} AS imin, {imax} AS imax,
               {jmin} AS jmin, {jmax} AS jmax
        FROM rect),
li AS (SELECT doc_id, x0, y0, x1, y1, jmin, jmax,
              unnest(generate_series(imin, imax)) AS li FROM rng),
lj AS (SELECT doc_id, x0, y0, x1, y1, li,
              unnest(generate_series(jmin, jmax)) AS lj FROM li),
hex AS (SELECT doc_id, x0, y0, x1, y1,
               (cast(li as double) - cast(lj as double) / {d(2.0)}) AS hx,
               (cast(lj as double) * {S32}) AS hy
        FROM lj),
pol AS (SELECT doc_id, x0, y0, x1, y1,
               atan(sqrt(hx*hx + hy*hy) / {d(sc)} * {d(res0u)}) AS rr,
               (({d(az0)} - atan2(hy, hx))
                - {TWO_PI} * floor(({d(az0)} - atan2(hy, hx)) / {TWO_PI})) AS az
        FROM hex),
sl AS (SELECT doc_id, x0, y0, x1, y1, rr, az,
              least(greatest(sin({d(fla)})*cos(rr)
                             + cos({d(fla)})*sin(rr)*cos(az),
                             {d(-1.0)}), {d(1.0)}) AS sinlat
       FROM pol),
ctr AS (SELECT doc_id, x0, y0, x1, y1,
               (asin(sinlat) * {deg}) AS clat,
               (({lon2} - {TWO_PI} * floor({lon2} / {TWO_PI}) - {PI}) * {deg}) AS clon
        FROM sl),
ins AS (SELECT doc_id, clat, clon FROM ctr
        WHERE clon > x0 AND clon < x1 AND clat > y0 AND clat < y1)"""
    return ctes, enc


def _h3_token(expr: str) -> str:
    """DuckDB: BIGINT h3 id expression -> lowercase hex token."""
    nib = " || ".join(
        f"substring('0123456789abcdef', cast((({expr}) >> {4 * k}) & 15 as int) + 1, 1)"
        for k in range(14, -1, -1)
    )
    return f"regexp_replace({nib}, '^0+', '')"


def _h3_pid(expr: str, parent_res: int) -> str:
    """DuckDB: parent id at ``parent_res`` for an h3 id of ANY res —
    clear the res nibble, set parent_res, fill lower digits with 7s
    (the engine's parent_expr, dggs/h3backend.py:50)."""
    res_mask = 15 << 52
    fill = (1 << (3 * (15 - parent_res))) - 1
    return (f"((({expr}) - (({expr}) & {res_mask}) + {parent_res << 52})"
            f" | {fill})")


def _h3_polyfill_oracle_sql() -> str:
    """DuckDB restatement of the H3 polyfill (module comment above)."""
    res, pres = _H3PF_RES, _H3PF_PARENT
    ctes, enc = _h3_enum_ctes(_h3_rect_corpus_sql())
    pid = _h3_pid("('0x' || cell)::BIGINT", pres)
    return f"""{ctes}
SELECT cell AS h3_{res:02d}, doc_id,
       {_h3_token("__p")} AS h3_{pres:02d}
FROM (SELECT doc_id, cell, {pid} AS __p FROM ({enc}) __e) __f
"""


# ------------------------------------------ H3 compaction oracle (q50)
# A2/A3 pinned on a THIRD cell geometry: aperture-7 hex compaction is
# ID-based (H3 children are not spatially nested), so the oracle replays
# the iterative 7-sibling merge with the engine's own parent bit math
# (clear res nibble, set parent res, fill digits with 7s) instead of the
# string prefixes q28/q41 used.  The corpus window has no pentagon base
# cells, so complete sets are always exactly 7.
def _h3c_rect_corpus_sql(table: str = "events", id_col: str = "event_id") -> str:
    """Rects in the q47 face-8 window sized for merges: small rects
    0.25-0.49° complete interior res-5 sibling sets at res 6 (a res-5
    cell's 49 res-6 descendants span ~0.5° of footprint only for the
    big case — small rects exercise partial sets too); every ~377th
    'big' rect is 1.0°, which contains some res-4 cell's full res-6
    descendant footprint (~0.66°) but can never complete a res-3 set
    (descendant footprint ~1.7°), so the parent_res=3 floor provably
    never re-expands — the q41 argument, aperture 7."""
    lat = f"({G.dlit(-6.9)} + ({id_col} % 480) * {G.dlit(0.01)})"
    lon = f"({G.dlit(-44.4)} + (({id_col} * 7) % 480) * {G.dlit(0.01)})"
    big = f"{id_col} % 377 = 0"
    w = f"(CASE WHEN {big} THEN {G.dlit(1.0)} ELSE {G.dlit(0.25)} + ({id_col} % 7) * {G.dlit(0.04)} END)"
    h = f"(CASE WHEN {big} THEN {G.dlit(1.0)} ELSE {G.dlit(0.25)} + ({id_col} % 5) * {G.dlit(0.05)} END)"
    return f"""
SELECT doc_id,
       (lon - w * {G.dlit(0.5)}) AS x0, (lat - h * {G.dlit(0.5)}) AS y0,
       (lon + w * {G.dlit(0.5)}) AS x1, (lat + h * {G.dlit(0.5)}) AS y1
FROM (
  SELECT ('C' || cast({id_col} as string)) AS doc_id,
         {lat} AS lat, {lon} AS lon, {w} AS w, {h} AS h
  FROM {table} WHERE {id_col} % 17 = 0) __r
"""


def _q_h3_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q50 — REAL pipeline (H3 polyfill + ID-based compaction) over the
    merge-sized face-local rect corpus."""
    from pyspark.sql import functions as F

    from vector2dggs_spark import index

    load_views(spark, sf_dir)
    corpus = spark.sql(_h3c_rect_corpus_sql())
    s = lambda c: F.col(c).cast("string")  # noqa: E731 — Java shortest-repr
    rect_wkt = F.concat(
        F.lit("POLYGON (("),
        s("x0"), F.lit(" "), s("y0"), F.lit(", "),
        s("x1"), F.lit(" "), s("y0"), F.lit(", "),
        s("x1"), F.lit(" "), s("y1"), F.lit(", "),
        s("x0"), F.lit(" "), s("y1"), F.lit(", "),
        s("x0"), F.lit(" "), s("y0"), F.lit("))"),
    )
    docs = corpus.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("geometry").alias("kind"),
                rect_wkt.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    r = index(spark, docs, dggs="h3", resolution=_H3PF_RES,
              parent_res=_H3PF_PARENT, cut_threshold_deg2=0, compact=True)
    return r.cells


def _h3_compaction_oracle_sql() -> str:
    """DuckDB restatement: the q47 lattice enumeration over the bigger
    corpus, then the iterative 7-sibling merge replayed level by level
    on the ids (6→5→4→3); mirrors q41's chained prefix GROUP BYs with
    bit-math parents."""
    res, pres = _H3PF_RES, _H3PF_PARENT
    ctes, enc = _h3_enum_ctes(_h3c_rect_corpus_sql())
    p5 = _h3_pid("id", 5)
    p4 = _h3_pid("pid", 4)
    p3 = _h3_pid("pid", 3)
    parent = _h3_pid("id", pres)
    return f"""{ctes},
allc AS (SELECT doc_id, ('0x' || cell)::BIGINT AS id FROM ({enc}) __e),
g5 AS (SELECT doc_id, {p5} AS pid, count(*) AS n FROM allc GROUP BY 1, 2),
m5 AS (SELECT doc_id, pid FROM g5 WHERE n = 7),
k6 AS (SELECT a.doc_id, a.id FROM allc a
       LEFT JOIN m5 ON m5.doc_id = a.doc_id AND m5.pid = {_h3_pid("a.id", 5)}
       WHERE m5.pid IS NULL),
g4 AS (SELECT doc_id, {p4} AS pid, count(*) AS n FROM m5 GROUP BY 1, 2),
m4 AS (SELECT doc_id, pid FROM g4 WHERE n = 7),
k5 AS (SELECT a.doc_id, a.pid AS id FROM m5 a
       LEFT JOIN m4 ON m4.doc_id = a.doc_id AND m4.pid = {_h3_pid("a.pid", 4)}
       WHERE m4.pid IS NULL),
g3 AS (SELECT doc_id, {p3} AS pid, count(*) AS n FROM m4 GROUP BY 1, 2),
m3 AS (SELECT doc_id, pid FROM g3 WHERE n = 7),
k4 AS (SELECT a.doc_id, a.pid AS id FROM m4 a
       LEFT JOIN m3 ON m3.doc_id = a.doc_id AND m3.pid = {_h3_pid("a.pid", 3)}
       WHERE m3.pid IS NULL),
comp AS (SELECT doc_id, id FROM k6
         UNION ALL SELECT doc_id, id FROM k5
         UNION ALL SELECT doc_id, id FROM k4
         UNION ALL SELECT doc_id, pid AS id FROM m3)
SELECT {_h3_token("id")} AS h3_{res:02d}, doc_id,
       {_h3_token(parent)} AS h3_{pres:02d}
FROM comp
"""


def _line_corpus_sql(table: str = "events", id_col: str = "event_id") -> str:
    """doc_id + 3 polyline vertices (ax,ay)-(bx,by)-(cx,cy) in degrees —
    IDENTICAL text in both dialects.  Segments are 0.05°-0.3° long with
    mixed slopes (both signs, shallow and steep vs the ~0.011°x0.0055°
    res-6 cell) and never vertical, so the supercover's general
    column-interpolation path is what both engines execute."""
    ax = f"({G.dlit(-176.6)} + (({id_col} * 7) % 400) * {G.dlit(0.001)})"
    ay = f"({G.dlit(-44.4)} + ({id_col} % 700) * {G.dlit(0.001)})"
    return f"""
SELECT doc_id, ax, ay,
       (ax + {G.dlit(0.05)} + ({id_col} % 13) * {G.dlit(0.017)}) AS bx,
       (ay + {G.dlit(-0.11)} + ({id_col} % 9) * {G.dlit(0.027)}) AS by,
       (ax + {G.dlit(0.08)} + ({id_col} % 7) * {G.dlit(0.013)}) AS cx,
       (ay + {G.dlit(0.09)} - ({id_col} % 11) * {G.dlit(0.019)}) AS cy,
       {id_col} AS __id
FROM (
  SELECT ('L' || cast({id_col} as string)) AS doc_id,
         {ax} AS ax, {ay} AS ay, {id_col}
  FROM {table}) __l
"""


def _q_linetrace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q40 — REAL pipeline over a SQL-derived 2-segment polyline corpus
    with ``linetrace_mode="supercover"`` (C14's oracle-exact mode; the
    A* default legitimately skips corner cells so it keeps its
    Dijkstra-optimality pytest oracle instead)."""
    from pyspark.sql import functions as F

    from vector2dggs_spark import index

    load_views(spark, sf_dir)
    corpus = spark.sql(_line_corpus_sql())
    s = lambda c: F.col(c).cast("string")  # noqa: E731 — Java shortest-repr
    # round-trips exactly through the numpy WKT parse (q14's trick)
    wkt = F.concat(
        F.lit("LINESTRING ("),
        s("ax"), F.lit(" "), s("ay"), F.lit(", "),
        s("bx"), F.lit(" "), s("by"), F.lit(", "),
        s("cx"), F.lit(" "), s("cy"), F.lit(")"),
    )
    docs = corpus.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("geometry").alias("kind"),
                wkt.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    r = index(spark, docs, dggs="geohash", resolution=_GEO_RES,
              parent_res=_GEO_PARENT, cut_threshold_deg2=0,
              linetrace_mode="supercover")
    return r.cells


def _linetrace_oracle_sql() -> str:
    """DuckDB restatement of the supercover linetrace: grid-space
    endpoints, one row per x-column via correlated generate_series, the
    SAME clamp/interpolation doubles the numpy kernel evaluates
    (dggs/geohash.py:_segment_cells — column-interval rasterization),
    then cell-center re-encode through the shared staged geohash SQL.
    Bit-exact because every expression is textually identical
    IEEE-754 double arithmetic in both engines."""
    from vector2dggs_spark.dggs.geohash import cell_dims

    dlat, dlon = cell_dims(_GEO_RES)
    enc = G.geohash_select_sql(
        "SELECT doc_id, clat, clon FROM ctr", "clat", "clon", _GEO_RES,
        ["doc_id"], out="cell",
    )
    return f"""
WITH lines AS ({_line_corpus_sql()}),
segs AS (
  SELECT doc_id, ax AS px, ay AS py, bx AS qx, by AS qy FROM lines
  UNION ALL
  SELECT doc_id, bx, by, cx, cy FROM lines),
g AS (SELECT doc_id,
             ((px + {G.dlit(180.0)}) / {G.dlit(dlon)}) AS gx0,
             ((py + {G.dlit(90.0)}) / {G.dlit(dlat)}) AS gy0,
             ((qx + {G.dlit(180.0)}) / {G.dlit(dlon)}) AS gx1,
             ((qy + {G.dlit(90.0)}) / {G.dlit(dlat)}) AS gy1
      FROM segs),
o AS (SELECT doc_id,
             CASE WHEN gx1 < gx0 THEN gx1 ELSE gx0 END AS x0,
             CASE WHEN gx1 < gx0 THEN gy1 ELSE gy0 END AS y0,
             CASE WHEN gx1 < gx0 THEN gx0 ELSE gx1 END AS x1,
             CASE WHEN gx1 < gx0 THEN gy0 ELSE gy1 END AS y1
      FROM g),
cols AS (SELECT doc_id, x0, y0, x1, y1,
                unnest(generate_series(cast(floor(x0) as bigint),
                                       cast(floor(x1) as bigint))) AS ix
         FROM o),
cl AS (SELECT doc_id, x0, y0, x1, y1, ix,
              greatest(cast(ix as double), x0) AS xl,
              least(cast(ix as double) + {G.dlit(1.0)}, x1) AS xr
       FROM cols),
yy AS (SELECT doc_id, ix,
              (y0 + (y1 - y0) * ((xl - x0) / (x1 - x0))) AS yl,
              (y0 + (y1 - y0) * ((xr - x0) / (x1 - x0))) AS yr
       FROM cl),
cells AS (SELECT doc_id, ix,
                 unnest(generate_series(
                   cast(floor(least(yl, yr)) as bigint),
                   cast(floor(greatest(yl, yr)) as bigint))) AS iy
          FROM yy),
dcells AS (SELECT DISTINCT doc_id, ix, iy FROM cells),
ctr AS (SELECT doc_id,
               ({G.dlit(-180.0)} + (ix + {G.dlit(0.5)}) * {G.dlit(dlon)}) AS clon,
               ({G.dlit(-90.0)} + (iy + {G.dlit(0.5)}) * {G.dlit(dlat)}) AS clat
        FROM dcells),
allc AS ({enc})
""" + _FINAL_SELECT.format(src="allc")


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q42 — near-dup CLUSTER identification: connected components of
    the q12 MinHash-LSH pair graph via the distributed large-star/
    small-star operator (``operators/cc.py``), joined back onto the full
    document universe (singletons = their own cluster) with cluster
    sizes.  The operation a dedup pipeline actually needs beyond pairs:
    chains (A~B~C with A!~C) collapse into one cluster.

    Cluster sizes come from ``groupBy(cluster_id).count()`` joined back
    — map-side-combinable, so a mega-cluster (the boilerplate/template
    component every corpus-scale near-dup graph has) costs one combined
    row per map task, never a single-task window materialization of all
    its members (VERDICT r04 #2: ``count(*) OVER (PARTITION BY
    cluster_id)`` was the one skew-prone spot left in the projection)."""
    from pyspark.sql import functions as F

    from vector2dggs_spark.operators.cc import connected_components

    load_views(spark, sf_dir)
    pairs = spark.sql(_minhash_sql("spark"))
    comp = connected_components(pairs)
    docs = spark.sql("SELECT doc_id FROM documents")
    labeled = docs.join(comp, docs["doc_id"] == comp["node"], "left").select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("cluster_id"),
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labeled.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size"
    )


_CC_ORACLE = f"""
WITH RECURSIVE pairs AS ({_minhash_sql("duckdb")}),
edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
cc AS (
  SELECT doc_id AS node, doc_id AS lbl FROM documents
  UNION
  SELECT e.v, cc.lbl FROM cc JOIN edges e ON e.u = cc.node
),
comp AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM cc GROUP BY node)
SELECT doc_id, cluster_id,
       cast(count(*) OVER (PARTITION BY cluster_id) as bigint) AS cluster_size
FROM comp
"""


def _bm25_sql(dialect: str) -> str:
    """q43 — BM25 retrieval scoring over the documents corpus (k1=1.2,
    b=0.75, the standard Robertson/Sparck-Jones formulation): the
    quality-/retrieval-scoring op a training-data pipeline uses to rank
    corpus documents against a query.  Pure native SQL in both engines;
    zero-tf terms contribute exactly 0 through the shared formula (no
    CASE), corpus stats (N, avgdl, df per term) come from one
    broadcastable stats row, and the float expression tree is
    textually identical so ranks reproduce bit-for-bit."""
    terms = ("spark", "scan", "window")
    k1, b = G.dlit(1.2), G.dlit(0.75)
    h = G.dlit(0.5)
    one = G.dlit(1.0)
    if dialect == "spark":
        tf = lambda t: f"cast(size(filter(toks, x -> x = '{t}')) as double)"  # noqa: E731
    else:
        tf = lambda t: f"cast(len(list_filter(toks, x -> x = '{t}')) as double)"  # noqa: E731
    tf_cols = ", ".join(f"{tf(t)} AS tf{i}" for i, t in enumerate(terms))
    df_cols = ", ".join(
        f"cast(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) as double) AS df{i}"
        for i in range(len(terms))
    )
    idf = lambda i: f"ln(((n - df{i} + {h}) / (df{i} + {h})) + {one})"  # noqa: E731
    contrib = lambda i: (  # noqa: E731
        f"({idf(i)} * (tf{i} * ({k1} + {one}))"
        f" / (tf{i} + {k1} * ({one} - {b} + {b} * dl / avgdl)))"
    )
    score = f"(({contrib(0)} + {contrib(1)}) + {contrib(2)})"
    return f"""
WITH tk AS (SELECT doc_id, split(text, ' ') AS toks FROM documents),
d AS (SELECT doc_id, cast({'size' if dialect == 'spark' else 'len'}(toks) as double) AS dl,
             {tf_cols}
      FROM tk),
st AS (SELECT cast(count(*) as double) AS n, avg(dl) AS avgdl, {df_cols} FROM d),
sc AS (SELECT doc_id, {score} AS s FROM d CROSS JOIN st),
r AS (SELECT doc_id, s,
             cast(row_number() OVER (ORDER BY s DESC, doc_id) as int) AS rnk
      FROM sc)
SELECT doc_id, round(s, 6) AS bm25, rnk FROM r WHERE rnk <= 20
"""


Q43 = _dialects(_bm25_sql("spark"), _bm25_sql("duckdb"))


def _q_adaptive_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q44 — mixed-level adaptive region covers (RegionCoverer analog,
    ``operators/cover.py``) over a SQL-derived rect corpus, distributed
    via mapInPandas (one cover per feature, vectorized numpy inside).
    Rows-only contract entry: the cover construction (priority-queue
    refinement with a cell budget) is not SQL-expressible; correctness
    is pinned by the per-backend superset/budget property suite
    (tests/test_cover.py)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.cover import adaptive_cover

    load_views(spark, sf_dir)
    corpus = spark.sql(_rhp_rect_corpus_sql()).where(
        F.expr("substring(doc_id, 2) % 20 = 0")
    )
    backend = get_backend("geohash")

    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                ring = np.array(
                    [[r.x0, r.y0], [r.x1, r.y0], [r.x1, r.y1],
                     [r.x0, r.y1], [r.x0, r.y0]]
                )
                for cell in adaptive_cover(backend, [ring], max_cells=32):
                    rows.append((r.doc_id, str(cell), len(str(cell))))
            yield pd.DataFrame(rows, columns=["doc_id", "cell", "level"])

    return corpus.mapInPandas(gen, "doc_id string, cell string, level int")


def _stratified_sample_sql(dialect: str) -> str:
    """q45 — deterministic stratified sampling by language: downsample
    the over-represented stratum ('en' keeps 40%, others 80%) with a
    content-independent md5 hash bucket, the standard reproducible-split
    primitive of a training-data pipeline (no rand(): retries, engines
    and re-runs all agree).  Emits the kept docs with their bucket and
    per-stratum kept/total counts."""
    if dialect == "spark":
        bucket = "cast(conv(substring(md5(cast(doc_id as string)), 1, 12), 16, 10) % 100 as int)"
    else:
        bucket = "cast(('0x' || substring(md5(cast(doc_id as varchar)), 1, 12))::BIGINT % 100 as int)"
    return f"""
WITH h AS (SELECT doc_id, lang, {bucket} AS bucket FROM documents),
kept AS (SELECT doc_id, lang, bucket FROM h
         WHERE bucket < (CASE WHEN lang = 'en' THEN 40 ELSE 80 END)),
stats AS (SELECT h.lang,
                 cast(count(*) as bigint) AS stratum_total,
                 cast(sum(CASE WHEN bucket < (CASE WHEN h.lang = 'en' THEN 40 ELSE 80 END)
                          THEN 1 ELSE 0 END) as bigint) AS stratum_kept
          FROM h GROUP BY h.lang)
SELECT k.doc_id, k.lang, k.bucket, s.stratum_kept, s.stratum_total
FROM kept k JOIN stats s ON k.lang = s.lang
"""


Q45 = _dialects(_stratified_sample_sql("spark"), _stratified_sample_sql("duckdb"))


def _unigram_lm_sql(dialect: str) -> str:
    """q46 — unigram-LM document scoring (perplexity proxy): corpus
    token frequencies with add-one smoothing -> per-doc mean log
    probability, the classic cheap quality signal for corpus filtering.
    Token probabilities and the sequential left-fold over each doc's
    tokens are identical double arithmetic in both engines."""
    if dialect == "spark":
        body = """
WITH tk AS (SELECT doc_id, split(text, ' ') AS toks FROM documents),
tok AS (SELECT doc_id, t.tok FROM tk
        LATERAL VIEW explode(toks) t AS tok),
"""
    else:
        body = """
WITH tk AS (SELECT doc_id, split(text, ' ') AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM tk),
"""
    # per-doc sum via fixed-point DECIMAL: float sums are not
    # order-associative and groupBy partial-aggregation order differs
    # between engines; a decimal sum of 9-dp-rounded log-probs is exact
    # and order-independent, cast to double once at the end
    return body + """
cnt AS (SELECT tok, cast(count(*) as double) AS c FROM tok GROUP BY tok),
tot AS (SELECT cast(count(*) as double) AS n,
               cast(count(DISTINCT tok) as double) AS v FROM tok),
lp AS (SELECT tok,
              cast(round(ln((c + cast(1.0 as double)) / (n + v)), 9)
                   as decimal(18, 9)) AS logp
       FROM cnt CROSS JOIN tot),
doc AS (SELECT t.doc_id,
               sum(lp.logp) AS s,
               cast(count(*) as double) AS len
        FROM tok t JOIN lp ON t.tok = lp.tok
        GROUP BY t.doc_id)
SELECT doc_id, round(cast(s as double) / len, 6) AS mean_logp,
       cast(len as bigint) AS n_tokens
FROM doc
"""


Q46 = _dialects(_unigram_lm_sql("spark"), _unigram_lm_sql("duckdb"))


def _gopher_sql(dialect: str) -> str:
    """q48 — the Gopher document-quality rules (Rae et al. 2021,
    arXiv:2112.11446, Table A1 — the published heuristics production
    training pipelines apply before dedup), word-level subset matching
    this corpus' single-line documents:

    * word count within [50, 100000];
    * mean word length within [3, 10];
    * at least 2 distinct required stop words present (the published
      rule takes the corpus language's function words as a parameter —
      Gopher's English list intersects this synthetic corpus' vocabulary
      only at 'the', which would make the flag constant-0, so the list
      here is the corpus' own high-document-frequency function words;
      same rule shape, honest variance);
    * characters in the most frequent word 2-gram <= 20% of the text.

    All thresholds are pinned double literals; fractions are exact-int
    numerators/denominators divided once in IEEE double (identical in
    both engines); the top 2-gram is tie-broken (count DESC, gram ASC)
    so the winner is deterministic.  ``keep`` is emitted as int to dodge
    cross-engine bool dtype drift."""
    stopw = ("the", "data", "table", "row", "join", "batch", "merge", "hash")
    if dialect == "spark":
        toks = "split(text, ' ')"
        sz = "size"
        sum_len = "aggregate(toks, 0L, (a, w) -> a + length(w))"
        # distinct stop words PRESENT (explicit per-word contains: the
        # engines' array-intersect dedup semantics are not identical)
        inter = " + ".join(
            f"(CASE WHEN array_contains(toks, '{w}') THEN 1 ELSE 0 END)"
            for w in stopw
        )
        grams = ("transform(sequence(1, cast(size(toks) as int) - 1),"
                 " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")
        expl = "explode(grams)"
    else:
        toks = "string_split(text, ' ')"
        sz = "len"
        sum_len = "list_sum(list_transform(toks, w -> length(w)))"
        inter = " + ".join(
            f"(CASE WHEN list_contains(toks, '{w}') THEN 1 ELSE 0 END)"
            for w in stopw
        )
        grams = ("list_transform(generate_series(1, len(toks) - 1),"
                 " i -> toks[i] || ' ' || toks[i + 1])")
        expl = "unnest(grams)"
    mean_len = "(cast(sum_len as double) / cast(n_words as double))"
    frac = "top_bigram_char_frac"
    return f"""
WITH t AS (SELECT doc_id, length(text) AS n_chars_x, {toks} AS toks FROM documents),
s AS (SELECT doc_id, n_chars_x,
             cast({sz}(toks) as bigint) AS n_words,
             cast({sum_len} as bigint) AS sum_len,
             cast(({inter}) as bigint) AS stop_hits
      FROM t),
g AS (SELECT doc_id, {expl} AS gram
      FROM (SELECT doc_id, {grams} AS grams FROM t WHERE {sz}(toks) >= 2) __g),
gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
top AS (SELECT doc_id, gram, c FROM (
          SELECT doc_id, gram, c,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY c DESC, gram) AS rk
          FROM gc) __r WHERE rk = 1),
j AS (SELECT s.doc_id, s.n_words, s.sum_len, s.stop_hits,
             (cast(coalesce(top.c * length(top.gram), 0) as double)
              / cast(s.n_chars_x as double)) AS {frac}
      FROM s LEFT JOIN top ON s.doc_id = top.doc_id)
SELECT doc_id, n_words,
       (cast(sum_len as double) / cast(n_words as double)) AS mean_word_len,
       stop_hits, {frac},
       cast(CASE WHEN n_words >= 50 AND n_words <= 100000
                  AND {mean_len} >= {_D(3.0)}
                  AND {mean_len} <= {_D(10.0)}
                  AND stop_hits >= 2
                  AND {frac} <= {_D(0.2)}
             THEN 1 ELSE 0 END as int) AS keep
FROM j
"""


Q48 = _dialects(_gopher_sql("spark"), _gopher_sql("duckdb"))


def _repeated_window_sql(dialect: str, k: int = 8) -> str:
    """q49 — exact-substring duplication signal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): flag every ``k``-token window that appears
    verbatim in MORE THAN ONE document, and score each document by its
    duplicated-window fraction.  The paper's suffix array does not
    distribute; the standard Spark-scale reduction is rolling-window
    fingerprints (md5 over the joined window) + a doc-count groupBy —
    all equi-joins and partial-aggregating groupBys, the 100-TB shape.
    Windows, not shingle sets: unlike MinHash (q12) this is EXACT
    verbatim-substring evidence, the signal used to clip repeated
    boilerplate out of training text."""
    if dialect == "spark":
        toks = "split(text, ' ')"
        sz = "size(toks)"
        wins = (f"transform(sequence(1, cast(size(toks) as int) - {k - 1}),"
                f" i -> md5(concat_ws(' ', slice(toks, i, {k}))))")
        expl = "explode(wins)"
    else:
        toks = "string_split(text, ' ')"
        sz = "len(toks)"
        wins = (f"list_transform(generate_series(1, len(toks) - {k - 1}),"
                f" i -> md5(array_to_string(toks[i:i + {k - 1}], ' ')))")
        expl = "unnest(wins)"
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
w AS (SELECT doc_id, {expl} AS wh
      FROM (SELECT doc_id, {wins} AS wins FROM t WHERE {sz} >= {k}) __w),
g AS (SELECT wh, count(DISTINCT doc_id) AS nd FROM w GROUP BY wh),
d AS (SELECT w.doc_id,
             cast(count(*) as bigint) AS n_windows,
             cast(sum(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END) as bigint) AS dup_windows
      FROM w JOIN g ON w.wh = g.wh
      GROUP BY w.doc_id)
SELECT t2.doc_id,
       cast(coalesce(d.n_windows, 0) as bigint) AS n_windows,
       cast(coalesce(d.dup_windows, 0) as bigint) AS dup_windows,
       (CASE WHEN coalesce(d.n_windows, 0) = 0 THEN cast(0.0 as double)
             ELSE cast(d.dup_windows as double) / cast(d.n_windows as double)
        END) AS dup_frac
FROM (SELECT doc_id FROM documents) t2
LEFT JOIN d ON t2.doc_id = d.doc_id
"""


Q49 = _dialects(_repeated_window_sql("spark"), _repeated_window_sql("duckdb"))


def _dsir_sql(dialect: str, buckets: int = 1024) -> str:
    """q61 — DSIR-style importance weighting (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling",
    arXiv:2302.03169): hashed word-bigram features, bag-of-ngrams
    unigram LMs over a TARGET domain sample (lang = 'en' — selecting
    target-like documents out of the mixed raw pool, the paper's use
    case) and the RAW pool, and the per-document log importance weight
    log w(x) = Σ_b n_b(x) · (ln p_t(b) − ln p_r(b)) with add-one
    smoothing over the fixed bucket space.  The paper resamples with
    Gumbel noise; this engine is deterministic by design (memory:
    q45), so the contract surface reports the weight and a
    weight-positive selection flag instead.

    Determinism: the q46 device — per-bucket λ rounded to 9 dp and
    summed in exact DECIMAL (float group-sums are not
    order-associative across engines), one double division at the end.
    Scale: the λ table has exactly ``buckets`` rows (broadcast,
    map-side join); everything else is partial-aggregating groupBys —
    the 100-TB shape."""
    if dialect == "spark":
        toks = "split(text, ' ')"
        sz = "size(toks)"
        wins = (f"transform(sequence(1, cast(size(toks) as int) - 1),"
                f" i -> cast(conv(substring(md5(concat_ws(' ', slice(toks, i, 2))),"
                f" 1, 12), 16, 10) % {buckets} as int))")
        expl = "explode(wins)"
    else:
        toks = "string_split(text, ' ')"
        sz = "len(toks)"
        wins = (f"list_transform(generate_series(1, len(toks) - 1),"
                f" i -> cast(('0x' || substr(md5(array_to_string(toks[i:i + 1], ' ')),"
                f" 1, 12))::BIGINT % {buckets} as int))")
        expl = "unnest(wins)"
    d = G.dlit
    one, zero, B = d(1.0), d(0.0), d(float(buckets))
    return f"""
WITH t AS (SELECT doc_id, lang, {toks} AS toks FROM documents),
w AS (SELECT doc_id, lang, {expl} AS b
      FROM (SELECT doc_id, lang, {wins} AS wins FROM t WHERE {sz} >= 2) __w),
cr AS (SELECT b, cast(count(*) as double) AS c_raw FROM w GROUP BY b),
ct AS (SELECT b, cast(count(*) as double) AS c_tgt FROM w
       WHERE lang = 'en' GROUP BY b),
nn AS (SELECT cast(count(*) as double) AS n_raw,
              cast(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) as double) AS n_tgt
       FROM w),
lam AS (SELECT cr.b,
               cast(round(ln((coalesce(ct.c_tgt, {zero}) + {one}) / (nn.n_tgt + {B}))
                          - ln((cr.c_raw + {one}) / (nn.n_raw + {B})), 9)
                    as decimal(18, 9)) AS lam
        FROM cr LEFT JOIN ct ON ct.b = cr.b CROSS JOIN nn),
d AS (SELECT w.doc_id, sum(lam.lam) AS s, cast(count(*) as bigint) AS n
      FROM w JOIN lam ON w.b = lam.b
      GROUP BY w.doc_id)
SELECT t2.doc_id,
       cast(coalesce(d.n, 0) as bigint) AS n_grams,
       (CASE WHEN d.doc_id IS NULL THEN {zero}
             ELSE round(cast(d.s as double) / cast(d.n as double), 6)
        END) AS mean_logw,
       (CASE WHEN d.doc_id IS NOT NULL AND cast(d.s as double) > {zero}
             THEN 1 ELSE 0 END) AS selected
FROM (SELECT doc_id FROM documents) t2
LEFT JOIN d ON t2.doc_id = d.doc_id
"""


Q61 = _dialects(_dsir_sql("spark"), _dsir_sql("duckdb"))


def _pii_scrub_sql(dialect: str) -> str:
    """q62 — PII redaction, the scrub *apply* step every published
    web-corpus pipeline runs (C4 / Raffel et al. 2020 removed
    offensive+PII tokens; RefinedWeb and FineWeb redact emails/phones
    with regex passes): replace email addresses and phone numbers with
    typed placeholders and report per-doc redaction counts plus the
    cleaned text's md5/length.

    The PII-bearing corpus is SQL-derived from ``customer`` (the
    engine-wide technique): per-key deterministic emails
    (``customer.0000123@corp-N.example.com``) and dd-ddd-ddd-dddd
    phones, with a 4-way presence mix (both / email-only / phone-only /
    neither) so the scrubber sees every case.

    Cross-engine regex portability: Java regex (Spark) vs RE2 (DuckDB)
    agree only on the common subset — no backreferences, no
    lookaround, ``[.]`` instead of backslash escapes (dialect escape
    rules differ).  DuckDB's regexp_replace needs the explicit 'g'
    flag (Spark replaces all matches by default).  Scale: pure
    projection — zero shuffles, embarrassingly parallel at 100 TB."""
    em = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
    ph = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
    if dialect == "spark":
        nmail = f"size(regexp_extract_all(text, '{em}', 0))"
        nphone = f"size(regexp_extract_all(text, '{ph}', 0))"
        clean = (f"regexp_replace(regexp_replace(text, '{em}', '<EMAIL>'),"
                 f" '{ph}', '<PHONE>')")
    else:
        nmail = f"len(regexp_extract_all(text, '{em}'))"
        nphone = f"len(regexp_extract_all(text, '{ph}'))"
        clean = (f"regexp_replace(regexp_replace(text, '{em}', '<EMAIL>', 'g'),"
                 f" '{ph}', '<PHONE>', 'g')")
    phone = ("(cast((20 + (c_custkey % 80)) as string) || '-' || "
             "cast((100 + (c_custkey % 900)) as string) || '-' || "
             "cast((100 + ((c_custkey * 7) % 900)) as string) || '-' || "
             "cast((1000 + ((c_custkey * 13) % 9000)) as string))")
    return f"""
WITH src AS (
  SELECT c_custkey AS doc_id,
         ('segment ' || c_mktsegment ||
          (CASE WHEN c_custkey % 4 <= 1
                THEN ' email ' || lower(replace(c_name, '#', '.')) ||
                     '@corp-' || cast(c_nationkey as string) || '.example.com'
                ELSE '' END) ||
          (CASE WHEN c_custkey % 4 = 0 OR c_custkey % 4 = 2
                THEN ' tel ' || {phone}
                ELSE '' END) ||
          ' account ' || c_name) AS text
  FROM customer),
red AS (SELECT doc_id, {nmail} AS ne, {nphone} AS np, {clean} AS clean
        FROM src)
SELECT doc_id,
       cast(ne as bigint) AS n_emails,
       cast(np as bigint) AS n_phones,
       md5(clean) AS clean_md5,
       cast(length(clean) as bigint) AS clean_len
FROM red
"""


Q62 = _dialects(_pii_scrub_sql("spark"), _pii_scrub_sql("duckdb"))


def _corpus_profile_sql(dialect: str) -> str:
    """q64 — exact corpus profiling: per-language token-count order
    statistics (lower median, p90, p99, max) — the audit step run
    before/after every filtering stage of a training-data pipeline.

    Quantile semantics are EXPLICIT rank selection (kth order statistic
    = smallest value whose cumulative count reaches k, k in pure
    integer-on-double math both engines evaluate identically) — never
    an engine ``percentile`` builtin, whose interpolation rules differ.

    Scale design: the naive exact quantile (row_number over the corpus
    per group) is a mega-partition window — the q42 anti-pattern.  This
    is the HISTOGRAM formulation: groupBy (lang, n_toks) first (partial
    map-side combine), then the cumulative window runs over the
    AGGREGATED histogram, whose size is bounded by the value domain
    (distinct token counts), not the corpus — at 100 TB the window
    input stays thousands of rows per language."""
    sz = ("size(split(text, ' '))" if dialect == "spark"
          else "len(string_split(text, ' '))")
    return f"""
WITH t AS (SELECT doc_id, lang, cast({sz} as bigint) AS n_toks FROM documents),
h AS (SELECT lang, n_toks, count(*) AS c FROM t GROUP BY lang, n_toks),
tot AS (SELECT lang, sum(c) AS n, max(n_toks) AS mx FROM h GROUP BY lang),
cum AS (SELECT lang, n_toks,
               sum(c) OVER (PARTITION BY lang ORDER BY n_toks
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        FROM h)
SELECT cum.lang,
       cast(max(tot.n) as bigint) AS n_docs,
       min(CASE WHEN cm >= floor((tot.n + 1) / 2.0) THEN n_toks END) AS med_toks,
       min(CASE WHEN cm >= floor((9 * tot.n + 9) / 10.0) THEN n_toks END) AS p90_toks,
       min(CASE WHEN cm >= floor((99 * tot.n + 99) / 100.0) THEN n_toks END) AS p99_toks,
       cast(max(tot.mx) as bigint) AS max_toks
FROM cum JOIN tot ON cum.lang = tot.lang
GROUP BY cum.lang
"""


Q64 = _dialects(_corpus_profile_sql("spark"), _corpus_profile_sql("duckdb"))


# --------------------------------------------- S2 polyfill oracle (q51)
# C9/C10 were the last backends whose polygon fill had only structural
# tests (VERDICT r04 "missing" #2).  Same construction as q47 (H3) /
# q41 (rHP): a rect corpus confined to ONE cube face — face 0, centered
# on (0°, 0°), where u = tan(lon), v = tan(lat)/cos(lon) — so every
# level-12 cell center in play is the image of one (i, j) lattice point
# of that face's quadtree grid.  The oracle enumerates the (i, j) range
# from the corner-projected s/t extremes (+4-cell margin — v's interior
# extreme when a rect crosses lon=0 is O(lat·lon²/2) ≈ 1e-5 cells off
# the corner hull, so the margin drowns it; extra candidates fail the
# strict inside test for free), rebuilds each candidate's center with
# the EXACT doubles the kernel computes (dggs/s2.py:polyfill — the
# (leaf+0.5)/2^30 → quadratic ST→UV → face-0 xyz chain is all exact or
# ≤1-ulp libm, far below any generic rect boundary's distance), keeps
# centers strictly inside the rect, and re-encodes them through the
# PROVEN layered q31 encode SQL (functions/sqlgen.py:s2_select_sql).
# S2 is spatially nested (a quadtree on (s,t)), so the parent column is
# an INDEPENDENT re-encode of the same center at the parent level — no
# bit math shared with the engine's parent_expr.
# Reference parity: s2vectorindexer.py:92-157,190-199 (fixed-level
# covering post-filtered to center-inside cells).
_S2PF_RES, _S2PF_PARENT = 12, 8


def _s2_rect_corpus_sql(table: str = "events", id_col: str = "event_id") -> str:
    """Axis-aligned rects wholly interior to cube face 0 (|lat|, |lon|
    < 19.7° ≪ 45°) — IDENTICAL text in both dialects.  Rects are
    0.2-0.5° wide; at level 12 (cell ≈ 0.022°) that is 9-23 cells
    across."""
    lat = f"({G.dlit(-19.2)} + ({id_col} % 480) * {G.dlit(0.08)})"
    lon = f"({G.dlit(-19.2)} + (({id_col} * 7) % 480) * {G.dlit(0.08)})"
    w = f"({G.dlit(0.2)} + ({id_col} % 7) * {G.dlit(0.05)})"
    h = f"({G.dlit(0.2)} + ({id_col} % 5) * {G.dlit(0.06)})"
    return f"""
SELECT doc_id,
       (lon - w * {G.dlit(0.5)}) AS x0, (lat - h * {G.dlit(0.5)}) AS y0,
       (lon + w * {G.dlit(0.5)}) AS x1, (lat + h * {G.dlit(0.5)}) AS y1
FROM (
  SELECT ('S' || cast({id_col} as string)) AS doc_id,
         {lat} AS lat, {lon} AS lon, {w} AS w, {h} AS h
  FROM {table} WHERE {id_col} % 29 = 0) __r
"""


def _q_s2_polyfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q51 — REAL pipeline (S2 polygon polyfill, C9) over the
    face-0 SQL-derived rect corpus."""
    from pyspark.sql import functions as F

    from vector2dggs_spark import index

    load_views(spark, sf_dir)
    corpus = spark.sql(_s2_rect_corpus_sql())
    s = lambda c: F.col(c).cast("string")  # noqa: E731 — Java shortest-repr
    rect_wkt = F.concat(
        F.lit("POLYGON (("),
        s("x0"), F.lit(" "), s("y0"), F.lit(", "),
        s("x1"), F.lit(" "), s("y0"), F.lit(", "),
        s("x1"), F.lit(" "), s("y1"), F.lit(", "),
        s("x0"), F.lit(" "), s("y1"), F.lit(", "),
        s("x0"), F.lit(" "), s("y0"), F.lit("))"),
    )
    docs = corpus.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("geometry").alias("kind"),
                rect_wkt.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    r = index(spark, docs, dggs="s2", resolution=_S2PF_RES,
              parent_res=_S2PF_PARENT, cut_threshold_deg2=0)
    return r.cells


def _s2_st_to_uv_sql(s: str) -> str:
    """_st_to_uv with the kernel's exact op order (dggs/s2.py:128)."""
    d = G.dlit
    one, half, third, four = d(1.0), d(0.5), d(1.0 / 3.0), d(4.0)
    return (f"(CASE WHEN {s} >= {half} THEN {third} * ({four} * {s} * {s} - {one})"
            f" ELSE {third} * ({one} - {four} * ({one} - {s}) * ({one} - {s})) END)")


def _s2_enum_ctes(corpus_sql: str) -> str:
    """The q51 construction as a reusable piece: the ``WITH rect .. ins``
    chain enumerating every level-``_S2PF_RES`` cell center strictly
    inside its rect (module comment above q51).  ``ins`` carries the
    face-0 quadtree lattice indices ``(li, lj)`` alongside the center,
    so consumers can replay ID-free sibling merges in lattice space."""
    import numpy as np

    res = _S2PF_RES
    shift = 30 - res
    d = G.dlit
    RAD = d(np.pi / 180.0)
    DEG = d(float(np.degrees(1.0)))
    LVL = float(1 << res)          # s*2^res = level-`res` cell index
    STEP = d(float(1 << shift))    # leaf cells per level-`res` cell
    HALF = d((1 << (shift - 1)) + 0.5)  # kernel's center leaf offset
    MAXN = d(float(1 << 30))
    one, half = d(1.0), d(0.5)
    st_to_uv = _s2_st_to_uv_sql

    def st(u: str) -> str:
        """_uv_to_st (monotone) — range mapping only, ulps irrelevant."""
        return (f"(CASE WHEN {u} >= {d(0.0)} THEN {half} * sqrt({one} + {d(3.0)} * {u})"
                f" ELSE {one} - {half} * sqrt({one} - {d(3.0)} * {u}) END)")

    # corner u depends on lon only (u = tan(lon), monotone on the face);
    # corner v = tan(lat)/cos(lon) — extremes at corners up to the
    # documented O(1e-5)-cell interior slack the margin covers
    vc = lambda y, x: f"(tan(({y}) * {RAD}) / cos(({x}) * {RAD}))"  # noqa: E731
    ci = lambda s: f"cast(floor({s} * {d(LVL)}) as bigint)"  # noqa: E731
    vs = [vc("y0", "x0"), vc("y0", "x1"), vc("y1", "x0"), vc("y1", "x1")]

    return f"""
WITH rect AS ({corpus_sql}),
rng AS (SELECT doc_id, x0, y0, x1, y1,
               {ci(st(f"tan(x0 * {RAD})"))} - 4 AS imin,
               {ci(st(f"tan(x1 * {RAD})"))} + 4 AS imax,
               {ci(st(f"least({', '.join(vs)})"))} - 4 AS jmin,
               {ci(st(f"greatest({', '.join(vs)})"))} + 4 AS jmax
        FROM rect),
li AS (SELECT doc_id, x0, y0, x1, y1, jmin, jmax,
              unnest(generate_series(imin, imax)) AS li FROM rng),
lj AS (SELECT doc_id, x0, y0, x1, y1, li,
              unnest(generate_series(jmin, jmax)) AS lj FROM li),
st AS (SELECT doc_id, x0, y0, x1, y1, li, lj,
              ((cast(li as double) * {STEP} + {HALF}) / {MAXN}) AS sc,
              ((cast(lj as double) * {STEP} + {HALF}) / {MAXN}) AS tc
       FROM lj),
uv AS (SELECT doc_id, x0, y0, x1, y1, li, lj,
              {st_to_uv("sc")} AS uc, {st_to_uv("tc")} AS vcc
       FROM st),
xr AS (SELECT doc_id, x0, y0, x1, y1, li, lj, uc, vcc,
              sqrt(({one} + uc * uc) + vcc * vcc) AS rr
       FROM uv),
ctr AS (SELECT doc_id, x0, y0, x1, y1, li, lj,
               (asin(least(greatest(vcc / rr, {d(-1.0)}), {one})) * {DEG}) AS clat,
               (atan2(uc, {one}) * {DEG}) AS clon
        FROM xr),
ins AS (SELECT doc_id, clat, clon, li, lj FROM ctr
        WHERE clon > x0 AND clon < x1 AND clat > y0 AND clat < y1)"""


def _s2_polyfill_oracle_sql() -> str:
    """DuckDB restatement of the S2 polyfill (module comment above)."""
    res, pres = _S2PF_RES, _S2PF_PARENT
    enc12 = G.s2_select_sql("SELECT doc_id, clat, clon FROM ins",
                            "clat", "clon", res, ["doc_id", "clat", "clon"],
                            dialect="duckdb", out="cell")
    enc8 = G.s2_select_sql(enc12, "clat", "clon", pres, ["doc_id", "cell"],
                           dialect="duckdb", out="p")
    return f"""{_s2_enum_ctes(_s2_rect_corpus_sql())}
SELECT cell AS s2_{res:02d}, doc_id, p AS s2_{pres:02d}
FROM ({enc8}) __f
"""


# ------------------------------------------ S2 compaction oracle (q59)
# A2/A3 pinned on a FOURTH sibling arity: the S2 quadtree merges
# complete 4-sets.  Unlike H3 (q50, ID bit math) the merge here is
# replayed in LATTICE space — S2 is spatially nested on (s, t), so a
# level-(l-1) parent is exactly (li // 2, lj // 2) of its four
# level-l children, and the oracle never touches the engine's parent
# or compact bit math at all: surviving cells at each level are
# re-encoded from their interior center points through the PROVEN q31
# layered Hilbert SQL at that level (and at the parent level for the
# parent column).  The resolution floor (parent_res = 8) needs no
# special case: the engine compacts past level 8 and re-expands back
# to level-8 children (`_enforce_resolution_floor`), which yields the
# same cell set as simply stopping the merge at level 8 — the chain
# below stops there.
# Reference parity: vectorindexer.py:124-196 (compaction_common) on
# the S2 indexer's fixed-level covering.
def _s2c_rect_corpus_sql(table: str = "events", id_col: str = "event_id") -> str:
    """Rects deep inside cube face 0 sized for merges: small rects
    0.25-0.49° complete level-11/-10/-9 sibling sets (level-12 cells
    are 0.019-0.021° in this window); every ~377th 'big' rect is 1.0°,
    which contains full level-8 footprints (~0.31°) and occasionally a
    full level-7 footprint — absorbed exactly by the floor argument in
    the module comment."""
    lat = f"({G.dlit(-6.9)} + ({id_col} % 480) * {G.dlit(0.01)})"
    lon = f"({G.dlit(-20.0)} + (({id_col} * 7) % 480) * {G.dlit(0.01)})"
    big = f"{id_col} % 377 = 0"
    w = f"(CASE WHEN {big} THEN {G.dlit(1.0)} ELSE {G.dlit(0.25)} + ({id_col} % 7) * {G.dlit(0.04)} END)"
    h = f"(CASE WHEN {big} THEN {G.dlit(1.0)} ELSE {G.dlit(0.25)} + ({id_col} % 5) * {G.dlit(0.05)} END)"
    return f"""
SELECT doc_id,
       (lon - w * {G.dlit(0.5)}) AS x0, (lat - h * {G.dlit(0.5)}) AS y0,
       (lon + w * {G.dlit(0.5)}) AS x1, (lat + h * {G.dlit(0.5)}) AS y1
FROM (
  SELECT ('Q' || cast({id_col} as string)) AS doc_id,
         {lat} AS lat, {lon} AS lon, {w} AS w, {h} AS h
  FROM {table} WHERE {id_col} % 17 = 0) __r
"""


def _q_s2_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q59 — REAL pipeline (S2 polyfill + 4-sibling compaction) over
    the merge-sized face-0 rect corpus."""
    from pyspark.sql import functions as F

    from vector2dggs_spark import index

    load_views(spark, sf_dir)
    corpus = spark.sql(_s2c_rect_corpus_sql())
    s = lambda c: F.col(c).cast("string")  # noqa: E731 — Java shortest-repr
    rect_wkt = F.concat(
        F.lit("POLYGON (("),
        s("x0"), F.lit(" "), s("y0"), F.lit(", "),
        s("x1"), F.lit(" "), s("y0"), F.lit(", "),
        s("x1"), F.lit(" "), s("y1"), F.lit(", "),
        s("x0"), F.lit(" "), s("y1"), F.lit(", "),
        s("x0"), F.lit(" "), s("y0"), F.lit("))"),
    )
    docs = corpus.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("geometry").alias("kind"),
                rect_wkt.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    r = index(spark, docs, dggs="s2", resolution=_S2PF_RES,
              parent_res=_S2PF_PARENT, cut_threshold_deg2=0, compact=True)
    return r.cells


def _s2_lvl_center_sql(src: str, lvl: int) -> str:
    """doc_id + center lat/lon of each level-``lvl`` face-0 lattice
    cell ``(li, lj)`` in ``src`` — the q51 center chain parameterized
    by level, with the kernel's exact double ops (dggs/s2.py)."""
    import numpy as np

    d = G.dlit
    DEG = d(float(np.degrees(1.0)))
    shift = 30 - lvl
    STEP = d(float(1 << shift))
    HALF = d((1 << (shift - 1)) + 0.5)
    MAXN = d(float(1 << 30))
    one = d(1.0)
    uv = _s2_st_to_uv_sql
    return f"""
SELECT doc_id,
       (asin(least(greatest(vcc / rr, {d(-1.0)}), {one})) * {DEG}) AS clat,
       (atan2(uc, {one}) * {DEG}) AS clon
FROM (SELECT doc_id, uc, vcc, sqrt(({one} + uc * uc) + vcc * vcc) AS rr
      FROM (SELECT doc_id, {uv("sc")} AS uc, {uv("tc")} AS vcc
            FROM (SELECT doc_id,
                         ((cast(li as double) * {STEP} + {HALF}) / {MAXN}) AS sc,
                         ((cast(lj as double) * {STEP} + {HALF}) / {MAXN}) AS tc
                  FROM {src}) __s) __q) __x"""


def _s2_lvl_encode_sql(src: str, lvl: int, pres: int) -> str:
    """One surviving-cell branch: centers of ``src`` re-encoded through
    the proven layered SQL at ``lvl`` (cell) and ``pres`` (parent)."""
    enc_c = G.s2_select_sql(_s2_lvl_center_sql(src, lvl), "clat", "clon", lvl,
                            ["doc_id", "clat", "clon"], dialect="duckdb", out="cell")
    enc_p = G.s2_select_sql(enc_c, "clat", "clon", pres, ["doc_id", "cell"],
                            dialect="duckdb", out="p")
    return f"SELECT doc_id, cell, p FROM ({enc_p}) __e{lvl}"


def _s2_compaction_oracle_sql() -> str:
    """DuckDB restatement of the S2 compaction pipeline (module comment
    above): q51's lattice enumeration over the merge-sized corpus, the
    iterative 4-sibling merge replayed level by level on ``(li // 2,
    lj // 2)`` down to the parent_res floor, then per-level center
    re-encode of every surviving cell."""
    res, pres = _S2PF_RES, _S2PF_PARENT
    ctes, prev = [], f"c{res}"
    for lvl in range(res - 1, pres - 1, -1):
        ctes.append(
            f"g{lvl} AS (SELECT doc_id, li // 2 AS li, lj // 2 AS lj,\n"
            f"                   count(*) AS n FROM {prev} GROUP BY 1, 2, 3)")
        ctes.append(f"m{lvl} AS (SELECT doc_id, li, lj FROM g{lvl} WHERE n = 4)")
        ctes.append(
            f"k{lvl + 1} AS (SELECT a.doc_id, a.li, a.lj FROM {prev} a\n"
            f"       LEFT JOIN m{lvl} m ON m.doc_id = a.doc_id\n"
            f"                         AND m.li = a.li // 2 AND m.lj = a.lj // 2\n"
            f"       WHERE m.li IS NULL)")
        prev = f"m{lvl}"
    branches = [_s2_lvl_encode_sql(f"k{lvl}", lvl, pres)
                for lvl in range(res, pres, -1)]
    branches.append(_s2_lvl_encode_sql(f"m{pres}", pres, pres))
    union = "\nUNION ALL\n".join(branches)
    merge = ",\n".join(ctes)
    return f"""{_s2_enum_ctes(_s2c_rect_corpus_sql())},
c{res} AS (SELECT doc_id, li, lj FROM ins),
{merge}
SELECT cell AS s2_{res:02d}, doc_id, p AS s2_{pres:02d}
FROM ({union}) __u
"""


# --------------------------------------------- A5 polyfill oracle (q52)
# The last polyfill family without an end-to-end oracle (q24 is golden
# only).  Same program as q51/q47: a rect corpus confined to ONE
# quintant of ONE dodecahedron face — face 1, quintant 0, whose
# interior covers lats 8-14°N, lons 39-46°E with barycentric (s, t) in
# [0.17, 0.40] (deeply interior: s+t <= 0.71 < 1).  The aperture-4
# triangle quadtree's centers form a plain lattice in the quintant
# frame — up-triangles at ((i+1/3)/n, (j+1/3)/n), down-triangles at
# ((i+2/3)/n, (j+2/3)/n), n = 2^(res-1) — verified to reproduce the
# kernel's IFS-recursion centroids (dggs/a5.py:cell_to_lonlat) to
# 2e-14° with exact encode round-trip.  The oracle forward-projects
# rect corners to (s, t), enumerates the lattice range (+4 margin;
# phantom out-of-range orientations land outside the rect and filter
# free), inverse-projects centers through the gnomonic frame
# (p = C + x·E1 + y·E2, normalized), keeps centers strictly inside,
# and re-encodes via the PROVEN q34 layered SQL
# (functions/a5sql.py:a5_select_sql).  A5's triangle quadtree is
# spatially nested, so the parent column is an independent re-encode
# at the parent res — no marker-bit math shared with parent_expr.
# Reference parity: a5vectorindexer.py:25 (polygon_to_cells +
# uncompact at a fixed res, center-containment modality).
_A5PF_RES, _A5PF_PARENT, _A5PF_FACE, _A5PF_QUINT = 10, 7, 1, 0


def _a5_rect_corpus_sql(table: str = "events", id_col: str = "event_id") -> str:
    """Axis-aligned rects wholly inside the face-1/quintant-0 window —
    IDENTICAL text in both dialects.  Rect centers span 8.5-13.5°N x
    39.5-45.5°E; 0.2-0.5° wide (res-10 cell ≈ 0.073°: 3-7 across)."""
    lat = f"({G.dlit(8.5)} + ({id_col} % 480) * {G.dlit(0.0104)})"
    lon = f"({G.dlit(39.5)} + (({id_col} * 7) % 480) * {G.dlit(0.0125)})"
    w = f"({G.dlit(0.2)} + ({id_col} % 7) * {G.dlit(0.05)})"
    h = f"({G.dlit(0.2)} + ({id_col} % 5) * {G.dlit(0.06)})"
    return f"""
SELECT doc_id,
       (lon - w * {G.dlit(0.5)}) AS x0, (lat - h * {G.dlit(0.5)}) AS y0,
       (lon + w * {G.dlit(0.5)}) AS x1, (lat + h * {G.dlit(0.5)}) AS y1
FROM (
  SELECT ('A' || cast({id_col} as string)) AS doc_id,
         {lat} AS lat, {lon} AS lon, {w} AS w, {h} AS h
  FROM {table} WHERE {id_col} % 29 = 0) __r
"""


def _q_a5_polyfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q52 — REAL pipeline (A5 polygon polyfill, C17) over the
    quintant-interior SQL-derived rect corpus."""
    from pyspark.sql import functions as F

    from vector2dggs_spark import index

    load_views(spark, sf_dir)
    corpus = spark.sql(_a5_rect_corpus_sql())
    s = lambda c: F.col(c).cast("string")  # noqa: E731 — Java shortest-repr
    rect_wkt = F.concat(
        F.lit("POLYGON (("),
        s("x0"), F.lit(" "), s("y0"), F.lit(", "),
        s("x1"), F.lit(" "), s("y0"), F.lit(", "),
        s("x1"), F.lit(" "), s("y1"), F.lit(", "),
        s("x0"), F.lit(" "), s("y1"), F.lit(", "),
        s("x0"), F.lit(" "), s("y0"), F.lit("))"),
    )
    docs = corpus.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("geometry").alias("kind"),
                rect_wkt.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    r = index(spark, docs, dggs="a5", resolution=_A5PF_RES,
              parent_res=_A5PF_PARENT, cut_threshold_deg2=0)
    return r.cells


def _a5_frame_consts() -> dict:
    """Exact doubles of the face-1/quintant-0 frame (dggs/a5.py)."""
    import numpy as np

    from vector2dggs_spark.dggs import a5 as A

    f0, q0 = _A5PF_FACE, _A5PF_QUINT
    v1x, v1y, v2x, v2y = (float(np.asarray(v).ravel()[0])
                          for v in A._vert_xy(np.array([f0]), np.array([q0])))
    cx, cy, cz = (float(v) for v in A.FACE_XYZ[f0])
    e1x, e1y, e1z = (float(v) for v in A._E1[f0])
    e2x, e2y, e2z = (float(v) for v in A._E2[f0])
    return dict(v1x=v1x, v1y=v1y, v2x=v2x, v2y=v2y, det=v1x * v2y - v2x * v1y,
                cx=cx, cy=cy, cz=cz, e1x=e1x, e1y=e1y, e1z=e1z,
                e2x=e2x, e2y=e2y, e2z=e2z)


def _a5_center_layers(src: str, n: int, carry: list[str]) -> str:
    """``carry`` + (clat, clon) centers of quintant-lattice cells
    ``(li, lj, od)`` at lattice size ``n`` (od 0 = up triangle at
    ((li+1/3)/n, (lj+1/3)/n), od 1 = down at +2/3), via the kernel's
    exact gnomonic chain (dggs/a5.py cell_to_lonlat).  ``src`` must
    provide li, lj, od plus the carry columns.  Layered nested SELECTs
    (cross-engine SQL rule: no lateral alias chains)."""
    import numpy as np

    K = _a5_frame_consts()
    d = G.dlit
    DEG = d(float(np.degrees(1.0)))
    cols = ", ".join(carry)
    oo = f"(CASE WHEN od = 1 THEN {d(2.0 / 3.0)} ELSE {d(1.0 / 3.0)} END)"
    return f"""
SELECT {cols},
       (asin(least(greatest(p2 / pn, {d(-1.0)}), {d(1.0)})) * {DEG}) AS clat,
       (atan2(p1 / pn, p0 / pn) * {DEG}) AS clon
FROM (SELECT {cols}, p0, p1, p2,
             sqrt((p0 * p0 + p1 * p1) + p2 * p2) AS pn
      FROM (SELECT {cols},
                   (({d(K['cx'])} + gx * {d(K['e1x'])}) + gy * {d(K['e2x'])}) AS p0,
                   (({d(K['cy'])} + gx * {d(K['e1y'])}) + gy * {d(K['e2y'])}) AS p1,
                   (({d(K['cz'])} + gx * {d(K['e1z'])}) + gy * {d(K['e2z'])}) AS p2
            FROM (SELECT {cols},
                         (sc * {d(K['v1x'])} + tc * {d(K['v2x'])}) AS gx,
                         (sc * {d(K['v1y'])} + tc * {d(K['v2y'])}) AS gy
                  FROM (SELECT {cols},
                               ((cast(li as double) + {oo}) / {d(float(n))}) AS sc,
                               ((cast(lj as double) + {oo}) / {d(float(n))}) AS tc
                        FROM {src}) __b) __g) __p) __n"""


def _a5_enum_ctes(corpus_sql: str, res: int) -> str:
    """The q52 lattice enumeration as reusable WITH-clauses ending in
    ``ins`` = (doc_id, li, lj, od, clat, clon) — the quintant-lattice
    cells at ``res`` whose centers lie strictly inside each rect.
    Margin +4 on the corner-projected (i, j) ranges; phantom
    orientations land outside the rect and filter free."""
    import numpy as np

    K = _a5_frame_consts()
    n = 1 << (res - 1)
    d = G.dlit
    RAD = d(np.pi / 180.0)

    def fwd_st(xc: str, yc: str) -> tuple[str, str]:
        """Corner (lon=xc, lat=yc, degrees) -> fractional (s, t) in the
        quintant frame (the kernel's lonlat_to_cell projection ops)."""
        phi, lam = f"(({yc}) * {RAD})", f"(({xc}) * {RAD})"
        px = f"(cos({phi}) * cos({lam}))"
        py = f"(cos({phi}) * sin({lam}))"
        pz = f"sin({phi})"
        dot = (f"((({px} * {d(K['cx'])}) + ({py} * {d(K['cy'])}))"
               f" + ({pz} * {d(K['cz'])}))")
        x = (f"((({px} * {d(K['e1x'])}) + ({py} * {d(K['e1y'])})"
             f" + ({pz} * {d(K['e1z'])})) / {dot})")
        y = (f"((({px} * {d(K['e2x'])}) + ({py} * {d(K['e2y'])})"
             f" + ({pz} * {d(K['e2z'])})) / {dot})")
        s = f"((({x}) * {d(K['v2y'])} - {d(K['v2x'])} * ({y})) / {d(K['det'])})"
        t = f"(({d(K['v1x'])} * ({y}) - ({x}) * {d(K['v1y'])}) / {d(K['det'])})"
        return s, t

    Ss, Ts = zip(*[fwd_st(cxn, cyn) for cxn, cyn in
                   (("x0", "y0"), ("x1", "y0"), ("x1", "y1"), ("x0", "y1"))])
    rng = lambda es: (f"cast(floor(least({', '.join(es)}) * {d(float(n))}) as bigint) - 4",  # noqa: E731
                      f"cast(ceil(greatest({', '.join(es)}) * {d(float(n))}) as bigint) + 4")
    imin, imax = rng(Ss)
    jmin, jmax = rng(Ts)
    carry = ["doc_id", "x0", "y0", "x1", "y1", "li", "lj", "od"]
    ctr = _a5_center_layers("cand", n, carry)
    return f"""
WITH rect AS ({corpus_sql}),
rng AS (SELECT doc_id, x0, y0, x1, y1,
               {imin} AS imin, {imax} AS imax,
               {jmin} AS jmin, {jmax} AS jmax
        FROM rect),
li AS (SELECT doc_id, x0, y0, x1, y1, jmin, jmax,
              unnest(generate_series(imin, imax)) AS li FROM rng),
lj AS (SELECT doc_id, x0, y0, x1, y1, li,
              unnest(generate_series(jmin, jmax)) AS lj FROM li),
cand AS (SELECT doc_id, x0, y0, x1, y1, li, lj, od
         FROM lj, (VALUES (0), (1)) __o(od)),
ctr AS ({ctr}),
ins AS (SELECT doc_id, li, lj, od, clat, clon FROM ctr
        WHERE clon > x0 AND clon < x1 AND clat > y0 AND clat < y1)"""


def _a5_polyfill_oracle_sql() -> str:
    """DuckDB restatement of the A5 polyfill (module comment above)."""
    from vector2dggs_spark.functions.a5sql import a5_select_sql

    res, pres = _A5PF_RES, _A5PF_PARENT
    enc10 = a5_select_sql("SELECT doc_id, clat, clon FROM ins",
                          "clat", "clon", res, ["doc_id", "clat", "clon"],
                          out="cell")
    enc7 = a5_select_sql(enc10, "clat", "clon", pres, ["doc_id", "cell"],
                         out="p")
    return f"""{_a5_enum_ctes(_a5_rect_corpus_sql(), res)}
SELECT cell AS a5_{res:02d}, doc_id, p AS a5_{pres:02d}
FROM ({enc7}) __f
"""


# ------------------------------------------ A5 compaction oracle (q60)
# A2/A3 pinned on the FIFTH sibling arity/geometry: the aperture-4
# triangle quadtree merges complete 4-sets.  Like q59 the merge is
# replayed in LATTICE space.  In the quintant frame a cell is
# (li, lj, od): od 0 = "up" triangle anchored at (li/n, lj/n), od 1 =
# "down" triangle point-reflected about ((li+1)/n, (lj+1)/n) — the
# kernel's d=0 digit applies (s,t) -> (1-s, 1-t), a 180° rotation, so
# orientation (not mirroring) is the only frame state.  Composing the
# four inverse digit maps one level gives the parent rule
#     parent = (li // 2, lj // 2),
#     parent od = 1  iff  (li % 2) + (lj % 2) + od >= 2
# (children of up(I,J): up(2I,2J), up(2I+1,2J), up(2I,2J+1),
# down(2I,2J); of down(I,J): down(2I+1,2J), down(2I,2J+1),
# down(2I+1,2J+1), up(2I+1,2J+1)) — verified against the kernel's
# cell_to_parent bit op on 575 random cells across res 10/9/8.
# Surviving cells at each level are re-encoded from their centers
# through the PROVEN q34/q52 layered SQL at that level and at the
# parent level; the resolution floor needs no special case (merge
# simply stops at parent_res, the q59 argument).
# Reference parity: vectorindexer.py:124-196 (compaction_common) on
# the A5 indexer's fixed-res covering (a5vectorindexer.py:25).
def _a5c_rect_corpus_sql(table: str = "events", id_col: str = "event_id") -> str:
    """Merge-sized rects inside the q52 face-1/quintant-0 window: small
    rects 0.30-0.60° complete res-9 (0.146°) and res-8 (0.29°) sibling
    sets; every ~377th 'big' rect is 1.3°, containing full res-7
    footprints (0.58°) — absorbed exactly by the floor argument.
    Corners stay within 8.65-13.45°N x 39.65-45.55°E, interior to
    q52's proven 8.25-13.75 x 39.25-45.75 envelope."""
    lat = f"({G.dlit(9.3)} + ({id_col} % 480) * {G.dlit(0.0073)})"
    lon = f"({G.dlit(40.3)} + (({id_col} * 7) % 480) * {G.dlit(0.0096)})"
    big = f"{id_col} % 377 = 0"
    w = f"(CASE WHEN {big} THEN {G.dlit(1.3)} ELSE {G.dlit(0.3)} + ({id_col} % 7) * {G.dlit(0.05)} END)"
    h = f"(CASE WHEN {big} THEN {G.dlit(1.3)} ELSE {G.dlit(0.3)} + ({id_col} % 5) * {G.dlit(0.06)} END)"
    return f"""
SELECT doc_id,
       (lon - w * {G.dlit(0.5)}) AS x0, (lat - h * {G.dlit(0.5)}) AS y0,
       (lon + w * {G.dlit(0.5)}) AS x1, (lat + h * {G.dlit(0.5)}) AS y1
FROM (
  SELECT ('V' || cast({id_col} as string)) AS doc_id,
         {lat} AS lat, {lon} AS lon, {w} AS w, {h} AS h
  FROM {table} WHERE {id_col} % 19 = 0) __r
"""


def _q_a5_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q60 — REAL pipeline (A5 polyfill + 4-sibling compaction) over
    the merge-sized quintant-interior rect corpus."""
    from pyspark.sql import functions as F

    from vector2dggs_spark import index

    load_views(spark, sf_dir)
    corpus = spark.sql(_a5c_rect_corpus_sql())
    s = lambda c: F.col(c).cast("string")  # noqa: E731 — Java shortest-repr
    rect_wkt = F.concat(
        F.lit("POLYGON (("),
        s("x0"), F.lit(" "), s("y0"), F.lit(", "),
        s("x1"), F.lit(" "), s("y0"), F.lit(", "),
        s("x1"), F.lit(" "), s("y1"), F.lit(", "),
        s("x0"), F.lit(" "), s("y1"), F.lit(", "),
        s("x0"), F.lit(" "), s("y0"), F.lit("))"),
    )
    docs = corpus.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("geometry").alias("kind"),
                rect_wkt.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    r = index(spark, docs, dggs="a5", resolution=_A5PF_RES,
              parent_res=_A5PF_PARENT, cut_threshold_deg2=0, compact=True)
    return r.cells


def _a5_lvl_encode_sql(src: str, lvl: int, pres: int) -> str:
    """One surviving-cell branch: centers of the (li, lj, od) cells in
    ``src`` at level ``lvl``, re-encoded through the proven layered SQL
    at ``lvl`` (cell) and ``pres`` (parent — A5's triangle quadtree is
    spatially nested, so the ancestor is a second encode)."""
    from vector2dggs_spark.functions.a5sql import a5_select_sql

    ctr = _a5_center_layers(f"(SELECT doc_id, li, lj, od FROM {src}) __s{lvl}",
                            1 << (lvl - 1), ["doc_id"])
    enc_c = a5_select_sql(ctr, "clat", "clon", lvl,
                          ["doc_id", "clat", "clon"], out="cell")
    enc_p = a5_select_sql(enc_c, "clat", "clon", pres, ["doc_id", "cell"],
                          out="p")
    return f"SELECT doc_id, cell, p FROM ({enc_p}) __e{lvl}"


def _a5_compaction_oracle_sql() -> str:
    """DuckDB restatement of the A5 compaction pipeline (module comment
    above): q52's lattice enumeration over the merge-sized corpus, the
    iterative 4-sibling merge replayed level by level with the
    orientation-aware parent rule, then per-level center re-encode of
    every surviving cell."""
    res, pres = _A5PF_RES, _A5PF_PARENT
    po = lambda t: (f"(CASE WHEN (({t}li % 2) + ({t}lj % 2)) + {t}od >= 2"  # noqa: E731
                    f" THEN 1 ELSE 0 END)")
    ctes, prev = [], f"c{res}"
    for lvl in range(res - 1, pres - 1, -1):
        ctes.append(
            f"g{lvl} AS (SELECT doc_id, li // 2 AS pi, lj // 2 AS pj,\n"
            f"                   {po('')} AS po, count(*) AS n\n"
            f"            FROM {prev} GROUP BY 1, 2, 3, 4)")
        ctes.append(f"m{lvl} AS (SELECT doc_id, pi AS li, pj AS lj, po AS od\n"
                    f"            FROM g{lvl} WHERE n = 4)")
        ctes.append(
            f"k{lvl + 1} AS (SELECT a.doc_id, a.li, a.lj, a.od FROM {prev} a\n"
            f"       LEFT JOIN m{lvl} m ON m.doc_id = a.doc_id\n"
            f"                         AND m.li = a.li // 2 AND m.lj = a.lj // 2\n"
            f"                         AND m.od = {po('a.')}\n"
            f"       WHERE m.li IS NULL)")
        prev = f"m{lvl}"
    branches = [_a5_lvl_encode_sql(f"k{lvl}", lvl, pres)
                for lvl in range(res, pres, -1)]
    branches.append(_a5_lvl_encode_sql(f"m{pres}", pres, pres))
    union = "\nUNION ALL\n".join(branches)
    merge = ",\n".join(ctes)
    return f"""{_a5_enum_ctes(_a5c_rect_corpus_sql(), res)},
c{res} AS (SELECT doc_id, li, lj, od FROM ins),
{merge}
SELECT cell AS a5_{res:02d}, doc_id, p AS a5_{pres:02d}
FROM ({union}) __u
"""


def _line_dedup_sql(dialect: str, k: int = 8) -> str:
    """q56 — exact-duplicate SEGMENT REMOVAL, the *apply* step the
    dedup family lacked (q49 computes the Lee-et-al duplication signal;
    CCNet/RefinedWeb-style pipelines then CUT corpus-duplicated
    paragraphs out of the text).  The corpus has no newlines, so the
    deterministic segmenter is non-overlapping ``k``-word blocks (the
    last block may be shorter).  A block is removed iff its verbatim
    content occurs in >= 2 DISTINCT documents; the cleaned document is
    the surviving blocks rejoined in order.  All partial-aggregating
    groupBys and equi-joins — no windows, no skew key, and the
    doc-frequency shuffle moves 32-char md5 keys, never the segment
    text (the 100-TB shape); the cleaned text is returned as md5 +
    length (driver canonicalizer needs scalars)."""
    if dialect == "spark":
        base = (f"SELECT doc_id, toks, explode(sequence(1, size(toks), {k})) AS i"
                " FROM (SELECT doc_id, split(text, ' ') AS toks FROM documents) __t")
        seg = f"concat_ws(' ', slice(toks, i, {k}))"
        rebuild = ("array_join(transform(array_sort(collect_list(struct(i, seg)))"
                   ", s -> s.seg), ' ')")
    else:
        base = (f"SELECT doc_id, toks, unnest(generate_series(1, len(toks), {k})) AS i"
                " FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) __t")
        seg = f"array_to_string(toks[i:i + {k - 1}], ' ')"
        rebuild = "string_agg(seg, ' ' ORDER BY i)"
    return f"""
WITH s AS (SELECT doc_id, i, seg, md5(seg) AS sh
           FROM (SELECT doc_id, i, {seg} AS seg FROM ({base}) __b) __s),
g AS (SELECT sh, count(DISTINCT doc_id) AS nd FROM s GROUP BY sh),
j AS (SELECT s.doc_id, s.i, s.seg, g.nd FROM s JOIN g ON s.sh = g.sh),
cnt AS (SELECT doc_id,
               cast(count(*) as bigint) AS n_segments,
               cast(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) as bigint) AS n_removed
        FROM j GROUP BY doc_id),
cln AS (SELECT doc_id, {rebuild} AS cleaned
        FROM j WHERE nd < 2 GROUP BY doc_id)
SELECT d.doc_id, c.n_segments, c.n_removed,
       md5(coalesce(cl.cleaned, '')) AS cleaned_md5,
       cast(length(coalesce(cl.cleaned, '')) as bigint) AS cleaned_len
FROM (SELECT doc_id FROM documents) d
JOIN cnt c ON d.doc_id = c.doc_id
LEFT JOIN cln cl ON d.doc_id = cl.doc_id
"""


Q56 = _dialects(_line_dedup_sql("spark"), _line_dedup_sql("duckdb"))


def _seq_packing_sql(dialect: str, budget: int = 512, shards: int = 8) -> str:
    """q57 — deterministic sequence packing: the GPT-style
    concatenate-and-chunk layout step of a training pipeline.  Docs are
    hash-sharded (content-independent md5 bucket, q45's reproducible
    primitive — no rand()), deterministically ordered within the shard,
    and laid head-to-tail; each doc reports its token offsets and the
    fixed-``budget`` sequence window(s) it lands in.  The only
    non-map-side op is a running sum windowed BY SHARD — shard count
    grows with data so the per-partition state stays bounded at 100 TB
    (never a global-order window)."""
    if dialect == "spark":
        ntok = "size(split(text, ' '))"
        shard = f"cast(conv(substring(md5(cast(doc_id as string)), 1, 12), 16, 10) % {shards} as int)"
        okey = "substring(md5(cast(doc_id as string)), 13, 16)"
    else:
        ntok = "len(string_split(text, ' '))"
        shard = f"cast(('0x' || substring(md5(cast(doc_id as varchar)), 1, 12))::BIGINT % {shards} as int)"
        okey = "substring(md5(cast(doc_id as varchar)), 13, 16)"
    return f"""
WITH t AS (SELECT doc_id, cast({ntok} as bigint) AS n_toks,
                  {shard} AS shard, {okey} AS okey
           FROM documents),
c AS (SELECT doc_id, shard, n_toks,
             sum(n_toks) OVER (PARTITION BY shard ORDER BY okey, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t)
SELECT doc_id, shard, n_toks,
       cast(cum - n_toks as bigint) AS start_off,
       cast(cum - 1 as bigint) AS end_off,
       cast(floor(cast(cum - n_toks as double) / {G.dlit(float(budget))}) as bigint) AS first_seq,
       cast(floor(cast(cum - 1 as double) / {G.dlit(float(budget))}) as bigint) AS last_seq
FROM c
"""


Q57 = _dialects(_seq_packing_sql("spark"), _seq_packing_sql("duckdb"))


def _decontamination_sql(dialect: str, k: int = 8) -> str:
    """q58 — benchmark decontamination: flag training documents that
    share any verbatim ``k``-word window with the held-out eval split
    (the GPT-3-appendix / FineWeb n-gram overlap rule).  The eval split
    is the deterministic doc_id % 50 = 0 subset; overlap is an
    equi-join of train window hashes against the DISTINCT eval window
    set — the broadcast-able small side of a real decontamination run
    (eval suites are tiny next to the corpus)."""
    if dialect == "spark":
        toks = "split(text, ' ')"
        sz = "size(toks)"
        wins = (f"transform(sequence(1, cast(size(toks) as int) - {k - 1}),"
                f" i -> md5(concat_ws(' ', slice(toks, i, {k}))))")
        expl = "explode(wins)"
    else:
        toks = "string_split(text, ' ')"
        sz = "len(toks)"
        wins = (f"list_transform(generate_series(1, len(toks) - {k - 1}),"
                f" i -> md5(array_to_string(toks[i:i + {k - 1}], ' ')))")
        expl = "unnest(wins)"
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
w AS (SELECT doc_id, {expl} AS wh
      FROM (SELECT doc_id, {wins} AS wins FROM t WHERE {sz} >= {k}) __w),
ev AS (SELECT DISTINCT wh FROM w WHERE doc_id % 50 = 0),
tr AS (SELECT doc_id, wh FROM w WHERE doc_id % 50 <> 0),
d AS (SELECT tr.doc_id,
             cast(count(*) as bigint) AS n_windows,
             cast(sum(CASE WHEN ev.wh IS NOT NULL THEN 1 ELSE 0 END) as bigint)
               AS hit_windows
      FROM tr LEFT JOIN ev ON tr.wh = ev.wh
      GROUP BY tr.doc_id)
SELECT doc_id, n_windows, hit_windows,
       cast(CASE WHEN hit_windows > 0 THEN 1 ELSE 0 END as int) AS contaminated
FROM d
"""


Q58 = _dialects(_decontamination_sql("spark"), _decontamination_sql("duckdb"))


# ------------------------------- dense-sample linetrace oracles (q53-q55)
# C6/C10/C18's linetrace is dense sampling at quarter-cell spacing +
# per-doc dedup (dggs/{s2,a5,rhp}.py:linetrace; reference
# line_string_to_cells role).  np.linspace(0,1,n+1)[1:] is exactly
# [k·(1/n) for k<n] + [1.0] (verified bit-for-bit), and every sample
# coordinate is a + t·(b−a) in plain left-assoc double ops — so the
# ENTIRE sampling schedule is replicable in SQL, and each sample
# re-encodes through the backend's proven layered point SQL (q30/q31/
# q34).  Cells are nested under parents for all three backends, so the
# parent column is an independent second encode at the parent res.
# The q40 line corpus is reused (0.05-0.3° two-segment polylines, no
# antimeridian crossing).  H3's linetrace (C2) is a grid_path_cells
# walk, not dense sampling — it keeps its pytest/golden pinning.
_DSL = {"s2": (12, 8), "a5": (10, 7), "rhp": (6, 3)}


def _q_linetrace_backend(spark: SparkSession, sf_dir: str, dggs: str) -> DataFrame:
    """q53/q54/q55 — REAL pipeline over the q40 polyline corpus with
    the dense-sample backends."""
    from pyspark.sql import functions as F

    from vector2dggs_spark import index

    res, pres = _DSL[dggs]
    load_views(spark, sf_dir)
    corpus = spark.sql(_line_corpus_sql())
    s = lambda c: F.col(c).cast("string")  # noqa: E731 — Java shortest-repr
    wkt = F.concat(
        F.lit("LINESTRING ("),
        s("ax"), F.lit(" "), s("ay"), F.lit(", "),
        s("bx"), F.lit(" "), s("by"), F.lit(", "),
        s("cx"), F.lit(" "), s("cy"), F.lit(")"),
    )
    docs = corpus.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("geometry").alias("kind"),
                wkt.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    r = index(spark, docs, dggs=dggs, resolution=res, parent_res=pres,
              cut_threshold_deg2=0)
    return r.cells


def _dense_sample_ctes(step: float, seg_start: bool) -> str:
    """WITH-chain producing ``pts(doc_id, sx, sy)`` — the exact sample
    schedule of the dense-sample linetrace kernels.  ``seg_start``:
    rHP's _densify emits every segment's start vertex; s2/a5 emit only
    the polyline's first vertex."""
    one = G.dlit(1.0)
    st = G.dlit(step)
    starts = ("SELECT doc_id, px AS sx, py AS sy FROM segs" if seg_start
              else "SELECT doc_id, ax AS sx, ay AS sy FROM lines")
    return f"""
WITH lines AS ({_line_corpus_sql()}),
segs AS (
  SELECT doc_id, ax AS px, ay AS py, bx AS qx, by AS qy FROM lines
  UNION ALL
  SELECT doc_id, bx, by, cx, cy FROM lines),
sn AS (SELECT doc_id, px, py, qx, qy,
              greatest(cast(ceil(greatest(abs(qx - px), abs(qy - py)) / {st}) as bigint), 1) AS n
       FROM segs),
sk AS (SELECT doc_id, px, py, qx, qy, n,
              unnest(generate_series(1, n)) AS k FROM sn),
stt AS (SELECT doc_id, px, py, qx, qy,
               (CASE WHEN k = n THEN {one}
                     ELSE cast(k as double) * ({one} / cast(n as double)) END) AS tt
        FROM sk),
pts AS (SELECT doc_id, (px + tt * (qx - px)) AS sx, (py + tt * (qy - py)) AS sy
        FROM stt
        UNION ALL
        {starts})"""


def _dense_linetrace_oracle_sql(dggs: str) -> str:
    """DuckDB restatement: replayed sample schedule -> two layered
    point encodes (cell res + parent res) -> per-doc DISTINCT."""
    from vector2dggs_spark.dggs import a5 as A
    from vector2dggs_spark.dggs import rhp as R
    from vector2dggs_spark.dggs import s2 as S
    from vector2dggs_spark.functions.a5sql import a5_select_sql

    res, pres = _DSL[dggs]
    if dggs == "s2":
        step = S.cell_width_deg(res) / 4.0
        enc = lambda src, r, keep, out: G.s2_select_sql(  # noqa: E731
            src, "sy", "sx", r, keep, dialect="duckdb", out=out)
        seg_start = False
    elif dggs == "a5":
        step = A.cell_width_deg(res) / 4.0
        enc = lambda src, r, keep, out: a5_select_sql(  # noqa: E731
            src, "sy", "sx", r, keep, out=out)
        seg_start = False
    else:
        step = R.cell_width_deg(res) / 4.0
        enc = lambda src, r, keep, out: G.rhp_select_sql(  # noqa: E731
            src, "sy", "sx", r, keep, out=out)
        seg_start = True
    enc1 = enc("SELECT doc_id, sx, sy FROM pts", res, ["doc_id", "sx", "sy"], "cell")
    enc2 = enc(enc1, pres, ["doc_id", "cell"], "p")
    return f"""{_dense_sample_ctes(step, seg_start)}
SELECT DISTINCT cell AS {dggs}_{res:02d}, doc_id, p AS {dggs}_{pres:02d}
FROM ({enc2}) __f
"""


def _mixture_rebalance_sql(dialect: str, buckets: int = 64) -> str:
    """q66 — exact-quota mixture rebalancing (the apply step of
    DoReMi / The-Pile-style domain weighting): given per-source target
    weights, keep EXACTLY quota_s documents from each source, chosen by
    a deterministic content-independent hash order (retries, engines
    and re-runs agree; no rand()).

    Quotas are pure integer math: quota_s = min(count_s,
    (w_s * (N div 2)) div sum(w)) — the target corpus is half the
    input, apportioned by weight.  Weights here derive from the source
    id (w = id % 4 + 1) to keep the query self-contained; a real run
    would join a tiny literal weight table (broadcast).

    Scale design: exact selection needs a per-source rank, and a
    row_number over PARTITION BY source is the q42 mega-partition
    anti-pattern (a 100-TB corpus has billions of docs per source).
    Two-level rank instead: bucket = TOP bits of the 48-bit order hash
    (so buckets are contiguous runs of the order), rank within
    (source, bucket) windows over N_s/buckets rows, and the global rank
    adds the windowed cumulative count of earlier buckets (a
    buckets-per-source-sized frame).  ``buckets`` scales with the data;
    no window partition ever holds a whole source."""
    # ADVICE r05: derive the shift from ``buckets`` (power of two) —
    # the r05 text hardcoded 48-6, silently giving every caller 64
    # buckets.  Default 64 produces byte-identical SQL to r05 (shift
    # 42), so the frozen q66 oracle text is unchanged.
    if buckets < 2 or (buckets & (buckets - 1)) != 0:
        raise ValueError(f"buckets must be a power of two >= 2, got {buckets}")
    shift = 48 - buckets.bit_length() + 1
    if dialect == "spark":
        h48 = "cast(conv(substring(md5(cast(doc_id as string)), 1, 12), 16, 10) as bigint)"
        bkt = f"cast(shiftright(h48, {shift}) as int)"
        idiv = "DIV"
    else:
        h48 = "('0x' || substring(md5(cast(doc_id as varchar)), 1, 12))::BIGINT"
        bkt = f"cast(h48 >> {shift} as int)"
        idiv = "//"
    return f"""
WITH h AS (SELECT doc_id, source, {h48} AS h48 FROM documents),
b AS (SELECT doc_id, source, h48, {bkt} AS bkt FROM h),
bc AS (SELECT source, bkt, count(*) AS c FROM b GROUP BY source, bkt),
off AS (SELECT source, bkt,
               coalesce(sum(c) OVER (PARTITION BY source ORDER BY bkt
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
        FROM bc),
rk AS (SELECT doc_id, source, bkt,
              row_number() OVER (PARTITION BY source, bkt
                                 ORDER BY h48, doc_id) AS rb
       FROM b),
tot AS (SELECT count(*) AS n FROM documents),
w AS (SELECT source, count(*) AS cnt,
             (cast(substring(source, 4) as int) % 4) + 1 AS wt
      FROM documents GROUP BY source),
sw AS (SELECT sum(wt) AS sumw FROM w),
q AS (SELECT w.source,
             least(w.cnt, (w.wt * (tot.n {idiv} 2)) {idiv} sw.sumw) AS quota
      FROM w CROSS JOIN sw CROSS JOIN tot),
g AS (SELECT rk.doc_id, rk.source, off.o + rk.rb AS grank
      FROM rk JOIN off ON rk.source = off.source AND rk.bkt = off.bkt)
SELECT g.doc_id, g.source, cast(g.grank as bigint) AS grank,
       cast(q.quota as bigint) AS quota,
       cast(CASE WHEN g.grank <= q.quota THEN 1 ELSE 0 END as int) AS kept
FROM g JOIN q ON g.source = q.source
"""


Q66 = _dialects(_mixture_rebalance_sql("spark"), _mixture_rebalance_sql("duckdb"))


def _delta_dedup_sql(dialect: str) -> str:
    """q67 — cross-corpus delta dedup: dedup an INCOMING batch against
    an EXISTING corpus (the CCNet / FineWeb "dedup against previous
    dumps" step — within-corpus q39 dedup does not cover it: here
    existing docs are immutable and only incoming docs can be dropped).

    Incoming = sources src0-src3; existing = everything else.  Verdicts
    per incoming doc: 'exact' (full-text md5 present in the existing
    corpus), else 'near' (shares a banded MinHash bucket with any
    existing doc — the q12/q39 signature machinery reused verbatim),
    else 'keep'.  Docs under 3 tokens have no signature and can only be
    exact-dropped, as in q39.

    The synthetic corpus has no FULL-TEXT duplicates (its planted dups
    are segment-level), so the exact tier is exercised structurally
    here and pinned by a constructed-corpus pytest
    (test_entry_contract.py::test_delta_dedup_exact_tier).

    Scale shape: both tiers are equi-joins against DISTINCT projections
    of the existing corpus (hash set / band set); the incoming batch is
    the small side of every join and broadcasts.  Nothing rescans or
    rewrites the existing corpus."""
    base = _minhash_bands_cte(dialect)
    inc_pred = "source IN ('src0', 'src1', 'src2', 'src3')"
    return f"""{base},
inc AS (SELECT doc_id FROM documents WHERE {inc_pred}),
ex AS (SELECT doc_id FROM documents WHERE NOT ({inc_pred})),
hx AS (SELECT doc_id, md5(text) AS hh FROM documents),
ehash AS (SELECT DISTINCT hx.hh FROM hx JOIN ex ON hx.doc_id = ex.doc_id),
exacts AS (SELECT DISTINCT hx.doc_id FROM hx
           JOIN inc ON hx.doc_id = inc.doc_id
           JOIN ehash ON hx.hh = ehash.hh),
eband AS (SELECT DISTINCT b.band, b.bv FROM b JOIN ex ON b.doc_id = ex.doc_id),
nears AS (SELECT DISTINCT b.doc_id FROM b
          JOIN inc ON b.doc_id = inc.doc_id
          JOIN eband ON b.band = eband.band AND b.bv = eband.bv)
SELECT inc.doc_id,
       CASE WHEN x.doc_id IS NOT NULL THEN 'exact'
            WHEN n.doc_id IS NOT NULL THEN 'near'
            ELSE 'keep' END AS verdict
FROM inc
LEFT JOIN exacts x ON inc.doc_id = x.doc_id
LEFT JOIN nears n ON inc.doc_id = n.doc_id
"""


Q67 = _dialects(_delta_dedup_sql("spark"), _delta_dedup_sql("duckdb"))


def _bpe_corpus_cte() -> str:
    """The q62 mixed-character corpus (emails, phones, '#'-names) —
    the documents table is pure ``[a-z ]`` so a sub-word tokenizer
    would degenerate to whitespace counts there."""
    phone = ("(cast((20 + (c_custkey % 80)) as string) || '-' || "
             "cast((100 + (c_custkey % 900)) as string) || '-' || "
             "cast((100 + ((c_custkey * 7) % 900)) as string) || '-' || "
             "cast((1000 + ((c_custkey * 13) % 9000)) as string))")
    return f"""
src AS (
  SELECT c_custkey AS doc_id,
         ('segment ' || c_mktsegment ||
          (CASE WHEN c_custkey % 4 <= 1
                THEN ' email ' || lower(replace(c_name, '#', '.')) ||
                     '@corp-' || cast(c_nationkey as string) || '.example.com'
                ELSE '' END) ||
          (CASE WHEN c_custkey % 4 = 0 OR c_custkey % 4 = 2
                THEN ' tel ' || {phone}
                ELSE '' END) ||
          ' account ' || c_name) AS text
  FROM customer)"""


def _bpe_token_count_sql(dialect: str) -> str:
    """q68 — BPE-ish regex token counting (SURVEY's 'token counting:
    whitespace + a BPE-ish regex'): the GPT-2-family pre-tokenizer
    shape — leading-space letter runs, digit runs, punctuation runs —
    restricted to the ASCII classes both regex engines (Java / RE2)
    treat identically.  Emits whitespace vs sub-word counts per doc
    plus the class breakdown and a chars-per-token ratio (the cheap
    tokenizer-cost estimator pipelines budget with).

    Scale: pure projection over one regexp pass — zero shuffles."""
    full = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"
    sz = "size" if dialect == "spark" else "len"
    n = lambda pat: f"{sz}(regexp_extract_all(text, '{pat}', 0))"  # noqa: E731
    return f"""
WITH {_bpe_corpus_cte()},
c AS (SELECT doc_id,
             {sz}(split(text, ' ')) AS n_ws,
             {n(full)} AS n_bpe,
             {n('[a-zA-Z]+')} AS n_word,
             {n('[0-9]+')} AS n_num,
             {n('[^a-zA-Z0-9 ]+')} AS n_punct,
             length(text) AS n_chars
      FROM src)
SELECT doc_id, cast(n_ws as bigint) AS n_ws, cast(n_bpe as bigint) AS n_bpe,
       cast(n_word as bigint) AS n_word, cast(n_num as bigint) AS n_num,
       cast(n_punct as bigint) AS n_punct,
       round(cast(n_chars as double) / n_bpe, 6) AS chars_per_tok
FROM c
"""


Q68 = _dialects(_bpe_token_count_sql("spark"), _bpe_token_count_sql("duckdb"))


# --------------------------------------------- polygon-polygon join (q69)
def _rect_layer_sql(residue: int, dx: float, mod: int = 3) -> str:
    """An axis-aligned rect layer derived from events (engine-wide
    pinned-double technique): rows with event_id % 3 == residue,
    centers on the standard test lattice shifted by ``dx`` degrees so
    the two layers genuinely interleave, sizes varying 0.002-0.014 deg.
    IDENTICAL text in both dialects."""
    _D = G.dlit
    lat = f"({_D(-44.4)} + (event_id % 700) * {_D(0.001)})"
    lon = f"({_D(-176.6)} + ((event_id * 7) % 400) * {_D(0.001)} + {_D(dx)})"
    w = f"({_D(0.002)} + (event_id % 7) * {_D(0.002)})"
    h = f"({_D(0.002)} + (event_id % 5) * {_D(0.0025)})"
    return f"""
SELECT ('r' || cast(event_id as string)) AS rid,
       (lon - w * {_D(0.5)}) AS x0, (lat - h * {_D(0.5)}) AS y0,
       (lon + w * {_D(0.5)}) AS x1, (lat + h * {_D(0.5)}) AS y1
FROM (SELECT event_id, {lat} AS lat, {lon} AS lon, {w} AS w, {h} AS h
      FROM events WHERE event_id % {mod} = {residue}) __r
"""


def _q_rect_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q69 engine side: operators.joins.rect_join — native packed-key
    covers on both layers at geohash res 7, cell equi-join, exact
    overlap refine (docstring there has the scale analysis)."""
    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.joins import rect_join

    load_views(spark, sf_dir)
    a = spark.sql(_rect_layer_sql(0, 0.0)).withColumnRenamed("rid", "id_a")
    b = spark.sql(_rect_layer_sql(1, 0.0007)).withColumnRenamed("rid", "id_b")
    return rect_join(a, b, get_backend("geohash"), res=7)


_RECT_JOIN_ORACLE = f"""
WITH a AS ({_rect_layer_sql(0, 0.0)}), b AS ({_rect_layer_sql(1, 0.0007)})
SELECT a.rid AS id_a, b.rid AS id_b
FROM a JOIN b
  ON a.x0 <= b.x1 AND b.x0 <= a.x1 AND a.y0 <= b.y1 AND b.y0 <= a.y1
"""


# ------------------------------------------- trajectory sessionization (q70)
_GAP_US = 21_600_000_000  # 6 h — the trip-boundary gap
_TRIP_ROUND = 9  # leg rounding digits (engine-wide decimal-sum device)


def _pings_sql(dialect: str) -> str:
    """Per-user GPS pings: events' REAL (user_id, ts) stream + the
    engine-standard derived lattice coordinates.  Time as exact integer
    microseconds — the fixtures carry sub-second TIMESTAMP_NTZ, so
    second-truncating epoch functions would diverge between engines and
    session-timezone-dependent ones (``unix_micros(cast(...))``) would
    shift by the driver's TZ; ``timestampdiff`` from the NTZ epoch is
    timezone-free and matches DuckDB's ``epoch_us`` bit-for-bit."""
    ep = ("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
          if dialect == "spark" else "epoch_us(ts)")
    _D = G.dlit
    lat = f"({_D(-44.4)} + (event_id % 700) * {_D(0.001)})"
    lon = f"({_D(-176.6)} + ((event_id * 7) % 400) * {_D(0.001)})"
    return (f"SELECT user_id, event_id AS ping_id, {ep} AS t_us, "
            f"{lat} AS lat, {lon} AS lon FROM events")


def _trip_sessionize_sql(dialect: str) -> str:
    """q70 — gap-based trajectory sessionization (trip segmentation)
    with per-trip stats and an origin/destination cell pair: the
    canonical distributed telemetry shape (lag → boundary flag →
    running-sum trip id → group).  All windows partition by user_id —
    bounded by one device's ping history, never corpus-scale (the q42
    mega-partition lesson).  Trip distance sums legs through exact
    DECIMAL(18,9) after a 1e-9 round (float group-sums are not
    order-associative across engines — the q46 device); legs use the
    planar degree metric (arithmetic + IEEE-exact sqrt, bit-identical
    cross-engine).  O/D cells ride the proven staged geohash encode.

    Scale: two narrow window passes + one groupBy, all keyed/co-keyed
    on user_id — one shuffle of the ping stream, then map-side
    combinable aggregation."""
    cellp = G.geohash_select_sql(
        _pings_sql(dialect), "lat", "lon", 6,
        ["user_id", "ping_id", "t_us", "lat", "lon"], out="cell")
    _D = G.dlit
    return f"""
WITH cellp AS ({cellp}),
w AS (
  SELECT user_id, ping_id, t_us, lat, lon, cell,
         lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, ping_id) AS p_t,
         lag(lat)  OVER (PARTITION BY user_id ORDER BY t_us, ping_id) AS p_lat,
         lag(lon)  OVER (PARTITION BY user_id ORDER BY t_us, ping_id) AS p_lon
  FROM cellp),
x AS (
  SELECT user_id, ping_id, t_us, lat, lon, cell, p_lat, p_lon,
         CASE WHEN p_t IS NULL OR t_us - p_t > {_GAP_US} THEN 1 ELSE 0 END AS is_new
  FROM w),
y AS (
  SELECT user_id, ping_id, t_us, cell, is_new,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY t_us, ping_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS trip_no,
         CASE WHEN is_new = 1 THEN {_D(0.0)}
              ELSE round(sqrt((lat - p_lat) * (lat - p_lat)
                              + (lon - p_lon) * (lon - p_lon)), {_TRIP_ROUND})
         END AS leg
  FROM x),
z AS (
  SELECT user_id, ping_id, t_us, cell, is_new, trip_no, leg,
         row_number() OVER (PARTITION BY user_id, trip_no
                            ORDER BY t_us DESC, ping_id DESC) AS rn_last
  FROM y)
SELECT user_id, cast(trip_no as int) AS trip_no,
       count(*) AS n_pings,
       min(t_us) AS t_start_us, max(t_us) AS t_end_us,
       cast(sum(cast(leg as decimal(18,9))) as double) AS dist_deg,
       min(CASE WHEN is_new = 1 THEN cell END) AS o_cell,
       min(CASE WHEN rn_last = 1 THEN cell END) AS d_cell
FROM z GROUP BY user_id, trip_no
"""


Q70 = _dialects(_trip_sessionize_sql("spark"), _trip_sessionize_sql("duckdb"))


# ----------------------------------------------------- OD matrix (q79)
def _od_matrix_sql(dialect: str) -> str:
    """q79 — origin-destination matrix over q70's trips: trip counts,
    total pings and total duration between res-3 O/D tiles (the urban
    mobility / demand-model product).  Built directly on the
    sessionization CTE — one extra map-side-combinable groupBy on a
    bounded key domain (tile pairs)."""
    return f"""
WITH trips AS ({_trip_sessionize_sql(dialect)})
SELECT substring(o_cell, 1, 4) AS o_tile,
       substring(d_cell, 1, 4) AS d_tile,
       count(*) AS n_trips,
       cast(sum(n_pings) as bigint) AS total_pings,
       cast(sum(t_end_us - t_start_us) as bigint) AS total_duration_us
FROM trips
GROUP BY 1, 2
"""


Q79 = _dialects(_od_matrix_sql("spark"), _od_matrix_sql("duckdb"))


# ------------------------------------------------- geofence anti-join (q71)
def _q_geofence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q71 engine side: operators.joins.rect_contains_join(how="anti")
    — the geofencing exclusion filter (points inside NO zone rect);
    cover + refine + left_anti, matched-id dedup riding inside the
    semi-join (scale analysis in the operator docstring)."""
    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.joins import rect_contains_join

    load_views(spark, sf_dir)
    pts = spark.sql(PTS)
    zones = spark.sql(_rect_layer_sql(2, 0.0003, mod=97)).withColumnRenamed("rid", "id_r")
    return rect_contains_join(pts, zones, get_backend("geohash"), res=7,
                              how="anti")


_GEOFENCE_ORACLE = f"""
WITH pts AS ({PTS}), z AS ({_rect_layer_sql(2, 0.0003, mod=97)})
SELECT p.point_id, p.lat, p.lon
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM z
  WHERE p.lon >= z.x0 AND p.lon <= z.x1
    AND p.lat >= z.y0 AND p.lat <= z.y1)
"""


# ----------------------------------------------------- zonal stats (q80)
def _q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q80 — zonal statistics (the raster-analytics staple): per-zone
    point counts and value sums over the q71 zone layer.  Same cover +
    refine as ``rect_contains_join`` but KEEPING the zone id through
    the join; the rollup is a map-side-combinable groupBy on zone id
    with the engine's DECIMAL-exact sum device (values quantized at
    1e-9 — float group-sums are not order-associative across engines).
    At 100 TB: zone cover broadcastable, candidates bounded by
    points-per-zone-cell, one bounded-domain aggregation."""
    from pyspark.sql import functions as F

    from vector2dggs_spark.dggs import get_backend

    load_views(spark, sf_dir)
    be = get_backend("geohash")
    zones = spark.sql(_rect_layer_sql(2, 0.0003, mod=97))
    cover = be.native_rect_keys(
        zones.selectExpr("rid AS zone_id", "x0", "y0", "x1", "y1"),
        "y0", "x0", "y1", "x1", 7,
        ["zone_id", "x0", "y0", "x1", "y1"], out="__cell",
    )
    pts = spark.sql(
        f"SELECT p.point_id, p.lat, p.lon, e.value "
        f"FROM ({PTS}) p JOIN events e ON p.point_id = e.event_id")
    keyed = be.native_point_keys(
        pts, "lat", "lon", 7, ["point_id", "lat", "lon", "value"],
        out="__cell")
    return (
        keyed.join(F.broadcast(cover), "__cell")
        .where((F.col("lon") >= F.col("x0")) & (F.col("lon") <= F.col("x1"))
               & (F.col("lat") >= F.col("y0")) & (F.col("lat") <= F.col("y1")))
        .groupBy("zone_id")
        .agg(
            F.count("*").alias("n_points"),
            F.expr("cast(sum(cast(round(value, 9) as decimal(28,9))) as double)")
            .alias("sum_value"),
        )
    )


_ZONAL_ORACLE = f"""
WITH pts AS ({PTS}), z AS ({_rect_layer_sql(2, 0.0003, mod=97)})
SELECT z.rid AS zone_id, count(*) AS n_points,
       cast(sum(cast(round(e.value, 9) as decimal(28,9))) as double) AS sum_value
FROM pts p
JOIN events e ON p.point_id = e.event_id
JOIN z ON p.lon >= z.x0 AND p.lon <= z.x1 AND p.lat >= z.y0 AND p.lat <= z.y1
GROUP BY z.rid
"""


# ------------------------------------------------- tile pyramid rollup (q72)
def _pyramid_sql(dialect: str) -> str:
    """q72 — multi-resolution aggregation pyramid (vector-tile rollup,
    geohash res 1..6 in one statement): aggregate ONCE at the finest
    resolution, then explode the SMALL aggregate across prefix lengths
    and re-aggregate — the two-level rollup that never re-reads the
    corpus per zoom level.  At 100 TB the base groupBy is the only
    corpus-scale shuffle (map-side combinable); the pyramid runs over
    |distinct cells| rows x 6."""
    lv = ("SELECT explode(sequence(1, 6)) AS r" if dialect == "spark"
          else "SELECT unnest([1, 2, 3, 4, 5, 6]) AS r")
    return f"""
WITH cells AS ({PTS_CELL6}),
base AS (SELECT cell, count(*) AS n FROM cells GROUP BY 1),
lv AS ({lv})
SELECT cast(r as int) AS res, substring(cell, 1, r) AS tile,
       cast(sum(n) as bigint) AS n_points, count(*) AS n_cells
FROM base CROSS JOIN lv
GROUP BY 1, 2
"""


Q72 = _dialects(_pyramid_sql("spark"), _pyramid_sql("duckdb"))


# -------------------------------------------- spatio-temporal join (q73)
_ST_RADIUS_DEG = 0.03
_ST_DT_US = 1_800_000_000  # +/- 30 min


def _q_st_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q73 engine side: range_join with (t_col, dt_us) — the
    spatio-temporal correlation join.  Time buckets join the candidate
    KEY (cell, t div dt), not just the refine, so an all-history hot
    cell shards across time slices (docstring on the operator)."""
    from pyspark.sql import functions as F

    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.joins import range_join

    load_views(spark, sf_dir)
    pings = spark.sql(_pings_sql("spark"))
    queries = (pings.where(F.col("ping_id") % 23 == 0)
               .withColumnRenamed("ping_id", "query_id"))
    targets = pings.withColumnRenamed("ping_id", "target_id")
    out = range_join(queries, targets, get_backend("geohash"), res=5,
                     radius=_ST_RADIUS_DEG, t_col="t_us", dt_us=_ST_DT_US)
    return out.select("query_id", "target_id", "dist_sq", "delta_us")


_ST_SQDD = ("((q.lat - t.lat) * (q.lat - t.lat)"
            " + (q.lon - t.lon) * (q.lon - t.lon))")
_ST_RANGE_ORACLE = f"""
WITH pings AS ({_pings_sql("duckdb")}),
q AS (SELECT * FROM pings WHERE ping_id % 23 = 0)
SELECT q.ping_id AS query_id, t.ping_id AS target_id,
       {_ST_SQDD} AS dist_sq,
       (t.t_us - q.t_us) AS delta_us
FROM q CROSS JOIN pings t
WHERE {_ST_SQDD} <= {G.dlit(_ST_RADIUS_DEG * _ST_RADIUS_DEG)}
  AND abs(t.t_us - q.t_us) <= {_ST_DT_US}
"""


# --------------------------------------------- IDW interpolation (q74)
_IDW_K = 5
_IDW_EPS = 1e-6  # distance floor: duplicate lattice coords yield d=0


def _q_idw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q74 engine side: inverse-distance-weighted interpolation — the
    kNN apply-step (sensor-network / environmental-surface estimation).
    kNN (J3) finds each query's 5 nearest measurement sites; the value
    blend is w = 1/(eps + d), with numerator and denominator summed as
    SEQUENTIAL rank-ordered float folds (float group-sums are not
    order-associative across engines, and the DECIMAL device doesn't
    survive the final ratio: DuckDB's int128-decimal->double cast
    double-rounds where Spark's BigDecimal path rounds once — measured
    1-ulp divergence at sf0.01).  k is a small constant, so the
    per-group collect is O(k).  Scale: knn's plan + one equi join to
    the value table + one map-side-combinable groupBy."""
    from pyspark.sql import functions as F

    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.joins import knn

    load_views(spark, sf_dir)
    pts = spark.sql(PTS)
    queries = (pts.where(F.col("point_id") % 41 == 7)
               .withColumnRenamed("point_id", "query_id"))
    targets = (pts.where(F.col("point_id") % 41 != 7)
               .withColumnRenamed("point_id", "target_id"))
    nn = knn(queries, targets, get_backend("geohash"), res=6, k=_IDW_K)
    vals = spark.sql("SELECT event_id AS target_id, value FROM events")
    j = nn.join(vals, "target_id").select(
        "query_id", "rank",
        F.expr(f"{G.dlit(1.0)} / ({G.dlit(_IDW_EPS)} + sqrt(dist_sq))").alias("w"),
        "value",
    ).withColumn("wv", F.expr("w * value"))
    seq_fold = ("aggregate(array_sort(collect_list(struct(rank, {c}))), "
                "cast(0.0 as double), (a, x) -> a + x.{c})")
    out = (
        j.groupBy("query_id")
        .agg(
            F.expr(seq_fold.format(c="wv")).alias("__num"),
            F.expr(seq_fold.format(c="w")).alias("__den"),
            F.count("*").cast("bigint").alias("n_neighbors"),
        )
        .select("query_id",
                (F.col("__num") / F.col("__den")).alias("idw_value"),
                "n_neighbors")
    )
    # ADVICE r05: knn documents that the caller owns releasing its
    # persisted result; materialize the (one-row-per-query) IDW output
    # and free the top-k cache NOW instead of leaking it for the rest of
    # the contract run.  The output cache is what the driver's later
    # collect reads.
    out = out.persist()
    out.count()
    nn.unpersist()
    return out


_IDW_ORACLE = f"""
WITH pts AS ({PTS}),
q AS (SELECT * FROM pts WHERE point_id % 41 = 7),
t AS (SELECT * FROM pts WHERE point_id % 41 <> 7),
c AS (
  SELECT q.point_id AS query_id, t.point_id AS target_id,
         ((q.lat - t.lat) * (q.lat - t.lat) +
          (q.lon - t.lon) * (q.lon - t.lon)) AS dist_sq
  FROM q CROSS JOIN t),
nn AS (
  SELECT query_id, target_id, dist_sq, rank FROM (
    SELECT query_id, target_id, dist_sq,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dist_sq, target_id) AS rank
    FROM c) r
  WHERE rank <= {_IDW_K}),
jv AS (
  SELECT nn.query_id, nn.rank,
         {G.dlit(1.0)} / ({G.dlit(_IDW_EPS)} + sqrt(nn.dist_sq)) AS w,
         ({G.dlit(1.0)} / ({G.dlit(_IDW_EPS)} + sqrt(nn.dist_sq))) * e.value AS wv
  FROM nn JOIN events e ON nn.target_id = e.event_id)
SELECT query_id,
       list_reduce(list(wv ORDER BY rank), (a, b) -> a + b)
         / list_reduce(list(w ORDER BY rank), (a, b) -> a + b) AS idw_value,
       count(*) AS n_neighbors
FROM jv GROUP BY query_id
"""


# ------------------------------------------------- focal density (q75)
_FOCAL_RES = 6


def _q_focal_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q75 engine side: raster-style FOCAL operation on the DGGS grid —
    per-cell point counts smoothed over the 3x3 Chebyshev neighborhood
    (hotspot/density surfaces).  Scatter-gather, never an adjacency
    join: each aggregated cell explodes its count to the 9 positions it
    contributes to (codegen sequence explodes — the native-disk device),
    a second groupBy gathers, and an inner join restricts to occupied
    cells.  Both groupBys are map-side combinable; the explode runs
    over the AGGREGATE (|cells| rows), not the corpus — at 100 TB the
    only corpus-scale shuffle is the base count."""
    from pyspark.sql import functions as F

    from vector2dggs_spark.functions import sqlgen as S

    load_views(spark, sf_dir)
    total = 5 * _FOCAL_RES
    lon_bits = (total + 1) // 2
    lat_bits = total - lon_bits
    base = (
        spark.sql(PTS)
        .select(
            F.expr(S.quantize_sql("lon", 180.0, 360.0, lon_bits)).alias("gx"),
            F.expr(S.quantize_sql("lat", 90.0, 180.0, lat_bits)).alias("gy"),
        )
        .groupBy("gx", "gy")
        .agg(F.count("*").alias("n_points"))
    )
    scattered = (
        base
        .select("n_points",
                F.explode(F.sequence(F.col("gx") - 1, F.col("gx") + 1)).alias("tx"),
                "gy")
        .select("n_points", "tx",
                F.explode(F.sequence(F.col("gy") - 1, F.col("gy") + 1)).alias("ty"))
        .groupBy("tx", "ty")
        .agg(F.sum("n_points").cast("bigint").alias("focal_n"))
    )
    return base.join(
        scattered,
        (F.col("gx") == F.col("tx")) & (F.col("gy") == F.col("ty")),
    ).select("gx", "gy", "n_points", "focal_n")


def _focal_oracle() -> str:
    from vector2dggs_spark.functions import sqlgen as S

    total = 5 * _FOCAL_RES
    lon_bits = (total + 1) // 2
    lat_bits = total - lon_bits
    qx = S.quantize_sql("lon", 180.0, 360.0, lon_bits)
    qy = S.quantize_sql("lat", 90.0, 180.0, lat_bits)
    return f"""
WITH pts AS ({PTS}),
g AS (SELECT {qx} AS gx, {qy} AS gy FROM pts),
c AS (SELECT gx, gy, count(*) AS n_points FROM g GROUP BY 1, 2)
SELECT a.gx, a.gy, a.n_points, cast(sum(b.n_points) as bigint) AS focal_n
FROM c a JOIN c b ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
GROUP BY a.gx, a.gy, a.n_points
"""


# --------------------------------------- spatio-temporal OLAP cube (q76)
def _st_cube_sql() -> str:
    """q76 — the hypertable-style continuous-aggregate shape: event
    counts and distinct devices by (day, res-3 tile) with GROUPING SETS
    marginals (per-day totals, per-tile totals, grand total) in ONE
    scan.  The day key is substring(cast(ts as string), 1, 10):
    timezone-free (NTZ renders identically in both engines), no date
    functions involved.  Scale: Catalyst expands grouping sets into a
    single Expand+groupBy — one corpus shuffle for all four rollup
    levels; count(distinct) goes through Spark's standard two-phase
    expansion."""
    _D = G.dlit
    lat = f"({_D(-44.4)} + (event_id % 700) * {_D(0.001)})"
    lon = f"({_D(-176.6)} + ((event_id * 7) % 400) * {_D(0.001)})"
    src = (f"SELECT substring(cast(ts as string), 1, 10) AS day, user_id, "
           f"{lat} AS lat, {lon} AS lon FROM events")
    cells = G.geohash_select_sql(src, "lat", "lon", 3,
                                 ["day", "user_id"], out="tile")
    return f"""
WITH cells AS ({cells})
SELECT coalesce(day, '*') AS day, coalesce(tile, '*') AS tile,
       count(*) AS n_events,
       count(distinct user_id) AS n_users,
       cast(grouping(day) as int) AS g_day,
       cast(grouping(tile) as int) AS g_tile
FROM cells
GROUP BY GROUPING SETS ((day, tile), (day), (tile), ())
"""


Q76 = _shared(_st_cube_sql())


# ------------------------------------------- co-location contacts (q77)
_CT_RADIUS_DEG = 0.01
_CT_DT_US = 1_200_000_000  # +/- 20 min


def _q_contact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q77 engine side: trajectory co-location (contact) detection —
    the spatio-temporal self-join workload (proximity tracing / fleet
    encounter mining).  range_join(t_col, dt_us) proposes fix pairs
    within 0.01 deg AND +/- 20 min through (cell, time-bucket) keys;
    user ids attach via two equi-joins; ``query_id < target_id`` keeps
    one orientation of each unordered fix pair BEFORE aggregation; the
    canonical (least, greatest) user pair then groups encounter stats.
    Scale: the self-join never materializes same-cell-all-history pairs
    (bucketed keys), the orientation filter halves it, and the final
    groupBy is map-side combinable on a bounded key domain (user
    pairs)."""
    from pyspark.sql import functions as F

    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.joins import range_join

    load_views(spark, sf_dir)
    pings = spark.sql(_pings_sql("spark"))
    ids = pings.select("ping_id", "user_id", F.col("t_us").alias("fix_us"))
    pairs = range_join(
        pings.withColumnRenamed("ping_id", "query_id"),
        pings.withColumnRenamed("ping_id", "target_id"),
        get_backend("geohash"), res=6,
        radius=_CT_RADIUS_DEG, t_col="t_us", dt_us=_CT_DT_US,
    ).where(F.col("query_id") < F.col("target_id"))
    j = (
        pairs
        .join(ids.withColumnRenamed("ping_id", "query_id")
                 .withColumnRenamed("user_id", "u_q"), "query_id")
        .join(ids.withColumnRenamed("ping_id", "target_id")
                 .withColumnRenamed("user_id", "u_t")
                 .withColumnRenamed("fix_us", "fix_us_t"), "target_id")
        .where(F.col("u_q") != F.col("u_t"))
    )
    return (
        j.select(
            F.least("u_q", "u_t").alias("u1"),
            F.greatest("u_q", "u_t").alias("u2"),
            F.col("fix_us"),
        )
        .groupBy("u1", "u2")
        .agg(F.count("*").alias("n_contacts"),
             F.min("fix_us").alias("first_us"),
             F.max("fix_us").alias("last_us"))
    )


_CT_SQDD = ("((a.lat - b.lat) * (a.lat - b.lat)"
            " + (a.lon - b.lon) * (a.lon - b.lon))")
_CONTACT_ORACLE = f"""
WITH pings AS ({_pings_sql("duckdb")}),
c AS (
  SELECT least(a.user_id, b.user_id) AS u1,
         greatest(a.user_id, b.user_id) AS u2,
         a.t_us AS fix_us
  FROM pings a JOIN pings b
    ON a.ping_id < b.ping_id
   AND a.user_id <> b.user_id
   AND {_CT_SQDD} <= {G.dlit(_CT_RADIUS_DEG * _CT_RADIUS_DEG)}
   AND abs(a.t_us - b.t_us) <= {_CT_DT_US})
SELECT u1, u2, count(*) AS n_contacts,
       min(fix_us) AS first_us, max(fix_us) AS last_us
FROM c GROUP BY u1, u2
"""


# --------------------------------------------- trip footprints (q78)
def _trip_segments_sql(dialect: str) -> str:
    """CTE fragment (w, x, y, segs) shared by q78's engine and oracle:
    q70's sessionization chain reduced to consecutive-ping SEGMENTS
    within a trip — (trip_id, doc_id, px, py, qx, qy), one row per
    non-boundary ping.  Byte-identical in both dialects except the
    epoch function."""
    return f"""
w AS (
  SELECT user_id, ping_id, t_us, lat, lon,
         lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, ping_id) AS p_t,
         lag(lat)  OVER (PARTITION BY user_id ORDER BY t_us, ping_id) AS p_lat,
         lag(lon)  OVER (PARTITION BY user_id ORDER BY t_us, ping_id) AS p_lon
  FROM ({_pings_sql(dialect)}) __pp),
x AS (
  SELECT user_id, ping_id, t_us, lat, lon, p_lat, p_lon,
         CASE WHEN p_t IS NULL OR t_us - p_t > {_GAP_US} THEN 1 ELSE 0 END AS is_new
  FROM w),
y AS (
  SELECT user_id, ping_id, lat, lon, p_lat, p_lon, is_new,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY t_us, ping_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS trip_no
  FROM x),
segs AS (
  SELECT ('u' || cast(user_id as string) || 't'
          || cast(cast(trip_no as int) as string)) AS trip_id,
         ('u' || cast(user_id as string) || 's'
          || cast(ping_id as string)) AS doc_id,
         p_lon AS px, p_lat AS py, lon AS qx, lat AS qy
  FROM y WHERE is_new = 0)"""


def _q_trip_footprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q78 — trip FOOTPRINTS (map-matching-lite): q70's sessionization
    composes with the REAL supercover linetrace pipeline — every
    consecutive-ping segment of a trip becomes a LINESTRING document,
    runs through ``index(linetrace_mode="supercover")`` at res 6, and
    the per-trip distinct cell set is the trip's grid footprint (the
    structure road-demand / coverage analytics aggregate).  Unlike
    q40's synthetic corpus, REAL consecutive fixes produce vertical and
    zero-length segments, so the kernel's vertical branch
    (dggs/geohash.py:336) is exercised and restated in the oracle.
    Scale: sessionization is one user-keyed window pass; the trace is
    the pipeline's own Arrow path; the final distinct is an equi-key
    shuffle on (trip, cell)."""
    from pyspark.sql import functions as F

    from vector2dggs_spark import index

    load_views(spark, sf_dir)
    segs = spark.sql(
        "WITH " + _trip_segments_sql("spark") + " SELECT * FROM segs")
    s = lambda c: F.col(c).cast("string")  # noqa: E731 — Java shortest-repr
    wkt = F.concat(
        F.lit("LINESTRING ("),
        s("px"), F.lit(" "), s("py"), F.lit(", "),
        s("qx"), F.lit(" "), s("qy"), F.lit(")"),
    )
    docs = segs.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("geometry").alias("kind"),
                wkt.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    r = index(spark, docs, dggs="geohash", resolution=_GEO_RES,
              parent_res=_GEO_PARENT, cut_threshold_deg2=0,
              linetrace_mode="supercover")
    return (
        r.cells.join(segs.select("doc_id", "trip_id"), "doc_id")
        .select("trip_id", f"geohash_{_GEO_RES:02d}",
                f"geohash_{_GEO_PARENT:02d}")
        .distinct()
    )


def _trip_footprint_oracle_sql() -> str:
    """q40's grid-space supercover restatement, extended with the
    kernel's VERTICAL branch (x1 == x0: all cells floor(min y)..
    floor(max y) in the one column — the interpolation would divide by
    zero) and carried per-trip instead of per-doc."""
    from vector2dggs_spark.dggs.geohash import cell_dims

    dlat, dlon = cell_dims(_GEO_RES)
    enc = G.geohash_select_sql(
        "SELECT trip_id, clat, clon FROM ctr", "clat", "clon", _GEO_RES,
        ["trip_id"], out="cell",
    )
    return f"""
WITH {_trip_segments_sql("duckdb")},
g AS (SELECT trip_id,
             ((px + {G.dlit(180.0)}) / {G.dlit(dlon)}) AS gx0,
             ((py + {G.dlit(90.0)}) / {G.dlit(dlat)}) AS gy0,
             ((qx + {G.dlit(180.0)}) / {G.dlit(dlon)}) AS gx1,
             ((qy + {G.dlit(90.0)}) / {G.dlit(dlat)}) AS gy1
      FROM segs),
o AS (SELECT trip_id,
             CASE WHEN gx1 < gx0 THEN gx1 ELSE gx0 END AS x0,
             CASE WHEN gx1 < gx0 THEN gy1 ELSE gy0 END AS y0,
             CASE WHEN gx1 < gx0 THEN gx0 ELSE gx1 END AS x1,
             CASE WHEN gx1 < gx0 THEN gy0 ELSE gy1 END AS y1
      FROM g),
cols AS (SELECT trip_id, x0, y0, x1, y1,
                unnest(generate_series(cast(floor(x0) as bigint),
                                       cast(floor(x1) as bigint))) AS ix
         FROM o),
cl AS (SELECT trip_id, x0, y0, x1, y1, ix,
              greatest(cast(ix as double), x0) AS xl,
              least(cast(ix as double) + {G.dlit(1.0)}, x1) AS xr
       FROM cols),
yy AS (SELECT trip_id, ix,
              CASE WHEN x1 = x0 THEN y0
                   ELSE (y0 + (y1 - y0) * ((xl - x0) / (x1 - x0))) END AS yl,
              CASE WHEN x1 = x0 THEN y1
                   ELSE (y0 + (y1 - y0) * ((xr - x0) / (x1 - x0))) END AS yr
       FROM cl),
cells AS (SELECT trip_id, ix,
                 unnest(generate_series(
                   cast(floor(least(yl, yr)) as bigint),
                   cast(floor(greatest(yl, yr)) as bigint))) AS iy
          FROM yy),
dcells AS (SELECT DISTINCT trip_id, ix, iy FROM cells),
ctr AS (SELECT trip_id,
               ({G.dlit(-180.0)} + (ix + {G.dlit(0.5)}) * {G.dlit(dlon)}) AS clon,
               ({G.dlit(-90.0)} + (iy + {G.dlit(0.5)}) * {G.dlit(dlat)}) AS clat
        FROM dcells),
allc AS ({enc})
SELECT trip_id, cell AS geohash_{_GEO_RES:02d},
       substring(cell, 1, {_GEO_PARENT}) AS geohash_{_GEO_PARENT:02d}
FROM allc
"""


def _semdedup_q() -> tuple[Callable, str]:
    from vector2dggs_spark.functions.textops import semdedup_sql

    return _dialects(semdedup_sql("spark"), semdedup_sql("duckdb"))


Q65 = _semdedup_q()


QUERIES: dict[str, tuple[Callable, str | None]] = {
    "q01_pricing_summary": Q01,
    "q02_top_orders_per_customer": Q02,
    "q03_point_index_geohash": Q03,
    "q04_parent_rollup": Q04,
    "q05_tile_assignment": Q05,
    "q06_knn_ring_expansion": Q06,
    "q07_dedup_exact": Q07,
    "q08_fingerprint": Q08,
    "q09_token_stats": Q09,
    "q10_quality_score": Q10,
    "q11_langid": Q11,
    "q12_minhash_lsh_pairs": Q12,
    "q13_ann_cosine_topk": Q13,
    "q14_polyfill_pipeline_geohash": (_q_polyfill, _polyfill_oracle_sql()),
    "q15_compaction_pipeline": (_q_compaction, None),
    "q16_pipeline_rhp": (_q_rhp, None),
    "q17_knn_h3": (_q_knn_h3, _KNN_ORACLE),
    "q18_pipeline_h3": (_q_h3_pipeline, None),
    "q19_simhash_pairs": Q19,
    "q20_embedding_near_dup": Q20,
    "q21_ann_ivf_bucketed": Q21,
    "q22_media_decode_features": (_q_media, _MEDIA_ORACLE),
    "q23_pipeline_s2": (_q_s2_pipeline, None),
    "q24_pipeline_a5": (_q_a5_pipeline, None),
    "q25_jaccard_ngram_pairs": Q25,
    "q26_embedding_near_dup_lsh": Q26,
    "q27_knn_haversine": Q27,
    "q29_ann_ivf_multiprobe": Q29,
    "q30_point_index_rhp": Q30,
    "q31_point_index_s2": Q31,
    "q32_embedding_near_dup_arrow": Q32,
    "q33_point_index_h3": Q33,
    "q34_point_index_a5": Q34,
    "q35_pipeline_points_rhp": Q35,
    "q36_pipeline_points_h3": Q36,
    "q37_pipeline_points_s2": Q37,
    "q38_pipeline_points_a5": Q38,
    "q39_lsh_dedup_greedy": Q39,
    "q28_compaction_oracle": (
        lambda spark, sf_dir: _q_polyfill(spark, sf_dir, big_deg=0.8, compact=True),
        _compaction_oracle_sql(),
    ),
    "q40_linetrace_pipeline_geohash": (_q_linetrace, _linetrace_oracle_sql()),
    "q41_compaction_pipeline_rhp": (_q_rhp_compaction, _rhp_compaction_oracle_sql()),
    "q42_dedup_clusters": (_q_dedup_clusters, _CC_ORACLE),
    "q43_bm25_topk": Q43,
    "q44_adaptive_cover": (_q_adaptive_cover, None),
    "q45_stratified_sample": Q45,
    "q46_unigram_lm_score": Q46,
    "q47_polyfill_pipeline_h3": (_q_h3_polyfill, _h3_polyfill_oracle_sql()),
    "q48_gopher_quality": Q48,
    "q49_repeated_window_dedup": Q49,
    "q50_compaction_pipeline_h3": (_q_h3_compaction, _h3_compaction_oracle_sql()),
    "q51_polyfill_pipeline_s2": (_q_s2_polyfill, _s2_polyfill_oracle_sql()),
    "q52_polyfill_pipeline_a5": (_q_a5_polyfill, _a5_polyfill_oracle_sql()),
    "q53_linetrace_pipeline_s2": (
        lambda spark, sf_dir: _q_linetrace_backend(spark, sf_dir, "s2"),
        _dense_linetrace_oracle_sql("s2"),
    ),
    "q54_linetrace_pipeline_a5": (
        lambda spark, sf_dir: _q_linetrace_backend(spark, sf_dir, "a5"),
        _dense_linetrace_oracle_sql("a5"),
    ),
    "q55_linetrace_pipeline_rhp": (
        lambda spark, sf_dir: _q_linetrace_backend(spark, sf_dir, "rhp"),
        _dense_linetrace_oracle_sql("rhp"),
    ),
    "q56_segment_dedup_apply": Q56,
    "q57_sequence_packing": Q57,
    "q58_decontamination": Q58,
    "q59_compaction_pipeline_s2": (_q_s2_compaction, _s2_compaction_oracle_sql()),
    "q60_compaction_pipeline_a5": (_q_a5_compaction, _a5_compaction_oracle_sql()),
    "q61_dsir_importance": Q61,
    "q62_pii_redaction": Q62,
    "q63_range_join": Q63,
    "q64_corpus_profile": Q64,
    "q65_semdedup": Q65,
    "q66_mixture_rebalance": Q66,
    "q67_delta_dedup": Q67,
    "q68_bpe_token_count": Q68,
    "q69_rect_join": (_q_rect_join, _RECT_JOIN_ORACLE),
    "q70_trip_sessionize": Q70,
    "q71_geofence_anti": (_q_geofence, _GEOFENCE_ORACLE),
    "q72_tile_pyramid": Q72,
    "q73_st_range_join": (_q_st_range_join, _ST_RANGE_ORACLE),
    "q74_idw_interpolation": (_q_idw, _IDW_ORACLE),
    "q75_focal_density": (_q_focal_density, _focal_oracle()),
    "q76_st_cube": Q76,
    "q77_contact_pairs": (_q_contact_pairs, _CONTACT_ORACLE),
    "q78_trip_footprint": (_q_trip_footprint, _trip_footprint_oracle_sql()),
    "q79_od_matrix": Q79,
    "q80_zonal_stats": (_q_zonal_stats, _ZONAL_ORACLE),
}


def flagship(spark: SparkSession) -> DataFrame:
    """Full pipeline at smoke scale: interleaved docs -> geohash cells ->
    tile assignment join (the engine's signature dataflow)."""
    from vector2dggs_spark import get_backend, index
    from vector2dggs_spark.operators.joins import assign_tiles
    from vector2dggs_spark.sources.documents import documents_df

    docs = documents_df(spark, 400, seed=42)
    r = index(spark, docs, dggs="geohash", resolution=6, parent_res=3)
    tiles = assign_tiles(r.cells, docs, get_backend("geohash"), r.parent_res, r.parent_col)
    return r.cells.join(
        tiles.select("doc_id", "media_ref").dropDuplicates(["doc_id"]), "doc_id", "left"
    )
