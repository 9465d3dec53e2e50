"""Interleaved text+media documents source (the north-rule input shape).

Schema (BASELINE.json ``input_hint``):

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

``kind='geometry'`` spans carry WKT in ``text``; ``kind='media'`` spans
carry ``media_ref`` (``tile://z/x/y``); ``kind='text'`` spans carry
prose.  The per-row invariant the engine must preserve is span-sequence
equality ``(kind, text, media_ref, order)`` — the web-scale analog of
the reference's ``--keep_attributes`` (``common.py:629-631``).

Synthesis is deterministic (seed 42, FIXTURES.md §1): polygon coverage +
overlapping polygons + polylines + points in a Chatham-like window,
katana WKT shapes from the reference test suite
(``/root/reference/tests/classes/katana.py:7-21`` roles), an oversized
polygon, an optional antimeridian strip, and degenerate spans.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)
DOCUMENTS_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.StringType(), False), T.StructField("spans", SPAN_TYPE)]
)

WINDOW = (-176.6, -44.4, -176.2, -43.7)  # lon_min, lat_min, lon_max, lat_max

# reference katana smoke WKTs' roles: plain square, square with hole,
# multipolygon (tests/classes/katana.py:7-21)
KATANA_WKTS = [
    "POLYGON ((-176.55 -44.35, -176.45 -44.35, -176.45 -44.25, -176.55 -44.25, -176.55 -44.35))",
    "POLYGON ((-176.40 -44.35, -176.28 -44.35, -176.28 -44.23, -176.40 -44.23, -176.40 -44.35), "
    "(-176.36 -44.31, -176.32 -44.31, -176.32 -44.27, -176.36 -44.27, -176.36 -44.31))",
    "MULTIPOLYGON (((-176.58 -43.80, -176.52 -43.80, -176.52 -43.74, -176.58 -43.74, -176.58 -43.80)), "
    "((-176.50 -43.78, -176.44 -43.78, -176.44 -43.72, -176.50 -43.72, -176.50 -43.78)))",
]
OVERSIZED_WKT = (
    "POLYGON ((-176.60 -44.40, -176.20 -44.40, -176.20 -44.00, -176.60 -44.00, -176.60 -44.40))"
)
ANTIMERIDIAN_WKT = (
    "POLYGON ((179.8 -44.2, -179.8 -44.2, -179.8 -44.0, 179.8 -44.0, 179.8 -44.2))"
)

_WORDS = "spark cell grid index tile span doc join shuffle partition hex trace point line poly".split()


def _rect(cx, cy, w, h):
    x0, x1, y0, y1 = cx - w / 2, cx + w / 2, cy - h / 2, cy + h / 2
    return (
        f"POLYGON (({x0:.6f} {y0:.6f}, {x1:.6f} {y0:.6f}, {x1:.6f} {y1:.6f}, "
        f"{x0:.6f} {y1:.6f}, {x0:.6f} {y0:.6f}))"
    )


def _ngon(cx, cy, r, n, rng):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    xs = cx + r * np.cos(ang)
    ys = cy + r * np.sin(ang)
    pts = ", ".join(f"{x:.6f} {y:.6f}" for x, y in zip(xs, ys))
    return f"POLYGON (({pts}, {xs[0]:.6f} {ys[0]:.6f}))"


def _line(rng, lon0, lat0, nverts):
    steps = rng.uniform(-0.012, 0.012, (nverts - 1, 2))
    pts = np.concatenate([[[lon0, lat0]], np.cumsum(steps, axis=0) + [lon0, lat0]])
    body = ", ".join(f"{x:.6f} {y:.6f}" for x, y in pts)
    return f"LINESTRING ({body})"


def _tile_ref(lon, lat, z=8) -> str:
    n = 2**z
    x = int((lon + 180.0) / 360.0 * n) % n
    lat_r = np.radians(np.clip(lat, -85.05, 85.05))
    y = int((1.0 - np.arcsinh(np.tan(lat_r)) / np.pi) / 2.0 * n)
    return f"tile://{z}/{x}/{min(max(y, 0), n - 1)}"


def synthesize_documents_pdf(
    n_docs: int = 1000, seed: int = 42, include_antimeridian: bool = False,
    include_degenerates: bool = True,
) -> pd.DataFrame:
    """Deterministic interleaved documents table as pandas (FIXTURES.md §1)."""
    rng = np.random.default_rng(seed)
    lon0, lat0, lon1, lat1 = WINDOW
    rows = []

    def mk_doc(i: int, wkt: str | None, extra_spans=None):
        spans = []
        off = 0
        spans.append(
            {
                "kind": "text",
                "text": " ".join(rng.choice(_WORDS, 5)),
                "media_ref": None,
                "offset": off,
            }
        )
        off += 1
        if wkt is not None:
            spans.append({"kind": "geometry", "text": wkt, "media_ref": None, "offset": off})
            off += 1
        if extra_spans:
            for sp in extra_spans:
                spans.append({**sp, "offset": off})
                off += 1
        return {"doc_id": f"doc{i:08d}", "spans": spans}

    special: list[tuple[str | None, list | None]] = []
    for w in KATANA_WKTS:
        special.append((w, None))
    special.append((OVERSIZED_WKT, None))
    if include_antimeridian:
        special.append((ANTIMERIDIAN_WKT, None))
    if include_degenerates:
        special.append(("POLYGON EMPTY", None))
        special.append((None, None))  # doc with no geometry span
        special.append(("CIRCULARSTRING (0 0, 1 1, 2 0)", None))  # unsupported type
        rows_none = {"kind": "geometry", "text": None, "media_ref": None}
        special.append(("POINT (-176.4 -44.1)", [rows_none]))  # null-text geometry span

    i = 0
    for wkt, extra in special:
        rows.append(mk_doc(i, wkt, extra))
        i += 1

    # overlapping polygons (~2% — compaction treats features independently)
    n_overlap = max(4, n_docs // 50)
    base_cx, base_cy = (lon0 + lon1) / 2, (lat0 + lat1) / 2
    for _ in range(n_overlap):
        cx = base_cx + rng.uniform(-0.02, 0.02)
        cy = base_cy + rng.uniform(-0.02, 0.02)
        rows.append(mk_doc(i, _rect(cx, cy, 0.05, 0.05)))
        i += 1

    # bulk mix: 60% points (+media span), 20% polygons, 10% lines, 10% text-only
    while i < n_docs:
        u = rng.uniform()
        lon = rng.uniform(lon0 + 0.01, lon1 - 0.01)
        lat = rng.uniform(lat0 + 0.01, lat1 - 0.01)
        if u < 0.6:
            wkt = f"POINT ({lon:.6f} {lat:.6f})"
            media = [{"kind": "media", "text": None, "media_ref": _tile_ref(lon, lat)}]
            rows.append(mk_doc(i, wkt, media))
        elif u < 0.8:
            if rng.uniform() < 0.3:
                wkt = _ngon(lon, lat, rng.uniform(0.004, 0.02), int(rng.integers(4, 9)), rng)
            else:
                wkt = _rect(lon, lat, rng.uniform(0.004, 0.03), rng.uniform(0.004, 0.03))
            rows.append(mk_doc(i, wkt))
        elif u < 0.9:
            rows.append(mk_doc(i, _line(rng, lon, lat, int(rng.integers(3, 12)))))
        else:
            rows.append(mk_doc(i, None))
        i += 1
    return pd.DataFrame(rows)


def documents_df(
    spark: SparkSession, n_docs: int = 1000, seed: int = 42, **kw
) -> DataFrame:
    pdf = synthesize_documents_pdf(n_docs, seed, **kw)
    return spark.createDataFrame(pdf, schema=DOCUMENTS_SCHEMA)


def read_documents(spark: SparkSession, source: str) -> DataFrame:
    """Load the documents table from an Iceberg table name or a parquet
    path (the north-rule source is an Iceberg catalog table; this
    container has no Iceberg runtime jars, so the parquet branch is the
    tested path — the Iceberg branch is the same one-liner Spark offers
    everywhere: ``spark.read.format("iceberg").load(name)``)."""
    if "/" not in source and not source.endswith(".parquet"):
        try:
            return spark.read.format("iceberg").load(source)
        except Exception:
            return spark.read.table(source)
    return spark.read.parquet(source)


def read_documents_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    id_col: str = "doc_id",
    wkt_col: str = "wkt",
    partition_col: str | None = None,
    num_partitions: int = 32,
    lower: int | None = None,
    upper: int | None = None,
) -> DataFrame:
    """SQL/JDBC feature source (SURVEY S2 — the reference's PostGIS read,
    common.py:594-615): rows of (id, WKT) from any JDBC database become
    the engine's documents shape natively (no Python per row).

    For parallel scans of big tables pass ``partition_col`` (a numeric
    column) + bounds — Spark issues ``num_partitions`` range-partitioned
    queries instead of one serial cursor.  Tested against the embedded
    Derby engine Spark ships (no PostGIS driver exists in this
    container; the code path is identical for any JDBC URL)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_col is not None:
        reader = (
            reader.option("partitionColumn", partition_col)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower if lower is not None else 0)
            .option("upperBound", upper if upper is not None else 1 << 31)
        )
    raw = reader.load()
    return raw.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("geometry").alias("kind"),
                F.col(wkt_col).cast("string").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )


def synthesize_documents_native(spark: SparkSession, n_docs: int) -> DataFrame:
    """Large-scale interleaved documents table generated ENTIRELY with
    native Spark expressions (no Python row loop) — the web-scale shape
    where point documents dominate.  Deterministic in ``doc_id``.

    Used by the scaling benches; the pandas synthesizer above provides
    the mixed-geometry fixture corpus for correctness tests."""
    lon0, lat0, lon1, lat1 = WINDOW
    df = spark.range(n_docs).withColumnRenamed("id", "i")
    lat = F.lit(lat0) + (F.col("i") % 700) * F.lit((lat1 - lat0) / 700.0)
    lon = F.lit(lon0) + ((F.col("i") * 7) % 400) * F.lit((lon1 - lon0) / 400.0)
    wkt = F.concat(F.lit("POINT ("), lon.cast("string"), F.lit(" "), lat.cast("string"), F.lit(")"))
    tile = F.concat(
        F.lit("tile://8/"),
        ((F.col("i") * 13) % 256).cast("string"),
        F.lit("/"),
        ((F.col("i") * 29) % 256).cast("string"),
    )
    spans = F.array(
        F.struct(
            F.lit("text").alias("kind"),
            F.concat(F.lit("doc body "), F.col("i").cast("string")).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        ),
        F.struct(
            F.lit("geometry").alias("kind"),
            wkt.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(1).alias("offset"),
        ),
        F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            tile.alias("media_ref"),
            F.lit(2).alias("offset"),
        ),
    )
    return df.select(
        F.format_string("doc%08d", F.col("i")).alias("doc_id"), spans.alias("spans")
    )


# ------------------------------------------------------------ extraction
def extract_geometries(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, span_idx, wkt): one row per geometry span.

    Pure native exprs (posexplode + filter) — Catalyst prunes the scan to
    (doc_id, spans).  The reference analog is the OGR/PostGIS read of the
    geometry column (common.py:586-616)."""
    return (
        docs.select("doc_id", F.posexplode("spans").alias("span_idx", "span"))
        .where(F.col("span.kind") == "geometry")
        .select("doc_id", "span_idx", F.col("span.text").alias("wkt"))
    )


def extract_media(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, media_ref, z, x, y): one row per media span,
    tile coordinates parsed natively (regexp_extract — F2-style)."""
    m = (
        docs.select("doc_id", F.explode("spans").alias("span"))
        .where(F.col("span.kind") == "media")
        .select("doc_id", F.col("span.media_ref").alias("media_ref"))
    )
    pat = r"tile://(\d+)/(\d+)/(\d+)"
    return m.select(
        "doc_id",
        "media_ref",
        F.regexp_extract("media_ref", pat, 1).cast("int").alias("z"),
        F.regexp_extract("media_ref", pat, 2).cast("int").alias("x"),
        F.regexp_extract("media_ref", pat, 3).cast("int").alias("y"),
    )


def tile_centers(media: DataFrame) -> DataFrame:
    """Add slippy-tile center (lon, lat) — pure native math (no UDF)."""
    n = F.pow(F.lit(2.0), F.col("z"))
    lon = (F.col("x") + 0.5) / n * 360.0 - 180.0
    yfrac = 1.0 - 2.0 * (F.col("y") + 0.5) / n
    lat = F.degrees(F.atan(F.sinh(F.lit(np.pi) * yfrac)))
    return media.withColumn("tile_lon", lon).withColumn("tile_lat", lat)


def span_signature(docs: DataFrame) -> DataFrame:
    """(doc_id, span_sig): order-sensitive hash of (kind, text, media_ref,
    order) — the invariant checked after every stage (BASELINE.md §23)."""
    sig = F.md5(
        F.to_json(
            F.transform(
                "spans",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            )
        )
    )
    return docs.select("doc_id", sig.alias("span_sig"))
