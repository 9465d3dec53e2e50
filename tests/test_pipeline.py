"""End-to-end pipeline tests: documents -> cell table -> Hive output.

Mirrors the reference's CLI smoke + structural output validation layers
(`/root/reference/tests/classes/h3.py`, `output_validation.py:11-86`)
on the synthetic interleaved documents table (FIXTURES.md §1)."""
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector2dggs_spark import get_backend, index, write_partitioned
from vector2dggs_spark.geometry import wkt as gw
from vector2dggs_spark.sources.documents import (
    documents_df,
    extract_geometries,
    span_signature,
)

N_DOCS = 300
RES = 6  # geohash precision 6 (reference geohash tests use res 6)


@pytest.fixture(scope="module")
def docs(spark):
    df = documents_df(spark, N_DOCS, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def result(spark, docs):
    r = index(spark, docs, dggs="geohash", resolution=RES, cut_threshold_deg2=0.01)
    r.cells.cache().count()
    return r


def test_output_shape_and_naming(result):
    cols = result.cells.columns
    assert cols == ["geohash_06", "doc_id", "geohash_01"]  # F1 naming, default parent 6-6=0->min 1
    assert result.parent_res == 1


def test_rows_nonempty_and_cells_valid(result):
    rows = result.cells.limit(5000).collect()
    assert len(rows) > 500
    for r in rows[:200]:
        assert len(r["geohash_06"]) == 6
        assert r["geohash_01"] == r["geohash_06"][:1]


def test_degenerates_dropped(result, docs):
    # docs with EMPTY/null/unsupported geometry spans contribute no rows
    # (P3/P4) but the null-text doc with a valid POINT span still indexes
    present = {r["doc_id"] for r in result.cells.select("doc_id").distinct().collect()}
    empty_docs = {f"doc{i:08d}" for i in (4, 5, 6)}  # EMPTY, no-geom, CIRCULARSTRING
    assert not (empty_docs & present)
    assert "doc00000007" in present  # POINT + null-text geometry span doc


def test_cells_match_direct_kernel(spark, result, docs):
    """Pipeline output == direct numpy-kernel computation per document."""
    backend = get_backend("geohash")
    got = {}
    for r in result.cells.collect():
        got.setdefault(r["doc_id"], []).append(r["geohash_06"])
    geoms = {r["doc_id"]: r["wkt"] for r in extract_geometries(docs).collect() if r["wkt"]}
    from vector2dggs_spark.geometry import kernels as gk

    checked = 0
    for doc_id, wkt in geoms.items():
        geom = gw.parse_wkt(wkt)
        if geom is None:
            continue
        expected: list[str] = []
        for single in gk.explode(geom):
            gt, parts = single
            if gt == "Point":
                expected.extend(backend.point_to_cell([parts[1]], [parts[0]], RES))
            elif gt == "Polygon":
                # pipeline bisects with threshold 0.01; union of pieces ==
                # whole-polygon fill (center-inside is pointwise)
                expected.extend(backend.polyfill(parts, RES))
            else:
                expected.extend(backend.linetrace(parts, RES))
        if geom[0] == "LineString" or geom[0] == "MultiLineString":
            expected = sorted(set(expected))
            assert sorted(set(got.get(doc_id, []))) == expected, doc_id
        else:
            assert sorted(got.get(doc_id, [])) == sorted(expected), doc_id
        checked += 1
    assert checked > 50


def test_span_sequence_invariant(spark, docs):
    """(kind, text, media_ref, order) survives keep_spans indexing."""
    r = index(spark, docs, dggs="geohash", resolution=5, keep_spans=True)
    sig_in = {x["doc_id"]: x["span_sig"] for x in span_signature(docs).collect()}
    out_docs = r.cells.select("doc_id", "spans").dropDuplicates(["doc_id"])
    sig_out = {x["doc_id"]: x["span_sig"] for x in span_signature(out_docs).collect()}
    assert sig_out  # non-empty
    for doc_id, s in sig_out.items():
        assert sig_in[doc_id] == s


def test_hive_partitioned_write(spark, result, tmp_path):
    out = str(tmp_path / "out")
    write_partitioned(result, out)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("geohash_01="))
    assert dirs, "expected Hive dirs named geohash_01=<token>"
    # exactly one parquet data file per parent dir (S8 semantics)
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)
    # read back: partition values are strings (reference common.py:300-305)
    back = spark.read.parquet(out)
    assert dict(back.dtypes)["geohash_01"] == "string"
    assert back.count() == result.cells.count()


def test_explicit_parent_res(spark, docs, tmp_path):
    r = index(spark, docs, dggs="geohash", resolution=RES, parent_res=3)
    assert r.parent_col == "geohash_03"
    out = str(tmp_path / "pr3")
    write_partitioned(r, out)
    assert any(d.startswith("geohash_03=") for d in os.listdir(out))


def test_resolution_validation(spark, docs):
    with pytest.raises(ValueError, match="parent resolution"):
        index(spark, docs, dggs="geohash", resolution=5, parent_res=5)
    with pytest.raises(ValueError, match="out of range"):
        index(spark, docs, dggs="geohash", resolution=99)
    with pytest.raises(ValueError, match="unknown DGGS"):
        index(spark, docs, dggs="nope", resolution=5)


def test_rhp_end_to_end(spark, docs):
    r = index(spark, docs, dggs="rhp", resolution=5, parent_res=2)
    rows = r.cells.limit(2000).collect()
    assert rows
    for row in rows[:100]:
        assert len(row["rhp_05"]) == 6 and row["rhp_05"][0] in "NOPQRS"
        assert row["rhp_02"] == row["rhp_05"][:3]


def test_antimeridian_gated_split(spark):
    docs = documents_df(spark, 20, seed=1, include_antimeridian=True)
    r = index(spark, docs, dggs="geohash", resolution=4, cut_threshold_deg2=0)
    am_cells = [
        x["geohash_04"]
        for x in r.cells.where(F.col("doc_id") == "doc00000004").collect()
    ]
    # antimeridian doc is special index 4 when include_antimeridian=True
    assert am_cells
    lons = []
    from vector2dggs_spark.dggs import geohash as gh

    _, lon = gh.decode_center(np.array(am_cells), 4)
    assert (lon > 170).any() and (lon < -170).any()
    # and no bogus cells spanning the globe interior
    assert np.all((np.abs(lon) > 170))


def test_h3_end_to_end(spark, docs):
    r = index(spark, docs, dggs="h3", resolution=8, parent_res=3)
    rows = r.cells.limit(2000).collect()
    assert rows
    import vector2dggs_spark.dggs.h3core as H

    for row in rows[:50]:
        v = H.from_token([row["h3_08"]])
        assert H.get_resolution(v)[0] == 8
        assert row["h3_03"] == str(H.to_token(H.cell_to_parent(v, 3))[0])


def test_empty_geometry_input(spark):
    """P10: documents without geometry spans produce an empty cell table
    (no crash, stable schema)."""
    import pandas as pd

    from vector2dggs_spark.sources.documents import DOCUMENTS_SCHEMA

    pdf = pd.DataFrame(
        [{"doc_id": "d1", "spans": [{"kind": "text", "text": "x", "media_ref": None, "offset": 0}]}]
    )
    docs = spark.createDataFrame(pdf, schema=DOCUMENTS_SCHEMA)
    r = index(spark, docs, dggs="geohash", resolution=5)
    assert r.cells.count() == 0
    assert r.cells.columns == ["geohash_05", "doc_id", "geohash_01"]


def test_spatial_sort_variants_equivalent(spark, docs):
    base = None
    for sort in ("geohash", "morton", "hilbert", "none"):
        r = index(spark, docs, dggs="geohash", resolution=5, spatial_sort=sort)
        got = sorted(
            (x["doc_id"], x["geohash_05"]) for x in r.cells.collect()
        )
        if base is None:
            base = got
        else:
            assert got == base, sort


def test_jdbc_source_end_to_end(spark, tmp_path):
    """SURVEY S2: JDBC feature source -> documents shape -> index().
    Uses the embedded Derby engine on Spark's own classpath (the code
    path is identical for PostGIS/any JDBC URL; reference
    common.py:594-615 + tests/classes/postgis.py scenario shape)."""
    from vector2dggs_spark import index
    from vector2dggs_spark.sources.documents import read_documents_jdbc

    url = f"jdbc:derby:{tmp_path}/featdb;create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate("CREATE TABLE feats (fid INT, wkt VARCHAR(300))")
    rows = [
        (1, "POINT (174.5 -36.5)"),
        (2, "POINT (174.6 -36.6)"),
        (3, "POLYGON ((174.0 -37.0, 174.2 -37.0, 174.2 -36.8, 174.0 -36.8, 174.0 -37.0))"),
        (4, "LINESTRING (174.3 -36.9, 174.4 -36.8)"),
    ]
    for fid, wkt in rows:
        st.executeUpdate(f"INSERT INTO feats VALUES ({fid}, '{wkt}')")
    conn.close()

    docs = read_documents_jdbc(
        spark, url, "feats", id_col="fid", wkt_col="wkt",
        partition_col="fid", lower=0, upper=5, num_partitions=2,
    )
    assert docs.count() == 4
    assert docs.schema["spans"].dataType.elementType.fieldNames() == [
        "kind", "text", "media_ref", "offset",
    ]
    r = index(spark, docs, dggs="geohash", resolution=5, parent_res=2)
    out = r.cells.toPandas()
    assert set(out.doc_id) == {"1", "2", "3", "4"}
    assert len(out) > 10  # polygon fills multiple cells


def _walk(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def test_plan_no_rangepartitioning_single_prefix_shuffle(spark, docs):
    """Plan-regression guard (VERDICT r02 #8a): the docs pipeline must
    keep the hash-prefix spatial shuffle — repartitionByRange's sampling
    re-executes the Arrow prepare stage (was >half of round-1 wall time).
    Pin: zero rangepartitioning nodes, exactly 2 hashpartitioning
    exchanges (spatial prefix shuffle + line-dedup aggregate)."""
    r = index(spark, docs, dggs="geohash", resolution=RES, parent_res=3,
              cut_threshold_deg2=0.01)
    plan = r.cells._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan
    import re

    n_hash = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_hash == 2, f"expected 2 hash exchanges, plan has {n_hash}"


def test_plan_native_point_branch_shuffle_free(spark):
    """Plan-regression guard (VERDICT r02 #8b): the native POINT branch
    (the dominant web-scale class) must stay a pure map-side plan — no
    exchange between the scan and the union with the Arrow branch."""
    from vector2dggs_spark.sources.documents import synthesize_documents_native

    ndocs = synthesize_documents_native(spark, 1000)
    r = index(spark, ndocs, dggs="geohash", resolution=9, parent_res=3)
    sp = r.cells._jdf.queryExecution().sparkPlan()
    unions = [n for n in _walk(sp) if n.nodeName() == "Union"]
    assert unions, "expected a Union of Arrow and native-point branches"
    union = unions[0]
    ch = union.children()
    natives = []
    for i in range(ch.size()):
        sub = list(_walk(ch.apply(i)))
        if not any("MapInPandas" in n.nodeName() for n in sub):
            natives.append(sub)
    assert natives, "no native (non-Arrow) union child found"
    for sub in natives:
        bad = [n.nodeName() for n in sub if "Exchange" in n.nodeName()]
        assert not bad, f"native point branch shuffles: {bad}"


def test_write_partitioned_uncached_default_single_job(spark, docs, tmp_path):
    """ADVICE r02 medium: the default write on an UNCACHED result must
    not run a pre-write aggregation (which would execute the whole
    pipeline twice).  AQE splits one write into a job per shuffle stage,
    so the pin is relative: the default path triggers exactly as many
    jobs as an explicit no-probe write of the same plan."""
    sc = spark.sparkContext

    def jobs_for(group, fn):
        sc.setJobGroup(group, group)
        try:
            fn()
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    r = index(spark, docs, dggs="geohash", resolution=5, parent_res=2)
    out1, out2 = str(tmp_path / "auto"), str(tmp_path / "explicit")
    n_auto = jobs_for("wp_auto", lambda: write_partitioned(r, out1))
    n_plain = jobs_for(
        "wp_plain",
        lambda: write_partitioned(r, out2, single_file_per_partition=False,
                                  max_records_per_file=20_000_000),
    )
    assert n_auto == n_plain, f"default path ran {n_auto} jobs vs {n_plain} (probe leak)"
    back = spark.read.parquet(out1)
    assert back.count() == r.cells.count()


def test_read_documents_table_source(spark):
    """SURVEY S1/S3: a bare table name (no slash) resolves through the
    catalog — the Iceberg-shaped branch of read_documents (the container
    has no Iceberg jars, so the spark.read.table fallback is the tested
    path; the Iceberg branch is the same one-liner)."""
    from vector2dggs_spark.sources.documents import documents_df, read_documents

    documents_df(spark, 25, seed=4).createOrReplaceTempView("docs_catalog_src")
    got = read_documents(spark, "docs_catalog_src")
    assert got.count() == 25
    assert set(got.columns) == {"doc_id", "spans"}
