"""GeoParquet output mode (S7): structure mirrors the reference's
output_validation.py:59-78 (geometry column + valid geo metadata)."""
import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from vector2dggs_spark import get_backend, index
from vector2dggs_spark.geometry.kernels import points_in_polygon
from vector2dggs_spark.geometry.wkt import from_wkb
from vector2dggs_spark.sources.documents import documents_df
from vector2dggs_spark.sources.sinks import write_geoparquet


@pytest.fixture(scope="module")
def result(spark):
    docs = documents_df(spark, 120, seed=3)
    r = index(spark, docs, dggs="geohash", resolution=5, parent_res=3)
    r.cells.cache().count()
    return r


def _files(out):
    for root, _d, files in os.walk(out):
        for fn in files:
            if fn.endswith(".parquet"):
                yield os.path.join(root, fn)


@pytest.mark.parametrize("mode", ["point", "polygon"])
def test_geoparquet_structure(spark, result, tmp_path, mode):
    out = str(tmp_path / mode)
    write_geoparquet(result, out, mode=mode)
    files = list(_files(out))
    assert files
    for path in files:
        t = pq.read_table(path)
        assert "geometry" in t.column_names
        meta = t.schema.metadata
        geo = json.loads(meta[b"geo"])
        assert geo["version"] == "1.1.0"
        assert geo["primary_column"] == "geometry"
        col = geo["columns"]["geometry"]
        assert col["encoding"] == "WKB"
        assert col["crs"]["id"] == {"authority": "EPSG", "code": 4326}
        assert col["geometry_types"] == (["Point"] if mode == "point" else ["Polygon"])
        bbox = col["bbox"]
        assert bbox[0] <= bbox[2] and bbox[1] <= bbox[3]
        # every geometry within the file bbox and decodes as valid WKB
        for wkb in t.column("geometry").to_pylist()[:20]:
            g = from_wkb(wkb)
            assert g[0] == ("Point" if mode == "point" else "Polygon")


def test_point_geometry_is_cell_center(spark, result, tmp_path):
    out = str(tmp_path / "pt")
    write_geoparquet(result, out, mode="point")
    backend = get_backend("geohash")
    path = next(_files(out))
    t = pq.read_table(path).to_pandas()
    lat, lon = backend.cell_center(t["geohash_05"].to_numpy(dtype=str), 5)
    for idx, wkb in enumerate(t["geometry"][:50]):
        g = from_wkb(wkb)
        assert abs(g[1][0] - lon[idx]) < 1e-9
        assert abs(g[1][1] - lat[idx]) < 1e-9


def test_polygon_geometry_contains_center(spark, result, tmp_path):
    out = str(tmp_path / "pg")
    write_geoparquet(result, out, mode="polygon")
    backend = get_backend("geohash")
    path = next(_files(out))
    t = pq.read_table(path).to_pandas()
    lat, lon = backend.cell_center(t["geohash_05"].to_numpy(dtype=str), 5)
    for idx, wkb in enumerate(t["geometry"][:50]):
        g = from_wkb(wkb)
        inside = points_in_polygon(np.array([lon[idx]]), np.array([lat[idx]]), g[1])
        assert inside[0]


def test_h3_boundary_rings(spark):
    b = get_backend("h3")
    cells = b.point_to_cell(np.array([-44.0, -43.9]), np.array([-176.4, -176.3]), 7)
    rings = b.cell_boundary(cells, 7)
    assert rings.shape == (2, 7, 2)
    # closed, and center inside its own hexagon
    assert np.allclose(rings[:, 0], rings[:, 6])
    lat, lon = b.cell_center(cells, 7)
    for i in range(2):
        assert points_in_polygon(np.array([lon[i]]), np.array([lat[i]]), [rings[i]])[0]
    # hexagon vertices should be shared with neighbors: all 6 distinct
    for i in range(2):
        assert len({(round(x, 9), round(y, 9)) for x, y in rings[i][:6]}) == 6


@pytest.mark.parametrize("dggs,res,pr", [
    ("rhp", 8, 4), ("h3", 7, 3), ("s2", 13, 7), ("a5", 12, 6),
])
def test_geoparquet_all_backends(spark, tmp_path, dggs, res, pr):
    """S7 across every backend: both geo modes write valid GeoParquet
    with a geo 1.1.0 footer, and point geometries decode to the cell
    centers the backend kernel reports."""
    import json
    import struct

    import pyarrow.parquet as pq

    from vector2dggs_spark import index
    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.sources.documents import documents_df
    from vector2dggs_spark.sources.sinks import write_geoparquet

    docs = documents_df(spark, 60, seed=21)
    r = index(spark, docs, dggs=dggs, resolution=res, parent_res=pr)
    out = str(tmp_path / f"geo_{dggs}")
    write_geoparquet(r, out, mode="point", overwrite=True)
    files = [
        os.path.join(root, f)
        for root, _d, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert files
    t = pq.read_table(files[0])
    geo = json.loads(t.schema.metadata[b"geo"])
    assert geo["version"] == "1.1.0"
    assert geo["columns"]["geometry"]["geometry_types"] == ["Point"]
    b = get_backend(dggs)
    cells = t.column(r.cell_col).to_pylist()[:10]
    lat, lon = b.cell_center(cells, res)
    for i, wkb in enumerate(t.column("geometry").to_pylist()[:10]):
        x, y = struct.unpack_from("<2d", memoryview(wkb), 5)
        assert abs(x - lon[i]) < 1e-9 and abs(y - lat[i]) < 1e-9
    # polygon mode also writes (boundary rings per backend)
    out2 = str(tmp_path / f"geo_{dggs}_poly")
    write_geoparquet(r, out2, mode="polygon", overwrite=True)
    assert any(f.endswith(".parquet") for _r, _d, fs in os.walk(out2) for f in fs)


def test_footer_splice_is_footer_only(tmp_path):
    """rewrite_footer_metadata edits only the footer: the byte prefix up
    to the old footer start is identical after the upsert, the data
    round-trips, and existing KV keys survive."""
    import struct as _struct

    import pyarrow as pa

    from vector2dggs_spark.sources.parquet_footer import rewrite_footer_metadata

    path = str(tmp_path / "f.parquet")
    t = pa.table({"a": list(range(500)), "b": [f"s{i}" for i in range(500)]})
    pq.write_table(t, path, compression="zstd")
    before = open(path, "rb").read()
    footer_len = _struct.unpack("<I", before[-8:-4])[0]
    data_end = len(before) - 8 - footer_len

    rewrite_footer_metadata(path, {b"geo": b'{"v": 1}'})
    after = open(path, "rb").read()
    assert after[:data_end] == before[:data_end]  # zero data bytes touched
    md = pq.ParquetFile(path).metadata.metadata
    assert md[b"geo"] == b'{"v": 1}'
    assert b"ARROW:schema" in md  # pre-existing key preserved
    assert pq.read_table(path).drop_columns([]).equals(t)
    # upsert replaces, not duplicates
    rewrite_footer_metadata(path, {b"geo": b'{"v": 2}'})
    assert pq.ParquetFile(path).metadata.metadata[b"geo"] == b'{"v": 2}'


def test_geo_sink_composes_with_exploded_spans(spark, tmp_path):
    """VERDICT r04 #8: wide-media corpora get BOTH GeoParquet output and
    the payload-free flat companion.  write_geoparquet over a
    keep_spans="exploded" result works unchanged (the cell table is
    payload-free), the companion lands beside it with every cell doc
    represented, and a media_ref-only companion scan is ReadSchema-
    pruned to one column."""
    docs = documents_df(spark, 100, seed=12)
    r = index(spark, docs, dggs="geohash", resolution=5, parent_res=3,
              keep_spans="exploded")
    out = str(tmp_path / "geo")
    comp = str(tmp_path / "spans")
    write_geoparquet(r, out, mode="point")
    r.spans.write.parquet(comp)

    files = [
        os.path.join(root, f)
        for root, _d, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert files
    geo = json.loads(pq.read_table(files[0]).schema.metadata[b"geo"])
    assert geo["version"] == "1.1.0"
    # the cell table carries no span payload fields
    assert not ({"kind", "text", "media_ref"} & set(r.cells.columns))
    # companion scan selecting one field reads ONE parquet column
    plan = (
        spark.read.parquet(comp)
        .select("media_ref")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert m and "media_ref" in m[0]
    assert "text" not in m[0] and "kind" not in m[0]
    # every cell doc joins back onto the companion
    missing = (
        r.cells.select("doc_id")
        .distinct()
        .join(
            spark.read.parquet(comp).select("doc_id").distinct(),
            "doc_id",
            "left_anti",
        )
        .count()
    )
    assert missing == 0


def test_local_path_rejects_remote_schemes():
    """ADVICE r04: a remote-scheme output (hdfs/s3a/…) must fail fast on
    the driver with the real reason, not as an opaque executor
    FileNotFoundError inside the foreach."""
    from vector2dggs_spark.sources.sinks import _local_path

    assert _local_path("file:///tmp/a%20b.parquet") == "/tmp/a b.parquet"
    assert _local_path("/tmp/x.parquet") == "/tmp/x.parquet"
    with pytest.raises(ValueError, match="locally-mounted"):
        _local_path("hdfs://nn:8020/warehouse/part-0.parquet")
    with pytest.raises(ValueError, match="'s3a'"):
        _local_path("s3a://bucket/key/part-0.parquet")


def test_footer_splice_retry_heals_crashed_write(tmp_path):
    """ADVICE r04: a task kill mid-rewrite leaves the in-place footer
    region corrupt; the retry must find the fsync'd sidecar, restore the
    original tail exactly, and complete the splice — instead of dying on
    the corrupt trailer."""
    import struct as _struct

    import pyarrow as pa

    from vector2dggs_spark.sources.parquet_footer import rewrite_footer_metadata

    path = str(tmp_path / "f.parquet")
    t = pa.table({"a": list(range(200))})
    pq.write_table(t, path)
    before = open(path, "rb").read()
    size = len(before)
    footer_len = _struct.unpack("<I", before[-8:-4])[0]
    data_end = size - 8 - footer_len

    # simulate the crash point: sidecar written (original size + old
    # footer + old trailer), then the footer region half-overwritten
    # with garbage and the file truncated mid-write
    with open(path + ".footer.bak", "wb") as b:
        b.write(_struct.pack("<Q", size))
        b.write(before[data_end:size - 8])
        b.write(before[-8:])
    with open(path, "r+b") as f:
        f.seek(data_end)
        f.write(b"\x99" * (footer_len // 2))
        f.truncate(data_end + footer_len // 2)
    with pytest.raises(Exception):
        pq.read_table(path)  # really corrupt without recovery

    rewrite_footer_metadata(path, {b"geo": b'{"v": 9}'})
    assert not os.path.exists(path + ".footer.bak")
    after = open(path, "rb").read()
    assert after[:data_end] == before[:data_end]
    assert pq.ParquetFile(path).metadata.metadata[b"geo"] == b'{"v": 9}'
    assert pq.read_table(path).column("a").to_pylist() == list(range(200))


def test_footer_splice_no_stale_sidecar_after_success(tmp_path):
    """Successful splices must not leave sidecars behind (a stale one
    would roll back a LATER splice's result on the next call)."""
    import pyarrow as pa

    from vector2dggs_spark.sources.parquet_footer import rewrite_footer_metadata

    path = str(tmp_path / "g.parquet")
    pq.write_table(pa.table({"a": [1, 2, 3]}), path)
    rewrite_footer_metadata(path, {b"geo": b'{"v": 1}'})
    assert not os.path.exists(path + ".footer.bak")
    rewrite_footer_metadata(path, {b"k2": b"x"})
    md = pq.ParquetFile(path).metadata.metadata
    assert md[b"geo"] == b'{"v": 1}' and md[b"k2"] == b"x"


def test_attach_geo_runs_off_driver(spark, result, tmp_path, monkeypatch):
    """VERDICT r03 #1: the geo post-pass must not read data files on the
    driver.  Poison pq.read_table/write_table in the driver process (the
    executor python workers are separate processes, unaffected) and the
    full write_geoparquet still succeeds with exact per-file bboxes."""
    import pyarrow.parquet as _pq

    def _boom(*a, **k):
        raise AssertionError("driver-side pyarrow data-file I/O in geo post-pass")

    monkeypatch.setattr(_pq, "read_table", _boom)
    monkeypatch.setattr(_pq, "write_table", _boom)
    out = str(tmp_path / "offdriver")
    write_geoparquet(result, out, mode="point")
    monkeypatch.undo()

    files = list(_files(out))
    assert files
    for path in files:
        t = pq.read_table(path)
        geo = json.loads(t.schema.metadata[b"geo"])
        bbox = geo["columns"]["geometry"]["bbox"]
        # bbox is EXACT for this file's geometries
        import struct as _struct

        xs, ys = [], []
        for wkb in t.column("geometry").to_pylist():
            x, y = _struct.unpack_from("<2d", memoryview(wkb), 5)
            xs.append(x)
            ys.append(y)
        assert bbox == [min(xs), min(ys), max(xs), max(ys)]
