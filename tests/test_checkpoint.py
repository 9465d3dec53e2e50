"""Checkpoint / lineage / idempotent-repair (north-rule resumability)."""
import json
import os

import pytest
from pyspark.sql import functions as F

from vector2dggs_spark import index, write_partitioned
from vector2dggs_spark.plans.checkpoint import (
    index_checkpointed,
    read_manifest,
    repair_partition,
    stage_checkpoint,
    verify_lineage,
    write_lineage,
)
from vector2dggs_spark.sources.documents import documents_df


@pytest.fixture(scope="module")
def docs(spark):
    df = documents_df(spark, 150, seed=11).cache()
    df.count()
    return df


def test_stage_checkpoint_reuse(spark, tmp_path):
    cp = str(tmp_path / "cp")
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    out1 = stage_checkpoint(df, cp, "s1", "fp1")
    assert out1.count() == 100
    m = read_manifest(cp, "s1")
    assert m["rows"] == 100 and m["fingerprint"] == "fp1"
    # same fingerprint: reused (plan reads parquet, no recompute of df)
    out2 = stage_checkpoint(spark.range(5).toDF("id"), cp, "s1", "fp1")
    assert out2.count() == 100  # stale df ignored — manifest hit
    # changed fingerprint: recomputed
    out3 = stage_checkpoint(spark.range(5, 10).toDF("id"), cp, "s1", "fp2")
    assert out3.count() == 5
    assert read_manifest(cp, "s1")["fingerprint"] == "fp2"


def test_index_checkpointed_resume(spark, docs, tmp_path):
    cp = str(tmp_path / "cp2")
    r1 = index_checkpointed(spark, docs, cp, "v1", dggs="geohash", resolution=5, parent_res=2)
    n1 = r1.cells.count()
    assert n1 > 0
    assert "prepare" in r1.manifests and "cells" in r1.manifests
    # resume: second run with same fingerprint reuses both stages
    r2 = index_checkpointed(spark, docs, cp, "v1", dggs="geohash", resolution=5, parent_res=2)
    assert r2.cells.count() == n1
    assert r2.manifests["cells"]["written_at"] == r1.manifests["cells"]["written_at"]


def test_index_checkpointed_threads_crs_and_rejects_unknown(spark, tmp_path):
    """ADVICE r02 high: --source_crs through the checkpoint path must
    reproject (not parse meters as degrees), the fingerprint must key on
    the CRS config (no stale aliasing), and unsupported options fail
    loudly."""
    from vector2dggs_spark.geometry.crs import get_crs
    from vector2dggs_spark.sources.documents import DOCUMENTS_SCHEMA

    # one NZTM-projected point document (Chatham-ish lon/lat -> EPSG:2193)
    lon, lat = -176.4, -44.1
    e, n = get_crs(2193).forward([lon], [lat])
    wkt = f"POINT ({e[0]:.3f} {n[0]:.3f})"
    pdocs = spark.createDataFrame(
        [("d0", [{"kind": "geometry", "text": wkt, "media_ref": None, "offset": 0}])],
        schema=DOCUMENTS_SCHEMA,
    )
    cp = str(tmp_path / "cp_crs")
    r = index_checkpointed(spark, pdocs, cp, "v1", dggs="geohash", resolution=5,
                           parent_res=2, source_crs=2193)
    cells = [row["geohash_05"] for row in r.cells.collect()]
    expected = index(spark, pdocs, dggs="geohash", resolution=5, parent_res=2,
                     source_crs=2193).cells.collect()
    assert cells == [row["geohash_05"] for row in expected]

    # same fingerprint string, different CRS config -> stages NOT reused
    r2 = index_checkpointed(spark, pdocs, cp, "v1", dggs="geohash", resolution=5,
                            parent_res=2)  # no source_crs: coords are meters
    fp1 = r.manifests["prepare"]["fingerprint"]
    fp2 = r2.manifests["prepare"]["fingerprint"]
    assert fp1 != fp2 and "crs2193" in fp1 and "crsNone" in fp2

    with pytest.raises(ValueError, match="unsupported options"):
        index_checkpointed(spark, pdocs, cp, "v1", dggs="geohash", resolution=5,
                           bogus_flag=True)


def test_verify_lineage_empty_dataset(spark, tmp_path):
    """Zero-row lineage dataset (or legacy output) must report a diff,
    not crash on schema inference (ADVICE r02 low)."""
    out = str(tmp_path / "empty_out")
    os.makedirs(out)
    empty = spark.createDataFrame([], "geohash_02 string, n long")
    write_lineage(empty.limit(0), out, "geohash_02", {})
    assert verify_lineage(spark, out) == {}


def test_lineage_and_repair(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    r = index(spark, docs, dggs="geohash", resolution=6, parent_res=4)
    r.cells.cache()
    write_partitioned(r, out)
    lineage = write_lineage(r.cells, out, r.parent_col, {"dggs": "geohash", "res": 5})
    assert lineage["total_rows"] == r.cells.count()
    assert not verify_lineage(spark, out)  # no mismatches
    # corrupt one partition: delete its files, then repair idempotently
    victims = [d for d in os.listdir(out) if d.startswith("geohash_04=")]
    victim = victims[0]
    vdir = os.path.join(out, victim)
    for fn in os.listdir(vdir):
        os.remove(os.path.join(vdir, fn))
    os.rmdir(vdir)
    bad = verify_lineage(spark, out)
    assert list(bad) == [victim.split("=", 1)[1]]
    repair_partition(r.cells, out, r.parent_col, victim.split("=", 1)[1])
    assert not verify_lineage(spark, out)
    # repair is idempotent: running again changes nothing
    repair_partition(r.cells, out, r.parent_col, victim.split("=", 1)[1])
    assert not verify_lineage(spark, out)
    with open(os.path.join(out, "_LINEAGE.json")) as f:
        assert json.load(f)["config"]["dggs"] == "geohash"
