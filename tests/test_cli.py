"""CLI smoke + error paths (mirrors reference tests/classes/errors.py
roles: bad compression, overwrite guard, resolution checks)."""
import json
import os

import pytest

from vector2dggs_spark.cli import main, resolve_output_path, validate_compression
from vector2dggs_spark.sources.documents import documents_df


@pytest.fixture(scope="module")
def docs_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("docs") / "documents.parquet")
    documents_df(spark, 120, seed=5).write.parquet(path)
    return path


def test_cli_end_to_end(spark, docs_parquet, tmp_path):
    out = str(tmp_path / "out")
    rc = main([
        "geohash", docs_parquet, out, "-r", "5", "-pr", "3", "-o",
    ], spark=spark)
    assert rc == 0
    assert any(d.startswith("geohash_03=") for d in os.listdir(out))
    with open(os.path.join(out, "_LINEAGE.json")) as f:
        lineage = json.load(f)
    assert lineage["config"]["dggs"] == "geohash"
    assert lineage["total_rows"] > 0


def test_cli_geo_mode(spark, docs_parquet, tmp_path):
    out = str(tmp_path / "geo")
    rc = main([
        "rhp", docs_parquet, out, "-r", "4", "-pr", "2", "--geo", "point", "-o",
    ], spark=spark)
    assert rc == 0
    files = [os.path.join(r, f) for r, _, fs in os.walk(out) for f in fs if f.endswith(".parquet")]
    import pyarrow.parquet as pq

    assert files and b"geo" in (pq.read_table(files[0]).schema.metadata or {})


def test_cli_compaction_checkpoint(spark, docs_parquet, tmp_path):
    out = str(tmp_path / "co")
    cp = str(tmp_path / "cp")
    rc = main([
        "geohash", docs_parquet, out, "-r", "5", "-pr", "3", "-co",
        "--checkpoint", cp, "-o",
    ], spark=spark)
    assert rc == 0
    assert os.path.exists(os.path.join(cp, "compacted", "_MANIFEST.json"))


def test_cli_error_paths(spark, docs_parquet, tmp_path):
    with pytest.raises(ValueError, match="invalid compression"):
        validate_compression("brotli9000")
    out = tmp_path / "exists"
    out.mkdir()
    (out / "junk").write_text("x")
    with pytest.raises(FileExistsError):
        resolve_output_path(str(out), overwrite=False)
    # overwrite clears
    resolve_output_path(str(out), overwrite=True)
    assert not out.exists()
    with pytest.raises(ValueError, match="parent resolution"):
        main(["geohash", docs_parquet, str(tmp_path / "x"), "-r", "3", "-pr", "3"], spark=spark)
    with pytest.raises(SystemExit):
        main(["nope", docs_parquet, str(tmp_path / "y"), "-r", "3"], spark=spark)
