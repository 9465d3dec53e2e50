"""Frozen-output checks for the rows-only contract pipelines.

The driver's correctness gate can only row-count queries without a SQL
oracle; these hashes pin the exact canonicalized cell sets (VERDICT r01
#9) so a pipeline regression cannot hide behind a stable row count.
Regenerate intentionally with scripts/freeze_goldens.py."""
import json
import os

import pytest

from scripts.freeze_goldens import ROWS_ONLY, canon_md5
from vector2dggs_spark.entrypoints import QUERIES

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "pipelines.json")
with open(GOLDEN_PATH) as f:
    GOLDEN = json.load(f)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_pipeline_matches_golden(spark, name):
    fn, _ = QUERIES[name]
    pdf = fn(spark, "/root/testdata/sf0.001").toPandas()
    assert len(pdf) == GOLDEN[name]["rows"], f"{name}: row count drifted"
    assert canon_md5(pdf) == GOLDEN[name]["md5"], f"{name}: cell set drifted"
