"""Build the spark-submit deployment artifact (north-rule deploy path:
``spark-submit --py-files vector2dggs_spark.zip submit.py ...`` on a
multi-executor cluster).

Produces ``dist/vector2dggs_spark.zip`` (the package, import-rooted, no
__pycache__, deterministic entry order + zeroed timestamps so the
artifact hash is reproducible) and ``dist/submit.py`` (the primary
application file spark-submit needs — spark-submit has no ``-m``; the
runner just dispatches to ``vector2dggs_spark.cli.main``).

Usage:  python scripts/make_pyfiles.py [dist_dir]
"""
from __future__ import annotations

import sys
import zipfile
from pathlib import Path

RUNNER = '''\
"""spark-submit primary file: dispatch to the packaged CLI.

    spark-submit --master <master> --py-files vector2dggs_spark.zip \\
        submit.py geohash /data/documents.parquet /data/cells -r 9 -pr 3
"""
import sys

from vector2dggs_spark.cli import main

sys.exit(main())
'''


def build(dist: Path) -> Path:
    repo = Path(__file__).resolve().parent.parent
    pkg = repo / "vector2dggs_spark"
    dist.mkdir(parents=True, exist_ok=True)
    zpath = dist / "vector2dggs_spark.zip"
    files = sorted(
        p for p in pkg.rglob("*.py") if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(repo)))
            info.date_time = (1980, 1, 1, 0, 0, 0)
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, p.read_bytes())
    (dist / "submit.py").write_text(RUNNER)
    return zpath


if __name__ == "__main__":
    out = build(Path(sys.argv[1]) if len(sys.argv) > 1 else Path("dist"))
    print(out)
