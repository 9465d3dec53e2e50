"""CLI — mirrors the reference's command surface
(``vector2dggs {h3|rhp|geohash} INPUT OUTPUT -r R [-pr P] [-co] [--geo ...]``,
``/root/reference/vector2dggs/cli_factory.py:26-150``) for spark-submit:

    spark-submit --master <cluster> --py-files vector2dggs_spark.zip submit.py \
        h3 /path/documents.parquet /path/out -r 9 -pr 3 --geo point

INPUT is a parquet (or directory of parquet) documents table with the
interleaved (doc_id, spans) schema.  Runs on whatever master the
environment provides (local[N] default via SPARK_GRAFT_CPUS).
"""
from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

VALID_COMPRESSION = {"none", "uncompressed", "snappy", "gzip", "lz4", "zstd"}
SORT_METHODS = {"geohash", "morton", "hilbert", "none"}  # O1
GEO_MODES = {"none", "point", "polygon"}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vector2dggs_spark")
    sub = p.add_subparsers(dest="dggs", required=True)
    from vector2dggs_spark.dggs import available

    for name in available():
        sp = sub.add_parser(name, help=f"index into {name} cells")
        sp.add_argument("vector_input")
        sp.add_argument("output_directory")
        sp.add_argument("-r", "--resolution", type=int, required=True)
        sp.add_argument("-pr", "--parent_res", type=int, default=None)
        sp.add_argument("-id", "--id_field", default="doc_id")
        sp.add_argument("-k", "--keep_attributes", action="store_true",
                        help="carry the full span payload on every cell row")
        sp.add_argument("-co", "--compact", action="store_true")
        sp.add_argument("-c", "--cut_threshold", type=float, default=None,
                        help="katana bbox-area threshold in deg^2 (0 disables)")
        sp.add_argument("--source_crs", type=int, default=None,
                        help="EPSG code of the input WKT coordinates (reference --crs)")
        sp.add_argument("--cut_crs", type=int, default=None,
                        help="projected EPSG code to bisect in (reference --cut_crs)")
        sp.add_argument("--cut_threshold_units2", type=float, default=None,
                        help="katana threshold in cut-CRS squared units (e.g. m^2)")
        sp.add_argument("-s", "--spatial_sorting", default="geohash", choices=sorted(SORT_METHODS))
        sp.add_argument("-cp", "--compression", default="snappy")
        sp.add_argument("--geo", default="none", choices=sorted(GEO_MODES))
        sp.add_argument("-o", "--overwrite", action="store_true")
        sp.add_argument("--cpus", type=int, default=None)
        sp.add_argument("--checkpoint", default=None)
    return p


def resolve_output_path(output_directory: str, overwrite: bool) -> Path:
    """reference common.py:118-133."""
    out = Path(output_directory)
    if out.exists() and any(out.iterdir()):
        if not overwrite:
            raise FileExistsError(
                f"output directory {out} exists and is not empty (use -o to overwrite)"
            )
        shutil.rmtree(out)
    return out


def validate_compression(value: str) -> str:
    """reference common.py:76-89."""
    if value not in VALID_COMPRESSION:
        raise ValueError(f"invalid compression {value!r}; one of {sorted(VALID_COMPRESSION)}")
    return value


def main(argv: list[str] | None = None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    validate_compression(args.compression)
    resolve_output_path(args.output_directory, args.overwrite)

    from vector2dggs_spark import index, write_partitioned
    from vector2dggs_spark.plans.checkpoint import index_checkpointed, write_lineage
    from vector2dggs_spark.session import get_spark
    from vector2dggs_spark.sources.sinks import write_geoparquet

    owns_spark = spark is None
    if spark is None:
        spark = get_spark(cores=args.cpus, app=f"vector2dggs_spark:{args.dggs}")
    try:
        from vector2dggs_spark.sources.documents import read_documents

        docs = read_documents(spark, args.vector_input)
        if args.id_field != "doc_id":
            # reference `-id` semantics: use a caller-chosen unique column
            # as the feature id (common.py:624-628)
            docs = docs.withColumnRenamed(args.id_field, "doc_id")
        if args.checkpoint:
            run = index_checkpointed(
                spark, docs, args.checkpoint,
                fingerprint=f"{args.vector_input}",
                dggs=args.dggs, resolution=args.resolution,
                parent_res=args.parent_res, compact=args.compact,
                cut_threshold_deg2=args.cut_threshold,
                source_crs=args.source_crs,
                cut_crs=args.cut_crs,
                cut_threshold_units2=args.cut_threshold_units2,
                spatial_sort=args.spatial_sorting,
                keep_spans=args.keep_attributes,
            )
            from vector2dggs_spark.dggs import get_backend
            from vector2dggs_spark.plans.pipeline import IndexResult

            backend = get_backend(args.dggs)
            pr = args.parent_res if args.parent_res is not None else backend.default_parent_res(args.resolution)
            result = IndexResult(
                run.cells, backend, args.resolution, pr,
                backend.col_name(args.resolution), backend.col_name(pr),
            )
        else:
            result = index(
                spark, docs, dggs=args.dggs, resolution=args.resolution,
                parent_res=args.parent_res, compact=args.compact,
                keep_spans=args.keep_attributes,
                cut_threshold_deg2=args.cut_threshold,
                spatial_sort=args.spatial_sorting,
                source_crs=args.source_crs,
                cut_crs=args.cut_crs,
                cut_threshold_units2=args.cut_threshold_units2,
            )
        result.cells.cache()
        if args.geo == "none":
            write_partitioned(result, args.output_directory,
                              compression=args.compression, overwrite=True)
        else:
            write_geoparquet(result, args.output_directory, mode=args.geo,
                             compression=args.compression, overwrite=True)
        write_lineage(
            result.cells, args.output_directory, result.parent_col,
            {
                "dggs": args.dggs, "resolution": args.resolution,
                "parent_res": result.parent_res, "compact": args.compact,
                "geo": args.geo, "input": args.vector_input,
                # deployment provenance: on a cluster submit this records
                # yarn/k8s, proving the library didn't demote the master
                "master": spark.sparkContext.master,
            },
        )
        return 0
    finally:
        if owns_spark:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
