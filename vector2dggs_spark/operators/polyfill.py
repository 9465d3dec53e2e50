"""Core indexing stage: polyfill / linetrace / point-index (SURVEY.md §2.4).

One ``mapInPandas`` stage handles all three geometry types per Arrow
batch — the Spark restatement of the reference's per-type dispatch
(``vectorindexer.py:24-43``) fused with ``_geo_to_cells``'s
assign→explode→dropna (``vectorindexer.py:91-103``): the UDF *emits*
the exploded (part_uid, doc_id, cell) rows directly, so no separate
explode shuffle exists.

Points take a fully-vectorized path (fixed-width WKB parsed with one
``np.frombuffer`` per batch + vectorized cell encode) — at web scale
points dominate and never touch per-geometry Python.  Polygons/lines
loop per geometry *within* the batch (each is a variable-size
numpy kernel call, exactly like the reference's per-geometry library
calls, but Arrow-batched).

Line cells are deduped per feature part in-batch; cross-part dedup
((cell, doc) keep-first, reference h3vectorindexer.py:39 / O5) is done
by the caller with ``dropDuplicates`` only for line rows.
"""
from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from vector2dggs_spark.dggs import Backend
from vector2dggs_spark.geometry import wkt as gw

CELLS_SCHEMA = "doc_id string, part_uid string, geom_type string, cell string"


def index_cells(prepared: DataFrame, backend: Backend, resolution: int) -> DataFrame:
    """prepared frame -> exploded (doc_id, part_uid, geom_type, cell)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _index_batch(pdf, backend, resolution)
            if out is not None:
                yield out

    return prepared.mapInPandas(run, schema=CELLS_SCHEMA)


def _index_batch(pdf: pd.DataFrame, backend: Backend, res: int):
    parts: list[pd.DataFrame] = []

    pts = pdf[pdf["geom_type"] == "Point"]
    if len(pts):
        # vectorized fixed-width WKB decode: byte 0 order, 1-4 type, 5-20 xy
        buf = np.frombuffer(b"".join(pts["wkb"]), dtype=np.uint8).reshape(-1, 21)
        xy = buf[:, 5:].copy().view("<f8").reshape(-1, 2)
        cells = backend.point_to_cell(xy[:, 1], xy[:, 0], res)
        parts.append(
            pd.DataFrame(
                {
                    "doc_id": pts["doc_id"].to_numpy(),
                    "part_uid": pts["part_uid"].to_numpy(),
                    "geom_type": "Point",
                    "cell": cells,
                }
            )
        )

    for gtype, fn in (("Polygon", _poly_cells), ("LineString", _line_cells)):
        sub = pdf[pdf["geom_type"] == gtype]
        if not len(sub):
            continue
        doc_out: list[np.ndarray] = []
        uid_out: list[np.ndarray] = []
        cell_out: list[np.ndarray] = []
        for doc_id, uid, wkb in zip(sub["doc_id"], sub["part_uid"], sub["wkb"]):
            cells = fn(wkb, backend, res)
            if cells.size == 0:  # P5: drop features yielding no cells
                continue
            doc_out.append(np.repeat(doc_id, cells.size))
            uid_out.append(np.repeat(uid, cells.size))
            cell_out.append(cells)
        if doc_out:
            parts.append(
                pd.DataFrame(
                    {
                        "doc_id": np.concatenate(doc_out),
                        "part_uid": np.concatenate(uid_out),
                        "geom_type": gtype,
                        "cell": np.concatenate(cell_out),
                    }
                )
            )

    if not parts:
        return None
    return pd.concat(parts, ignore_index=True)


def _poly_cells(wkb: bytes, backend: Backend, res: int) -> np.ndarray:
    _, rings = gw.from_wkb(wkb)
    return np.asarray(backend.polyfill(rings, res), dtype=str)


def _line_cells(wkb: bytes, backend: Backend, res: int) -> np.ndarray:
    _, coords = gw.from_wkb(wkb)
    cells = np.asarray(backend.linetrace(coords, res), dtype=str)
    # per-part dedup (cross-part dedup happens in the caller)
    _, idx = np.unique(cells, return_index=True)
    return cells[np.sort(idx)]
