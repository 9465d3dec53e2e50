"""Exploded-spans companion table (VERDICT r03 #6).

``keep_spans=True`` re-joins the full ``spans`` payload array onto every
(cell, doc) row — the reference's keep-attributes analog
(``/root/reference/vector2dggs/common.py:629-631``).  For wide-media
corpora that shuffles every document's full payload through the cell
join, and Parquet's nested-column pruning cannot narrow a scan to one
field of an ``array<struct<...>>`` (documented at commit 099bae7).

The scale-path alternative is a flat companion table::

    doc_id string, span_idx int, kind string, text string,
    media_ref string, offset int

Each field is a top-level Parquet column, so a consumer selecting, say,
``media_ref`` scans ONE column (ReadSchema-pruned — plan-asserted in
tests), and the cell join stays payload-free.  ``reassemble_spans``
restores the exact original span sequences (``span_idx`` order), so the
pair is lossless: ``reassemble_spans(explode_spans(docs)) == docs`` up
to null-vs-empty normalization (documents with NULL or empty ``spans``
reassemble to an empty array — collect_list semantics).

``index(keep_spans="exploded")`` returns the companion on
``IndexResult.spans`` instead of joining payloads into the cell table.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPAN_FIELDS = ("kind", "text", "media_ref", "offset")


def explode_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, spans) -> flat (doc_id, span_idx, kind, text, media_ref,
    offset); documents with NULL/empty spans keep one all-null row so no
    doc_id is lost."""
    return docs.select(
        "doc_id", F.posexplode_outer("spans").alias("span_idx", "__s")
    ).select(
        "doc_id",
        "span_idx",
        *[F.col(f"__s.{f}").alias(f) for f in SPAN_FIELDS],
    )


def reassemble_spans(exploded: DataFrame) -> DataFrame:
    """Inverse of :func:`explode_spans`: rebuild (doc_id, spans) with
    the original span order (sorted by span_idx — array_sort on the
    struct orders by its first field, and span_idx is unique per doc).
    NULL/empty-spans docs come back as empty arrays."""
    tagged = F.when(
        F.col("span_idx").isNotNull(),
        F.struct("span_idx", *SPAN_FIELDS),
    )
    ordered = F.array_sort(F.collect_list(tagged))
    spans = F.transform(
        ordered,
        lambda s: F.struct(*[s[f].alias(f) for f in SPAN_FIELDS]),
    )
    return exploded.groupBy("doc_id").agg(spans.alias("spans"))
