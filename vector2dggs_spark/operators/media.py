"""Multimodal media operators — Spark-side plumbing with STUBBED decode.

Media payloads are opaque ``binary`` columns with typed metadata; this
module implements the real Spark dataflow (schema, Arrow batching,
``mapInPandas`` shape, partitioning by parent cell) around a decode step
that is deterministic-fake in this container (no image/audio libs — see
the decode gate below).  Swap ``_decode_stub`` for a PIL/ffmpeg call on
a real cluster without touching the plumbing.

The stub math is md5-based on purpose: it is exactly reproducible in
ANSI SQL, so the contract query (q22) has a full DuckDB oracle even
though the Spark path runs through ``mapInPandas``.
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StructField,
    StructType,
)

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

DECODED_SCHEMA = (
    "media_ref string, width int, height int, format string, n_frames int"
)
FEATURE_DIM = 16
_FORMATS = np.array(["png", "jpeg", "webp"])


def _md5_bytes(keys: np.ndarray) -> np.ndarray:
    """(n,) str -> (n, 16) uint8 digest matrix.  The per-key hash call is
    the stand-in for 'decode this payload'; everything around it is
    vectorized numpy (no iterrows / per-row DataFrame construction)."""
    buf = b"".join(hashlib.md5(k.encode()).digest() for k in keys)
    return np.frombuffer(buf, dtype=np.uint8).reshape(-1, 16)


def _decode_stub(refs: np.ndarray) -> pd.DataFrame:
    """Deterministic fake decode: metadata derived from md5(media_ref).

    A real decode would read the binary payload; the container has no
    imaging libraries, so the stub keeps the batch shape and determinism
    while clearly not decoding pixels."""
    h = _md5_bytes(refs)
    return pd.DataFrame(
        {
            "media_ref": refs,
            "width": (256 + h[:, 0].astype(np.int32) * 4),
            "height": (256 + h[:, 1].astype(np.int32) * 4),
            "format": _FORMATS[h[:, 2] % 3],
            "n_frames": (1 + (h[:, 3] % 4)).astype(np.int32),
        }
    )


def decode_media(media: DataFrame) -> DataFrame:
    """(…, media_ref) -> decoded metadata table via Arrow-batched
    mapInPandas.  With PIL installed this would decode real payloads;
    here the stub path is taken (HAVE_PIL is False in this container)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if HAVE_PIL:  # pragma: no cover
                raise NotImplementedError(
                    "real decode path: read payload bytes and decode via PIL"
                )
            yield _decode_stub(pdf["media_ref"].drop_duplicates().to_numpy())

    return media.select("media_ref").dropDuplicates(["media_ref"]).mapInPandas(
        run, schema=DECODED_SCHEMA
    )


def extract_frame_features(decoded: DataFrame) -> DataFrame:
    """Frame-sample + feature-extract: one row per (media, frame) with a
    deterministic FEATURE_DIM-float vector (fake features from the ref
    hash — the real path would embed decoded frames).  Demonstrates the
    one-to-many mapInPandas shape used for video frame sampling.

    All input columns are carried through (schema = input + frame +
    features), so downstream queries keep the decode metadata without a
    second decode pass.  Batch assembly is fully vectorized: repeat by
    n_frames, per-group frame counter via cumsum arithmetic."""
    # StructType.add mutates in place — build a fresh struct so the input
    # DataFrame's cached schema object is untouched.
    out_schema = StructType(
        list(decoded.schema.fields)
        + [
            StructField("frame", IntegerType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            n = pdf["n_frames"].to_numpy().astype(np.int64)
            total = int(n.sum())
            if total == 0:
                continue
            idx = np.repeat(np.arange(len(pdf)), n)
            frame = (np.arange(total) - np.repeat(np.cumsum(n) - n, n)).astype(
                np.int32
            )
            out = pdf.iloc[idx].reset_index(drop=True)
            keys = np.array(
                [f"{r}#{f}" for r, f in zip(out["media_ref"].to_numpy(), frame)]
            )
            # b/256 is a dyadic rational: exact in float32 AND in any
            # double-precision oracle recomputation (cross-engine safe).
            feats = _md5_bytes(keys)[:, :FEATURE_DIM].astype(np.float32) / np.float32(
                256.0
            )
            out["frame"] = frame
            out["features"] = list(feats)
            yield out

    return decoded.mapInPandas(run, schema=out_schema)
