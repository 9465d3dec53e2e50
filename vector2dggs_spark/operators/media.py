"""Multimodal media operators — Spark-side plumbing with STUBBED decode.

Media payloads are opaque ``binary`` columns with typed metadata; this
module implements the real Spark dataflow (schema, Arrow batching,
``mapInPandas`` shape, partitioning by parent cell) around a decode step
that is deterministic-fake in this container (no image/audio libs — see
the decode gate below).  Swap ``_decode_stub`` for a PIL/ffmpeg call on
a real cluster without touching the plumbing.
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

DECODED_SCHEMA = (
    "media_ref string, width int, height int, format string, n_frames int"
)
FEATURES_SCHEMA = "media_ref string, frame int, features array<float>"
FEATURE_DIM = 16


def _decode_stub(refs: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode: metadata derived from md5(media_ref).

    A real decode would read the binary payload; the container has no
    imaging libraries, so the stub keeps the batch shape and determinism
    while clearly not decoding pixels."""
    rows = []
    for ref in refs:
        h = hashlib.md5(ref.encode()).digest()
        rows.append(
            {
                "media_ref": ref,
                "width": 256 + h[0] * 4,
                "height": 256 + h[1] * 4,
                "format": ["png", "jpeg", "webp"][h[2] % 3],
                "n_frames": 1 + (h[3] % 4),
            }
        )
    return pd.DataFrame(rows)


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
            yield _decode_stub(pdf["media_ref"].drop_duplicates())

    return media.select("media_ref").dropDuplicates(["media_ref"]).mapInPandas(
        run, schema=DECODED_SCHEMA
    )


def extract_frame_features(decoded: DataFrame) -> DataFrame:
    """Frame-sample + feature-extract: one row per (media, frame) with a
    deterministic FEATURE_DIM-float vector (fake features from the ref
    hash — the real path would embed decoded frames).  Demonstrates the
    one-to-many mapInPandas shape used for video frame sampling."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                for frame in range(int(row["n_frames"])):
                    seed = hashlib.md5(f"{row['media_ref']}#{frame}".encode()).digest()
                    feats = (np.frombuffer(seed, dtype=np.uint8)[:FEATURE_DIM].astype(
                        np.float32
                    ) / 255.0)
                    out.append(
                        {"media_ref": row["media_ref"], "frame": frame, "features": feats}
                    )
            if out:
                yield pd.DataFrame(out)

    return decoded.mapInPandas(run, schema=FEATURES_SCHEMA)
