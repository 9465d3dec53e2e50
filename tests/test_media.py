"""Multimodal plumbing: decode (stub) + frame features (SURVEY §2 media).

The decode is container-stubbed (deterministic md5 metadata); these
tests pin the Spark-side dataflow: Arrow batch shapes, metadata
pass-through, per-media frame fan-out, and feature determinism.
"""
import hashlib

import numpy as np
import pytest

from vector2dggs_spark.operators.media import (
    FEATURE_DIM,
    decode_media,
    extract_frame_features,
)


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(
        [(f"tile://8/{i}/{i * 3 % 256}",) for i in range(40)] + [("tile://8/0/0",)],
        "media_ref string",
    )


def test_decode_dedup_and_determinism(spark, media):
    out = decode_media(media).toPandas().sort_values("media_ref")
    assert len(out) == 40  # duplicate ref deduped
    h = hashlib.md5(b"tile://8/0/0").digest()
    row = out[out.media_ref == "tile://8/0/0"].iloc[0]
    assert row.width == 256 + h[0] * 4
    assert row.height == 256 + h[1] * 4
    assert row.format == ["png", "jpeg", "webp"][h[2] % 3]
    assert row.n_frames == 1 + h[3] % 4


def test_features_fanout_and_passthrough(spark, media):
    dec = decode_media(media)
    feats = extract_frame_features(dec).toPandas()
    decoded = dec.toPandas().set_index("media_ref")
    # one row per (media, frame); all decode metadata carried through
    counts = feats.groupby("media_ref").frame.agg(["count", "min", "max"])
    for ref, c in counts.iterrows():
        n = int(decoded.loc[ref, "n_frames"])
        assert (c["count"], c["min"], c["max"]) == (n, 0, n - 1)
    assert {"width", "height", "format", "n_frames"} <= set(feats.columns)
    row = feats.iloc[0]
    seed = hashlib.md5(f"{row.media_ref}#{row.frame}".encode()).digest()
    expect = np.frombuffer(seed, np.uint8)[:FEATURE_DIM].astype(np.float32) / np.float32(256.0)
    assert np.array_equal(np.asarray(row.features, dtype=np.float32), expect)
