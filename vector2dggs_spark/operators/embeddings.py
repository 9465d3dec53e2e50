"""Embedding near-dup / similarity operators — the Arrow scale path.

The contract queries q20/q26 define the semantics in cross-engine SQL
(functions/textops.py) and stay the DuckDB-checked oracles.  At scale,
however, Catalyst's higher-order functions (``aggregate``/``zip_with``)
are *interpreted* per element — the 8x12-plane signature fold measured
SLOWER at local[32] than local[8] (allocation/GC-bound: 0.33 normalized
scaling efficiency, BENCH/BASELINE.md job D) — so the production path
computes the identical signatures with one Arrow-batched numpy matmul
(BLAS) per partition and keeps only the band equi-join and the exact
cosine refilter in the plan.  Parity with the SQL formulation is pinned
row-for-row by pytest (test_entry_contract) and by sharing q26's DuckDB
oracle (q32).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector2dggs_spark.functions.textops import (
    EMB_DIM,
    LSH_BANDS,
    LSH_BITS_PER_BAND,
    _rademacher_planes,
)


def _sig_pack_udf(bands: int, bits: int, dim: int, seed: int):
    """Arrow-batched UDF: embedding -> (band-value array, packed float32
    blob) in ONE pass over the vector.

    Bit order matches textops.embedding_near_dup_lsh_sql exactly: plane
    ``i*bits + b`` contributes ``2^(bits-1-b)`` to band ``i``; a bit is
    set iff the float64 dot with the Rademacher plane is >= 0.
    """
    planes = np.asarray(_rademacher_planes(bands * bits, dim, seed), dtype=np.float64)
    weights = np.array([1 << (bits - 1 - b) for b in range(bits)], dtype=np.int64)

    @F.pandas_udf("struct<sig: array<bigint>, pk: binary>")
    def _sig_pack(emb: pd.Series) -> pd.DataFrame:
        if len(emb) == 0:
            return pd.DataFrame({"sig": [], "pk": []})
        m32 = np.stack(emb.to_numpy()).astype(np.float32)
        m = m32.astype(np.float64)
        sign_bits = (m @ planes.T) >= 0.0
        packed = (
            sign_bits.reshape(len(m), bands, bits).astype(np.int64) * weights
        ).sum(axis=2)
        blobs = [row.tobytes() for row in np.ascontiguousarray(m32)]
        return pd.DataFrame({"sig": list(packed), "pk": blobs})

    return _sig_pack


def band_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = LSH_BANDS,
    bits: int = LSH_BITS_PER_BAND,
    dim: int = EMB_DIM,
    seed: int = 1337,
) -> DataFrame:
    """(id, band_idx, band_val) rows — sign-bit LSH signatures (the
    public building block; near_dup_lsh uses the same UDF with the
    packed vector carried alongside)."""
    sig = _sig_pack_udf(bands, bits, dim, seed)
    return df.select(
        F.col(id_col), sig(F.col(vec_col)).alias("__sp")
    ).select(
        F.col(id_col),
        F.posexplode("__sp.sig").alias("band_idx", "band_val"),
    )


def near_dup_lsh(
    df: DataFrame,
    threshold: float = 0.38,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = LSH_BANDS,
    bits: int = LSH_BITS_PER_BAND,
    dim: int = EMB_DIM,
    seed: int = 1337,
) -> DataFrame:
    """Banded near-duplicate pairs (vec_a, vec_b, cos_sim) — q26
    semantics on the Arrow scale path.

    Candidates: shared (band_idx, band_val) EQUI-join (never all-pairs);
    refilter: exact cosine over the two embeddings, numpy per batch; the
    final round(6) runs in Spark SQL so the literal rounding function
    matches the oracle's.
    """
    # The embedding rides along with its signature rows, carried through
    # posexplode — no join-back (the candidates -> distinct -> two
    # id-joins formulation costs three extra shuffles of the pair set
    # and measured shuffle-bound at local[32]).  It rides as PACKED
    # little-endian float32 BINARY, not array<float>: an UnsafeRow array
    # costs ~8 B/element in the shuffle (512 B/row at dim 64) plus
    # per-element object churn that was measured GC-thrashing 32-thread
    # runs; the packed blob is dim*4 B flat.  A pair sharing k bands is
    # scored k times and collapsed by the final distinct — identical
    # inputs give identical numpy cosines, so the duplicates are exact.
    sig = _sig_pack_udf(bands, bits, dim, seed)
    sigs = df.select(
        F.col(id_col), sig(F.col(vec_col)).alias("__sp")
    ).select(
        F.col(id_col),
        F.col("__sp.pk").alias("__e"),
        F.posexplode("__sp.sig").alias("band_idx", "band_val"),
    )
    a, c = sigs.alias("a"), sigs.alias("c")

    @F.pandas_udf("double")
    def _cos(ea: pd.Series, eb: pd.Series) -> pd.Series:
        if len(ea) == 0:
            return pd.Series([], dtype=np.float64)
        ma = np.frombuffer(b"".join(ea.tolist()), dtype=np.float32).reshape(-1, dim).astype(np.float64)
        mb = np.frombuffer(b"".join(eb.tolist()), dtype=np.float32).reshape(-1, dim).astype(np.float64)
        num = np.einsum("ij,ij->i", ma, mb)
        den = np.sqrt(np.einsum("ij,ij->i", ma, ma)) * np.sqrt(
            np.einsum("ij,ij->i", mb, mb)
        )
        return pd.Series(num / den)

    pairs = (
        a.join(
            c,
            (F.col("a.band_idx") == F.col("c.band_idx"))
            & (F.col("a.band_val") == F.col("c.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"c.{id_col}")),
        )
        .withColumn("__cs", _cos(F.col("a.__e"), F.col("c.__e")))
        .where(F.col("__cs") >= F.lit(float(threshold)))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"c.{id_col}").alias("vec_b"),
            F.round("__cs", 6).alias("cos_sim"),
        )
        .distinct()
    )
    return pairs
