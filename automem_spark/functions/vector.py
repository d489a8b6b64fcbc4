"""Vector primitives: cosine similarity expressions + the deterministic
placeholder embedding.

The reference stores one 1024-d vector per memory in Qdrant and queries with
cosine distance (automem/stores/runtime_clients.py:146). In Spark the
embedding is just an `array<float>` column; cosine is a column expression
(JVM-side) or a NumPy matmul inside mapInPandas for the bulk path.

The placeholder embedding (automem/embedding/runtime_helpers.py:50-55,
automem/embedding/placeholder.py:28-42) is reimplemented bit-exactly:
SHA-256(content) first 8 bytes little-endian seeds random.Random, then D
uniform floats. Deterministic => vector rankings reproducible across engines.
"""

from __future__ import annotations

import hashlib
import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType


def dot_expr(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] in double precision (matches DuckDB list_dot_product on
    DOUBLE[] for oracle parity)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision; 0.0 when either norm is 0
    (consolidation.py:104-118)."""
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_expr(a, b) / denom)


def l2_normalize_expr(a: Column) -> Column:
    """Unit-normalize so Euclidean LSH (BucketedRandomProjectionLSH) over the
    result is cosine-equivalent: for unit vectors, L2² = 2 - 2·cos."""
    n = norm_expr(a)
    return F.when(n == 0.0, a.cast("array<double>")).otherwise(
        F.transform(a, lambda x: x.cast("double") / n)
    )


def placeholder_embedding(content: str, dim: int = 64) -> list[float]:
    """Bit-exact twin of the reference placeholder provider
    (automem/embedding/placeholder.py:28-42)."""
    digest = hashlib.sha256(content.encode("utf-8")).digest()
    seed = int.from_bytes(digest[:8], "little", signed=False)
    rng = random.Random(seed)
    return [rng.random() for _ in range(dim)]


def placeholder_embedding_udf(dim: int = 64):
    """Arrow-batched pandas UDF computing placeholder embeddings executor-side.

    Python is unavoidable here (SHA-256 + Mersenne Twister semantics), so it
    runs as a vectorized pandas_udf — one Arrow batch per invocation, not one
    Python call per row.
    """

    @F.pandas_udf(ArrayType(DoubleType()))
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(lambda c: placeholder_embedding(c or "", dim))

    return _embed
