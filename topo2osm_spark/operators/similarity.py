"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force cosine top-k: the exact baseline. Dot product and norms
  via JVM higher-order functions (zip_with/aggregate) in double
  precision — no Python in the scan; top-k via orderBy+limit with a
  deterministic tiebreak.
- LSH-bucketed ANN: random-hyperplane signatures (seeded, fixed plane
  matrix) assign each vector to a bucket; the query probes its own
  bucket plus hamming-1 neighbors. Sub-linear candidate set — the
  100 TB path; recall traded for scan cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from topo2osm_spark.functions.text import dround

N_PLANES = 8  # 2^8 buckets; multi-probe (hamming-1) widens recall
_PLANE_SEED = 1234


def cosine_col(vec_col, query: list[float]):
    """Column: cosine(vec, literal query) in double precision."""
    q = F.array(*[F.lit(float(x)) for x in query])
    v = F.transform(vec_col, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(v, q, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                            F.lit(0.0), lambda a, x: a + x))
    nq = float(np.sqrt(np.sum(np.asarray(query, dtype=np.float64) ** 2)))
    return dot / (nv * F.lit(nq))


def brute_force_topk(embs: DataFrame, query: list[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k. orderBy(desc(sim), id) + limit — Spark plans
    this as TakeOrderedAndProject (per-partition heaps, no full sort)."""
    return (embs
            .withColumn("cosine", dround(cosine_col(F.col(vec_col), query)))
            .select(id_col, "cosine")
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k))


def _planes(dim: int, n_planes: int = N_PLANES) -> np.ndarray:
    rng = np.random.default_rng(_PLANE_SEED)
    return rng.standard_normal((n_planes, dim))


def bucket_udf(dim: int, n_planes: int = N_PLANES):
    planes = _planes(dim, n_planes)

    @F.pandas_udf(T.IntegerType())
    def _bucket(vec: pd.Series) -> pd.Series:
        m = np.stack(vec.to_numpy())
        signs = (m @ planes.T) > 0
        b = np.zeros(len(m), dtype=np.int32)
        for i in range(planes.shape[0]):
            b |= signs[:, i].astype(np.int32) << i
        return pd.Series(b)

    return _bucket


def query_buckets(query: list[float], n_planes: int = N_PLANES) -> list[int]:
    """Query's own bucket + all hamming-1 neighbors (multi-probe)."""
    planes = _planes(len(query), n_planes)
    signs = (planes @ np.asarray(query, dtype=np.float64)) > 0
    b = 0
    for i, s in enumerate(signs):
        b |= int(s) << i
    return [b] + [b ^ (1 << i) for i in range(n_planes)]


def lsh_topk(embs: DataFrame, query: list[float], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = N_PLANES) -> DataFrame:
    """ANN: restrict the cosine scan to the query's probe buckets.
    The bucket filter is a pushdown-friendly IN-list on an int column;
    on a bucketed/partitioned-by-bucket table this prunes partitions."""
    dim = len(query)
    bucketed = embs.withColumn("bucket", bucket_udf(dim, n_planes)(F.col(vec_col)))
    probes = query_buckets(query, n_planes)
    cand = bucketed.where(F.col("bucket").isin(probes))
    return (cand
            .withColumn("cosine", dround(cosine_col(F.col(vec_col), query)))
            .select(id_col, "cosine")
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k))
