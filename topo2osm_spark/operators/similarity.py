"""Similarity search over embedding columns (array<float>).

Three paths:
- brute-force cosine top-k: the exact baseline. Dot product and norms
  via JVM higher-order functions (zip_with/aggregate) in double
  precision — no Python in the scan; top-k via orderBy+limit with a
  deterministic tiebreak.
- LSH-bucketed ANN: random-hyperplane signatures (seeded, fixed plane
  matrix) assign each vector to a bucket; the query probes its own
  bucket plus hamming-1 neighbors. Sub-linear candidate set — the
  100 TB path; recall traded for scan cost.
- IVF ANN: inverted-file index with DETERMINISTIC training-free
  centroids (the n vectors with the smallest md5(id) — a seedless
  pseudo-random sample both Spark and a SQL oracle can reproduce);
  vectors partition by nearest centroid, the query scans only its
  top-P probe lists. At scale the assignment is written once as a
  partition column and probing becomes partition pruning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from topo2osm_spark.functions.text import dround

N_PLANES = 8  # 2^8 buckets; multi-probe (hamming-1) widens recall
_PLANE_SEED = 1234


def cosine_col(vec_col, query: list[float]):
    """Column: cosine(vec, literal query) in double precision.

    Kept as zip_with/aggregate HOFs DELIBERATELY (r6, measured): a
    fully-unrolled 64-term codegen sum chain (F.get per element) was
    tried and ran 3x SLOWER at sf1.0 (0.64 s -> 1.9 s median, noop
    sink) — a 128-subexpression chain blows the codegen method budget
    and the whole projection falls back to interpreted eval, which is
    worse than the HOF loop. Guide §1.1's 'fresh ideal plan is often
    slower because of some gotcha' in the flesh."""
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


N_CENTROIDS = 16
N_PROBES = 4


def ivf_centroids(embs: DataFrame, n_centroids: int = N_CENTROIDS,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Training-free deterministic centroids: the n_centroids vectors
    with the smallest md5(cast(id as string)) — a fixed pseudo-random
    sample reproducible in any engine (no k-means iterations, no
    seed plumbing). Good list balance for near-isotropic embeddings;
    swap in k-means centroids at scale without changing the query."""
    return (embs.select(F.col(id_col).alias("cid"),
                        F.col(vec_col).alias("cvec"),
                        F.md5(F.col(id_col).cast("string")).alias("_h"))
            .orderBy("_h", "cid").limit(n_centroids).drop("_h"))


def _cos_cols(v, c):
    """cosine of two array columns, double precision, left-to-right
    summation (bit-compatible with the naive SQL mirror)."""
    vd = F.transform(v, lambda x: x.cast("double"))
    cd = F.transform(c, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(vd, cd, lambda x, y: x * y),
                      F.lit(0.0), lambda a, x: a + x)
    nv = F.sqrt(F.aggregate(F.transform(vd, lambda x: x * x),
                            F.lit(0.0), lambda a, x: a + x))
    nc = F.sqrt(F.aggregate(F.transform(cd, lambda x: x * x),
                            F.lit(0.0), lambda a, x: a + x))
    return dot / (nv * nc)


def ivf_assign(embs: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, nearest centroid id) for every vector: broadcast the tiny
    centroid set, cosine via JVM HOFs, argmax with a deterministic
    tie-break (highest sim, then lowest cid) via max_by on a struct."""
    sim = _cos_cols(F.col(vec_col), F.col("cvec"))
    fan = embs.select(id_col, vec_col).crossJoin(F.broadcast(centroids))
    return (fan.select(id_col, "cid", sim.alias("sim"))
            .groupBy(id_col)
            .agg(F.max_by("cid", F.struct(F.col("sim"),
                                          (-F.col("cid")).alias("nc")))
                 .alias("cid")))


def ivf_topk(embs: DataFrame, query: list[float], k: int = 10,
             n_centroids: int = N_CENTROIDS, n_probes: int = N_PROBES,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF ANN: rank centroids against the query, scan only the
    vectors assigned to the top n_probes lists. Every step is a
    DataFrame op (broadcast joins + HOF math); on a table partitioned
    by the assignment column the probe filter is partition pruning."""
    cents = ivf_centroids(embs, n_centroids, id_col, vec_col)
    probes = (cents
              .select("cid", cosine_col(F.col("cvec"), query).alias("qs"))
              .orderBy(F.desc("qs"), "cid").limit(n_probes)
              .select("cid"))
    assign = ivf_assign(embs, cents, id_col, vec_col)
    # probes is n_probes rows -> always broadcast. cand, however, is
    # ~n_probes/n_centroids of the corpus — data-proportional — so the
    # embs⋈cand join below carries NO broadcast hint (AQE picks the
    # strategy; on a table partitioned by cid the probe filter becomes
    # partition pruning and this join disappears).
    cand = (assign.join(F.broadcast(probes), "cid", "left_semi")
            .select(id_col))
    return (embs.join(cand, id_col, "left_semi")
            .withColumn("cosine", dround(cosine_col(F.col(vec_col), query)))
            .select(id_col, "cosine")
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k))


def lsh_topk(embs: DataFrame, query: list[float], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = N_PLANES) -> DataFrame:
    """ANN: restrict the cosine scan to the query's probe buckets.
    Index-free form — the bucket column is computed AT QUERY TIME over
    the whole corpus (a linear pandas_udf scan), so this is only the
    right call for ad-hoc / one-shot queries. The scale path is
    `write_lsh_index` once + `lsh_topk_indexed` per query (partition
    pruning, sub-linear scan)."""
    dim = len(query)
    bucketed = embs.withColumn("bucket", bucket_udf(dim, n_planes)(F.col(vec_col)))
    probes = query_buckets(query, n_planes)
    cand = bucketed.where(F.col("bucket").isin(probes))
    return (cand
            .withColumn("cosine", dround(cosine_col(F.col(vec_col), query)))
            .select(id_col, "cosine")
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k))


# --------------------------------------------------------------- indexes
# The materialized-index path: build once (one full scan), then every
# query reads ONLY its probe partitions. Probe sets are computed
# driver-side from O(index-params) metadata (the plane matrix / the
# centroid table), never from a corpus scan, so the per-query plan is
# a partition-pruned parquet scan + TakeOrderedAndProject.

def lsh_index(embs: DataFrame, dim: int, id_col: str = "vec_id",
              vec_col: str = "embedding",
              n_planes: int = N_PLANES) -> DataFrame:
    """(id, embedding, bucket) — the LSH index table. One linear scan;
    persist it partitioned by `bucket` (write_lsh_index)."""
    return embs.select(
        id_col, vec_col,
        bucket_udf(dim, n_planes)(F.col(vec_col)).alias("bucket"))


def write_lsh_index(embs: DataFrame, path: str, dim: int,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = N_PLANES) -> None:
    """Materialize the LSH index: parquet partitioned by `bucket`.
    2^n_planes partitions; each holds ~corpus/2^n_planes vectors, so a
    multi-probe query touches (n_planes+1)/2^n_planes of the data."""
    (lsh_index(embs, dim, id_col, vec_col, n_planes)
     .write.mode("overwrite").partitionBy("bucket").parquet(path))


def lsh_topk_indexed(spark, path: str, query: list[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     n_planes: int = N_PLANES) -> DataFrame:
    """ANN over the materialized LSH index: the probe-bucket IN-list is
    a static literal filter on the partition column, so the scan's
    PartitionFilters prune to (n_planes+1) of 2^n_planes partitions —
    verified in BENCH/PLANS.md. Row set identical to lsh_topk on the
    same corpus (same planes, same probes)."""
    probes = query_buckets(query, n_planes)
    idx = spark.read.parquet(path).where(F.col("bucket").isin(probes))
    return (idx
            .withColumn("cosine", dround(cosine_col(F.col(vec_col), query)))
            .select(id_col, "cosine")
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k))


def write_ivf_index(embs: DataFrame, path: str,
                    n_centroids: int = N_CENTROIDS,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> None:
    """Materialize the IVF index: `<path>/lists` parquet partitioned by
    the assigned centroid id `cid` (the inverted lists) + the tiny
    `<path>/centroids` table. Build cost = one centroid-broadcast
    assignment pass; after this, queries never recompute assignment."""
    cents = ivf_centroids(embs, n_centroids, id_col, vec_col)
    assign = ivf_assign(embs, cents, id_col, vec_col)
    (embs.select(id_col, vec_col).join(assign, id_col)
     .write.mode("overwrite").partitionBy("cid").parquet(f"{path}/lists"))
    cents.write.mode("overwrite").parquet(f"{path}/centroids")


def _rank_centroids_local(path: str, query: list[float],
                          n_probes: int) -> list:
    """Driver-side centroid ranking from the index's centroid table —
    O(n_centroids) metadata read via pyarrow (like FAISS keeping
    centroids in RAM; works on any pyarrow-readable filesystem URI).
    NOT a Spark collect: the centroid table is index metadata, fixed
    at n_centroids rows regardless of corpus size."""
    import pyarrow.dataset as ds
    t = ds.dataset(f"{path}/centroids", format="parquet").to_table()
    cids = np.asarray(t.column("cid").to_pylist())
    cvecs = np.stack([np.asarray(v, dtype=np.float64)
                      for v in t.column("cvec").to_pylist()])
    q = np.asarray(query, dtype=np.float64)
    sims = (cvecs @ q) / (np.linalg.norm(cvecs, axis=1) * np.linalg.norm(q))
    order = np.lexsort((cids, -sims))
    return [int(cids[i]) for i in order[:n_probes]]


def ivf_topk_indexed(spark, path: str, query: list[float], k: int = 10,
                     n_probes: int = N_PROBES,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN over the materialized IVF index: rank centroids driver-side
    (O(n_centroids) metadata), then scan ONLY the n_probes inverted
    lists — a static IN-list on the `cid` partition column, pruned at
    plan time (PartitionFilters, BENCH/PLANS.md). Row set identical to
    ivf_topk on the same corpus (same centroids, same tie-breaks)."""
    probes = _rank_centroids_local(path, query, n_probes)
    idx = spark.read.parquet(f"{path}/lists").where(F.col("cid").isin(probes))
    return (idx
            .withColumn("cosine", dround(cosine_col(F.col(vec_col), query)))
            .select(id_col, "cosine")
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k))
