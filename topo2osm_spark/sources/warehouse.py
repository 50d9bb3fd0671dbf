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

from pyspark.sql import DataFrame, SparkSession

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
    def __init__(self, spark: SparkSession, root: str,
                 iceberg_catalog: str | None = None):
        """iceberg_catalog: when set AND the Iceberg runtime is on the
        classpath, stages materialize through `df.writeTo()` against
        `<catalog>.<root-basename>.<stage>` tables (real snapshot
        commits) instead of the parquet+manifest emulation. The sandbox
        has no iceberg jar, so the path is exercised by a duck-typed
        writer test (test_warehouse.py)."""
        self.spark = spark
        self.root = root
        self.iceberg_catalog = iceberg_catalog
        self.namespace = os.path.basename(root.rstrip("/")) or "warehouse"
        os.makedirs(root, exist_ok=True)

    def _use_iceberg(self) -> bool:
        return (self.iceberg_catalog is not None
                and _iceberg_available(self.spark))

    def iceberg_write(self, df, name: str) -> str:
        """Production Iceberg commit: createOrReplace is a single atomic
        snapshot swap (the Iceberg equivalent of our manifest rename).
        Returns the fully-qualified table name. df only needs the
        DataFrameWriterV2 surface (`writeTo`), so tests drive this with
        a duck-typed recorder."""
        table = f"{self.iceberg_catalog}.{self.namespace}.{name}"
        df.writeTo(table).using("iceberg").createOrReplace()
        return table

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

    @staticmethod
    def _footer_counts(data_dir: str) -> list[tuple[int, int]]:
        """Per-partition row counts from parquet FOOTERS — metadata-only
        (a few KB per file), never a second data scan. One part file ==
        one write partition; the partition id is parsed from the
        part-NNNNN file name (the writer's task id). This is the same
        trick Iceberg manifests use: counts come from file metadata
        collected at commit time, not from re-reading data."""
        import re
        import pyarrow.parquet as pq
        out = []
        for fn in sorted(os.listdir(data_dir)):
            if not fn.endswith(".parquet") or fn.startswith("_"):
                continue
            m = re.match(r"part-(\d+)", fn)
            pid = int(m.group(1)) if m else len(out)
            out.append((pid, pq.ParquetFile(
                os.path.join(data_dir, fn)).metadata.num_rows))
        return out

    def write(self, df: DataFrame, name: str, fp: str) -> DataFrame:
        """Materialize df -> parquet snapshot + manifest + lineage.
        Exactly ONE scan of df (the write itself); per-partition lineage
        comes from the written files' parquet footers."""
        t0 = time.monotonic()
        if self._use_iceberg():
            table = self.iceberg_write(df, name)
            return self.spark.read.table(table)
        path = self._path(name)
        data = os.path.join(path, "data")
        df.write.mode("overwrite").parquet(data)
        per_part = self._footer_counts(data)
        wall_ms = int((time.monotonic() - t0) * 1000)
        man = {
            "fingerprint": fp,
            "rows": int(sum(n for _, n in per_part)),
            "partitions": [[pid, n] for pid, n in per_part],
            "wall_ms": wall_ms,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = os.path.join(path, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, os.path.join(path, MANIFEST))  # atomic commit
        lineage = self.spark.createDataFrame(
            [(name, pid, n, fp, wall_ms) for pid, n in per_part],
            "stage string, partition_id int, rows long, fingerprint string, wall_ms long")
        lineage.write.mode("append").parquet(os.path.join(self.root, "_lineage"))
        return self.spark.read.parquet(data)

    def stage(self, df: DataFrame, name: str, fp: str,
              resume: bool = True) -> tuple[DataFrame, bool]:
        """Checkpoint-or-load. Returns (df, was_resumed)."""
        if resume and self.is_complete(name, fp):
            return self.read(name), True
        return self.write(df, name, fp), False

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_lineage"))
