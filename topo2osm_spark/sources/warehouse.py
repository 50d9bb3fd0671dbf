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

Filesystem-agnostic: all metadata I/O (manifest read/write/commit,
data-file listing, parquet footer reads) goes through a
`pyarrow.fs.FileSystem` resolved from the warehouse root URI —
`file://`/plain paths, `s3://`, `hdfs://` (where pyarrow has the
backend) all work; Spark itself handles the data read/write URIs
natively. A filesystem can also be injected (tests use an in-memory
duck-type). Note on object stores: the manifest "atomic rename" is
best-effort there (copy+delete) — real atomicity at scale comes from
the Iceberg catalog path, which is exactly why it is the production
target.
"""

from __future__ import annotations

import hashlib
import json
import os
import posixpath
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


def _resolve_fs(root: str, filesystem=None) -> tuple[object, str]:
    """(pyarrow filesystem, fs-local root path) for a warehouse root.
    Plain paths and file:// map to LocalFileSystem; any other scheme
    resolves through pyarrow.fs.FileSystem.from_uri (s3, hdfs, ...)."""
    from pyarrow import fs as pafs
    if filesystem is not None:
        return filesystem, root.split("://", 1)[-1] if "://" in root else root
    if "://" in root:
        f, p = pafs.FileSystem.from_uri(root)
        return f, p
    return pafs.LocalFileSystem(), root


class Warehouse:
    def __init__(self, spark: SparkSession, root: str,
                 iceberg_catalog: str | None = None,
                 filesystem=None):
        """iceberg_catalog: when set AND the Iceberg runtime is on the
        classpath, stages materialize through `df.writeTo()` against
        `<catalog>.<root-basename>.<stage>` tables (real snapshot
        commits) instead of the parquet+manifest emulation. The sandbox
        has no iceberg jar, so the path is exercised by a duck-typed
        writer test (test_warehouse.py).

        filesystem: optional pyarrow-compatible filesystem for all
        metadata I/O (default: resolved from the root URI)."""
        self.spark = spark
        self.root = root
        self.iceberg_catalog = iceberg_catalog
        self.namespace = posixpath.basename(root.rstrip("/")) or "warehouse"
        self._fs, self._fs_root = _resolve_fs(root, filesystem)
        self._fs.create_dir(self._fs_root, recursive=True)

    def _use_iceberg(self) -> bool:
        return (self.iceberg_catalog is not None
                and _iceberg_available(self.spark))

    def iceberg_write(self, df, name: str, mode: str = "replace") -> str:
        """Production Iceberg commit. mode='replace': createOrReplace,
        a single atomic snapshot swap (the Iceberg equivalent of our
        manifest rename). mode='append': writeTo(...).append(), a new
        snapshot stacked on the current one (lineage/metrics tables).
        Returns the fully-qualified table name. df only needs the
        DataFrameWriterV2 surface (`writeTo`), so tests drive this with
        a duck-typed recorder — a real iceberg jar drop-in is a config
        change (iceberg_catalog=...), not a code change."""
        table = f"{self.iceberg_catalog}.{self.namespace}.{name}"
        w = df.writeTo(table)
        if mode == "append":
            w.append()
        else:
            w.using("iceberg").createOrReplace()
        return table

    def _path(self, name: str) -> str:
        """Spark-facing path (keeps the root's URI scheme)."""
        return posixpath.join(self.root, name)

    def _fs_path(self, name: str) -> str:
        """Filesystem-facing path (scheme stripped for pyarrow fs)."""
        return posixpath.join(self._fs_root, name)

    def _exists(self, fs_path: str) -> bool:
        from pyarrow import fs as pafs
        return self._fs.get_file_info(fs_path).type != pafs.FileType.NotFound

    def manifest(self, name: str) -> dict | None:
        mp = posixpath.join(self._fs_path(name), MANIFEST)
        if not self._exists(mp):
            return None
        with self._fs.open_input_stream(mp) as f:
            return json.loads(f.read().decode())

    def is_complete(self, name: str, fp: str) -> bool:
        m = self.manifest(name)
        return m is not None and m.get("fingerprint") == fp

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(posixpath.join(self._path(name), "data"))

    def _footer_counts(self, data_dir_fs: str,
                       with_names: bool = False) -> list:
        """Per-partition row counts from parquet FOOTERS — metadata-only
        (seekable open + a few KB of footer per file), never a second
        data scan, on ANY pyarrow filesystem. One part file == one
        write partition; the partition id is parsed from the part-NNNNN
        file name (the writer's task id). This is the same trick
        Iceberg manifests use: counts come from file metadata collected
        at commit time, not from re-reading data."""
        import re
        import pyarrow.parquet as pq
        from pyarrow import fs as pafs
        infos = self._fs.get_file_info(pafs.FileSelector(data_dir_fs))
        out = []
        for info in sorted(infos, key=lambda i: i.path):
            fn = posixpath.basename(info.path)
            if not fn.endswith(".parquet") or fn.startswith("_"):
                continue
            m = re.match(r"part-(\d+)", fn)
            pid = int(m.group(1)) if m else len(out)
            with self._fs.open_input_file(info.path) as f:
                n = pq.ParquetFile(f).metadata.num_rows
            out.append((pid, n, fn) if with_names else (pid, n))
        return out

    def _commit_manifest(self, name: str, man: dict) -> None:
        """Write manifest via temp file + rename. On a local filesystem
        this MUST be os.replace (atomic overwrite): a delete-then-move
        window would lose the committed manifest on a crash and silently
        recompute the stage. Object stores have no atomic rename at all,
        so delete+move is the honest best-effort there (see module
        docstring)."""
        from pyarrow import fs as pafs
        path = self._fs_path(name)
        tmp = posixpath.join(path, MANIFEST + ".tmp")
        final = posixpath.join(path, MANIFEST)
        with self._fs.open_output_stream(tmp) as f:
            f.write(json.dumps(man).encode())
        if isinstance(self._fs, pafs.LocalFileSystem):
            os.replace(tmp, final)
        else:
            if self._exists(final):
                self._fs.delete_file(final)
            self._fs.move(tmp, final)

    def snapshot_id(self, name: str) -> int | None:
        """Latest committed snapshot id of a stage, None if never
        written. Emulation manifests carry it explicitly (monotonic,
        parent-linked — the Iceberg snapshot-log shape); on the real
        Iceberg path the id comes from the table's snapshots metadata."""
        if self._use_iceberg():
            table = f"{self.iceberg_catalog}.{self.namespace}.{name}"
            row = self.spark.sql(
                f"SELECT snapshot_id FROM {table}.snapshots "
                "ORDER BY committed_at DESC LIMIT 1").first()
            return None if row is None else int(row["snapshot_id"])
        m = self.manifest(name)
        return None if m is None else m.get("snapshot_id")

    def write(self, df: DataFrame, name: str, fp: str,
              mode: str = "replace") -> DataFrame:
        """Materialize df -> parquet snapshot + manifest + lineage.
        Exactly ONE scan of df (the write itself); per-partition lineage
        comes from the written files' parquet footers.

        mode='replace' (stage checkpoints): the whole snapshot is
        swapped. mode='append' (metrics/lineage-style tables): new data
        files stack onto the existing ones and the manifest commits a
        NEW snapshot whose per-partition lineage covers only the DELTA
        files — Iceberg append-snapshot semantics on the emulation
        path (manifest = snapshot_id + parent_snapshot_id + file list)."""
        t0 = time.monotonic()
        if self._use_iceberg():
            table = self.iceberg_write(df, name, mode=mode)
            return self.spark.read.table(table)
        old_man = self.manifest(name)   # snapshot chaining (both modes)
        prev_files = (set(old_man.get("files", []))
                      if (old_man and mode == "append") else set())
        data = posixpath.join(self._path(name), "data")
        df.write.mode("append" if mode == "append" else "overwrite") \
            .parquet(data)
        per_file = self._footer_counts(
            posixpath.join(self._fs_path(name), "data"), with_names=True)
        delta = [(pid, n) for pid, n, fn in per_file if fn not in prev_files]
        per_part = delta if mode == "append" else [
            (pid, n) for pid, n, _ in per_file]
        wall_ms = int((time.monotonic() - t0) * 1000)
        man = {
            "fingerprint": fp,
            "snapshot_id": (old_man.get("snapshot_id", 0) + 1)
                           if old_man else 1,
            "parent_snapshot_id": old_man.get("snapshot_id")
                                  if old_man else None,
            "rows": int(sum(n for _, n, _ in per_file)),
            "partitions": [[pid, n] for pid, n in per_part],
            "files": [fn for _, _, fn in per_file],
            "wall_ms": wall_ms,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._commit_manifest(name, man)
        lineage = self.spark.createDataFrame(
            [(name, pid, n, fp, wall_ms) for pid, n in per_part],
            "stage string, partition_id int, rows long, fingerprint string, wall_ms long")
        lineage.write.mode("append").parquet(posixpath.join(self.root, "_lineage"))
        return self.spark.read.parquet(data)

    def stage(self, df: DataFrame, name: str, fp: str,
              resume: bool = True) -> tuple[DataFrame, bool]:
        """Checkpoint-or-load. Returns (df, was_resumed)."""
        if resume and self.is_complete(name, fp):
            return self.read(name), True
        return self.write(df, name, fp), False

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(posixpath.join(self.root, "_lineage"))
