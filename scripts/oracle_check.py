"""Local replica of the driver's t2 correctness gate: run each
queries()[name] on Spark and oracle_sql()[name] on DuckDB at sf0.01,
compare row count + sorted-by-name column values (order-insensitive).

Usage: python scripts/oracle_check.py [--sf DIR] [--only name1,name2] [--skip-geo]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def frame_repr(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--skip-geo", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from topo2osm_spark.plans.session import build_session
    spark = build_session("oracle-check", master="local[8]", shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    n_ok = n_bad = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, args.sf)
            pdf = sdf.toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error {str(ex)[:200]}")
            n_bad += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            if args.skip_geo:
                continue
            print(f"rows  {name}: {len(pdf)} rows ({dt:.1f}s) [rows-only]")
            n_rows_only += 1
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error {str(ex)[:200]}")
            n_bad += 1
            continue
        sc, sr = frame_repr(list(pdf.columns), pdf.itertuples(index=False, name=None))
        dc, dr = frame_repr(list(ddf.columns), ddf.itertuples(index=False, name=None))
        if sc != dc:
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}")
            n_bad += 1
        elif len(sr) != len(dr):
            print(f"FAIL  {name}: rowcount spark={len(sr)} duck={len(dr)}")
            n_bad += 1
        elif sr != dr:
            diff = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:3]
            print(f"FAIL  {name}: values differ at rows {diff}")
            for i in diff[:2]:
                print(f"      spark={sr[i]}")
                print(f"      duck ={dr[i]}")
            n_bad += 1
        else:
            print(f"OK    {name}: {len(sr)} rows ({dt:.1f}s)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail, {n_rows_only} rows-only")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
