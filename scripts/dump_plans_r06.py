"""Dump .explain("formatted") for the bench queries into plans/r06/.

Usage: python scripts/dump_plans_r06.py <suffix> [--sf DIR] [--only a,b]
Writes plans/r06/<query>_<suffix>.txt. Driver-only (no actions run).
"""
from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("suffix")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from topo2osm_spark.operators.dedup import minhash_lsh_dedup
    from topo2osm_spark.plans.session import build_session

    spark = build_session("plans-r06", master="local[4]",
                          shuffle_partitions=16)
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    names = ["agg_tpch_q1", "equi_join_agg", "broadcast_join_dims",
             "window_funcs", "collect_sorted_list", "dedup_exact",
             "dedup_token_jaccard", "ann_topk_bruteforce", "token_stats"]
    qmap = dict(entry_mod.queries())
    qmap["dedup_minhash_lsh"] = lambda s, sf: minhash_lsh_dedup(
        s.read.parquet(f"{sf}/documents.parquet"), threshold=0.5)
    names.append("dedup_minhash_lsh")
    only = set(args.only.split(",")) if args.only else None
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if only and name not in only:
            continue
        df = qmap[name](spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
