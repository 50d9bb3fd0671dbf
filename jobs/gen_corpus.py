"""Materialize the deterministic interleaved documents corpus to
parquet (distributed synthesis). Used by the scaling bench so both
cluster sizes read identical input bytes."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-sosi", type=int, default=3)
    ap.add_argument("--partitions", type=int, default=32)
    args = ap.parse_args()

    from topo2osm_spark.plans.session import build_session
    from topo2osm_spark.sources.fixtures import documents_df

    spark = build_session("gen-corpus", master="local[32]",
                          shuffle_partitions=32)
    docs = documents_df(spark, args.n_docs, seed=42, max_sosi=args.max_sosi,
                        partitions=args.partitions)
    docs.write.mode("overwrite").parquet(args.out)
    print("rows:", spark.read.parquet(args.out).count())
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
