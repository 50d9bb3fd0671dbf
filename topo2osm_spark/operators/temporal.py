"""Temporal joins: as-of and banded range/theta (SURVEY.md §2 ops 19, 20).

The reference converter itself has no temporal operators (its inputs
are static cartographic snapshots), which is why SURVEY.md §2 marked
ops 19/20 "not needed" for parity. They are nonetheless first-class
relational capabilities of the engine surface this repo claims, so
they are implemented here Spark-first — each as a composition of
built-in DataFrame ops with a single keyed shuffle, never a
nested-loop or driver-side pass.

As-of join (op 20) — "latest right row at-or-before each left row":
    UNION the two sides with a side tag, window over
    (key ORDER BY ts, side) and carry the last seen right payload
    with last(..., ignorenulls=True). One shuffle on the key, linear
    work per partition, no range explosion — the standard
    distributed re-expression of the kdb/pandas merge_asof. Skewed
    keys cost what any window on that key costs; AQE skew handling
    and (at 100 TB) pre-bucketing the table by key apply unchanged.

Range/theta join (op 19) — "right rows within [t, t+W) of each left
row": BANDED equi-join. Both sides bucket time into width-W bands;
the left side duplicates into (band, band+1) so every true match
shares a band with its left row; the exact window predicate refines
after the equi-join. Fan-out is a constant 2x regardless of data,
so the join stays an equi-join the planner can shuffle or broadcast
— never the quadratic theta product a naive ON-clause would force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_payload: tuple[str, ...] = ()) -> DataFrame:
    """For each left row: the most recent right row with
    right.ts <= left.ts on the same key (NULLs when none). Ties at
    identical timestamps match (the right row sorts first).

    Returns left's columns plus `asof_<col>` for each right payload
    column and `asof_ts`.
    """
    lcols = left.columns
    payload = list(right_payload)
    tagged_r = right.select(
        F.col(key).alias("__k"), F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__asof_ts"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
        *[F.lit(None).alias(f"__l_{c}") for c in lcols])
    tagged_l = left.select(
        F.col(key).alias("__k"), F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tagged_r.schema["__asof_ts"].dataType).alias("__asof_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}")
          for c in payload],
        *[F.col(c).alias(f"__l_{c}") for c in lcols])
    # right rows sort before left rows at the same instant, so an
    # exactly-simultaneous right row is visible to the left row.
    w = (Window.partitionBy("__k").orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = tagged_r.unionByName(tagged_l).select(
        "*",
        F.last("__asof_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
          for c in payload])
    return (carried.where(F.col("__side") == 1)
            .select(*[F.col(f"__l_{c}").alias(c) for c in lcols],
                    "asof_ts", *[f"asof_{c}" for c in payload]))


def range_join_count(left: DataFrame, right: DataFrame, key: str,
                     window_us: int,
                     left_ts: str = "ts", right_ts: str = "ts",
                     count_alias: str = "n_in_window") -> DataFrame:
    """Per left row: COUNT of right rows with
    left.ts <= right.ts < left.ts + window_us (microsecond integer
    math — no float drift). Left rows with no matches keep count 0.

    Banded equi-join on (key, time-band of width window_us): the left
    row lands in bands {b, b+1} (its window can straddle a boundary),
    the right row in its own band only, so every true pair meets in
    exactly one band and the equi-join + exact refine never touches
    the quadratic cross product.

    Duplicate left rows keep INDEPENDENT counts: byte-identical left
    rows necessarily have identical counts, so the join runs over
    DISTINCT left rows carrying a multiplicity, which re-expands at
    the end — one output row per input left row. (A generated row-id
    would not survive plan re-execution; `monotonically_increasing_id`
    is partition-layout-dependent.)
    """
    lcols = left.columns
    lkeys = [f"__l_{c}" for c in lcols]
    ldist = (left.select(F.col(key).alias("__k"),
                         F.unix_micros(F.col(left_ts).cast("timestamp")).alias("__lus"),
                         *[F.col(c).alias(f"__l_{c}") for c in lcols])
             .groupBy("__k", "__lus", *lkeys)
             .agg(F.count(F.lit(1)).alias("__mult")))
    l = ldist.withColumn("__band", F.explode(F.array(
        F.floor(F.col("__lus") / window_us),
        F.floor(F.col("__lus") / window_us) + 1)))
    r = right.select(F.col(key).alias("__k"),
                     F.unix_micros(F.col(right_ts).cast("timestamp")).alias("__rus")) \
             .withColumn("__band", F.floor(F.col("__rus") / window_us))
    hits = (l.join(r, ["__k", "__band"])
            .where((F.col("__rus") >= F.col("__lus"))
                   & (F.col("__rus") < F.col("__lus") + F.lit(window_us)))
            .groupBy(*lkeys)
            .agg(F.count(F.lit(1)).alias("__n")))
    # left rows whose bands matched nothing keep count 0; explode the
    # multiplicity back so duplicates re-appear as separate rows
    return (ldist.join(hits, lkeys, "left")
            .withColumn("__i", F.explode(F.sequence(F.lit(1), F.col("__mult"))))
            .select(*[F.col(f"__l_{c}").alias(c) for c in lcols],
                    F.coalesce("__n", F.lit(0)).cast("long").alias(count_alias)))
