"""As-of and banded range join semantics (SURVEY.md §2 ops 19, 20)."""

import datetime as dt

from topo2osm_spark.operators.temporal import asof_join, range_join_count


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T00:10:00")),   # after r2 -> matches r2
         (2, 10, _ts("2024-01-01T00:05:00")),   # exact tie with r2 -> matches
         (3, 10, _ts("2024-01-01T00:00:30")),   # only r1 before it
         (4, 20, _ts("2024-01-01T00:01:00"))],  # key with no right rows
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(100, 10, _ts("2024-01-01T00:00:00")),
         (101, 10, _ts("2024-01-01T00:05:00"))],
        "event_id long, user_id long, ts timestamp")
    got = {r["event_id"]: r["asof_event_id"] for r in
           asof_join(left, right.select("user_id", "ts", "event_id"),
                     key="user_id", right_payload=("event_id",)).collect()}
    assert got == {1: 101, 2: 101, 3: 100, 4: None}


def test_range_join_count_boundaries(spark):
    # window = 60s, half-open [t, t+60): right at +0s and +59.999999s
    # count, right at exactly +60s does not; band-straddling matches
    # (left near a band boundary, right in the next band) still count.
    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01T00:00:59")),
         (2, 5, _ts("2024-01-01T00:10:00")),
         (3, 6, _ts("2024-01-01T00:00:00"))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(5, _ts("2024-01-01T00:00:59")),     # == left1 ts -> counts
         (5, _ts("2024-01-01T00:01:58")),     # +59s, next band -> counts
         (5, _ts("2024-01-01T00:01:59")),     # exactly +60s -> excluded
         (5, _ts("2024-01-01T00:10:30"))],    # for left2
        "user_id long, ts timestamp")
    got = {r["event_id"]: r["n_in_window"] for r in
           range_join_count(left, right, key="user_id",
                            window_us=60_000_000).collect()}
    assert got == {1: 2, 2: 1, 3: 0}


def test_range_join_count_duplicate_left_rows(spark):
    """Duplicate left rows keep INDEPENDENT counts (r2 verdict fix):
    two byte-identical left rows each get their own output row with
    the per-row count, not one merged row with a summed count."""
    left = spark.createDataFrame(
        [(5, _ts("2024-01-01T00:00:00")),
         (5, _ts("2024-01-01T00:00:00")),     # exact duplicate
         (5, _ts("2024-01-01T00:05:00"))],
        "user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(5, _ts("2024-01-01T00:00:10")),
         (5, _ts("2024-01-01T00:00:20"))],
        "user_id long, ts timestamp")
    rows = range_join_count(left, right, key="user_id",
                            window_us=60_000_000).collect()
    assert len(rows) == 3  # one output row PER input left row
    counts = sorted(r["n_in_window"] for r in rows)
    assert counts == [0, 2, 2]
