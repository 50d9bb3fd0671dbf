"""Static guard (SURVEY.md §5.2.6): the API contract forbids per-row
Python UDFs (BASELINE.json:15 "no per-row Python") — only pandas_udf /
mapInArrow / applyInPandas are allowed."""

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "topo2osm_spark"


def test_no_row_at_a_time_udf():
    offenders = []
    for py in PKG.rglob("*.py"):
        src = py.read_text()
        # F.udf( / functions.udf( / @udf — but not pandas_udf
        if re.search(r"(?<!pandas_)\budf\s*\(", src.replace("pandas_udf", "")):
            offenders.append(str(py))
    assert not offenders, f"row-at-a-time UDFs found in {offenders}"


def test_no_rdd_usage():
    offenders = []
    for py in PKG.rglob("*.py"):
        src = py.read_text()
        if re.search(r"\.rdd\b|sparkContext\.parallelize", src):
            offenders.append(str(py))
    assert not offenders, f"RDD API used in {offenders}"


def test_no_driver_side_collect_in_operators():
    """Operators must stay distributed: no .collect()/.toPandas() in
    the package hot paths. Scalar one-row aggregates via .first() are
    allowed (e.g. snap max-lat derivation) — they move 8 bytes, not
    data."""
    offenders = []
    for py in PKG.rglob("*.py"):
        src = py.read_text()
        if re.search(r"\.collect\(|\.toPandas\(", src):
            offenders.append(str(py))
    assert not offenders, f"driver-side collect found in {offenders}"
