"""Content-addressed entity ids (SURVEY.md §2 op 27).

Every engine id is a pure function of stable identity columns —
xxhash64 with the SIGN BIT CLEARED, i.e. a 63-bit non-negative hash.
Why 63 bits: the OSM export sink must map ids bijectively into the
negative id space (OSM convention for not-yet-uploaded entities),
which has only 2^63 values; clearing the sign bit at the SOURCE makes
`export_id = -engine_id` injective by construction, instead of
folding +k/-k together at write time. The one extra collision bit is
immaterial (birthday bound ~n²/2⁶³).

Distributed-determinism contract: ids never depend on partitioning,
task order, or row order — two runs (or two cluster sizes) produce
byte-identical entity tables (scripts/check_shard_consistency.py).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

LOW63 = (1 << 63) - 1


def content_id(*cols) -> Column:
    """Non-negative 63-bit content hash of the given columns/literals."""
    return F.xxhash64(*cols).bitwiseAND(F.lit(LOW63))
