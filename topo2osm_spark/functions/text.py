"""Text-analysis column builders for training-data pipelines.

All pure `pyspark.sql.functions` Column expressions (JVM-side,
whole-stage-codegen) — no Python in the hot path. Each has an exact
ANSI-SQL mirror used by the DuckDB oracle (__spark_entry__.py).

Ops: token counting (whitespace + BPE-ish word/punct regex),
quality scoring (length / punctuation / short-token ratios),
language-ID (character-class heuristic), document fingerprinting
(normalized md5; a rolling-hash variant lives in operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dround(col: Column, k: int = 4) -> Column:
    """Deterministic decimal rounding: floor(x*10^k + 0.5)/10^k.

    Built-in round() half-up disagrees across engines on decimal
    midpoints that are inexact in binary (0.90475 rounds differently
    in Spark vs DuckDB). This formula is pure IEEE ops, so identical
    input bits give identical output bits on every engine — the form
    every DuckDB oracle mirrors verbatim."""
    m = float(10 ** k)
    return F.floor(col * F.lit(m) + F.lit(0.5)) / F.lit(m)

# BPE-ish pre-tokenizer: word pieces OR single punctuation marks —
# the split used for token accounting (public GPT-2-style pattern,
# simplified to what Spark/DuckDB regex both support).
BPE_SPLIT = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text."""
    return F.split(F.trim(text), r"\s+")


def token_count_ws(text: Column) -> Column:
    return F.size(ws_tokens(text))


def token_count_bpeish(text: Column) -> Column:
    """Count of BPE-ish pieces (regexp_extract_all)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT), F.lit(0)))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation."""
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()-]", ""))
    return dround(punct / F.greatest(F.length(text), F.lit(1)))


def short_token_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens with <= 3 chars (stopword-ish)."""
    toks = ws_tokens(text)
    short = F.size(F.filter(toks, lambda t: F.length(t) <= 3))
    return dround(short / F.greatest(F.size(toks), F.lit(1)))


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length band + low punctuation +
    balanced short-token ratio. Deterministic, SQL-mirrorable."""
    n = F.length(text)
    len_ok = F.when((n >= 50) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.5))
    return dround(
        len_ok * (1.0 - punct_ratio(text)) * (1.0 - 0.5 * short_token_ratio(text)))


def vowel_ratio(text: Column) -> Column:
    low = F.lower(text)
    v = F.length(F.regexp_replace(low, r"[^aeiouy]", ""))
    letters = F.length(F.regexp_replace(low, r"[^a-z]", ""))
    return dround(v / F.greatest(letters, F.lit(1)))


def lang_guess(text: Column) -> Column:
    """Character-class language heuristic (n-gram-free but
    deterministic): latin vowel ratio bands. Real corpora would use
    char n-gram profiles; the contract here is determinism + SQL
    mirror, not linguistic accuracy."""
    r = vowel_ratio(text)
    return (F.when(r >= 0.45, F.lit("vowel-heavy"))
             .when(r >= 0.30, F.lit("latin-balanced"))
             .otherwise(F.lit("consonant-heavy")))


def normalized(text: Column) -> Column:
    """Normalization used for fingerprinting: lowercase, collapse
    whitespace runs, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint_md5(text: Column) -> Column:
    return F.md5(F.encode(normalized(text), "UTF-8"))


def _sliding_zip(arr: Column, width: int) -> Column:
    """array<T> -> array<struct<t0..t{width-1}>> of the COMPLETE
    sliding windows, via arrays_zip of the array with its shifted
    copies (empty when fewer than `width` elements, incl. the
    size()=-1 null case). The per-window work downstream becomes a
    plain field expression — the transform(sequence, i -> f(slice(
    arr, i, width))) form is semantically identical but pays an
    interpreted slice() per window (HOF lambdas are CodegenFallback;
    measured 7x slower on shingle construction, SCALING_NOTES r5)."""
    n = F.size(arr)
    zipped = F.arrays_zip(
        arr.alias("t0"),
        *[F.slice(arr, j + 1, n).alias(f"t{j}") for j in range(1, width)])
    return F.when(n >= F.lit(width),
                  F.slice(zipped, 1, n - F.lit(width - 1))
                  ).otherwise(F.slice(zipped, 1, 0))


def kgram_hashes(text: Column, k: int = 5) -> Column:
    """Rolling k-gram token hashes: xxhash64 of each k-token window of
    the normalized text, in document order. Pure JVM expressions —
    the distributed equivalent of a Rabin-Karp scan, O(n·k) work per
    doc, no Python. Windows come from _sliding_zip (docs with fewer
    than k tokens, or null text where size() = -1, yield an empty
    hash array — same contract as before)."""
    toks = F.split(normalized(text), " ")
    hashes = F.transform(
        _sliding_zip(toks, k),
        lambda x: F.xxhash64(F.concat_ws(
            " ", *[x[f"t{j}"] for j in range(k)])))
    # null text -> null split array propagates through zip/slice; the
    # contract (and the old sequence-guard form) is an EMPTY hash array
    return F.coalesce(hashes, F.array().cast("array<bigint>"))


def winnow_fingerprints(text: Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): from the rolling k-gram hash
    sequence, keep the MINIMUM of every w-length window, dedup'd and
    sorted. Guarantees: any shared token run of length >= k + w - 1
    between two documents yields at least one shared fingerprint, so
    containment/overlap detection is exact above that span length —
    stronger than whole-document md5 (op: "document fingerprinting,
    rolling hash"). Entirely JVM HOFs: O(n·(k+w)) codegen work per
    doc, one shuffle only if the caller explodes for a join."""
    hs = kgram_hashes(text, k)
    # fewer than w k-gram hashes -> no complete window -> empty
    # fingerprint set (_sliding_zip's contract); per-window min is a
    # plain least() over the zipped fields, no interpreted slice
    mins = F.transform(
        _sliding_zip(hs, w),
        lambda x: F.least(*[x[f"t{j}"] for j in range(w)]))
    return F.array_sort(F.array_distinct(mins))
