"""Deduplication operators for training-data pipelines.

Five dedup families over a (doc_id, text) / (vec_id, embedding)
corpus, each scale-shaped for 100 TB inputs:

- exact:      hash-groupBy on normalized md5 — one shuffle, partial agg
- minhash:    word-shingle -> H seeded xxhash64 min-aggregates ->
              banded LSH -> candidate pairs within buckets only
              (never all-pairs); JVM-side hashes, no Python
- simhash:    64-bit majority fingerprint, fully JVM-side (explode +
              xxhash64 + per-bit vote sums); hamming-close pairs
              within bit-band buckets
- token jaccard: exact set-overlap verify, cohort-bounded, with a
              document-frequency cap (stop tokens never join)
- embedding cosine: VERIFY stage over LSH candidate pairs (banded
              random hyperplanes) by default; cohort-exhaustive form
              explicit (`_exhaustive`) for bounded cohorts / oracles

The LSH patterns follow the public MinHash/LSH literature (Broder;
Leskovec et al., Mining of Massive Datasets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from topo2osm_spark.functions.text import dround, fingerprint_md5, normalized

N_HASHES = 32
BAND_ROWS = 4  # 8 bands x 4 rows

# --- engine-portable hashing -------------------------------------------
# xxhash64 is Spark-only; for oracle-mirrorable variants we derive a
# 60-bit integer from the leading 15 hex digits of md5 — bit-identical
# in any engine with md5 (DuckDB mirror:
#   ('0x' || substr(md5(s || ':' || seed), 1, 15))::BIGINT ).
MD5_BITS = 60


def md5h(col, seed: int | None = None):
    """60-bit integer hash from md5, identical across engines."""
    s = col if seed is None else F.concat(col, F.lit(f":{seed}"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def exact_dup_groups(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: groups of identical (normalized) texts.
    Returns (fp, n_dups, keep_id) for groups with >1 member —
    keep_id = min id (deterministic survivor)."""
    return (docs
            .withColumn("fp", fingerprint_md5(F.col(text_col)))
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n_dups"),
                 F.min(id_col).alias("keep_id"))
            .where(F.col("n_dups") > 1))


def _shingle_array(text_col, n: int = 3):
    """Column expr: distinct non-empty word n-gram shingles of a text
    column, as array<string>.

    Construction: the token array is arrays_zip'ped with its own
    1..n-1 shifted copies and the zip is sliced to the gram count, so
    gram i is a plain concat_ws of n adjacent struct fields. The
    obvious transform(sequence(...), i -> concat_ws(slice(toks, i+1,
    n))) form is semantically identical but was measured 7x SLOWER —
    an interpreted slice() call per gram (HOF lambdas are
    CodegenFallback) dominates the whole minhash pipeline. Short docs
    (< n tokens) produce one short gram, exactly like the slice form
    (concat_ws skips the nulls the shifted copies pad with)."""
    toks = F.split(normalized(text_col), " ")
    sz = F.size(toks)
    zipped = F.arrays_zip(
        toks.alias("t0"),
        *[F.slice(toks, k + 1, sz).alias(f"t{k}") for k in range(1, n)])
    grams = F.transform(
        F.slice(zipped, 1, F.greatest(sz - n, F.lit(0)) + 1),
        lambda x: F.concat_ws(" ", *[x[f"t{k}"] for k in range(n)]))
    return F.filter(F.array_distinct(grams), lambda s: F.length(s) > 0)


def shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc, one row per shingle."""
    return (docs.withColumn("shingle",
                            F.explode(_shingle_array(F.col(text_col), n))))


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       n_hashes: int = N_HASHES,
                       mirrorable: bool = False) -> DataFrame:
    """(id, sig array<long>): sig[i] = min over shingles of the i-th
    seeded hash. Explode + partial-aggregating groupBy: the per-seed
    mins combine map-side, so the exchange carries one 32-long buffer
    per (doc, partition), not the shingle corpus. (A row-wise
    higher-order-function form — array_min(transform(...)) — was
    measured 3-8x SLOWER here: HOF lambdas are CodegenFallback,
    i.e. interpreted per element, while the agg path keeps every
    hash inside whole-stage codegen.)

    mirrorable=False (production): each shingle STRING is xxhash64'd
    exactly once; the n_hashes per-seed values derive from re-hashing
    the 8-byte base with the seed (xxhash64 over two longs, fixed
    cost) — an n_hashes-fold cut in string-scan work vs seeding the
    string hash directly, same independence structure (standard
    one-hash MinHash practice).
    mirrorable=True: seeded md5h per shingle — bit-identical in
    DuckDB, so the whole minhash+LSH pipeline gets a full SQL oracle.

    r6 plan shape: the gram strings are built AFTER the explode —
    explode the zip-shift windows (structs of n adjacent tokens) and
    concat_ws on the exploded ROWS, where it compiles into whole-stage
    codegen. The r5 form (transform(windows, concat_ws) + explode of
    the string array) paid an INTERPRETED concat per gram (HOF lambdas
    are CodegenFallback) — measured 6.0 s of the 8 s signature scan at
    sf1.0 vs 1.2 s for the bare zip+slice (guide §4.1: prefer built-in
    codegen over lambda evaluation). array_distinct is dropped: min()
    over duplicate shingles is identical, so signatures are unchanged
    (the md5 DuckDB oracle pins this); the length>0 filter moves to a
    codegen Filter on the exploded rows — same row set."""
    n = 3
    toks = F.split(normalized(F.col(text_col)), " ")
    sz = F.size(toks)
    zipped = F.arrays_zip(
        toks.alias("t0"),
        *[F.slice(toks, k + 1, sz).alias(f"t{k}") for k in range(1, n)])
    windows = F.slice(zipped, 1, F.greatest(sz - n, F.lit(0)) + 1)
    sh = (docs.select(id_col, F.explode(windows).alias("w"))
              .select(id_col, F.concat_ws(
                  " ", *[F.col(f"w.t{k}") for k in range(n)]).alias("shingle"))
              .where(F.length("shingle") > 0))
    if mirrorable:
        aggs = [F.min(md5h(F.col("shingle"), i)).alias(f"h{i}")
                for i in range(n_hashes)]
    else:
        sh = sh.withColumn("hb", F.xxhash64("shingle"))
        aggs = [F.min(F.xxhash64("hb", F.lit(i))).alias(f"h{i}")
                for i in range(n_hashes)]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(id_col, F.array(*[f"h{i}" for i in range(n_hashes)]).alias("sig"))


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        band_rows: int = BAND_ROWS,
                        mirrorable: bool = False,
                        carry_sig: bool = False) -> DataFrame:
    """Banded LSH: docs agreeing on ALL rows of any band become a
    candidate pair. Pairs are generated per bucket (self-join on
    (band, band_hash)) — the classic sub-quadratic shape.

    mirrorable=True uses the band's comma-joined value string as the
    bucket key (identical bucketing semantics, engine-portable);
    production hashes it with xxhash64 to keep the shuffle key fixed
    width.

    carry_sig=True returns (a, b, sig_a, sig_b): the signature arrays
    ride through the bucket join (the MMDS bucket layout), so the
    verify stage needs NO re-join against `sigs` — and, decisively,
    no recomputation of the shingle-explode + H min-agg subtree, which
    dominates the pipeline cost. The trade is ~2*H longs of extra
    width on the band shuffle; sig is functionally dependent on the
    id, so distinct over (a, b, sig_a, sig_b) yields the same pair
    set as distinct over (a, b)."""
    bands = sigs.withColumn(
        "band", F.explode(F.sequence(
            F.lit(0), F.floor(F.size("sig") / band_rows).cast("int") - 1)))
    band_vals = F.slice("sig", F.col("band") * band_rows + 1, band_rows)
    if mirrorable:
        bands = bands.withColumn("band_hash", F.concat_ws(
            ",", F.transform(band_vals, lambda x: x.cast("string"))))
    else:
        bands = bands.withColumn(
            "band_hash", F.xxhash64(band_vals.cast("string"), "band"))
    extra_l = [F.col("sig").alias("sig_a")] if carry_sig else []
    extra_r = [F.col("sig").alias("sig_b")] if carry_sig else []
    left = bands.select(F.col(id_col).alias("a"), "band", "band_hash", *extra_l)
    right = bands.select(F.col(id_col).alias("b"), "band", "band_hash", *extra_r)
    out_cols = ["a", "b"] + (["sig_a", "sig_b"] if carry_sig else [])
    return (left.join(right, ["band", "band_hash"])
                .where(F.col("a") < F.col("b"))
                .select(*out_cols).distinct())


def minhash_similarity(sigs: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """Estimated Jaccard = fraction of agreeing signature positions."""
    sa = sigs.select(F.col(id_col).alias("a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("b"), F.col("sig").alias("sig_b"))
    j = (pairs.join(sa, "a").join(sb, "b")
         .withColumn("est_jaccard", F.round(
             F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                             lambda m: m)) / F.size("sig_a"), 4)))
    return j.select("a", "b", "est_jaccard")


def minhash_lsh_dedup(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", threshold: float = 0.7,
                      n_hashes: int = N_HASHES,
                      mirrorable: bool = False) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline -> (a, b, est_jaccard).

    Signatures ride through the band join (carry_sig): the
    shingle-explode + H min-agg subtree — the dominant cost — is
    planned exactly once instead of three times (band join + two
    verify re-joins), and the verify stage is a pure projection.
    Result set is identical to the re-join form (same pairs, same
    est_jaccard; the md5-mirror DuckDB oracle pins this)."""
    sigs = minhash_signatures(docs, text_col, id_col, n_hashes, mirrorable)
    pairs = lsh_candidate_pairs(sigs, id_col, mirrorable=mirrorable,
                                carry_sig=True)
    est = F.round(
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda m: m)) / F.size("sig_a"), 4)
    return (pairs.withColumn("est_jaccard", est)
                 .where(F.col("est_jaccard") >= threshold)
                 .select("a", "b", "est_jaccard"))


def simhash_fingerprints(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         n_bits: int = 64,
                         mirrorable: bool = False) -> DataFrame:
    """(id, fp): n_bits-bit SimHash over whitespace tokens, entirely
    JVM-side (codegen) — no Python in the hot path.

    explode tokens -> hash(token) -> per-bit +/-1 votes -> n_bits
    partial-aggregating sums per doc -> majority bits OR'd into the
    fingerprint (disjoint bit values sum exactly, incl. the sign bit).
    One shuffle, map-side combine; replaces a per-row/per-token/
    per-byte Python FNV loop that was ~100x slower per batch.

    mirrorable=True swaps xxhash64 for the 60-bit md5h (pass
    n_bits=MD5_BITS) — every step is then plain integer SQL, so the
    whole fingerprint+banding pipeline has a DuckDB oracle."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    t = (docs.select(id_col, F.explode(toks).alias("tok"))
             .where(F.length("tok") > 0)
             .withColumn("h", md5h(F.col("tok")) if mirrorable
                         else F.xxhash64("tok")))
    votes = t.groupBy(id_col).agg(*[
        F.sum(F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1)
               .otherwise(-1)).alias(f"v{b}")
        for b in range(n_bits)])
    bit_terms = [
        F.shiftleft(F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long"))
                     .otherwise(F.lit(0).cast("long")), b)
        for b in range(n_bits)]
    fp = bit_terms[0]
    for term in bit_terms[1:]:
        fp = fp + term
    return votes.select(F.col(id_col).alias("id"), fp.alias("fp"))


def simhash_pairs(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 8,
                  n_bands: int = 8, n_bits: int = 64,
                  mirrorable: bool = False) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance. Candidate buckets:
    the fingerprint's n_bands equal bit-bands — by pigeonhole, a pair
    within hamming <= n_bands-1 agrees exactly on >= 1 band, so recall
    is total for max_hamming < n_bands and approximate beyond. Never
    an all-pairs join; narrower bands trade join fan-in for recall."""
    width = n_bits // n_bands
    mask = (1 << width) - 1
    fp = simhash_fingerprints(docs, text_col, id_col, n_bits, mirrorable)
    quarters = fp.withColumn("q", F.explode(F.array(
        *[F.struct(F.lit(i).alias("qi"),
                   F.shiftright("fp", width * i).bitwiseAND(F.lit(mask)).alias("qv"))
          for i in range(n_bands)])))
    left = quarters.select(F.col("id").alias("a"), F.col("fp").alias("fp_a"), "q")
    right = quarters.select(F.col("id").alias("b"), F.col("fp").alias("fp_b"), "q")
    cand = (left.join(right, ["q"]).where(F.col("a") < F.col("b"))
                .select("a", "b", "fp_a", "fp_b").distinct())
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (cand.withColumn("hamming", ham)
                .where(F.col("hamming") <= max_hamming)
                .select("a", "b", "hamming"))


def token_jaccard_pairs(docs: DataFrame, cohort_col: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.5,
                        max_df: int = 1000) -> DataFrame:
    """Exact token-set Jaccard within cohorts (bounded self-join) —
    the verify step behind MinHash candidates, SQL-mirrorable.

    max_df caps per-(cohort, token) document frequency: a stop token
    shared by every doc in a cohort would make the token self-join
    quadratic in cohort size (the classic LSH-verify blowup). Tokens
    with df > max_df are dropped from BOTH the intersection join and
    the per-doc set sizes, so the Jaccard stays internally consistent
    (it becomes Jaccard over the sub-max_df vocabulary — standard
    stop-token hygiene; mirrored in the DuckDB oracle).

    Plan shape (r5, measured ~1.8x over groupBy+semi-join df-capping):
    tokens are hashed to fixed-width longs up front (values unchanged
    modulo 64-bit collisions — negligible, and the DuckDB oracle
    hash-matches), and the df cap is a COUNT window over
    (cohort, token): one exchange of the token rows on exactly the
    key the a/b self-join needs, instead of a partial-agg shuffle
    plus a second full semi-join shuffle."""
    from pyspark.sql import Window

    tok_all = (docs.select(id_col, cohort_col,
                           F.explode(F.array_distinct(
                               F.split(normalized(F.col(text_col)), " "))).alias("ws"))
                   .withColumn("w", F.xxhash64("ws")).drop("ws"))
    wdf = Window.partitionBy(cohort_col, "w")
    tok = (tok_all.withColumn("df", F.count(F.lit(1)).over(wdf))
                  .where(F.col("df") <= max_df).drop("df"))
    sizes = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = tok.select(F.col(id_col).alias("a"), F.col(cohort_col).alias("c"), "w")
    b = tok.select(F.col(id_col).alias("b"), F.col(cohort_col).alias("c"), "w")
    inter = (a.join(b, ["c", "w"]).where(F.col("a") < F.col("b"))
              .groupBy("a", "b").agg(F.count(F.lit(1)).alias("i")))
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb"))
    return (inter.join(sa, "a").join(sb, "b")
            .withColumn("jaccard", dround(
                F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))))
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))


_EMB_LSH_SEED = 90210


def embedding_lsh_candidate_pairs(embs: DataFrame, id_col: str = "vec_id",
                                  vec_col: str = "embedding",
                                  n_planes: int = 8,
                                  n_bands: int = 4) -> DataFrame:
    """Candidate near-dup pairs by banded random-hyperplane LSH:
    n_bands independent n_planes-bit sign signatures per vector; any
    shared (band, bucket) makes a candidate. Pairs generate per bucket
    (self-join on the band key) — sub-quadratic, the scale-safe front
    end for cosine verification. Planes are seeded and derived from
    the vector dimension inside the UDF, so the signature is
    deterministic across batches/partitions."""
    seed, np_, nb_ = _EMB_LSH_SEED, n_planes, n_bands

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _band_buckets(vec: pd.Series) -> pd.Series:
        m = np.stack(vec.to_numpy())
        planes = np.random.default_rng(seed).standard_normal(
            (nb_ * np_, m.shape[1]))
        signs = (m @ planes.T) > 0
        out = np.zeros((len(m), nb_), dtype=np.int32)
        for band in range(nb_):
            for i in range(np_):
                out[:, band] |= signs[:, band * np_ + i].astype(np.int32) << i
        return pd.Series(list(out))

    bb = embs.select(F.col(id_col).alias("id"),
                     F.posexplode(_band_buckets(F.col(vec_col)))
                      .alias("band", "bucket"))
    left = bb.select(F.col("id").alias("a"), "band", "bucket")
    right = bb.select(F.col("id").alias("b"), "band", "bucket")
    return (left.join(right, ["band", "bucket"])
            .where(F.col("a") < F.col("b"))
            .select("a", "b").distinct())


def _cosine_on_pairs(embs: DataFrame, pairs: DataFrame, id_col: str,
                     vec_col: str, threshold: float) -> DataFrame:
    """cosine(a, b) for explicit (a, b) pairs; JVM HOF math in double
    precision with left-to-right summation (oracle-compatible)."""
    v = embs.select(id_col,
                    F.transform(vec_col, lambda x: x.cast("double")).alias("v"))
    va = v.select(F.col(id_col).alias("a"), F.col("v").alias("va"))
    vb = v.select(F.col(id_col).alias("b"), F.col("v").alias("vb"))
    j = pairs.join(va, "a").join(vb, "b")
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform("va", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform("vb", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return (j.withColumn("cosine", dround(dot / (na * nb)))
             .where(F.col("cosine") >= threshold)
             .select("a", "b", "cosine"))


def embedding_cosine_pairs(embs: DataFrame, candidates: DataFrame | None = None,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           threshold: float = 0.3) -> DataFrame:
    """Near-dup pairs by cosine — the VERIFY stage. Default entry
    point: cosine is computed only over CANDIDATE pairs (given, e.g.
    from `embedding_lsh_candidate_pairs` / minhash LSH; derived via
    hyperplane LSH when omitted), never over raw cohort cross
    products — a 10k-doc hot cohort stays sub-quadratic. The old
    cohort-exhaustive form survives as the explicit
    `embedding_cosine_pairs_exhaustive` (exact; fine for bounded
    cohorts and as the oracle surface)."""
    if isinstance(candidates, str):
        raise TypeError(
            "embedding_cosine_pairs's second parameter is now a candidate-"
            f"pair DataFrame, not a cohort column name ({candidates!r}); "
            "for cohort-exhaustive cosine use "
            "embedding_cosine_pairs_exhaustive(embs, cohort_col=...).")
    if candidates is None:
        candidates = embedding_lsh_candidate_pairs(embs, id_col, vec_col)
    return _cosine_on_pairs(embs, candidates, id_col, vec_col, threshold)


def embedding_cosine_pairs_exhaustive(
        embs: DataFrame, cohort_col: str = "label",
        id_col: str = "vec_id", vec_col: str = "embedding",
        threshold: float = 0.3) -> DataFrame:
    """ALL pairs within cohorts — exact but quadratic in cohort size;
    use only on bounded cohorts (or as an LSH-verify oracle). Dot/norm
    via JVM higher-order functions in double precision (matches the
    DuckDB oracle's arithmetic)."""
    v = embs.select(id_col, cohort_col,
                    F.transform(vec_col, lambda x: x.cast("double")).alias("v"))
    a = v.select(F.col(id_col).alias("a"), F.col(cohort_col).alias("c"),
                 F.col("v").alias("va"))
    b = v.select(F.col(id_col).alias("b"), F.col(cohort_col).alias("c"),
                 F.col("v").alias("vb"))
    pairs = a.join(b, "c").where(F.col("a") < F.col("b"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform("va", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform("vb", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return (pairs.withColumn("cosine", dround(dot / (na * nb)))
                 .where(F.col("cosine") >= threshold)
                 .select("a", "b", "cosine"))
