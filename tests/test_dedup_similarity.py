"""Dedup + similarity + text-analysis operator tests (sf0.001 tables)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup_finds_planted_dups(spark):
    from topo2osm_spark.operators.dedup import exact_dup_groups
    rows = [(1, "Hello   World"), (2, "hello world"), (3, "unique text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_dup_groups(df).collect()
    assert len(out) == 1
    assert out[0]["n_dups"] == 2 and out[0]["keep_id"] == 1


def test_token_jaccard_df_cap_drops_stop_tokens(spark):
    """A stop token shared by every doc in a cohort must not generate
    quadratic pairs: with max_df below the cohort size, docs that only
    share the stop token produce NO pair, while genuinely similar docs
    still match on their rare tokens."""
    from topo2osm_spark.operators.dedup import token_jaccard_pairs
    rows = [(i, "c", f"the unique{i} words{i} here{i}") for i in range(20)]
    rows += [(100, "c", "rare alpha beta gamma the"),
             (101, "c", "rare alpha beta gamma the")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {(r["a"], r["b"]) for r in token_jaccard_pairs(
        df, cohort_col="source", threshold=0.5, max_df=10).collect()}
    # 'the' (df=22 > 10) is dropped -> the 20 filler docs pair with nobody
    assert out == {(100, 101)}
    # without the cap, 'the' alone is below threshold, so same pairs but
    # the join had to consider all C(22,2) doc pairs sharing 'the'
    uncapped = {(r["a"], r["b"]) for r in token_jaccard_pairs(
        df, cohort_col="source", threshold=0.5, max_df=10**9).collect()}
    assert uncapped == {(100, 101)}


def test_minhash_detects_near_dups(spark):
    from topo2osm_spark.operators.dedup import minhash_lsh_dedup
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    near = base.replace("theta", "thetaX", 1)
    far = "one two three four five six seven eight nine ten " * 4
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string")
    pairs = {(r["a"], r["b"]): r["est_jaccard"]
             for r in minhash_lsh_dedup(df, threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.5
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_carry_sig_equals_rejoin_form(spark):
    """r5 restructure pin: carrying signatures through the LSH band
    join (carry_sig) must yield EXACTLY the pairs+estimates of the
    composable re-join form (lsh_candidate_pairs + minhash_similarity)
    — sig is functionally dependent on the id, so the distinct over
    (a, b, sig_a, sig_b) cannot change the pair set."""
    from pyspark.sql import functions as F

    from topo2osm_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_lsh_dedup, minhash_signatures,
        minhash_similarity)
    rows = [(i, f"alpha beta gamma delta w{i % 4} epsilon zeta eta "
                f"theta iota kappa " * 3) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(df)
    rejoin = (minhash_similarity(sigs, lsh_candidate_pairs(sigs))
              .where(F.col("est_jaccard") >= 0.5))
    carried = minhash_lsh_dedup(df, threshold=0.5)
    assert carried.exceptAll(rejoin).count() == 0
    assert rejoin.exceptAll(carried).count() == 0
    assert carried.count() > 0  # the pin is vacuous on an empty set


def test_simhash_hamming(spark):
    from topo2osm_spark.operators.dedup import simhash_pairs
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    near = base.replace("kappa", "kappaX", 1)
    far = "one two three four five six seven eight nine ten " * 4
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string")
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in simhash_pairs(df, max_hamming=16).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 16
    assert (1, 3) not in pairs


def test_minhash_mirrorable_matches_duckdb(spark):
    """The md5-hash minhash variant is bit-identical in DuckDB — the
    engine-portability contract behind the dedup_minhash_md5 oracle."""
    import duckdb
    from topo2osm_spark.operators.dedup import md5h, minhash_lsh_dedup
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    near = base.replace("theta", "thetaX", 1)
    far = "one two three four five six seven eight nine ten " * 4
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string")
    pairs = {(r["a"], r["b"]): r["est_jaccard"]
             for r in minhash_lsh_dedup(df, threshold=0.5, n_hashes=16,
                                        mirrorable=True).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.5
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # the primitive: Spark md5h == DuckDB's hex-slice cast, per seed
    got = df.select(md5h(F.col("text"), 7).alias("h")).orderBy("h").collect()
    want = duckdb.sql(
        "SELECT ('0x' || substr(md5(t || ':7'), 1, 15))::BIGINT AS h "
        "FROM (VALUES (?), (?), (?)) v(t) ORDER BY h",
        params=[base, near, far]).fetchall()
    assert [r["h"] for r in got] == [r[0] for r in want]


def test_simhash_mirrorable_60bit(spark):
    """md5 simhash variant: fingerprints fit in 60 bits and near-dup
    detection still works with 6x10-bit banding."""
    from topo2osm_spark.operators.dedup import (MD5_BITS,
                                                simhash_fingerprints,
                                                simhash_pairs)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    near = base.replace("kappa", "kappaX", 1)
    far = "one two three four five six seven eight nine ten " * 4
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string")
    fps = simhash_fingerprints(df, n_bits=MD5_BITS, mirrorable=True).collect()
    assert all(0 <= r["fp"] < (1 << MD5_BITS) for r in fps)
    pairs = {(r["a"], r["b"]) for r in simhash_pairs(
        df, max_hamming=16, n_bands=6, n_bits=MD5_BITS,
        mirrorable=True).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_token_jaccard_exact(spark):
    from topo2osm_spark.operators.dedup import token_jaccard_pairs
    df = spark.createDataFrame(
        [(1, "a", "x y z w"), (2, "a", "x y z q"), (3, "b", "x y z w")],
        "doc_id long, source string, text string")
    out = {(r["a"], r["b"]): r["jaccard"]
           for r in token_jaccard_pairs(df, "source", threshold=0.1).collect()}
    # same cohort only; jaccard(|{xyz}|=3 / |{xyzwq}|=5) = 0.6
    assert out == {(1, 2): 0.6}


def test_brute_force_topk_matches_numpy(spark, embs):
    import numpy as np
    from topo2osm_spark.operators.similarity import brute_force_topk
    q = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
    got = [(r["vec_id"], r["cosine"]) for r in brute_force_topk(embs, q, k=5).collect()]
    pdf = embs.toPandas()
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    qv = np.asarray(q)
    cos = (m @ qv) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qv))
    order = sorted(zip(pdf["vec_id"], cos), key=lambda t: (-t[1], t[0]))[:5]
    assert [g[0] for g in got] == [int(o[0]) for o in order]
    for g, o in zip(got, order):
        assert g[1] == pytest.approx(o[1], abs=1e-3)


def test_lsh_topk_subset_of_bruteforce_space(spark, embs):
    from topo2osm_spark.operators.similarity import lsh_topk
    q = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
    rows = lsh_topk(embs, q, k=10).collect()
    assert 0 < len(rows) <= 10  # approximate: bounded, non-empty
    sims = [r["cosine"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_text_functions(spark):
    from topo2osm_spark.functions import text as tx
    df = spark.createDataFrame(
        [(1, "The quick brown fox, it jumps! Over 2 dogs.")],
        "id long, text string")
    r = df.select(
        tx.token_count_ws(F.col("text")).alias("ws"),
        tx.token_count_bpeish(F.col("text")).alias("bpe"),
        tx.punct_ratio(F.col("text")).alias("punct"),
        tx.fingerprint_md5(F.col("text")).alias("fp"),
        tx.lang_guess(F.col("text")).alias("lang"),
    ).first()
    assert r["ws"] == 9
    assert r["bpe"] == 12  # 8 word pieces + '2' + ',' + '!' + '.'
    assert 0 < r["punct"] < 0.2
    assert len(r["fp"]) == 32
    assert r["lang"] in ("vowel-heavy", "latin-balanced", "consonant-heavy")


def test_ivf_topk_matches_oracle_and_recall(spark):
    """IVF ANN: Spark result row-set equals the DuckDB oracle (same
    deterministic md5-sampled centroids + argmax assignment), and the
    probed scan keeps reasonable recall vs exact brute force."""
    import duckdb
    import __spark_entry__ as e
    sf = "/root/testdata/sf0.001"
    got = [(r["vec_id"], r["cosine"])
           for r in e.queries()["ann_topk_ivf"](spark, sf).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    want = [tuple(r) for r in con.execute(e.oracle_sql()["ann_topk_ivf"]).fetchall()]
    assert [(int(a), round(b, 4)) for a, b in got] == \
           [(int(a), round(b, 4)) for a, b in want]
    exact = {r["vec_id"] for r in
             e.queries()["ann_topk_bruteforce"](spark, sf).collect()}
    ivf_ids = {v for v, _ in got}
    assert len(ivf_ids & exact) >= 3  # 4/16 probes: partial recall ok


def test_media_decode_stub(spark):
    from topo2osm_spark.operators.media import decode_media, frame_sample
    media = spark.createDataFrame(
        [("d1", "tile/12/2100/1100"), ("d2", "tile/12/2100/1101")],
        "doc_id string, media_ref string")
    out = decode_media(media).collect()
    assert len(out) == 2
    for r in out:
        assert r["meta"]["channels"] == 3
        assert len(r["payload"]) == 256
        assert len(r["features"]) == 16
    # deterministic across runs
    again = decode_media(media).collect()
    assert sorted((r["media_ref"], bytes(r["payload"])) for r in out) == \
           sorted((r["media_ref"], bytes(r["payload"])) for r in again)
    frames = frame_sample(decode_media(media), every_n=4)
    assert frames.count() == 2 * 64


def test_real_codecs_roundtrip():
    """PPM and WAV decode are REAL (pure numpy); only compressed
    codecs remain gated on an imaging library."""
    import numpy as np
    import pytest as pt
    from topo2osm_spark.operators import media as M

    img = np.arange(24 * 16 * 3, dtype=np.uint8).reshape(24, 16, 3)
    assert np.array_equal(M.decode_ppm(M.encode_ppm(img)), img)
    # header with a comment line parses too
    commented = b"P6\n# a comment\n16 24\n255\n" + img.tobytes()
    assert np.array_equal(M.decode_ppm(commented), img)

    samples = (np.sin(np.linspace(0, 40 * np.pi, 1600)) * 20000).astype(np.int16)
    back, rate = M.decode_wav_pcm16(M.encode_wav_pcm16(samples, 8000))
    assert rate == 8000 and np.array_equal(back, samples)

    small = M.resize_nearest(img, 6, 4)
    assert small.shape == (6, 4, 3)
    assert len(M.image_features(img)) == M.N_FEATURES
    assert len(M.audio_features(samples)) == M.N_FEATURES

    with pt.raises(NotImplementedError):  # jpeg needs Pillow (absent)
        M.decode_payload(b"\xff\xd8\xff\xe0fakejpeg")


def test_media_decode_real_path(spark):
    """decode_media runs the REAL decoder when a payload column is
    present: meta reflects the actual parsed PPM header."""
    import numpy as np
    from topo2osm_spark.operators import media as M
    refs = spark.createDataFrame(
        [("d1", "tile/12/2100/1100"), ("d2", "tile/12/2100/1101")],
        "doc_id string, media_ref string")
    out = M.decode_media(M.with_synth_payload(refs, size=24)).collect()
    assert len(out) == 2
    for r in out:
        assert r["meta"]["codec"] == "ppm"
        assert (r["meta"]["width"], r["meta"]["height"]) == (24, 24)
        img = M.decode_ppm(bytes(r["payload"]))
        assert np.allclose(r["features"], M.image_features(img), atol=1e-6)
    # wav payloads decode through the same operator
    wav = M.encode_wav_pcm16(
        (np.arange(800) % 100 * 300).astype(np.int16), 16000)
    a = spark.createDataFrame([("d3", "audio/1", bytearray(wav))],
                              "doc_id string, media_ref string, payload binary")
    r = M.decode_media(a).first()
    assert r["meta"]["codec"] == "wav/pcm16@16000"
    assert r["meta"]["width"] == 800  # samples


def _formatted_plan(df) -> str:
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_lsh_index_partition_pruning(spark, embs, tmp_path):
    """Materialized LSH index (r2 verdict task): same row set as the
    query-time-bucketed path, and the per-query scan PRUNES to the
    probe-bucket partitions (PartitionFilters on `bucket`)."""
    from topo2osm_spark.operators.similarity import (
        lsh_topk, lsh_topk_indexed, query_buckets, write_lsh_index)
    q = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
    path = str(tmp_path / "lsh_idx")
    write_lsh_index(embs, path, dim=64)
    got = lsh_topk_indexed(spark, path, q, k=10)
    want = [(r["vec_id"], r["cosine"]) for r in lsh_topk(embs, q, k=10).collect()]
    assert [(r["vec_id"], r["cosine"]) for r in got.collect()] == want
    plan = _formatted_plan(got)
    assert "PartitionFilters" in plan and "bucket" in plan
    # the scan touches only probe partitions, not the whole index
    import os
    n_parts = len([d for d in os.listdir(path) if d.startswith("bucket=")])
    assert len(query_buckets(q)) < n_parts or n_parts <= 9


def test_ivf_index_partition_pruning(spark, embs, tmp_path):
    """Materialized IVF index: row set identical to the
    assignment-recomputing path; query scans only the n_probes
    inverted lists (PartitionFilters on `cid`); centroid ranking is
    driver-side metadata (no corpus scan)."""
    from topo2osm_spark.operators.similarity import (
        ivf_topk, ivf_topk_indexed, write_ivf_index)
    q = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
    path = str(tmp_path / "ivf_idx")
    write_ivf_index(embs, path)
    got = ivf_topk_indexed(spark, path, q, k=10)
    want = [(r["vec_id"], r["cosine"]) for r in ivf_topk(embs, q, k=10).collect()]
    assert [(r["vec_id"], r["cosine"]) for r in got.collect()] == want
    plan = _formatted_plan(got)
    assert "PartitionFilters" in plan and "cid" in plan


def test_embedding_cosine_verify_via_lsh_candidates(spark):
    """The default cosine near-dup path verifies LSH CANDIDATE pairs
    only — a single hot 10k-vector cohort stays far below the ~50M
    exhaustive pair count (r2 verdict: quadratic cohort fan-out)."""
    import numpy as np
    from topo2osm_spark.operators.dedup import (
        embedding_cosine_pairs, embedding_lsh_candidate_pairs)
    n, dim = 10_000, 8
    rng = np.random.default_rng(7)
    base = rng.standard_normal((n // 2, dim))
    # half the corpus: near-duplicates of the first half
    m = np.vstack([base, base + rng.standard_normal((n // 2, dim)) * 0.01])
    rows = [(i, [float(x) for x in m[i]], "hot") for i in range(n)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    cand = embedding_lsh_candidate_pairs(embs)
    n_cand = cand.count()
    assert 0 < n_cand < (n * (n - 1)) // 20  # sub-quadratic candidates
    pairs = embedding_cosine_pairs(embs, cand, threshold=0.995)
    found = pairs.count()
    # planted near-dups (i, i + n/2) are near-certain bucket collisions
    assert found >= 0.8 * (n // 2)


def test_winnow_fingerprints_shared_run_guarantee(spark):
    """Winnowing (k=5, w=4): documents sharing a token run of length
    >= k+w-1 = 8 share at least one fingerprint; disjoint documents
    share none. Fingerprints are order-insensitive sets (sorted,
    distinct) computed fully JVM-side."""
    from topo2osm_spark.functions.text import winnow_fingerprints
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    df = spark.createDataFrame(
        [(1, f"one two three {shared} four five"),
         (2, f"{shared} completely different tail words here"),
         (3, "nothing in common with the others at all town")],
        "id long, text string")
    rows = {r["id"]: set(r["fp"]) for r in
            df.select("id", winnow_fingerprints(F.col("text")).alias("fp"))
              .collect()}
    assert rows[1] & rows[2], "shared 8-token run must share a fingerprint"
    assert not (rows[1] & rows[3])
    assert not (rows[2] & rows[3])
    # deterministic: same text -> same fingerprint set
    again = {r["id"]: set(r["fp"]) for r in
             df.select("id", winnow_fingerprints(F.col("text")).alias("fp"))
               .collect()}
    assert again == rows


def test_winnow_and_kgrams_short_docs(spark):
    """Docs shorter than k tokens (k=5) or with fewer than w k-gram
    windows (w=4, i.e. < k+w-1 = 8 tokens) must yield EMPTY hash /
    fingerprint arrays, not crash: sequence(1, 0) is descending in
    Spark and used to feed slice() a 0 start index
    (INVALID_PARAMETER_VALUE.START). Null text likewise."""
    from topo2osm_spark.functions.text import kgram_hashes, winnow_fingerprints
    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two three four"),          # < k tokens
         (4, "a b c d e f"),                                      # k<=n<k+w-1
         (5, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (6, None)],
        "id long, text string")
    out = {r["id"]: (r["kh"], r["fp"]) for r in df.select(
        "id",
        kgram_hashes(F.col("text")).alias("kh"),
        winnow_fingerprints(F.col("text")).alias("fp")).collect()}
    for i in (1, 2, 3, 6):
        assert out[i] == ([], []), f"doc {i} must be empty, got {out[i]}"
    kh4, fp4 = out[4]
    assert len(kh4) == 2 and fp4 == []   # 6 tokens -> 2 kgrams, no w-window
    kh5, fp5 = out[5]
    assert len(kh5) == 6 and len(fp5) >= 1
