"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship SOSI->OSM conversion on a deterministic
                 interleaved-documents corpus derived from the
                 sf0.001 driver tables (SURVEY.md §3.2).
queries()      — one callable per implemented operator from
                 SURVEY.md §2 plus the training-data operator suite
                 (dedup / similarity / text analysis / multimodal).
oracle_sql()   — DuckDB-equivalent ANSI SQL for every SQL-expressible
                 query; geometry/hash-specific ops are rows-only.

Column aliases match between Spark and SQL exactly; float outputs are
rounded identically on both sides (order-insensitive value-hash
contract). Session timezone is pinned to UTC at call time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def _dr(col, k=4):
    """Deterministic decimal rounding (floor(x*10^k+0.5)/10^k) — exact
    SQL mirror `floor(x * 10^k + 0.5) / 10^k`; see functions/text.dround."""
    from topo2osm_spark.functions.text import dround
    return dround(col, k)


# ---------------------------------------------------------------- helpers

def _tune(spark: SparkSession) -> None:
    from topo2osm_spark.plans.session import tune_for_session
    tune_for_session(spark)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_GEO_CACHE: dict = {}

# Fixed concave comb polygon (integer vertices, CCW) shared by the
# pip_raycast_sig Spark query and its DuckDB oracle — both sides unroll
# the SAME edge list into the SAME cross-multiplied crossing rule.
_PIP_POLY = [(0, 0), (100, 0), (100, 100), (75, 100), (75, 30),
             (50, 30), (50, 100), (25, 100), (25, 30), (0, 30)]


def _geo_outputs(spark: SparkSession, sf_dir: str) -> dict:
    """Geometry corpus + pipeline outputs, memoized per (session, sf).
    The corpus is synthesized deterministically (seed 42) at a fixed
    small size — geometry queries are correctness surfaces; scale is
    exercised by bench.py / jobs/convert.py."""
    # applicationId, not id(spark): Python id()s are reused after GC, so
    # a long-lived process could alias a dead session's cached outputs.
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _GEO_CACHE:
        from topo2osm_spark.plans.pipeline import run_pipeline
        from topo2osm_spark.sources.fixtures import documents_df
        _tune(spark)
        docs = documents_df(spark, 40, n_municipalities=8, seed=42,
                            max_sosi=2).persist()
        out = run_pipeline(spark, docs)
        out["documents"] = docs
        _GEO_CACHE[key] = out
    return _GEO_CACHE[key]


# ---------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: convert the interleaved corpus and return the
    tagged assembled ways (doc_id, way_id, objtype, tags, n_nodes,
    closed). Uses /root/testdata/sf0.001 document ids/texts as the
    text spans of the synthesized corpus (the driver's flat documents
    table has no spans column — corpus shape per BASELINE.json:15)."""
    from topo2osm_spark.plans.pipeline import run_pipeline
    from topo2osm_spark.schema import DOCUMENTS
    from topo2osm_spark.sources.fixtures import generate_documents
    _tune(spark)
    driver_texts = [
        r["text"] for r in
        _t(spark, "/root/testdata/sf0.001", "documents")
        .orderBy("doc_id").limit(40).collect()]
    tbl = generate_documents(len(driver_texts), n_municipalities=8, seed=42,
                             driver_texts=driver_texts, max_sosi=2)
    docs = spark.createDataFrame(tbl.to_pylist(), DOCUMENTS)
    out = run_pipeline(spark, docs, run_pip=False, run_tiles=False)
    return (out["ways"]
            .where(F.col("emit"))
            .select("doc_id", "way_id", "objtype", "tags", "n_nodes", "closed"))


# ---------------------------------------------------------------- queries

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- scans / filters / projections (ops 6, 10) ----
    def scan_filter_project(spark, sf):
        _tune(spark)
        li = _t(spark, sf, "lineitem")
        return (li.where(F.col("l_quantity") > 45)
                  .select("l_orderkey", "l_linenumber", "l_quantity")
                  .orderBy("l_orderkey", "l_linenumber"))
    q["scan_filter_project"] = scan_filter_project

    def string_funcs(spark, sf):  # op 35
        _tune(spark)
        d = _t(spark, sf, "documents")
        return d.select(
            "doc_id",
            F.upper(F.substring("text", 1, 10)).alias("head10"),
            F.length("text").alias("n"),
            F.regexp_extract("source", r"src(\d+)", 1).cast("int").alias("src_num"),
        ).orderBy("doc_id")
    q["string_funcs"] = string_funcs

    def math_funcs(spark, sf):  # op 36
        _tune(spark)
        li = _t(spark, sf, "lineitem")
        return (li.where(F.col("l_orderkey") % 100 == 0)
                .select("l_orderkey", "l_linenumber",
                        F.round(F.sqrt("l_extendedprice"), 4).alias("sq"),
                        F.round(F.atan2("l_quantity", F.lit(10.0)), 6).alias("ang"),
                        F.pmod(F.col("l_partkey"), F.lit(7)).alias("m7"))
                .orderBy("l_orderkey", "l_linenumber"))
    q["math_funcs"] = math_funcs

    def array_funcs(spark, sf):  # op 37
        _tune(spark)
        e = _t(spark, sf, "embeddings")
        v = F.transform("embedding", lambda x: x.cast("double"))
        return e.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x), 4).alias("vsum"),
            F.round(F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x), 4).alias("head_sum"),
        ).orderBy("vec_id")
    q["array_funcs"] = array_funcs

    def json_funcs(spark, sf):  # op 39
        _tune(spark)
        ev = _t(spark, sf, "events")
        return (ev.select("event_id",
                          F.get_json_object("props", "$.k").cast("int").alias("k"))
                  .where(F.col("k") > 90).orderBy("event_id"))
    q["json_funcs"] = json_funcs

    # ---- aggregations (ops 24, 25, 26) ----
    def agg_tpch_q1(spark, sf):
        _tune(spark)
        li = _t(spark, sf, "lineitem")
        return (li.where(F.col("l_shipdate") <= "1998-09-02")
                .groupBy("l_returnflag", "l_linestatus")
                .agg(_dr(F.sum("l_quantity"), 2).alias("sum_qty"),
                     _dr(F.sum("l_extendedprice"), 2).alias("sum_base"),
                     _dr(F.avg("l_discount"), 4).alias("avg_disc"),
                     F.count(F.lit(1)).alias("count_order"))
                .orderBy("l_returnflag", "l_linestatus"))
    q["agg_tpch_q1"] = agg_tpch_q1

    def count_by_type(spark, sf):  # op 24
        _tune(spark)
        ev = _t(spark, sf, "events")
        return (ev.groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.countDistinct("user_id").alias("n_users"),
                     _dr(F.sum("value"), 2).alias("sum_value"))
                .orderBy("event_type"))
    q["count_by_type"] = count_by_type

    def grouping_counts(spark, sf):  # op 25: rollup AND cube, one surface
        # (merged from r2's separate rollup_counts/cube_counts so the
        # full query list fits the driver's 50-query window — both
        # grouping-set shapes keep oracle coverage via the gset tag)
        _tune(spark)
        o = _t(spark, sf, "orders")
        r = (o.rollup("o_orderstatus", "o_orderpriority")
             .agg(F.count(F.lit(1)).alias("n"))
             .select(F.lit("rollup").alias("gset"),
                     "o_orderstatus", "o_orderpriority", "n"))
        c = (o.cube("o_orderstatus", "o_orderpriority")
             .agg(F.count(F.lit(1)).alias("n"))
             .select(F.lit("cube").alias("gset"),
                     "o_orderstatus", "o_orderpriority", "n"))
        return r.unionByName(c).orderBy(
            "gset", F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first())
    q["grouping_counts"] = grouping_counts

    def collect_sorted_list(spark, sf):  # op 23
        # Output is the CSV serialization of the ordered list — complex
        # columns are not hashable by the driver canonicalizer, and the
        # scalar form makes this a full oracle pass (string_agg mirror).
        _tune(spark)
        li = _t(spark, sf, "lineitem")
        return (li.where(F.col("l_orderkey") < 200)
                .groupBy("l_orderkey")
                .agg(F.array_join(
                    F.transform(F.sort_array(F.collect_list("l_linenumber")),
                                lambda x: x.cast("string")),
                    ",").alias("lines"))
                .orderBy("l_orderkey"))
    q["collect_sorted_list"] = collect_sorted_list

    # ---- joins (ops 12, 15, 18) ----
    def broadcast_join_dims(spark, sf):  # op 15 analog
        _tune(spark)
        c = _t(spark, sf, "customer")
        n = _t(spark, sf, "nation")
        r = _t(spark, sf, "region")
        return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
                 .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
                 .groupBy("r_name", "n_name")
                 .agg(F.count(F.lit(1)).alias("n_cust"),
                      _dr(F.sum("c_acctbal"), 2).alias("sum_bal"))
                 .orderBy("r_name", "n_name"))
    q["broadcast_join_dims"] = broadcast_join_dims

    def equi_join_agg(spark, sf):  # op 12 analog
        _tune(spark)
        li = _t(spark, sf, "lineitem")
        o = _t(spark, sf, "orders")
        return (li.join(o, li.l_orderkey == o.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(_dr(F.sum("l_quantity"), 2).alias("sum_qty"),
                     F.count(F.lit(1)).alias("n"))
                .orderBy("o_orderpriority"))
    q["equi_join_agg"] = equi_join_agg

    def semi_join(spark, sf):  # op 18
        _tune(spark)
        o = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        big = li.where(F.col("l_quantity") >= 49).select("l_orderkey")
        return (o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
                 .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey"))
    q["semi_join"] = semi_join

    def anti_join(spark, sf):  # op 18
        _tune(spark)
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders")
        return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
                 .select("c_custkey", "c_name").orderBy("c_custkey"))
    q["anti_join"] = anti_join

    # ---- windows (ops 27, 28, 29 — one shared window, three frames;
    # merged from r3's window_rownum/window_running_sum/window_lag_gap
    # to free 50-query-window slots for the geometry-math oracles; all
    # three window ops keep their oracle signal in this one surface) ----
    def window_funcs(spark, sf):
        _tune(spark)
        from pyspark.sql import Window as W
        ev = _t(spark, sf, "events").where(F.col("user_id") < 20)
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        wsum = w.rowsBetween(W.unboundedPreceding, 0)
        return (ev.select(
                    "user_id", "event_id",
                    F.row_number().over(w).alias("rn"),
                    _dr(F.sum("value").over(wsum), 2).alias("running"),
                    F.coalesce(F.lag("event_id").over(w),
                               F.lit(-1)).alias("prev_id"))
                  .orderBy("user_id", "rn"))
    q["window_funcs"] = window_funcs

    # ---- temporal joins (ops 19, 20 — operators/temporal.py) ----
    def asof_join_events(spark, sf):  # op 20: latest error <= each click
        _tune(spark)
        from topo2osm_spark.operators.temporal import asof_join
        ev = _t(spark, sf, "events").where(F.col("user_id") < 40)
        clicks = ev.where(F.col("event_type") == "click") \
                   .select("event_id", "user_id", "ts")
        errors = ev.where(F.col("event_type") == "error") \
                   .select("user_id", "ts", "event_id")
        return (asof_join(clicks, errors, key="user_id",
                          right_payload=("event_id",))
                .select("event_id", "user_id",
                        F.col("asof_event_id").alias("err_event_id"),
                        F.unix_micros(F.col("asof_ts").cast("timestamp")).alias("err_ts_us"))
                .orderBy("event_id"))
    q["asof_join_events"] = asof_join_events

    def range_join_events(spark, sf):  # op 19: clicks within 10min after error
        _tune(spark)
        from topo2osm_spark.operators.temporal import range_join_count
        ev = _t(spark, sf, "events").where(F.col("user_id") < 40)
        errors = ev.where(F.col("event_type") == "error") \
                   .select("event_id", "user_id", "ts")
        clicks = ev.where(F.col("event_type") == "click") \
                   .select("user_id", "ts")
        return (range_join_count(errors, clicks, key="user_id",
                                 window_us=600_000_000,
                                 count_alias="n_clicks")
                .select("event_id", "user_id", "n_clicks")
                .orderBy("event_id"))
    q["range_join_events"] = range_join_events

    # ---- sorts / limits / top-k (ops 30, 32) ----
    def topk_orders(spark, sf):
        _tune(spark)
        o = _t(spark, sf, "orders")
        return (o.select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
                 .orderBy(F.desc("price"), "o_orderkey").limit(10))
    q["topk_orders"] = topk_orders

    # ---- set ops (ops 33, 34 — union/except/intersect, one op-tagged
    # surface; r3's separate union_distinct merged in for the 50-query
    # window budget, its union-distinct oracle signal kept) ----
    def setop_orders(spark, sf):
        _tune(spark)
        o = _t(spark, sf, "orders")
        a = o.where(F.col("o_totalprice") > 100000).select("o_orderkey")
        bf = o.where(F.col("o_orderstatus") == "F").select("o_orderkey")
        bo = o.where(F.col("o_orderstatus") == "O").select("o_orderkey")
        ex = (a.exceptAll(bf).distinct()
              .select(F.lit("except").alias("op"), "o_orderkey"))
        it = (a.intersect(bo)
              .select(F.lit("intersect").alias("op"), "o_orderkey"))
        un = (a.union(bf).distinct()
              .select(F.lit("union").alias("op"), "o_orderkey"))
        return ex.unionByName(it).unionByName(un).orderBy("op", "o_orderkey")
    q["setop_orders"] = setop_orders

    # ---- date/time (op 40) ----
    def date_trunc_agg(spark, sf):
        _tune(spark)
        ev = _t(spark, sf, "events")
        return (ev.groupBy(F.date_format(F.date_trunc("hour", "ts"),
                                         "yyyy-MM-dd HH").alias("hour"))
                  .agg(F.count(F.lit(1)).alias("n"),
                       _dr(F.avg("value"), 4).alias("avg_value"))
                  .orderBy("hour"))
    q["date_trunc_agg"] = date_trunc_agg

    # ---- skew ops (op 41): salted two-phase agg == plain agg ----
    def salted_agg(spark, sf):
        _tune(spark)
        from topo2osm_spark.operators.skew import add_salt
        li = _t(spark, sf, "lineitem")
        salted = add_salt(li, ["l_orderkey", "l_linenumber"], buckets=16)
        partial = (salted.groupBy("l_returnflag", "salt")
                   .agg(F.sum("l_quantity").alias("pq"),
                        F.count(F.lit(1)).alias("pn")))
        return (partial.groupBy("l_returnflag")
                .agg(_dr(F.sum("pq"), 2).alias("sum_qty"),
                     F.sum("pn").alias("n"))
                .orderBy("l_returnflag"))
    q["salted_agg"] = salted_agg

    def sessionize(spark, sf):  # ops 28/29 composition: gap sessionization
        _tune(spark)
        from pyspark.sql import Window as W
        ev = _t(spark, sf, "events").where(F.col("user_id") < 100)
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        sess = (ev.withColumn("new_sess",
                              F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
                  .withColumn("session_id",
                              F.sum("new_sess").over(
                                  w.rowsBetween(W.unboundedPreceding, 0))))
        return (sess.groupBy("user_id", "session_id")
                .agg(F.count(F.lit(1)).alias("n_events"))
                .orderBy("user_id", "session_id"))
    q["sessionize"] = sessionize

    # ---- text analysis suite ----
    def token_stats(spark, sf):
        _tune(spark)
        from topo2osm_spark.functions import text as tx
        d = _t(spark, sf, "documents")
        return d.select(
            "doc_id",
            tx.token_count_ws(F.col("text")).alias("n_ws"),
            tx.token_count_bpeish(F.col("text")).alias("n_bpe"),
        ).orderBy("doc_id")
    q["token_stats"] = token_stats

    def quality_scores(spark, sf):
        _tune(spark)
        from topo2osm_spark.functions import text as tx
        d = _t(spark, sf, "documents")
        return d.select(
            "doc_id",
            tx.punct_ratio(F.col("text")).alias("punct_ratio"),
            tx.short_token_ratio(F.col("text")).alias("short_ratio"),
            tx.quality_score(F.col("text")).alias("quality"),
        ).orderBy("doc_id")
    q["quality_scores"] = quality_scores

    def lang_id(spark, sf):
        _tune(spark)
        from topo2osm_spark.functions import text as tx
        d = _t(spark, sf, "documents")
        return d.select(
            "doc_id",
            tx.vowel_ratio(F.col("text")).alias("vowel_ratio"),
            tx.lang_guess(F.col("text")).alias("lang_guess"),
        ).orderBy("doc_id")
    q["lang_id"] = lang_id

    def doc_fingerprint(spark, sf):
        _tune(spark)
        from topo2osm_spark.functions import text as tx
        d = _t(spark, sf, "documents")
        return d.select("doc_id",
                        tx.fingerprint_md5(F.col("text")).alias("fp")).orderBy("doc_id")
    q["doc_fingerprint"] = doc_fingerprint

    # ---- dedup suite ----
    def dedup_exact(spark, sf):
        _tune(spark)
        from topo2osm_spark.operators.dedup import exact_dup_groups
        d = _t(spark, sf, "documents")
        return exact_dup_groups(d).orderBy("fp")
    q["dedup_exact"] = dedup_exact

    def dedup_token_jaccard(spark, sf):
        _tune(spark)
        from topo2osm_spark.operators.dedup import token_jaccard_pairs
        d = _t(spark, sf, "documents")
        return (token_jaccard_pairs(d, cohort_col="source", threshold=0.8)
                .orderBy("a", "b"))
    q["dedup_token_jaccard"] = dedup_token_jaccard

    def dedup_embedding_cosine(spark, sf):
        # cohort-exhaustive variant (exact; the oracle surface). The
        # production default `embedding_cosine_pairs` now verifies only
        # LSH candidate pairs — sub-quadratic on hot cohorts
        # (tests/test_dedup_similarity.py skew test).
        _tune(spark)
        from topo2osm_spark.operators.dedup import \
            embedding_cosine_pairs_exhaustive
        e = _t(spark, sf, "embeddings")
        return (embedding_cosine_pairs_exhaustive(e, threshold=0.35)
                .select("a", "b").orderBy("a", "b"))
    q["dedup_embedding_cosine"] = dedup_embedding_cosine

    # NOTE (r3): the rows-only twins dedup_minhash_lsh / dedup_simhash /
    # ann_topk_lsh were dropped from the REGISTRY (not the library —
    # the xxhash64 production paths keep their pytest coverage in
    # tests/test_dedup_similarity.py): their semantics are already
    # oracle-proven bit-for-bit by the md5-mirror variants below, and
    # the driver evaluates only the first 50 registered queries
    # (CORRECTNESS_r02 dropped the geometry tail registered at 51-54).

    def dedup_minhash_md5(spark, sf):
        # oracle-mirrorable variant: seeded 60-bit md5 hashes + string
        # band keys — DuckDB reproduces the ENTIRE minhash+LSH pipeline
        # bit-for-bit (production path keeps xxhash64).
        _tune(spark)
        from topo2osm_spark.operators.dedup import minhash_lsh_dedup
        d = _t(spark, sf, "documents")
        return (minhash_lsh_dedup(d, threshold=0.5, n_hashes=16,
                                  mirrorable=True)
                .select("a", "b", "est_jaccard").orderBy("a", "b"))
    q["dedup_minhash_md5"] = dedup_minhash_md5

    def dedup_simhash_md5(spark, sf):
        # oracle-mirrorable variant: 60-bit md5 token hashes, 6 bands
        # x 10 bits — DuckDB reproduces fingerprints, banding and
        # hamming exactly.
        _tune(spark)
        from topo2osm_spark.operators.dedup import simhash_pairs
        d = _t(spark, sf, "documents")
        return (simhash_pairs(d, max_hamming=12, n_bands=6, n_bits=60,
                              mirrorable=True)
                .select("a", "b", F.col("hamming").cast("int").alias("hamming"))
                .orderBy("a", "b"))
    q["dedup_simhash_md5"] = dedup_simhash_md5

    # ---- similarity search ----
    _QUERY_VEC = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]

    def ann_topk_bruteforce(spark, sf):
        _tune(spark)
        from topo2osm_spark.operators.similarity import brute_force_topk
        e = _t(spark, sf, "embeddings")
        return brute_force_topk(e, _QUERY_VEC, k=10)
    q["ann_topk_bruteforce"] = ann_topk_bruteforce

    def ann_topk_ivf(spark, sf):  # full oracle: deterministic centroids
        _tune(spark)
        from topo2osm_spark.operators.similarity import ivf_topk
        e = _t(spark, sf, "embeddings")
        return ivf_topk(e, _QUERY_VEC, k=10)
    q["ann_topk_ivf"] = ann_topk_ivf

    # ---- multimodal plumbing (rows-only; REAL numpy PPM decode over
    # deterministic ref-derived payloads) ----
    def media_decode(spark, sf):
        # MERGED surface (r5, the r4 merge pattern): decode-metadata
        # rows (surface='decode') and frame-sample rows
        # (surface='frame') union into one registry slot — both
        # rows-only signals kept, one slot freed for the new hash
        # oracles (VERDICT r4 tasks #5/#10).
        _tune(spark)
        from topo2osm_spark.operators.media import (decode_media,
                                                    frame_sample,
                                                    with_synth_payload)
        geo = _geo_outputs(spark, sf)
        media = (geo["spans"].where(F.col("kind") == "media")
                 .select("doc_id", "media_ref"))
        d = decode_media(with_synth_payload(media))
        dec = d.select(
            F.lit("decode").alias("surface"), "doc_id", "media_ref",
            F.col("meta.width").cast("long").alias("k"),
            F.concat_ws(":", F.col("meta.codec"),
                        F.size("features").cast("string")).alias("detail"))
        fr = (frame_sample(decode_media(media), every_n=64)
              .select(F.lit("frame").alias("surface"), "doc_id", "media_ref",
                      F.col("frame_idx").cast("long").alias("k"),
                      F.hex("frame_sig").alias("detail")))
        return dec.unionByName(fr)
    q["media_decode"] = media_decode

    def stream_dedup_state(spark, sf):
        # custom STATEFUL streaming op (applyInPandasWithState):
        # first-seen-wins exact dedup with per-fingerprint state across
        # micro-batches. Rows-only by design (streaming, no SQL
        # equivalent). Driven to completion against the static table
        # (memory sink + processAllAvailable).
        _tune(spark)
        import tempfile
        from topo2osm_spark.streaming.stream import stream_dedup_exact
        schema = spark.read.parquet(f"{sf}/documents.parquet").schema
        # documents.parquet is a single FILE; FileStreamSource wants a
        # directory -> stream the sf dir with a glob filter.
        stream = (spark.readStream.schema(schema)
                  .option("pathGlobFilter", "documents.parquet")
                  .parquet(sf))
        name = "q_stream_dedup_state"
        qh = (stream_dedup_exact(stream)
              .writeStream.format("memory").queryName(name)
              .option("checkpointLocation",
                      tempfile.mkdtemp(prefix="sds_ck_"))
              .outputMode("append").start())
        qh.processAllAvailable()
        qh.stop()
        return (spark.table(name)
                .select("fingerprint", "doc_id", "first_seen")
                .orderBy("fingerprint"))
    q["stream_dedup_state"] = stream_dedup_state

    # ---- geometry suite (rows-only: non-SQL-expressible) ----
    def sosi_parse_objects(spark, sf):
        out = _geo_outputs(spark, sf)
        return out["objects"].select("doc_id", "span_idx", "obj_kind",
                                     "obj_id", "objtype")
    q["sosi_parse_objects"] = sosi_parse_objects

    def node_dedup(spark, sf):
        out = _geo_outputs(spark, sf)
        return out["nodes"]
    q["node_dedup"] = node_dedup

    def ring_assembly(spark, sf):
        out = _geo_outputs(spark, sf)
        return out["rings"].select("doc_id", "span_idx", "flate_id",
                                   "ring_idx", "is_hole", "closed",
                                   F.round("area", 10).alias("area"))
    q["ring_assembly"] = ring_assembly

    def tagged_features(spark, sf):
        # MERGED surface (r5): the op-15 tagged-way output and the op-9
        # tagged-point output (PUNKT Høydepunkt -> natural=peak, TEKST
        # Høydetall -> ele=<STRENG>) union into one registry slot with
        # aligned columns. Tags serialize to the key-sorted "k=v;k=v"
        # scalar (driver canonicalizer hashes values — maps/arrays are
        # not hashable). Frees one slot for the new hash oracles.
        out = _geo_outputs(spark, sf)

        def kv(col="tags"):
            return F.array_join(
                F.transform(F.array_sort(F.map_entries(col)),
                            lambda e: F.concat_ws("=", e["key"], e["value"])),
                ";").alias("tags_kv")

        ways = out["ways"].select(
            F.lit("way").alias("feature_kind"), "doc_id",
            F.col("way_id").alias("feature_id"), "objtype", kv(),
            F.col("n_nodes").cast("long").alias("k"),
            F.col("closed").cast("string").alias("detail"))
        pts = out["points"].select(
            F.lit("point").alias("feature_kind"), "doc_id",
            F.col("node_id").alias("feature_id"), "objtype", kv(),
            F.col("obj_id").cast("long").alias("k"),
            F.concat_ws(",", F.round("lat", 7).cast("string"),
                        F.round("lon", 7).cast("string")).alias("detail"))
        return ways.unionByName(pts)
    q["tagged_features"] = tagged_features

    def multipolygon_relations(spark, sf):
        # members array<struct> serialized to canonical JSON (order is
        # ring order, already deterministic) — scalar columns only.
        r = _geo_outputs(spark, sf)["relations"]
        return r.select(
            "rel_id", "doc_id", "span_idx", "flate_id",
            F.to_json("members").alias("members_json"),
            F.array_join(
                F.transform(F.array_sort(F.map_entries("tags")),
                            lambda e: F.concat_ws("=", e["key"], e["value"])),
                ";").alias("tags_kv"),
            "rel_type")
    q["multipolygon_relations"] = multipolygon_relations

    def pip_membership(spark, sf):
        out = _geo_outputs(spark, sf)
        return out["membership"]
    q["pip_membership"] = pip_membership

    def island_hierarchy(spark, sf):
        out = _geo_outputs(spark, sf)
        return out["islands"]
    q["island_hierarchy"] = island_hierarchy

    def tile_join(spark, sf):
        out = _geo_outputs(spark, sf)
        return out["tile_assignments"]
    q["tile_join"] = tile_join

    def span_echo(spark, sf):
        # span-sequence invariant surface serialized to JSON (array of
        # structs is unhashable for the driver canonicalizer); the JSON
        # preserves (offset, kind, text, media_ref) order exactly.
        out = _geo_outputs(spark, sf)
        return out["echo"].select(
            "doc_id", F.to_json("spans_sorted").alias("spans_json"))
    q["span_echo"] = span_echo

    def span_sort_sig(spark, sf):
        # SQL-mirrorable surface for op 31 (span-order sort): spans are
        # synthesized from the driver's flat documents table (token i
        # gets a pseudo-random md5-derived offset), sorted by offset
        # with array_sort, then reduced to an order-sensitive md5
        # signature. DuckDB reproduces the expected sequence with
        # string_agg(... ORDER BY offset) — an independent ordering
        # implementation — so a hash match proves the sort semantics.
        _tune(spark)
        from topo2osm_spark.operators.dedup import md5h
        d = _t(spark, sf, "documents")
        toks = F.slice(F.split(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "),
            1, 24)
        spans = F.transform(toks, lambda w, i: F.struct(
            md5h(F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                          i.cast("string"))).alias("offset"),
            w.alias("tok")))
        ordered = F.array_sort(spans)
        return d.select(
            "doc_id",
            F.md5(F.concat_ws("\x1e", F.transform(
                ordered, lambda s: s["tok"]))).alias("sig")).orderBy("doc_id")
    q["span_sort_sig"] = span_sort_sig

    def integrity_issues(spark, sf):
        out = _geo_outputs(spark, sf)
        return out["integrity"]
    q["integrity_issues"] = integrity_issues

    # ---- geometry-math oracle analogs (NEW r4): the pipeline-output
    # geometry queries above are rows-only because DuckDB cannot parse
    # SOSI; these three re-derive the same KERNEL MATH (quantize+dedup,
    # shoelace orientation, even-odd ray cast) from the driver's
    # documents table with integer-exact arithmetic, so the driver's
    # value-hash compares Spark vs DuckDB bit-for-bit. Each is pinned
    # to the production kernel by a pytest equivalence test
    # (tests/test_geo_sig_oracles.py). ----
    def node_snap_sig(spark, sf):
        # ops 12/13 math: quantize coords to a grid, group, keep the
        # MIN content-addressed id as the canonical node (exactly the
        # operators/nodes.py dedup contract, on md5-derived int coords).
        _tune(spark)
        from topo2osm_spark.operators.dedup import md5h
        d = _t(spark, sf, "documents").select("doc_id")
        pts = d.select(
            F.col("doc_id"),
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"))
        pid = F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                       F.col("i").cast("string"))
        pts = pts.select(
            md5h(pid).alias("pt_id"),
            F.pmod(md5h(pid, 1), F.lit(200)).alias("qlat"),
            F.pmod(md5h(pid, 2), F.lit(200)).alias("qlon"))
        return (pts.groupBy("qlat", "qlon")
                   .agg(F.min("pt_id").alias("node_id"),
                        F.count(F.lit(1)).alias("n_refs"))
                   .orderBy("qlat", "qlon"))
    q["node_snap_sig"] = node_snap_sig

    def ring_shoelace_sig(spark, sf):
        # ops 21/22 math: shoelace signed area + CCW orientation over a
        # 6-vertex integer ring per document (the assembly.py
        # orientation-normalize kernel, integer-exact: 2A stays BIGINT).
        _tune(spark)
        from topo2osm_spark.operators.dedup import md5h
        d = _t(spark, sf, "documents").select("doc_id")
        e = d.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(5))).alias("k"))

        def coord(axis, idx):
            s = F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                         idx.cast("string"), F.lit(":" + axis))
            return F.pmod(md5h(s), F.lit(1000))

        nxt = F.pmod(F.col("k") + 1, F.lit(6))
        term = (coord("x", F.col("k")) * coord("y", nxt)
                - coord("x", nxt) * coord("y", F.col("k")))
        return (e.select("doc_id", term.alias("term"))
                 .groupBy("doc_id")
                 .agg(F.sum("term").alias("area2"))
                 .select("doc_id", "area2", (F.col("area2") > 0).alias("ccw"))
                 .orderBy("doc_id"))
    q["ring_shoelace_sig"] = ring_shoelace_sig

    def pip_raycast_sig(spark, sf):
        # op 14 math: even-odd ray cast of md5-derived integer points
        # against the fixed concave comb polygon _PIP_POLY — the
        # operators/pip.py refine kernel's crossing rule, cross-
        # multiplied so every comparison stays in BIGINT (no division,
        # no float: bit-identical in any engine).
        _tune(spark)
        from topo2osm_spark.operators.dedup import md5h
        d = _t(spark, sf, "documents").select("doc_id")
        pts = d.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("pt_idx"))
        s = F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                     F.col("pt_idx").cast("string"))
        px = F.pmod(md5h(s, 11), F.lit(121)) - F.lit(10)
        py = F.pmod(md5h(s, 12), F.lit(121)) - F.lit(10)
        pts = pts.select("doc_id", "pt_idx", px.alias("px"), py.alias("py"))
        n_cross = F.lit(0)
        for (x1, y1), (x2, y2) in zip(_PIP_POLY,
                                      _PIP_POLY[1:] + _PIP_POLY[:1]):
            straddles = ((F.lit(y1) > F.col("py"))
                         != (F.lit(y2) > F.col("py")))
            # px < x1 + (x2-x1)(py-y1)/(y2-y1), cross-multiplied by
            # (y2-y1) with the sign flip folded into the literal
            cross = ((F.col("px") - F.lit(x1)) * F.lit(y2 - y1)
                     - F.lit(x2 - x1) * (F.col("py") - F.lit(y1)))
            hit = straddles & ((cross * F.lit(1 if y2 > y1 else -1))
                               < F.lit(0))
            n_cross = n_cross + F.when(hit, 1).otherwise(0)
        return (pts.select("doc_id", "pt_idx", "px", "py",
                           n_cross.alias("n_cross"),
                           (F.pmod(n_cross, F.lit(2)) == 1).alias("inside"))
                   .orderBy("doc_id", "pt_idx"))
    q["pip_raycast_sig"] = pip_raycast_sig

    def integrity_sig(spark, sf):
        # op 18 math (NEW r5): the orphan-ref / unused-curve detection
        # is a pair of anti-joins (operators/assembly.integrity_report);
        # this analog re-derives per-document curve-id and ref-id sets
        # from md5 hashes and runs the SAME anti-join kernel, so the
        # driver hash-checks the join semantics bit-for-bit vs DuckDB's
        # NOT EXISTS. distinct() on both sides: md5-derived ids may
        # collide within a document, and set semantics keep the two
        # engines' duplicate handling identical.
        _tune(spark)
        from topo2osm_spark.operators.dedup import md5h
        d = _t(spark, sf, "documents").select("doc_id")
        curves = (d.select(
            "doc_id", F.explode(F.sequence(F.lit(0), F.lit(5))).alias("i"))
            .select("doc_id", F.pmod(md5h(F.concat(
                F.col("doc_id").cast("string"), F.lit(":"),
                F.col("i").cast("string"), F.lit(":c"))),
                F.lit(40)).alias("curve_id"))
            .distinct())
        refs = (d.select(
            "doc_id", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("j"))
            .select("doc_id", F.pmod(md5h(F.concat(
                F.col("doc_id").cast("string"), F.lit(":"),
                F.col("j").cast("string"), F.lit(":r"))),
                F.lit(50)).alias("curve_id"))
            .distinct())
        orphans = (refs.join(curves, ["doc_id", "curve_id"], "left_anti")
                   .select(F.lit("orphan_ref").alias("issue"),
                           "doc_id", "curve_id"))
        unused = (curves.join(refs, ["doc_id", "curve_id"], "left_anti")
                  .select(F.lit("unused_curve").alias("issue"),
                          "doc_id", "curve_id"))
        return (orphans.unionByName(unused)
                .orderBy("issue", "doc_id", "curve_id"))
    q["integrity_sig"] = integrity_sig

    def tile_parent_sig(spark, sf):
        # ops 16/17 math (NEW r5): the cell codec's Morton interleave
        # (the 5 magic-mask spreading rounds of functions/cells.py) and
        # the ancestor shift of operators/tiles.py, re-run on
        # md5-derived (ix, iy) — pure BIGINT bit ops, reproducible in
        # DuckDB verbatim, pinned to the numpy codec by
        # tests/test_geo_sig_oracles.py. (res, parent_res) pairs are
        # literals so shift amounts stay literal in both engines.
        _tune(spark)
        from topo2osm_spark.operators.dedup import md5h
        d = _t(spark, sf, "documents").select("doc_id")
        pairs = [(0, 9, 7), (1, 10, 5), (2, 11, 8), (3, 12, 3)]
        rows = d.select("doc_id", F.explode(F.array(*[
            F.struct(F.lit(k).alias("k"), F.lit(r).alias("res"),
                     F.lit(p).alias("pres")) for k, r, p in pairs])).alias("c"))
        rows = rows.select("doc_id", "c.k", "c.res", "c.pres")
        s = F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                     F.col("k").cast("string"))

        def spread(v):
            # part1by1 Morton spread, same magic masks as cells.py
            for sh, mask in ((16, 0x0000FFFF0000FFFF),
                             (8, 0x00FF00FF00FF00FF),
                             (4, 0x0F0F0F0F0F0F0F0F),
                             (2, 0x3333333333333333),
                             (1, 0x5555555555555555)):
                v = v.bitwiseOR(F.shiftleft(v, sh)).bitwiseAND(F.lit(mask))
            return v

        # ix/iy bounded by the per-k resolution (literal modulus)
        mod = {9: 512, 10: 1024, 11: 2048, 12: 4096}
        ix = F.pmod(md5h(s, 21), F.element_at(
            F.create_map(*[F.lit(x) for kv in mod.items() for x in kv]),
            F.col("res")))
        iy = F.pmod(md5h(s, 22), F.element_at(
            F.create_map(*[F.lit(x) for kv in mod.items() for x in kv]),
            F.col("res")))
        rows = rows.select("doc_id", "k", "res", "pres",
                           ix.alias("ix"), iy.alias("iy"))
        rows = rows.withColumn("morton", spread(F.col("ix")).bitwiseOR(
            F.shiftleft(spread(F.col("iy")), 1)))
        cell = F.shiftleft(F.col("res").cast("long"), 58).bitwiseOR(
            F.col("morton"))
        # numBits is per-row (res - pres) -> SQL form of the shift
        parent = F.shiftleft(F.col("pres").cast("long"), 58).bitwiseOR(
            F.expr("shiftrightunsigned(morton, 2 * (res - pres))"))
        return (rows.select("doc_id", "k", "ix", "iy",
                            cell.alias("cell"),
                            parent.alias("parent_cell"))
                .orderBy("doc_id", "k"))
    q["tile_parent_sig"] = tile_parent_sig

    # ---- registration order: the driver evaluates the FIRST 50 ----
    # CORRECTNESS_r02 recorded exactly the first 50 registered queries
    # and silently dropped positions 51-54 (the geometry-contract
    # tail). The registry is therefore (a) trimmed to EXACTLY 50 and
    # (b) explicitly ordered with the geometry/pipeline contract
    # queries FIRST, so no §2-operator row can fall out of the window
    # even if it shrinks. The order below is the evaluation order.
    order = [
        # geometry / conversion contract (SURVEY.md §2 core ops)
        "sosi_parse_objects", "node_dedup", "ring_assembly",
        "tagged_features", "multipolygon_relations",
        "pip_membership", "island_hierarchy", "tile_join",
        "span_echo", "span_sort_sig", "integrity_issues",
        # geometry-kernel md5-oracle analogs (hash-checked math)
        "node_snap_sig", "ring_shoelace_sig", "pip_raycast_sig",
        "integrity_sig", "tile_parent_sig",
        # relational / scalar oracle suite
        "scan_filter_project", "string_funcs", "math_funcs",
        "array_funcs", "json_funcs", "agg_tpch_q1", "count_by_type",
        "grouping_counts", "collect_sorted_list", "broadcast_join_dims",
        "equi_join_agg", "semi_join", "anti_join", "window_funcs",
        "asof_join_events",
        "range_join_events", "topk_orders",
        "setop_orders", "date_trunc_agg", "salted_agg", "sessionize",
        # text analysis
        "token_stats", "quality_scores", "lang_id", "doc_fingerprint",
        # dedup / similarity / multimodal / streaming
        "dedup_exact", "dedup_token_jaccard", "dedup_embedding_cosine",
        "dedup_minhash_md5", "dedup_simhash_md5", "ann_topk_bruteforce",
        "ann_topk_ivf", "media_decode",
        "stream_dedup_state",
    ]
    assert len(order) == 50 and set(order) == set(q), (
        len(order), sorted(set(q) ^ set(order)))
    return {name: q[name] for name in order}


# ---------------------------------------------------------------- oracles

def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["scan_filter_project"] = """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem WHERE l_quantity > 45
        ORDER BY l_orderkey, l_linenumber"""

    sql["string_funcs"] = r"""
        SELECT doc_id,
               upper(substring(text, 1, 10)) AS head10,
               length(text) AS n,
               CAST(regexp_extract(source, 'src(\d+)', 1) AS INT) AS src_num
        FROM documents ORDER BY doc_id"""

    sql["math_funcs"] = """
        SELECT l_orderkey, l_linenumber,
               round(sqrt(l_extendedprice), 4) AS sq,
               round(atan2(l_quantity, 10.0), 6) AS ang,
               l_partkey % 7 AS m7
        FROM lineitem WHERE l_orderkey % 100 = 0
        ORDER BY l_orderkey, l_linenumber"""

    sql["array_funcs"] = """
        SELECT vec_id,
               len(embedding) AS dim,
               round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS vsum,
               round(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 4) AS head_sum
        FROM embeddings ORDER BY vec_id"""

    sql["json_funcs"] = """
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) > 90
        ORDER BY event_id"""

    sql["agg_tpch_q1"] = """
        SELECT l_returnflag, l_linestatus,
               floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
               floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_base,
               floor(avg(l_discount) * 10000 + 0.5) / 10000 AS avg_disc,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""

    sql["count_by_type"] = """
        SELECT event_type, count(*) AS n,
               count(DISTINCT user_id) AS n_users,
               floor(sum(value) * 100 + 0.5) / 100 AS sum_value
        FROM events GROUP BY event_type ORDER BY event_type"""

    sql["grouping_counts"] = """
        SELECT 'rollup' AS gset, o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        UNION ALL
        SELECT 'cube' AS gset, o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY gset, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""

    sql["collect_sorted_list"] = """
        SELECT l_orderkey,
               string_agg(CAST(l_linenumber AS VARCHAR), ','
                          ORDER BY l_linenumber) AS lines
        FROM lineitem WHERE l_orderkey < 200
        GROUP BY l_orderkey ORDER BY l_orderkey"""

    sql["broadcast_join_dims"] = """
        SELECT r_name, n_name, count(*) AS n_cust,
               floor(sum(c_acctbal) * 100 + 0.5) / 100 AS sum_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name"""

    sql["equi_join_agg"] = """
        SELECT o_orderpriority, floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
               count(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""

    sql["semi_join"] = """
        SELECT o_orderkey, o_orderstatus FROM orders
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
        ORDER BY o_orderkey"""

    sql["anti_join"] = """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        ORDER BY c_custkey"""

    sql["window_funcs"] = """
        SELECT user_id, event_id,
               row_number() OVER w AS rn,
               floor(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100 AS running,
               coalesce(lag(event_id) OVER w, -1) AS prev_id
        FROM events WHERE user_id < 20
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, rn"""

    sql["asof_join_events"] = """
        WITH ev AS (SELECT * FROM events WHERE user_id < 40),
        clicks AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click'),
        errors AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'error')
        SELECT c.event_id, c.user_id,
               e.event_id AS err_event_id,
               epoch_us(e.ts) AS err_ts_us
        FROM clicks c ASOF LEFT JOIN errors e
          ON c.user_id = e.user_id AND c.ts >= e.ts
        ORDER BY c.event_id"""

    sql["range_join_events"] = """
        WITH ev AS (SELECT * FROM events WHERE user_id < 40),
        errors AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'error'),
        clicks AS (SELECT user_id, ts FROM ev WHERE event_type = 'click')
        SELECT e.event_id, e.user_id,
               CAST(count(c.user_id) AS BIGINT) AS n_clicks
        FROM errors e LEFT JOIN clicks c
          ON e.user_id = c.user_id
         AND epoch_us(c.ts) >= epoch_us(e.ts)
         AND epoch_us(c.ts) < epoch_us(e.ts) + 600000000
        GROUP BY e.event_id, e.user_id
        ORDER BY e.event_id"""

    sql["topk_orders"] = """
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders ORDER BY price DESC, o_orderkey LIMIT 10"""

    sql["setop_orders"] = """
        SELECT 'except' AS op, o_orderkey FROM (
            SELECT DISTINCT o_orderkey FROM orders WHERE o_totalprice > 100000
            EXCEPT
            SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        UNION ALL
        SELECT 'intersect' AS op, o_orderkey FROM (
            SELECT o_orderkey FROM orders WHERE o_totalprice > 100000
            INTERSECT
            SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O')
        UNION ALL
        SELECT 'union' AS op, o_orderkey FROM (
            SELECT DISTINCT o_orderkey FROM (
                SELECT o_orderkey FROM orders WHERE o_totalprice > 100000
                UNION ALL
                SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'))
        ORDER BY op, o_orderkey"""

    sql["date_trunc_agg"] = """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
               count(*) AS n, floor(avg(value) * 10000 + 0.5) / 10000 AS avg_value
        FROM events GROUP BY 1 ORDER BY hour"""

    sql["salted_agg"] = """
        SELECT l_returnflag, floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

    sql["sessionize"] = """
        WITH g AS (
          SELECT user_id, event_id, ts,
                 epoch(ts) - epoch(lag(ts) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
          FROM events WHERE user_id < 100),
        s AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END AS new_sess
          FROM g),
        sid AS (
          SELECT user_id, event_id,
                 CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                     AS session_id
          FROM s)
        SELECT user_id, session_id, count(*) AS n_events
        FROM sid GROUP BY user_id, session_id
        ORDER BY user_id, session_id"""

    sql["token_stats"] = r"""
        SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_ws,
               len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe
        FROM documents ORDER BY doc_id"""

    sql["quality_scores"] = r"""
        WITH t AS (
          SELECT doc_id, text,
                 floor(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
                       * 1.0 / greatest(length(text), 1) * 10000 + 0.5) / 10000 AS punct_ratio,
                 floor(len(list_filter(string_split_regex(trim(text), '\s+'),
                                       t -> length(t) <= 3))
                       * 1.0 / greatest(len(string_split_regex(trim(text), '\s+')), 1)
                       * 10000 + 0.5) / 10000 AS short_ratio
          FROM documents)
        SELECT doc_id, punct_ratio, short_ratio,
               floor((CASE WHEN length(text) BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.5 END)
                     * (1.0 - punct_ratio) * (1.0 - 0.5 * short_ratio) * 10000 + 0.5) / 10000 AS quality
        FROM t ORDER BY doc_id"""

    sql["lang_id"] = """
        WITH t AS (
          SELECT doc_id,
                 floor(length(regexp_replace(lower(text), '[^aeiouy]', '', 'g')) * 1.0
                       / greatest(length(regexp_replace(lower(text), '[^a-z]', '', 'g')), 1)
                       * 10000 + 0.5) / 10000 AS vowel_ratio
          FROM documents)
        SELECT doc_id, vowel_ratio,
               CASE WHEN vowel_ratio >= 0.45 THEN 'vowel-heavy'
                    WHEN vowel_ratio >= 0.30 THEN 'latin-balanced'
                    ELSE 'consonant-heavy' END AS lang_guess
        FROM t ORDER BY doc_id"""

    sql["doc_fingerprint"] = r"""
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        FROM documents ORDER BY doc_id"""

    sql["dedup_exact"] = r"""
        SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
               count(*) AS n_dups, min(doc_id) AS keep_id
        FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY fp"""

    sql["dedup_token_jaccard"] = r"""
        WITH tok_all AS (
          SELECT doc_id, source, unnest(list_distinct(
                 string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))) AS w
          FROM documents),
        dfc AS (SELECT source, w FROM tok_all GROUP BY source, w
                HAVING count(*) <= 1000),
        tok AS (SELECT tok_all.* FROM tok_all
                JOIN dfc ON tok_all.source = dfc.source AND tok_all.w = dfc.w),
        sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        inter AS (
          SELECT ta.doc_id AS a, tb.doc_id AS b, count(*) AS i
          FROM tok ta JOIN tok tb ON ta.w = tb.w AND ta.source = tb.source
                      AND ta.doc_id < tb.doc_id
          GROUP BY 1, 2)
        SELECT a, b, floor(i * 1.0 / (sa.n + sb.n - i) * 10000 + 0.5) / 10000 AS jaccard
        FROM inter
        JOIN sizes sa ON inter.a = sa.doc_id
        JOIN sizes sb ON inter.b = sb.doc_id
        WHERE floor(i * 1.0 / (sa.n + sb.n - i) * 10000 + 0.5) / 10000 >= 0.8
        ORDER BY a, b"""

    # dedup_minhash_md5: DuckDB mirrors the ENTIRE minhash+LSH pipeline
    # (seeded 60-bit md5 hashes, 16 hashes, 4 bands x 4 rows, threshold
    # 0.5) bit-for-bit. The aggregate/CASE expansions are generated.
    _sig_cols = ",\n                ".join(
        f"min(('0x' || substr(md5(shingle || ':{i}'), 1, 15))::BIGINT) AS h{i}"
        for i in range(16))
    _band_case = " ".join(
        f"WHEN {b} THEN " + " || ',' || ".join(
            f"h{4 * b + r}::VARCHAR" for r in range(4))
        for b in range(4))
    _agree = " + ".join(f"(sa.h{i} = sb.h{i})::INT" for i in range(16))
    sql["dedup_minhash_md5"] = rf"""
        WITH toks AS (
          SELECT doc_id, string_split(
                   trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
          FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
                   range(0, greatest(len(tk) - 3, 0) + 1),
                   i -> array_to_string(tk[i+1:i+3], ' ')))) AS shingle
          FROM toks),
        shf AS (SELECT doc_id, shingle FROM sh WHERE length(shingle) > 0),
        sig AS (SELECT doc_id,
                {_sig_cols}
                FROM shf GROUP BY doc_id),
        bands AS (
          SELECT doc_id, band, CASE band {_band_case} END AS bkey
          FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b),
        pairs AS (
          SELECT l.doc_id AS a, r.doc_id AS b
          FROM bands l JOIN bands r ON l.band = r.band AND l.bkey = r.bkey
          WHERE l.doc_id < r.doc_id GROUP BY 1, 2)
        SELECT p.a, p.b, round(({_agree}) / 16.0, 4) AS est_jaccard
        FROM pairs p
        JOIN sig sa ON sa.doc_id = p.a
        JOIN sig sb ON sb.doc_id = p.b
        WHERE ({_agree}) / 16.0 >= 0.5
        ORDER BY a, b"""

    # dedup_simhash_md5: DuckDB mirrors fingerprints (60-bit md5 token
    # hash, per-bit majority votes), 6x10-bit banding and hamming.
    _votes = ",\n                ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(60))
    _fp = "\n                + ".join(
        f"(CASE WHEN v{b} > 0 THEN 1::BIGINT ELSE 0::BIGINT END << {b})"
        for b in range(60))
    sql["dedup_simhash_md5"] = rf"""
        WITH t AS (
          SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
          FROM documents),
        tk AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
               FROM t WHERE length(tok) > 0),
        votes AS (SELECT doc_id,
                {_votes}
                FROM tk GROUP BY doc_id),
        fp AS (SELECT doc_id,
                {_fp} AS fp
               FROM votes),
        qb AS (SELECT doc_id, fp, band, (fp >> (10 * band)) & 1023 AS qv
               FROM fp CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5]) AS band) b),
        cand AS (SELECT l.doc_id AS a, r.doc_id AS b, l.fp AS fa, r.fp AS fb
                 FROM qb l JOIN qb r ON l.band = r.band AND l.qv = r.qv
                 WHERE l.doc_id < r.doc_id GROUP BY 1, 2, 3, 4)
        SELECT a, b, bit_count(xor(fa, fb))::INT AS hamming
        FROM cand WHERE bit_count(xor(fa, fb)) <= 12
        ORDER BY a, b"""

    # span_sort_sig: an INDEPENDENT ordering implementation (string_agg
    # ORDER BY) reproduces Spark's array_sort-by-offset sequence.
    sql["span_sort_sig"] = r"""
        WITH t AS (
          SELECT doc_id, string_split(
                   trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')[1:24] AS tk
          FROM documents),
        u AS (
          SELECT doc_id, i, tk[i+1] AS tok,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR),
                                 1, 15))::BIGINT AS off
          FROM t CROSS JOIN (SELECT unnest(range(0, 24)) AS i) ix
          WHERE i < len(tk))
        SELECT doc_id, md5(string_agg(tok, chr(30) ORDER BY off, tok)) AS sig
        FROM u GROUP BY doc_id ORDER BY doc_id"""

    # geometry-kernel md5-oracle analogs: same md5h 60-bit idiom as the
    # dedup oracles; all arithmetic integer-exact (BIGINT on both sides)
    sql["node_snap_sig"] = """
        WITH pts AS (
          SELECT ('0x' || substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR),
                  1, 15))::BIGINT AS pt_id,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR
                  || ':1'), 1, 15))::BIGINT % 200 AS qlat,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR
                  || ':2'), 1, 15))::BIGINT % 200 AS qlon
          FROM documents CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) ix)
        SELECT qlat, qlon, min(pt_id) AS node_id,
               count(*) AS n_refs
        FROM pts GROUP BY qlat, qlon ORDER BY qlat, qlon"""

    sql["ring_shoelace_sig"] = """
        WITH e AS (
          SELECT doc_id, k,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':' || k::VARCHAR
                  || ':x'), 1, 15))::BIGINT % 1000 AS xk,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':' || k::VARCHAR
                  || ':y'), 1, 15))::BIGINT % 1000 AS yk,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':'
                  || ((k + 1) % 6)::VARCHAR || ':x'), 1, 15))::BIGINT
                  % 1000 AS xn,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':'
                  || ((k + 1) % 6)::VARCHAR || ':y'), 1, 15))::BIGINT
                  % 1000 AS yn
          FROM documents CROSS JOIN (SELECT unnest(range(0, 6)) AS k) kk)
        SELECT doc_id, sum(xk * yn - xn * yk)::BIGINT AS area2,
               sum(xk * yn - xn * yk) > 0 AS ccw
        FROM e GROUP BY doc_id ORDER BY doc_id"""

    _edges = list(zip(_PIP_POLY, _PIP_POLY[1:] + _PIP_POLY[:1]))
    _hits = "\n               + ".join(
        f"(CASE WHEN ({y1} > py) != ({y2} > py) AND "
        f"((px - {x1}) * ({y2 - y1}) - ({x2 - x1}) * (py - {y1}))"
        f" * {1 if y2 > y1 else -1} < 0 THEN 1 ELSE 0 END)"
        for (x1, y1), (x2, y2) in _edges)
    sql["pip_raycast_sig"] = f"""
        WITH pts AS (
          SELECT doc_id, i AS pt_idx,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR
                  || ':11'), 1, 15))::BIGINT % 121 - 10 AS px,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR
                  || ':12'), 1, 15))::BIGINT % 121 - 10 AS py
          FROM documents CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) ix)
        SELECT doc_id, pt_idx, px, py,
               ({_hits}) AS n_cross,
               ({_hits}) % 2 = 1 AS inside
        FROM pts ORDER BY doc_id, pt_idx"""

    sql["integrity_sig"] = """
        WITH curves AS (
          SELECT DISTINCT doc_id,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR
                  || ':c'), 1, 15))::BIGINT % 40 AS curve_id
          FROM documents
          CROSS JOIN (SELECT unnest(range(0, 6)) AS i) ix),
        refs AS (
          SELECT DISTINCT doc_id,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':' || j::VARCHAR
                  || ':r'), 1, 15))::BIGINT % 50 AS curve_id
          FROM documents
          CROSS JOIN (SELECT unnest(range(0, 8)) AS j) jx)
        SELECT 'orphan_ref' AS issue, r.doc_id, r.curve_id
        FROM refs r
        WHERE NOT EXISTS (SELECT 1 FROM curves c
                          WHERE c.doc_id = r.doc_id
                            AND c.curve_id = r.curve_id)
        UNION ALL
        SELECT 'unused_curve' AS issue, c.doc_id, c.curve_id
        FROM curves c
        WHERE NOT EXISTS (SELECT 1 FROM refs r
                          WHERE r.doc_id = c.doc_id
                            AND r.curve_id = c.curve_id)
        ORDER BY issue, doc_id, curve_id"""

    # Morton spread (part1by1) as nested BIGINT bit ops — the same 5
    # magic masks as functions/cells.py, expanded textually for DuckDB
    def _duck_spread(v: str) -> str:
        for sh, mask in ((16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
                         (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
                         (1, 0x5555555555555555)):
            v = f"(({v} | ({v} << {sh})) & {mask})"
        return v

    sql["tile_parent_sig"] = f"""
        WITH base AS (
          SELECT doc_id, k, res, pres,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':' || k::VARCHAR
                  || ':21'), 1, 15))::BIGINT % (1 << res) AS ix,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':' || k::VARCHAR
                  || ':22'), 1, 15))::BIGINT % (1 << res) AS iy
          FROM documents
          CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k,
                             unnest([9, 10, 11, 12]) AS res,
                             unnest([7, 5, 8, 3]) AS pres) kk),
        m AS (
          SELECT doc_id, k, res, pres, ix, iy,
                 ({_duck_spread('ix')}
                  | ({_duck_spread('iy')} << 1)) AS morton
          FROM base)
        SELECT doc_id, k, ix, iy,
               ((res::BIGINT << 58) | morton) AS cell,
               ((pres::BIGINT << 58) | (morton >> (2 * (res - pres))))
                 AS parent_cell
        FROM m ORDER BY doc_id, k"""

    sql["dedup_embedding_cosine"] = """
        SELECT a.vec_id AS a, b.vec_id AS b
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE floor(list_cosine_similarity(
                list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                list_transform(b.embedding, x -> CAST(x AS DOUBLE))) * 10000 + 0.5) / 10000 >= 0.35
        ORDER BY a, b"""

    sql["ann_topk_ivf"] = """
        WITH q AS (SELECT [{qv}]::DOUBLE[] AS qvec),
        c AS (SELECT vec_id AS cid,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
              FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
              LIMIT 16),
        assign AS (SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_cosine_similarity(list_transform(e.embedding,
                       x -> CAST(x AS DOUBLE)), c.cvec) DESC, c.cid) AS rn
            FROM embeddings e CROSS JOIN c) WHERE rn = 1),
        probes AS (SELECT c.cid FROM c, q
                   ORDER BY list_cosine_similarity(cvec, qvec) DESC, cid
                   LIMIT 4)
        SELECT e.vec_id,
               floor(list_cosine_similarity(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE)), qvec) * 10000 + 0.5) / 10000 AS cosine
        FROM embeddings e, q
        WHERE e.vec_id IN (SELECT vec_id FROM assign
                           WHERE cid IN (SELECT cid FROM probes))
        ORDER BY cosine DESC, vec_id LIMIT 10""".replace(
        "{qv}", ", ".join(str(((i * 37) % 19 - 9) / 10.0) for i in range(64)))

    sql["ann_topk_bruteforce"] = """
        WITH q AS (SELECT [{qv}]::DOUBLE[] AS qvec)
        SELECT vec_id,
               floor(list_cosine_similarity(
                 list_transform(embedding, x -> CAST(x AS DOUBLE)), qvec) * 10000 + 0.5) / 10000 AS cosine
        FROM embeddings, q
        ORDER BY cosine DESC, vec_id LIMIT 10""".replace(
        "{qv}", ", ".join(str(((i * 37) % 19 - 9) / 10.0) for i in range(64)))

    return sql
