"""Plan-shape regression pins for the headline queries.

EXPLAINS.md documents the plans; these tests FREEZE the properties that
matter at 100 TB so a refactor that silently adds a shuffle, drops a
broadcast, or un-prunes a scan fails CI instead of surviving until a
scale run. Counting is done on the pre-AQE executed plan (stable across
runs; AQE only narrows it at runtime).
"""

from __future__ import annotations

import re

import pytest

from map_reduce_framework_using_python_spark.plans.core import REGISTRY
from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    return REGISTRY[name].fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()


def _exchanges(plan: str) -> int:
    # ReusedExchange re-reads an existing shuffle; don't double-count.
    return len(re.findall(r"(?<!Reused)Exchange ", plan))


def test_q01_single_shuffle_partial_final_agg(spark):
    plan = _plan(spark, "q01_pricing_summary")
    assert _exchanges(plan) == 1, plan  # partial agg → 1 exchange → final agg
    assert plan.count("HashAggregate") >= 2  # map-side combine present


def test_q06_single_shuffle_with_pushdown(spark):
    plan = _plan(spark, "q06_forecast_revenue")
    assert _exchanges(plan) <= 1, plan
    assert "PushedFilters: [" in plan and "IsNotNull" in plan


def test_q05_dims_broadcast_fact_never_hash_joins_wide(spark):
    plan = _plan(spark, "q05_local_supplier")
    # Every dim joins via broadcast; lineitem is never shuffled FOR A JOIN
    # (the only exchanges are aggregation/broadcast ones).
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan


def test_q18_semi_join_shuffles_on_orderkey_only(spark):
    plan = _plan(spark, "q18_large_orders")
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    # No cartesian anywhere in the TPC-H set.
    assert "CartesianProduct" not in plan


def test_topk_per_group_uses_window_group_limit(spark):
    plan = _plan(spark, "q_topk_per_group")
    assert "WindowGroupLimit" in plan, plan  # limit pushed below the sort


def test_global_sort_topn_uses_take_ordered(spark):
    plan = _plan(spark, "q03_global_topn")
    assert "TakeOrderedAndProject" in plan, plan  # never a full global sort


def test_minhash_no_cartesian_no_python(spark):
    plan = _plan(spark, "ns_minhash_lsh_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan  # no row-at-a-time Python


def test_cosine_topk_stays_jvm_side(spark):
    plan = _plan(spark, "ns_cosine_topk")
    assert "BatchEvalPython" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_scans_prune_columns(spark):
    # The pricing summary needs 7 of lineitem's 11 columns; the scan
    # must not read the rest (ReadSchema listing is the proof).
    plan = _plan(spark, "q01_pricing_summary")
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m, plan
    cols = len([c for c in m.group(1).split(",") if c])
    assert cols <= 7, m.group(1)


def test_asof_join_is_one_window_not_pairwise(spark):
    # The as-of join must be the union-tag + window composition — a
    # pairwise join-then-max would show a non-equi join or cartesian.
    plan = _plan(spark, "q_join_asof")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Window [" in plan


def test_session_dynamic_gap_single_session_exchange(spark):
    plan = _plan(spark, "q_session_dynamic_gap")
    assert "CartesianProduct" not in plan
    assert _exchanges(plan) <= 2, plan  # user_id shuffle (+ final agg at most)


def test_range_bigbig_is_equi_join_not_nested_loop(spark):
    # The whole point of the bucket grid: a plain shuffle equi join on
    # the bucket key, never a nested-loop over the range predicate.
    plan = _plan(spark, "q_join_range_bigbig")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    ["q_window_ntile", "q_equidepth_histogram", "ns_seeded_shuffle", "q_funnel_latency",
     "q_window_pct"],
)
def test_no_single_partition_window_anywhere(spark, name):
    plan = _plan(spark, name)
    for ln in plan.splitlines():
        if "Window [" in ln:
            assert "windowspecdefinition(" in ln or "_rk_bucket" in ln, ln
    # The real assertion: no empty window partition spec — every window
    # rides a bucketed composition (_rk_bucket global / _rg_bucket
    # grouped, operators/ranks.py).
    assert (
        "Window [" not in plan or "_rk_bucket" in plan or "_rg_bucket" in plan
    ), plan


@pytest.mark.parametrize(
    "name,part_col",
    [
        ("q_rolling_ewma", "user_id"),
        ("q_window_count_distinct", "user_id"),
        ("q_attribution_last_touch", "user_id"),
        ("q_fuzzy_match", "p_partkey"),
        # r15: the histogram restructure moved the medians onto the
        # grouped weighted cumsum (_cg_bucket, bucketed_cumsum_grouped)
        ("q_mad_outliers", "_cg_bucket"),
    ],
)
def test_analytics_windows_are_partitioned(spark, name, part_col):
    # Every Window in the analytics batch must hash-partition (on the
    # natural key, or on the grouped-rank composite bucket) — never an
    # unpartitioned single-task window.
    plan = _plan(spark, name)
    for ln in plan.splitlines():
        if "Window [" in ln:
            assert part_col in ln, (name, ln)


def test_triangle_closing_join_is_equi(spark):
    # The wedge + closing joins must be hash/sort-merge equi-joins; the
    # only nested-loop joins are the two 1-row stat crossJoins at the
    # top (an OR-of-permutations closing condition would plan the whole
    # wedge×edge product as a nested loop).
    plan = _plan(spark, "q_triangle_count")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_plan_build_launches_no_spark_job(spark):
    """The driver contract says BUILDING a query callable launches no
    job. _spread() used to probe df.rdd.getNumPartitions() (forces
    physical planning = a real cost on every local dedup plan build);
    it now derives the spread decision from the source file count
    (driver-side listing). Pin: constructing every dedup/minhash plan
    submits zero Spark jobs (DAGScheduler job counter unchanged)."""

    def n_jobs() -> int:
        return spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()

    # Prime the file index (spark.read itself may list directories).
    for name in ("ns_dedup_exact", "ns_minhash_lsh_pairs",
                 "ns_ngram_jaccard_pairs", "ns_span_dedup"):
        REGISTRY[name].fn(spark, SF_SMOKE)
    before = n_jobs()
    for name in ("ns_dedup_exact", "ns_minhash_lsh_pairs",
                 "ns_ngram_jaccard_pairs", "ns_span_dedup"):
        REGISTRY[name].fn(spark, SF_SMOKE)
    assert n_jobs() == before


def test_dsir_weights_two_scans_one_broadcast_join(spark):
    """The DSIR plan pays exactly two corpus passes (model build +
    scoring) and lands the 256-row model via broadcast — a third scan
    means the totals regressed to a corpus re-aggregation (the
    Catalyst re-derivation trap, operators/dsir.py)."""
    plan = _plan(spark, "ns_dsir_weights")
    assert plan.count("Scan parquet") == 2, plan
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan


def test_corpus_drift_single_corpus_pass(spark):
    """PSI totals come from windows over the count table — one corpus
    scan, one token explode. Separate groupBy branches re-derive the
    counts once per branch (measured: 4 scans before the rewrite)."""
    plan = _plan(spark, "ns_corpus_drift")
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Generate") == 1


def test_paragraph_dedup_single_corpus_scan(spark):
    """The stats op derives instance frequency from a window over the
    ONE digest exchange — a groupBy+join-back regression would plan the
    scan+split+md5 pipeline twice (ReuseExchange can't fire across
    differing exchange payloads; measured in round 6)."""
    plan = _plan(spark, "ns_paragraph_dedup")
    assert plan.count("Scan parquet") == 1, plan
    assert "BatchEvalPython" not in plan


def test_paragraph_dedup_apply_two_scans_is_the_floor(spark):
    """The apply op pays exactly two corpus passes: the digest instance
    pipeline and the doc_id rebuild join (the output IS rewritten text,
    so one more text pass is the floor). Three scans = the keeper-table
    re-derivation came back."""
    plan = _plan(spark, "ns_paragraph_dedup_apply")
    assert plan.count("Scan parquet") == 2, plan


def test_ccnet_scaled_windows_only_over_histogram(spark):
    """The production CCNet form must never window over a corpus-sized
    table: its Window nodes sit ABOVE the (lang, li6) histogram
    aggregate (bounded by the score grid, not the corpus), partitioned
    by lang — and the threshold table lands via broadcast. NTILE must
    not appear anywhere (that is the parity fixture's operator)."""
    plan = _plan(spark, "ns_ccnet_buckets_scaled")
    assert "ntile" not in plan.lower(), plan
    assert plan.count("BroadcastHashJoin") >= 1
    # every window partitions by lang (no unpartitioned window), and the
    # windowed columns are the histogram's cnt aggregate, not doc rows
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines, plan
    for ln in win_lines:
        assert "lang#" in ln, ln
        assert "cnt#" in ln, ln


def test_epoch_realize_broadcast_plan_no_corpus_shuffle(spark):
    """The realize pass must be: corpus scan → BROADCAST join with the
    ≤|sources|-row plan aggregate → map-side explode. A sort-merge join
    or a corpus-keyed exchange above the stream-side scan means the
    plan aggregate stopped broadcasting."""
    plan = _plan(spark, "ns_epoch_realize")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Exchange hashpartitioning(doc_id" not in plan, plan


def test_epoch_shards_windows_are_bucket_partitioned(spark):
    """The shard packer's global cumsum must stay the bucketed two-pass
    form: every Window hash-partitions on the cumsum bucket — an
    unpartitioned Window is the 100 TB straggler this exists to
    avoid."""
    plan = _plan(spark, "ns_epoch_shards")
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines, plan
    cumsum_wins = [ln for ln in win_lines if "_cs_" in ln]
    assert cumsum_wins, plan
    for ln in cumsum_wins:
        assert "_cs_bucket" in ln, ln
    # the only other windows are the epoch-plan normalizations over the
    # ≤|sources|-row aggregate (documented single-partition-by-design)
    for ln in win_lines:
        if "_cs_" not in ln:
            assert "w9#" in ln or "sum(a#" in ln or "sum(nt#" in ln, ln


def test_paragraph_screen_index_scan_never_shuffles(spark):
    """The ingest screen's persisted-index scan must reach its joins
    purely map-side (broadcast batch ids anti-join + broadcast digest
    set equi-join): no Exchange may partition on the index's digest or
    doc column, and no sort-merge join may appear anywhere."""
    plan = _plan(spark, "ns_paragraph_screen")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
    # the only windows are the batch-side within-batch counts on h
    for ln in plan.splitlines():
        if "Window [" in ln:
            assert "h#" in ln, ln


def test_ivf_probe_batch_single_index_scan_broadcast_probe(spark):
    """The batched IVF probe: ONE scan of the persisted index layout
    equi-joined against the broadcast (q_id, centroid_id) probe table;
    top-k via a q_id-partitioned window (partial WindowGroupLimit
    before the exchange)."""
    plan = _plan(spark, "ns_ivf_probe_batch")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_span_dedup_single_corpus_scan(spark):
    """r7 pipeline review: the prior groupBy+join-back form planned the
    scan+explode+md5 pipeline THREE times; the window-flag form derives
    the dup flag from the ONE digest exchange (ns_paragraph_dedup
    pattern)."""
    plan = _plan(spark, "ns_span_dedup")
    assert plan.count("Scan parquet") == 1, plan
    assert "BatchEvalPython" not in plan


def test_cms_word_freq_builds_lazily(spark):
    """r7 pipeline review: building the CMS query must launch no Spark
    job (the registry lazy-build contract) — the prior form ran the
    whole sketch aggregate at build time through a driver-side JVM
    decode."""
    from map_reduce_framework_using_python_spark.plans.core import REGISTRY

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    jobs_before = spark.sparkContext.uiWebUrl  # touch nothing heavy
    df = REGISTRY["ns_cms_word_freq"].fn(spark, SF_SMOKE)
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before  # no job ran during the build
    out = {r["word"]: r["est_count"] for r in df.collect()}
    assert set(out) == {"data", "table", "row", "spark", "query"}


def test_semantic_decontaminate_map_only_scan(spark):
    """r14 (optimization round): the exact decon scorer is ONE
    vectorized Arrow pass — scan → MapInArrow → grid projection. No
    join of any kind, no exchange at all (the old crossJoin +
    per-vector partial-max exchange are gone), no row-at-a-time
    Python, and the slice predicate still reaches the scan."""
    plan = _plan(spark, "ns_semantic_decontaminate")
    assert "CartesianProduct" not in plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInArrow") == 1, plan
    assert "Exchange" not in plan, plan
    assert "PushedFilters: [IsNotNull(vec_id)]" in plan, plan


def test_training_capstone_corpus_scans_confined_to_cached_subtree(spark):
    """r9: the mixture/realize/pack stages must add ZERO corpus scans —
    every FileScan lives inside a cached subtree (the curated table,
    plus the r14 nested bigram-model/score caches). Asserted
    structurally since r14 (the textual modulo pin relied on
    single-level cache reprinting; see tests/test_pipeline8.py): the
    physical tree outside cache boundaries must contain no file scan
    at all."""
    df = REGISTRY["ns_training_capstone"].fn(spark, SF_SMOKE)
    root = df._jdf.queryExecution().executedPlan()
    if root.nodeName() == "AdaptiveSparkPlan":
        root = root.initialPlan()

    def walk(node):
        yield node
        for i in range(node.children().size()):
            yield from walk(node.children().apply(i))

    names = [n.nodeName() for n in walk(root)]
    assert sum(1 for n in names if "InMemoryTableScan" in n) > 0, names
    assert not any("Scan parquet" in n or "FileScan" in n for n in names), names
    assert "BatchEvalPython" not in df._jdf.queryExecution().executedPlan().toString()


def test_curate_batch_composed_plan_per_batch_cost_shape(spark):
    """Freeze the per-batch cost claims of the FULL four-leg curation
    composition (streaming/curation.curate_batch — the frame every
    micro-batch executes): the benchmark table joins as ONE broadcast
    nested-loop (the intended exact-decon crossJoin(broadcast(bench)),
    never a real cartesian), each frozen artifact is scanned a bounded
    number of times (minhash index ≤ 2: band probe + witness text
    verification; paragraph index and decon bench exactly once), and
    no row-at-a-time Python appears anywhere. The capstone query has
    standing plan evidence; this gives the streaming legs the same
    freeze (r9 verdict item 6). Artifacts live under a SHORT tempdir —
    pytest's tmp_path is long enough that plan Location strings
    truncate and the path-count assertions would read 0."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        build_minhash_index,
        build_paragraph_index,
    )
    from map_reduce_framework_using_python_spark.operators.dsir import (
        build_dsir_model,
    )
    from map_reduce_framework_using_python_spark.operators.similarity import (
        build_semdecon_bench,
    )
    from map_reduce_framework_using_python_spark.plans.northstar import (
        _BATCH_MOD,
        _BATCH_REM,
    )
    from map_reduce_framework_using_python_spark.streaming.curation import (
        curate_batch,
    )

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    corpus = d.filter(F.col("doc_id") % _BATCH_MOD != _BATCH_REM)
    batch = d.filter(F.col("doc_id") % _BATCH_MOD == _BATCH_REM)
    with tempfile.TemporaryDirectory(prefix="curplan") as root:
        idx = os.path.join(root, "idx")
        mdl = os.path.join(root, "model")
        para = os.path.join(root, "para")
        bench = os.path.join(root, "bench")
        build_minhash_index(corpus, idx, n=3, num_hashes=32, bands=16)
        build_dsir_model(spark, corpus, F.col("lang") == "en", mdl)
        build_paragraph_index(corpus, para)
        build_semdecon_bench(corpus.limit(5), bench)

        _, rejected, _ = curate_batch(
            spark, batch, corpus, idx, mdl,
            paragraph_index_path=para, decon_bench_path=bench,
        )
        plan = rejected._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # r14: the exact-decon leg is the vectorized Arrow pass (scan →
    # MapInArrow), so the old broadcast nested-loop bench cross is
    # gone and the bench artifact no longer appears in the per-batch
    # plan (it is collected once per batch into the kernel's broadcast
    # matrix — a bounded suite by contract).
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("MapInArrow") == 1, plan
    assert plan.count("/bench") == 0, plan
    # r15: the textual /idx count was retired as the per-batch cost
    # pin — the plan printer reprints every persisted subtree's child
    # plan per reference (the r14 capstone-pin lesson), so the count
    # tracks textual fan-out, not executed scans (the r15 distinct-text
    # verification references the persisted candidate table from more
    # branches while scanning the index exactly once). The REAL
    # assertion is structural: the per-batch sink plan reads ONLY
    # cached tables — every FileScan (index, paragraph index, corpus,
    # batch) lives inside a persist boundary, so each is executed at
    # most once per batch no matter how many branches reference it.
    root_p = rejected._jdf.queryExecution().executedPlan()
    if root_p.nodeName() == "AdaptiveSparkPlan":
        root_p = root_p.initialPlan()

    def walk(node):
        yield node
        for i in range(node.children().size()):
            yield from walk(node.children().apply(i))

    names = [n.nodeName() for n in walk(root_p)]
    assert sum(1 for n in names if "InMemoryTableScan" in n) >= 1, names
    assert not any(
        "Scan parquet" in n or "FileScan" in n for n in names
    ), names


def test_exact_substring_spans_one_scan_two_exchanges(spark):
    """The variable-length ExactSubstr finder (r10): ONE corpus scan
    (digests fan out of it — text never re-read), exactly two shuffle
    exchanges (digest window + doc window; the final group-by must
    reuse the doc_id partitioning), no join of any kind, no
    row-at-a-time Python."""
    plan = _plan(spark, "ns_exact_substring_spans")
    assert plan.count("Scan parquet") == 1, plan
    assert _exchanges(plan) == 2, plan
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_exact_substring_apply_two_scans_is_the_floor(spark):
    """The keep-one rewrite pays exactly one more corpus scan than the
    finder — the doc_id text join-back that rebuilds clean_text (the
    paragraph-apply economics); removal ranges ride a per-doc array,
    so the rebuild itself is map-side (no extra exchange past the
    ranges agg + join)."""
    plan = _plan(spark, "ns_exact_substring_apply")
    assert plan.count("Scan parquet") == 2, plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_span_screen_index_scan_never_shuffles(spark):
    """The span (ExactSubstr) ingest screen inherits the paragraph
    screen's shape contract: the persisted shingle-index scan reaches
    its joins purely map-side (broadcast batch-id anti-join +
    broadcast digest-set equi-join) — no sort-merge join anywhere, and
    the only windows are the batch-side within-batch counts on h."""
    plan = _plan(spark, "ns_span_screen")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
    for ln in plan.splitlines():
        if "Window [" in ln:
            assert "h#" in ln, ln


def test_span_screen_apply_shape(spark):
    """The apply form adds the within-batch rank window (still on h)
    and ONE batch-text join-back; the index side must still never
    sort-merge, and the rebuild must stay JVM-side (no row Python)."""
    plan = _plan(spark, "ns_span_screen_apply")
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    for ln in plan.splitlines():
        if "Window [" in ln:
            assert "h#" in ln or "doc_id#" in ln, ln


def test_ivfpq_topk_partition_pruned_codes_scan(spark):
    """The composed IVF-PQ probe (r11): the CODES scan must plan with
    PartitionFilters on centroid_id (only probed cells open — static
    pruning, never dependent on DPP heuristics), the exact rerank must
    join back as a broadcast (shortlist-sized side), the top-k must be
    TakeOrderedAndProject (no global sort), and nothing row-Python or
    cartesian may appear. The fits run at plan build (bounded model
    actions) — this pins the QUERY plan those artifacts serve."""
    plan = _plan(spark, "ns_ivfpq_topk")
    assert re.search(r"PartitionFilters: \[.*centroid_id.*(INSET|IN \()", plan), plan
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan, plan


def test_pandas_api_agg_compiles_to_distributed_hashaggregate(spark):
    """The pandas-on-Spark query (r11) must compile to the ordinary
    partial+final HashAggregate with ONE exchange and ZERO windows —
    the default 'sequence' index would attach an unpartitioned-window
    row number (the single-task straggler); index_col= keeps the plan
    distributed, and this pins it."""
    plan = _plan(spark, "q_pandas_api_agg")
    assert plan.count("HashAggregate") >= 2, plan
    assert _exchanges(plan) == 1, plan
    assert "Window [" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_join_shuffle_hash_uses_shuffled_hash_join(spark):
    """The SHUFFLE_HASH hint must survive to the physical plan (r12):
    a ShuffledHashJoin — no sort on either side — completing the
    pinned join-strategy matrix (broadcast / SMJ / bucketed SMJ /
    shuffle-hash)."""
    plan = _plan(spark, "q_join_shuffle_hash")
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
