"""Physical-plan regression guards.

These assert the SHAPE of the plans the engine's flagship queries
compile to — the properties PLANS.md documents as load-bearing at
100 TB. A refactor that silently reintroduces a shuffle, loses filter
pushdown, or drops a broadcast fails here even though results stay
correct.
"""

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from mdataframe_spark.session import get_spark

    s = get_spark("test_plans")
    yield s


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_single_exchange_partial_agg(spark):
    """TPC-H Q1 shape: partial aggregation before ONE exchange, and the
    shipdate filter pushed into the parquet scan."""
    from mdataframe_spark.queries import q1_pricing_summary

    plan = _plan(q1_pricing_summary(spark, SF))
    assert plan.count("Exchange") == 1, plan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # map-side combine present: a partial_ aggregate below the exchange
    assert "partial_" in plan


def test_filter_dsl_pushdown_and_pruning(spark):
    """The compiled filter DSL reaches the parquet scan (PushedFilters)
    and only referenced columns are read (ReadSchema pruning)."""
    from mdataframe_spark.queries import f1_filter_dsl

    plan = _plan(f1_filter_dsl(spark, SF))
    assert "PushedFilters: [" in plan and "IsNotNull" in plan
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "l_comment" not in rs[0], rs


def test_dimension_join_broadcasts(spark):
    """Q3-style join: the small dimension sides broadcast — no
    shuffle-hash/sort-merge join for customer/orders dims at this
    size ratio."""
    from mdataframe_spark.queries import j_generic_join_q3

    plan = _plan(j_generic_join_q3(spark, SF))
    assert "BroadcastHashJoin" in plan, plan


def test_count_matrix_single_level_aggregate(spark):
    """The conditional-aggregation count matrix compiles to ONE
    exchange (single-level partial agg), not the pivot's two."""
    from mdataframe_spark.queries import _six_counts

    plan = _plan(_six_counts(spark, SF))
    assert plan.count("Exchange") == 1, plan
    assert "partial_" in plan


def test_zscore_rows_no_shuffle(spark):
    """Row-wise z-score is pure horizontal arithmetic: zero exchanges
    on top of the scan."""
    from mdataframe_spark.functions.norm import zscore_rows

    df = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    out = zscore_rows(df, ["l_quantity", "l_extendedprice", "l_discount"])
    plan = _plan(out)
    assert "Exchange" not in plan, plan


def test_unigram_vocab_topk_no_global_sort(spark):
    """The vocabulary truncation compiles to TakeOrderedAndProject
    (per-partition heaps), never a global Sort of the token table."""
    from mdataframe_spark.operators.text import unigram_lm_scores
    from mdataframe_spark.cache import release_caches

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = unigram_lm_scores(docs, vocab_cap=64)
    try:
        plan = _plan(out)
        assert "TakeOrderedAndProject" in plan, plan
    finally:
        release_caches()


def test_substring_spans_no_pair_join(spark):
    """dd_substring_spans (ExactSubstr): the plan must contain NO
    cross/nested-loop join and NO doc-pair equi-join — duplicate
    detection is ONE hash-count groupBy + a left-semi seed join, and
    the island windows are partitioned by doc (no global window)."""
    # registry-rotation-proof lookup: the query may sit in the driver
    # registry or EXTRA depending on the round's rotation
    from mdataframe_spark.queries import EXTRA_QUERIES, QUERIES

    df = {**QUERIES, **EXTRA_QUERIES}["dd_substring_spans"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan
    # every Window node is partitioned (no move-all-to-one-partition)
    for ln in plan.splitlines():
        if "Window " in ln or ln.strip().startswith("Window"):
            assert "windowspecdefinition" not in ln or "id" in ln, ln


def test_dbscan_single_candidate_generation(spark):
    """ml_dbscan_classes: exactly ONE broadcast-joined candidate
    generation (the r4 regression was a second shifted explode for the
    border check) — the pair frame is persisted and reused."""
    from mdataframe_spark.queries import EXTRA_QUERIES, QUERIES

    df = {**QUERIES, **EXTRA_QUERIES}["ml_dbscan_classes"](spark, SF)
    plan = _plan(df)
    # after InMemoryRelation caching, the visible plan re-reads the
    # cached pair frame for BOTH consumers instead of regenerating the
    # 3x3-shifted candidates a second time
    assert plan.count("InMemoryTableScan") >= 2  # pairs read twice


def test_quality_gate_single_scan_no_exchange(spark):
    """txt_quality_gate fuses Gopher rules + entropy + language ID into
    ONE projection: the plan must contain exactly one parquet scan and
    ZERO exchanges (the whole gate is FileScan -> ArrowEvalPython ->
    Project)."""
    from mdataframe_spark.queries import EXTRA_QUERIES, QUERIES

    df = {**QUERIES, **EXTRA_QUERIES}["txt_quality_gate"](spark, SF)
    plan = _plan(df)
    assert plan.count("FileScan parquet") == 1, plan
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan, plan


def test_kendall_corpus_collapse_before_pair_join(spark):
    """kendall_tau_cells: the ONLY corpus-scale structure is the
    (x, y) cell groupBy; the inequality pair join runs over the
    cell table (InMemoryRelation from the tracked persist), never
    the raw scan."""
    from mdataframe_spark.queries import stat_kendall_tau

    plan = _plan(stat_kendall_tau(spark, SF))
    # the persisted cell table feeds both join sides and the margins
    assert "InMemoryTableScan" in plan, plan
    # no Python anywhere in the pipeline
    assert "EvalPython" not in plan, plan


def test_wasserstein_single_block_collapse(spark):
    """wasserstein_1d: one partial-agged block groupBy collapses the
    corpus; everything above is windows/joins over the distinct-value
    table; no Python, no per-row UDF."""
    from mdataframe_spark.queries import stat_wasserstein

    plan = _plan(stat_wasserstein(spark, SF))
    assert "EvalPython" not in plan, plan
    assert "partial_" in plan
    # round-12: the block table is persisted (it feeds the cumulative
    # windows, the totals, AND the max_blocks count probe) — every
    # consumer reads the InMemoryRelation, never a re-scan of the fact
    assert "InMemoryTableScan" in plan, plan


def test_kaplan_meier_fold_over_step_table(spark):
    """e_kaplan_meier: the survival fold is an ordered-window
    collect_list aggregate over the step table — one per-user
    exchange, one step-table sort, no Python."""
    from mdataframe_spark.queries import e_kaplan_meier

    plan = _plan(e_kaplan_meier(spark, SF))
    assert "collect_list" in plan, plan
    assert "EvalPython" not in plan, plan


def test_pipeline_pins_survivor_frames(spark):
    """pipe_fineweb_recipe: the gate output and both survivor frames
    are persisted (InMemoryRelation) so the signature build, the
    mixture rate probe, and the packing pass share materializations
    instead of re-running the gate."""
    from mdataframe_spark.queries import pipe_fineweb_recipe

    plan = _plan(pipe_fineweb_recipe(spark, SF))
    assert "InMemoryTableScan" in plan, plan


def test_cuped_moment_aggregation_no_python(spark):
    """e_cuped_adjust: decimal moment sums with partial aggregation;
    the statistics are scalar projections — no Python, no window."""
    from mdataframe_spark.queries import e_cuped_adjust

    plan = _plan(e_cuped_adjust(spark, SF))
    assert "EvalPython" not in plan, plan
    assert "partial_" in plan
    assert "Window" not in plan, plan


def test_join_size_gate_broadcast_cells(spark):
    """sk_join_size_gate: the sketch sides collapse to cell tables
    before any join; the spine/estimate joins are broadcast; no
    Python."""
    from mdataframe_spark.queries import sk_join_size_gate

    plan = _plan(sk_join_size_gate(spark, SF))
    assert "EvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_log_rank_step_table_collapse(spark):
    """e_log_rank: one per-user collapse + one step groupBy; the
    hypergeometric term sums are decimal partial aggregations over the
    step-bounded table — no Python, broadcast totals only."""
    from mdataframe_spark.queries import e_log_rank

    plan = _plan(e_log_rank(spark, SF))
    assert "EvalPython" not in plan, plan
    assert "partial_" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_rmst_reuses_km_fold_shape(spark):
    """e_rmst: the KM fold (ordered-window collect_list) over the step
    table plus lag/lead segment windows — no Python, no extra corpus
    scan beyond the per-user collapse."""
    from mdataframe_spark.queries import e_rmst

    plan = _plan(e_rmst(spark, SF))
    assert "collect_list" in plan, plan
    assert "EvalPython" not in plan, plan
    # the step table is persisted: the scalar total and the windows
    # both read InMemoryTableScan (the textual FileScan below it is
    # the cached relation's lineage, not a second runtime pass)
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_winsorized_one_scan_groups_bounded_edges(spark):
    """e_winsorized_lift: per-group percentile edges are a
    groups-bounded aggregate broadcast back onto the units — the unit
    table joins via BroadcastHashJoin, never a shuffle join; decimal
    clamp sums partial-aggregate."""
    from mdataframe_spark.queries import e_winsorized_lift

    plan = _plan(e_winsorized_lift(spark, SF))
    assert "EvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "partial_" in plan


def test_covariate_balance_stack_single_scan(spark):
    """dq_covariate_balance: the k-covariate unpivot is ONE scan
    through a Generate-stack stage (never k scans), then a
    covariates-bounded moment collapse."""
    from mdataframe_spark.queries import dq_covariate_balance

    plan = _plan(dq_covariate_balance(spark, SF))
    assert "Generate stack" in plan or "Expand" in plan, plan
    assert plan.count("Scan parquet") == 1, plan
    assert "EvalPython" not in plan, plan


def test_eb_shrinkage_keys_bounded_broadcast(spark):
    """e_eb_ctr_shrinkage: ONE keys-bounded moment aggregate broadcast
    back onto the per-key table; the shrink itself is a projection —
    no second corpus pass, no Python."""
    from mdataframe_spark.queries import e_eb_ctr_shrinkage

    plan = _plan(e_eb_ctr_shrinkage(spark, SF))
    assert "EvalPython" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the per-key table is persisted: the prior-moment probe and the
    # shrink projection both read InMemoryTableScan instead of
    # re-running the upstream collapse
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_vocab_richness_two_level_collapse(spark):
    """txt_vocab_richness: corpus -> (group, token) counts ->
    frequency-of-frequencies, all partial-agged; no Python, one scan."""
    from mdataframe_spark.queries import txt_vocab_richness

    plan = _plan(txt_vocab_richness(spark, SF))
    assert "EvalPython" not in plan, plan
    assert "partial_" in plan
    assert plan.count("Scan parquet") == 1, plan


def test_source_jsd_vocab_grid_bounded(spark):
    """txt_source_jsd: the corpus never flows past the (group, token)
    groupBy — the KL-grid machinery reads the persisted count table
    (InMemoryTableScan), and the vocabulary probe is a distributed
    top-K (TakeOrderedAndProject), not a global sort."""
    from mdataframe_spark.queries import txt_source_jsd

    plan = _plan(txt_source_jsd(spark, SF))
    assert "InMemoryTableScan" in plan, plan
    assert "EvalPython" not in plan, plan


def test_friedman_block_partitioned_windows(spark):
    """stat_friedman: the rank windows partition BY BLOCK — no
    single-partition global sort of the grid; no Python."""
    from mdataframe_spark.queries import stat_friedman

    plan = _plan(stat_friedman(spark, SF))
    assert "EvalPython" not in plan, plan
    # a block-partitioned window sorts (b, v) inside hash partitions
    # of b — the plan must not contain an unpartitioned Sort of the
    # whole grid feeding the rank window
    assert "partial_" in plan


def test_page_hinkley_series_bounded_windows(spark):
    """ts_page_hinkley: ONE corpus collapse (bucket_series); every
    window runs over the series-bounded bucket table; no Python."""
    from mdataframe_spark.queries import ts_page_hinkley

    plan = _plan(ts_page_hinkley(spark, SF))
    assert "EvalPython" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan
    assert "partial_" in plan


def test_ljung_box_shares_one_series_collapse(spark):
    """ts_ljung_box: the persisted bucket series feeds the lag join,
    the global moments, AND the length probe — InMemoryRelation, one
    corpus collapse, no Python."""
    from mdataframe_spark.queries import ts_ljung_box

    plan = _plan(ts_ljung_box(spark, SF))
    assert "InMemoryTableScan" in plan, plan
    assert "EvalPython" not in plan, plan


def test_degree_distribution_histogram_bounded(spark):
    """gr_degree_distribution: everything past the degree collapse
    runs on the persisted histogram (InMemoryRelation); the Hill sum
    and CCDF window never touch the corpus. No Python."""
    from mdataframe_spark.queries import gr_degree_distribution

    plan = _plan(gr_degree_distribution(spark, SF))
    assert "InMemoryTableScan" in plan, plan
    assert "EvalPython" not in plan, plan


def test_format_patterns_single_scan_codegen(spark):
    """dq_format_patterns: ONE parquet scan, the mask is pure
    translate/substr codegen (no regex, no Python), one partial-agged
    groupBy, TakeOrdered for the top-k."""
    from mdataframe_spark.queries import dq_format_patterns

    plan = _plan(dq_format_patterns(spark, SF))
    assert plan.count("Scan parquet") <= 2, plan
    assert "EvalPython" not in plan, plan
    assert "partial_" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_conversion_lag_one_user_collapse(spark):
    """e_conversion_lag: ONE per-user conditional-min collapse (the
    only corpus shuffle) + one users-bounded percentile aggregation;
    no window, no Python."""
    from mdataframe_spark.queries import e_conversion_lag

    plan = _plan(e_conversion_lag(spark, SF))
    assert "EvalPython" not in plan, plan
    assert "partial_" in plan, plan
    assert "Window" not in plan, plan


def test_kfold_profile_zero_preshuffle(spark):
    """ds_kfold_profile: the fold projection is pure md5 codegen —
    the only exchanges are the k-cell groupBy and its broadcast;
    no Python, no window, no join back to the corpus."""
    from mdataframe_spark.queries import ds_kfold_profile

    plan = _plan(ds_kfold_profile(spark, SF))
    assert "EvalPython" not in plan, plan
    assert "Window" not in plan, plan
    assert plan.count("Scan parquet") <= 2, plan
