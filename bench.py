"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Queries execute via a noop sink (full computation, no driver collect),
so the measurement is engine time, not toPandas serialization.

Each query is timed as the MIN over two passes at the target SF, after
a small-SF warmup pass. Rationale (measured on this box): the FIRST
execution of a query shape pays whole-stage-codegen compilation and
C2 JIT of the generated classes — a trivial groupBy ran 5.5s cold vs
1.1s warm, and the small-SF warmup alone does not push the generated
code over the JIT compile threshold. Min-of-two reports steady-state
engine time and cuts single-JVM run-to-run variance (observed 112s vs
183s for identical code on the same idle box).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mdataframe_spark.cache import release_caches
from mdataframe_spark.queries import EXTRA_QUERIES, QUERIES
from mdataframe_spark.session import get_spark

QUERIES = {**QUERIES, **EXTRA_QUERIES}

# Heaviest queries FIRST: they are the most sensitive to single-JVM
# session aging (accumulated code-cache/heap state), so they get the
# freshest JVM; the sub-second queries are insensitive to ordering.
HEADLINE = [
    "stat_edger_exact_test",
    "stat_deseq2",
    "ml_kmeans_lloyd",
    "ml_dbscan_classes",
    "stat_vst",
    "dd_minhash_lsh",
    "dd_semantic_dedup",
    "sim_cosine_topk",
    "txt_repetition",
    "ds_contamination",
    "txt_unigram_lm",
    "n_cpm_log2",
    "q1_pricing_summary",
    "f1_filter_dsl",
    "j_generic_join_q3",
    "a2_group_zscore",
    "w1_bh_fdr",
    "w2_rank_window",
    "layout_pivot_wide",
    "dd_exact_dedup",
    "txt_quality",
    "txt_lang_id",
    "mm_payload_stats",
    "st_events_window",
    "st_sessionize",
    "ds_train_split",
    "ds_pack_sequences",
    "j_asof_attribution",
    "j_range_session_errors",
    "dd_substring_spans",
    "ml_quality_classifier",
    "txt_kn_bigram_lm",
    # the iterative group-closure pipelines (multi-round join loops —
    # the shapes most likely to hide fixed-cost blowups; r5 verdict #7)
    "dd_dedup_groups",
    "ds_leakage_safe_split",
    # round-6 selection/quality operators: the fused one-scan gate, the
    # DSIR selection pipeline, and the zero-shuffle entropy signal
    "txt_quality_gate",
    "ds_dsir_select",
    "txt_char_entropy",
    # round-6 continuation: the heaviest new shapes — the Bloom
    # decontamination probe, q-gram fuzzy matching, the co-purchase
    # pair generator, the fixed-iteration PageRank trajectory, and the
    # x100-fanout Poisson bootstrap
    "sk_bloom_decontaminate",
    "dd_fuzzy_match",
    "rec_copurchase",
    "gr_pagerank",
    "ds_bootstrap_ci",
    # round-7: the 4-pattern regex scrub (pure codegen map over full
    # text — the regex-throughput signal) and the median/MAD triple
    # aggregation
    "txt_pii_scrub",
    "dq_robust_outliers",
    # round-8: the heaviest new shapes — the two-sided wedge join
    # (link prediction), the broadcast-argmax centroid classifier,
    # the max-struct CDC collapse, the in-plan OLS solve, the
    # decimal-exact doubled-rank correlation, and the HAVING-IN
    # large-orders semi join
    "gr_jaccard_linkpred",
    "ml_confusion_nc",
    "dim_cdc_apply",
    "ml_ols_fit",
    "stat_spearman",
    "j_q18_large_orders",
    # round-8 second half: the sketch certification (builds CM and the
    # exact side), the two-pass spread test, the seasonal profile, and
    # the multi-distinct Expand aggregation
    "sk_countmin_gate",
    "stat_brown_forsythe",
    "e_seasonal_profile",
    "dq_candidate_keys",
    # round-9: the time-series decimal-accumulation battery (series
    # collapse + lag join), the three-window RFM tiling, the per-user
    # range-join attribution, the Benford digit collapse, the
    # two-sided degree-moment correlation, the fixed-round k-core
    # peel, and the zero-shuffle weighted reservoir
    "ts_acf_hourly",
    "e_rfm_scores",
    "e_attribution_credit",
    "dq_benford",
    "gr_assortativity",
    "gr_kcore",
    "ds_weighted_reservoir",
    # wave G: the histogram quantile sketch certification (cell build
    # + exact percentile side) and the one-scan Expand profile
    "sk_quantile_gate",
    # round 14: dq_completeness_profile RESTORED (r13 verdict item 2 —
    # the r13 partial build had swapped it out for pipe_training_mix
    # under the payload budget; the budget chars were found by fixing
    # the worst-case model in test_bench_payload_fits_driver_capture
    # instead of dropping a measured series, so the bench now carries
    # BOTH queries)
    "dq_completeness_profile",
    "pipe_training_mix",
    # round-10: the end-to-end curation recipe — gate → exact dedup →
    # MinHash near-dup drop → mixture sample → pack as ONE lineage
    # (the longest chained plan in the registry) — plus the survival
    # fold and the series² trend join
    "pipe_fineweb_recipe",
    "e_kaplan_meier",
    "ts_mann_kendall",
    # round-11: the log-rank double risk-set windows over the persisted
    # step table, the per-group exact-percentile winsorization over the
    # users-scale table, the JSD vocab grid, and the EB shrink over the
    # persisted per-key table
    "e_log_rank",
    "e_winsorized_lift",
    "txt_source_jsd",
    "e_eb_ctr_shrinkage",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    # warmup: run every headline query once at the smallest SF so the
    # timed pass measures steady-state execution, not whole-stage
    # codegen compilation and JIT (2-5s per novel query shape)
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        try:
            QUERIES[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    release_caches()
    # second warmup at the TARGET SF, uniformly for every query: the
    # small-SF pass compiles the codegen shapes but does not push the
    # hot loops through HotSpot's C2 tier at production trip counts —
    # measured on stat_edger_exact_test, passes after an sf0.1 warmup
    # run 4.0s steady-state vs 7.8-15s while still warming. One
    # untimed pass per query (identical treatment for fast and slow
    # queries; methodology recorded in the output JSON).
    for name in HEADLINE:
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        finally:
            release_caches()
        try:
            spark._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
    # per-query error isolation: one broken query must never erase the
    # round's numbers — record its error type and keep timing the rest
    timings = {}
    errors = {}
    pass_counts = {}
    for name in HEADLINE:
        best = None
        passes = 2
        _attempt = 0
        _ok = 0
        while _attempt < passes:
            _attempt += 1
            t0 = time.time()
            try:
                df = QUERIES[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                # 2-dp timings: centisecond resolution (below the
                # JVM noise floor) keeps the 70-query payload line
                # inside the driver's ~2000-char tail capture
                dt = round(time.time() - t0, 2)
                _ok += 1
                best = dt if best is None else min(best, dt)
            except Exception as e:  # noqa: BLE001
                errors[name] = f"{type(e).__name__}: {str(e)[:200]}"
                break
            finally:
                # free persisted intermediates (dedup bands, APL curves)
                # so later queries are timed without inherited cache
                # pressure
                release_caches()
        # force a driver GC between query shapes so ContextCleaner
        # reclaims dead broadcasts/shuffles NOW, not at the periodic
        # interval — without this the single-JVM session ages and the
        # tail queries pay 2-3x in heap pressure (outside the timers:
        # the next query's cold pass absorbs any cleanup latency)
        try:
            spark._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
        if best is not None:
            timings[name] = best
            # SUCCESSFUL passes only — a later failed pass must not
            # inflate the recorded noise floor for flaky queries
            pass_counts[name] = _ok
            errors.pop(name, None)
    total = round(sum(timings.values()), 2)
    # Anchor normalization (round-12, carried from the r10/r11
    # verdicts): three stable sub-second queries whose plans have not
    # changed since round 1 form the box-speed anchor; dividing by
    # their sum makes round-over-round comparisons box-drift-immune
    # (three consecutive judges hand-derived a uniform ~1.2x JVM/box
    # swing — one ratio ends that). The guaranteed stdout line carries
    # the two scalars (anchor_sec, value_norm); the FULL per-query
    # normalized series cannot fit the driver's ~2000-char tail
    # capture next to the raw series, so it is written to
    # BENCH_NORM.json at the repo root instead (both forms, one file).
    ANCHORS = ["q1_pricing_summary", "dd_exact_dedup", "f1_filter_dsl"]
    # the ratio is only honest when ALL THREE anchors timed: a missing
    # anchor would deflate anchor_sec and inflate norm for a reason
    # unrelated to box speed (review finding, round 12) — report None
    # and let the raw series carry that round
    anchors_ok = all(a in timings for a in ANCHORS)
    anchor_sec = (
        round(sum(timings[a] for a in ANCHORS), 3) if anchors_ok else None
    )
    value_norm = (
        round(total / anchor_sec, 2)
        if anchors_ok and anchor_sec > 0
        else None
    )
    norm_record = {
        "metric": "headline_queries_anchor_normalized",
        "anchors": ANCHORS,
        "anchor_sec": anchor_sec,
        "value_sec": total,
        "value_norm": value_norm,
        "sf": float(sf),
        "queries_sec": timings,
        "queries_norm": {
            k: (
                round(v / anchor_sec, 2)
                if anchor_sec is not None and anchor_sec > 0
                else None
            )
            for k, v in timings.items()
        },
    }
    try:
        with open(Path(__file__).resolve().parent / "BENCH_NORM.json", "w") as f:
            json.dump(norm_record, f, indent=1)
    except OSError:
        pass  # read-only checkout: the stdout scalars still carry the ratio
    # The driver records only the LAST ~2000 characters of stdout
    # (BENCH_r06 lost its headline total to a >2000-char JSON line).
    # Two lines; the GUARANTEED-PARSEABLE payload prints LAST (the
    # tail capture preserves the end of stdout, so the first line is
    # the sacrificial one):
    #   1. a human-oriented summary FIRST — totals plus the full error
    #      diagnostics (messages value-truncated at 200 chars AND
    #      count-capped at 10, so even this sacrificial line stays
    #      bounded under mass failure),
    #   2. the full per-query payload LAST, compact-serialized with the
    #      `passes` map reduced to exceptions-only (normally empty),
    #      errors reduced to a count + a names-only list capped at 8
    #      (names identify WHAT failed; the messages live on line 1 and
    #      in manual runs), sized to fit the window —
    #      test_bench_payload_fits_driver_capture guards the budget
    #      including the worst mass-failure shape.
    summary = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "n_queries": len(timings),
        "anchor_sec": anchor_sec,
        "value_norm": value_norm,
        # methodology (rounds stay comparable): per-query min over 2
        # passes, after TWO untimed warmups per query (one at sf0.001
        # for codegen shapes, one at the target SF so HotSpot C2
        # compiles the hot loops at production trip counts), forced
        # driver GC between shapes. Lives on this SACRIFICIAL line —
        # the guaranteed payload line needs the chars for the queries
        "timing": "min2_warm2_gc",
    }
    if errors:
        summary["n_errors"] = len(errors)
        capped = dict(list(errors.items())[:10])
        if len(errors) > 10:
            capped["__omitted__"] = f"+{len(errors) - 10} more"
        summary["errors"] = capped
    print(json.dumps(summary))
    payload = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        # box-drift-immune scalars (short keys — the worst-case line
        # sits 3 chars under the 1900 budget): anchor = q1 + dd_exact
        # + f1 raw seconds; norm = value / anchor. Per-query
        # normalized series (too wide for this capture window) in
        # BENCH_NORM.json at the repo root.
        "anchor": anchor_sec,
        "norm": value_norm,
        # the methodology string lives on the SACRIFICIAL summary line
        # (and in BENCH_NORM.json) — this guaranteed line spends its
        # char budget on the per-query series + the anchor scalars
    }
    # exceptions only: a query that did NOT get its 2 clean passes.
    # Both exception maps are COUNT-capped (5 passes entries, 3 failed
    # names — tightened one notch in round 14 to pay for the restored
    # dq_completeness_profile): the headline list has grown past the
    # point where the 8-name caps fit the ~2000-char tail capture
    # under mass failure (test_bench_payload_fits_driver_capture
    # models the worst mix)
    odd_passes = {k: v for k, v in pass_counts.items() if v != 2}
    if odd_passes:
        if len(odd_passes) > 5:
            kept = dict(sorted(odd_passes.items())[:5])
            kept["__omitted__"] = len(odd_passes) - 5
            odd_passes = kept
        payload["passes"] = odd_passes
    if errors:
        payload["n_errors"] = len(errors)
        failed = sorted(errors)
        payload["failed"] = failed[:3] + (
            [f"+{len(failed) - 3} more"] if len(failed) > 3 else []
        )
    print(json.dumps(payload, separators=(",", ":")))


if __name__ == "__main__":
    main()
