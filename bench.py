"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}. Mirrors the reference's interpreted benchmark
runner contract (reference: benchmark/benchmark_runner.cpp — name,run,timing)
in spirit: wall-clock per named query, plus suite total.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume_customer",
    "tpch_q19_disjunctive_predicates",
    "agg_rollup",
    "window_ranks",
    "join_asof_purchase",
    "join_iejoin_two_inequalities",
    "tpcds_q67_rollup_topk",
    "dedup_minhash_pairs",
    "sim_topk_bruteforce",
    "sim_ivf_pruned_probe",
    "text_quality_scores",
    # round-6 additions (VERDICT item 10): dynamic pivot, reservoir sample,
    # and a tranche-3 TPC-DS shape (union + day pivot + YoY self-join)
    "pivot_dynamic_values",
    "sample_reservoir_fixed",
    "tpcds_q2_week_pivot_yoy",
    # round-7 additions (VERDICT item 6): the co-partitioned big-big shuffle
    # join, a JOB wide star, a ClickBench tail shape, and the recursive-CTE
    # fixpoint — the four plan families the suite didn't yet time.
    "h2o_join_big_big",
    "job_star_wide_five",
    "cb_ip_arith_groups",
    "recursive_cte_graph_reach",
    # round-8 addition: the storage-bucketed big-big join (zero-exchange
    # SMJ over bucketBy tables; the bucketed write happens at DataFrame
    # build — amortized setup, like the IVF index — so the timed runs
    # measure the join over existing bucketed storage, which is the claim).
    "join_bucketed_big_big",
    # round-9 addition: near-dup CLUSTER canonicalization — MinHash pairs →
    # alternating large-star/small-star connected components. The strongest
    # Spark-vs-DuckDB headline (0.24x at sf0.1, widening to 0.16x at 100x
    # data) and the suite's only iterative-fixpoint timing besides the
    # recursive CTE.
    "dedup_cluster_canonical",
]


def _forcer(df):
    """Return a closure that fully executes `df`, materializing EVERY output
    column (a bare .count() would let Catalyst prune unused window/join
    columns and final sorts, under-measuring the query). Aggregating a hash
    of all columns keeps the result a single engine-side row — no driver
    transfer — while forcing each column's computation, like the reference
    runner which fetches the full result (benchmark/benchmark_runner.cpp)."""
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in df.columns]
    try:
        # analysis is eager: raises here for unhashable (map-typed) outputs
        df.agg(F.sum(F.hash(*cols)))
    except Exception:
        return lambda: df.count()
    # Rebuild the probe per run: re-collecting one Dataset object would reuse
    # its shuffle map outputs across jobs (skipped stages) and under-measure
    # every run after the first. A fresh Dataset → fresh RDD lineage → full
    # re-execution each run.
    return lambda: df.agg(F.sum(F.hash(*cols))).collect()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)

    from duckdb_parachute_spark import get_session
    from duckdb_parachute_spark.session import scaled_adaptive, scaled_shuffle_partitions
    from duckdb_parachute_spark.workload import load_all

    # BENCH_SCALE=N (round 17, VERDICT r16 next #1 — the scaling contract):
    # at sf0.1 the suite is scheduling-floor-bound (~26 x 0.06-0.1 s), so an
    # 8-vs-32-core comparison measures the floor, not parallelism. With
    # BENCH_SCALE=N the SAME suite runs with the SAME methodology over a
    # factor-N replica of $SPARK_GRAFT_SF_DIR (testkit.scaleup — the
    # deterministic generator scripts/scale_measure.py has used since round
    # 6), where per-query work dominates the floor and the core-count ratio
    # becomes falsifiable. Data generation happens OUTSIDE the timed region
    # in its own session (and is reused across runs — it is input data, not
    # a computed result; every timed query still computes from parquet).
    # Timing-only addition: default (unset/1) behavior is byte-identical,
    # and scale-mode output never reports DuckDB-baseline ratios (the basis
    # is 1x) — it carries an explicit "scale" key instead.
    scale = int(os.environ.get("BENCH_SCALE", "1") or "1")
    base_sf_dir = sf_dir
    if scale > 1:
        from duckdb_parachute_spark.testkit.scaleup import generate_scaled

        gen = get_session(app_name="parachute-bench-scalegen", master=f"local[{cpus}]")
        sf_dir = generate_scaled(gen, sf_dir, scale, reuse=True)
        gen.stop()

    extra_conf = {
        # AQE sized to the data (round 8): each AQE exchange
        # materialization costs a driver scheduling round; below ~2 GiB it
        # has nothing to adapt (partitions already data-sized, dims already
        # broadcast-hinted) and costs ~11 % of suite wall. ≥2 GiB → on.
        "spark.sql.adaptive.enabled": scaled_adaptive(sf_dir)
    }
    if scale > 1:
        # Scale mode measures PARALLELISM, so the input split count must
        # exceed every tested core count — at 10x sf0.1 the default 128 MB
        # splits give lineitem only ~6 scan tasks, and an 8-vs-32-core
        # comparison measures the split count, not the cores (at 100 TB
        # splits >> cores holds naturally; this recreates that regime).
        # FIXED 16 MB for every scale run — identical layout at every core
        # count, so cores are the only variable between runs.
        extra_conf["spark.sql.files.maxPartitionBytes"] = str(16 * 2**20)
        # CPU-dense compressed inputs (the word-salted documents: tons of
        # md5 work per compressed byte) still collapse to a handful of
        # splits by size alone; a FIXED split-count floor keeps every scan
        # wider than the tested core counts.
        extra_conf["spark.sql.files.minPartitionNum"] = "64"
    # Shuffle parallelism: the 64 MB/partition dial is sized to compressed
    # bytes, which undersells row counts on replicated zstd data (30x sf0.1
    # is 450 MB -> 8 partitions, fewer than the tested core counts). Scale
    # mode floors it at 64 — a FIXED value for every core count, so the
    # 8-vs-32 comparison varies cores only (at 100 TB partitions >> cores
    # holds naturally; default mode is untouched).
    nshuffle = scaled_shuffle_partitions(sf_dir)
    if scale > 1:
        nshuffle = max(64, nshuffle)
    spark = get_session(
        app_name="parachute-bench",
        master=f"local[{cpus}]",
        # ~64 MB of input per shuffle partition: fuller partitions at bench
        # scale (scheduling floor dominates below that), AQE-coalesced
        # thousands at 100 TB — same dial, data-sized (session.py).
        shuffle_partitions=nshuffle,
        extra_conf=extra_conf,
    )
    qs = load_all()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in qs if n not in HEADLINE and os.environ.get("BENCH_ALL") == "1"
    ]
    # A/B bisection hooks (round 10, VERDICT r9 item 1): BENCH_ONLY runs a
    # comma-separated subset of the suite, BENCH_SKIP removes names — both
    # keep the remaining suite ORDER identical so in-session ordering effects
    # can be isolated without editing HEADLINE.
    if os.environ.get("BENCH_ONLY"):
        only = {s.strip() for s in os.environ["BENCH_ONLY"].split(",") if s.strip()}
        names = [n for n in names if n in only]
    if os.environ.get("BENCH_SKIP"):
        skip = {s.strip() for s in os.environ["BENCH_SKIP"].split(",") if s.strip()}
        names = [n for n in names if n not in skip]

    # Warm up the session once (JIT/codegen infrastructure, parquet reader
    # classes, file listing) so per-query timings reflect steady state — the
    # reference's runner likewise times runs after load (benchmark/
    # benchmark_runner.cpp, 5-run protocol).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from duckdb_parachute_spark.catalog import load_table

    load_table(spark, sf_dir, "lineitem").limit(1).collect()

    # Environment calibration (round 8, after the r6→r7 "drift" turned out
    # to be host noise — BASELINE.md §round-8): three fixed probes recorded
    # alongside the query timings so round-over-round comparisons can be
    # normalized against the machine's state that day. cpu_spin is a
    # single-thread pure-Python loop (driver-side speed); spark_noop is the
    # scheduling floor of one trivial 1-task job; spark_shuffle adds one
    # exchange. If these move round-over-round, the suite moved with them.
    def _min_of(f, n=7):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    def _spin():
        x = 0
        for i in range(2_000_000):
            x += i
        return x

    def _measure_calib():
        return {
            "cpu_spin": _min_of(_spin),
            "spark_noop": _min_of(lambda: spark.range(1).count()),
            "spark_shuffle": _min_of(
                lambda: spark.range(100).repartition(8, "id").count()
            ),
        }

    # Floor gate (round 15, VERDICT r14 next #1): the probes now ACT
    # instead of merely being recorded. The reference floor is read from
    # bench_baseline.json; if the measured scheduling floor (spark_noop)
    # exceeds BENCH_FLOOR_TOL × the reference floor, the probe re-measures
    # after a settle pause (transient host load passes), then — if the
    # suite still lands degraded — the whole suite re-runs up to
    # BENCH_FLOOR_RETRIES times. A run that never reaches tolerance is
    # stamped {"floor_degraded": true, "floor_ratio": N} so the headline
    # JSON carries its own health instead of needing a BASELINE.md
    # footnote (r13/r14 both recorded on noisy floors).
    base_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json"
    )
    baseline = json.load(open(base_path)) if os.path.exists(base_path) else {}
    ref_calib = baseline.get("ref_calib", {"spark_noop": 0.124, "spark_shuffle": 0.123})
    floor_tol = float(os.environ.get("BENCH_FLOOR_TOL", "1.25"))
    floor_retries = int(os.environ.get("BENCH_FLOOR_RETRIES", "1"))

    def _settled_calib():
        """Calibration with up to 3 settle re-probes: a floor spike from a
        transient co-tenant process should not trigger a full suite
        re-run when a 5-second pause clears it."""
        c = _measure_calib()
        for _ in range(3):
            if c["spark_noop"] <= floor_tol * ref_calib["spark_noop"]:
                break
            print(
                f"# floor degraded pre-suite (noop {c['spark_noop']:.3f} vs "
                f"ref {ref_calib['spark_noop']:.3f}); settling 5s",
                file=sys.stderr,
            )
            time.sleep(5)
            c = _measure_calib()
        return c

    calib = _settled_calib()
    print(f"# calib: {calib}", file=sys.stderr)

    # Per-query timing = min over BENCH_RUNS runs (default 5), mirroring the
    # reference's 5-run protocol (benchmark/benchmark_runner.cpp, default
    # nruns=5): early runs pay whole-stage-codegen javac compilation + JVM
    # JIT that steady-state execution does not. The DataFrame is built once
    # and each timed run re-executes it end-to-end (df.count() plans a fresh
    # job; no shuffle or result reuse across runs) — the prepared-statement
    # posture of the reference's runner (§3.3: prepare once, execute N times);
    # driver-side Python plan construction is not part of query execution.
    runs = int(os.environ.get("BENCH_RUNS", "5"))
    # Queries whose BUILD already executes Spark jobs (the recursive-CTE
    # driver loop localCheckpoints eagerly): timing only the final
    # DataFrame would measure a cached-result scan. For these, each timed
    # run rebuilds from scratch so the fixpoint iterations are inside the
    # clock.
    eager_build = {
        "recursive_cte_graph_reach",
        "recursive_cte_series",
        # two-phase global ranking localCheckpoints its ranked intermediate
        # at build time (functions/scalar.global_row_number)
        "tpcds_q44_best_worst_rank",
        "join_positional",
        "sequence_rownumber_ids",
        # the large-star/small-star fixpoint (and its per-round fingerprint
        # probes) executes at DataFrame-build time — must run inside the clock
        "dedup_cluster_canonical",
    }
    def _time_suite() -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in names:
            df = qs[name].fn(spark, sf_dir)
            n = df.count()  # row count for the report (untimed)
            if name in eager_build:
                def force(_n=name):
                    d = qs[_n].fn(spark, sf_dir)
                    return _forcer(d)()
            else:
                force = _forcer(df)
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                force()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
            print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)
        return timings

    # suite + post-probe, with bounded whole-suite retries when the floor
    # was degraded at EITHER end of the run (a mid-suite spike shows up in
    # the post probe; the pre probe alone can't see it)
    attempt = 0
    while True:
        timings = _time_suite()
        post_noop = _min_of(lambda: spark.range(1).count())
        floor_ratio = max(calib["spark_noop"], post_noop) / max(
            ref_calib["spark_noop"], 1e-9
        )
        if floor_ratio <= floor_tol or attempt >= floor_retries:
            break
        attempt += 1
        print(
            f"# floor degraded across the run (ratio {floor_ratio:.2f} > "
            f"{floor_tol}); retry {attempt}/{floor_retries} after settle",
            file=sys.stderr,
        )
        time.sleep(5)
        calib = _settled_calib()

    m = re.search(r"sf([\d.]+)", base_sf_dir)
    sf = float(m.group(1)) if m else None
    total = round(sum(timings.values()), 3)
    # Per-query DuckDB baseline (round 10, VERDICT r9 item 2 + ADVICE): the
    # basis is read from bench_baseline.json next to this script — NOT a
    # hardcoded suite total — and summed over the queries that actually ran,
    # so editing HEADLINE (or running a BENCH_ONLY subset) can never silently
    # misstate the claim: queries without a baseline row are listed in
    # `baseline_missing` and the ratios are omitted unless every timed query
    # has one. The floor normalization (round 9) rescales by the reference
    # host's Spark scheduling floor, clamped so a FASTER host never inflates
    # the claim; raw and normalized ratios are both recorded.
    base_q = baseline.get("queries", {})
    missing = [n for n in timings if n not in base_q]
    same_sf = abs((sf or 0) - float(baseline.get("sf", -1))) < 1e-9
    floor_scale = min(1.0, ref_calib["spark_noop"] / max(calib["spark_noop"], 1e-9))
    out = {
        "metric": "suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "calib": calib,
        "calib_ref": ref_calib,
        "calib_post_noop": round(post_noop, 4),
        "floor_ratio": round(floor_ratio, 3),
        "value_floor_normalized": round(total * floor_scale, 3),
        "sf": sf,
    }
    if floor_ratio > floor_tol:
        out["floor_degraded"] = True
        print(
            f"# WARNING: floor_degraded — scheduling floor {floor_ratio:.2f}x "
            "the reference after retries; wall numbers overstate query cost",
            file=sys.stderr,
        )
    if scale > 1:
        # scale mode is self-describing and never ratio'd: the recorded
        # DuckDB basis is 1x, the data is N x.
        out["scale"] = scale
        out["base_sf_dir"] = base_sf_dir
    basis_total = sum(base_q.get(n, 0.0) for n in timings)
    if missing or not same_sf or basis_total <= 0 or scale > 1:
        # basis_total == 0 happens only for BENCH_ONLY subsets whose every
        # member has a ~free DuckDB basis (e.g. a constant-SELECT oracle):
        # a ratio over a zero basis is undefined, not infinite (round 16 —
        # this was a ZeroDivisionError).
        # ADVICE r16: an empty timings dict (no queries ran, e.g. a
        # BENCH_ONLY filter matching nothing) is reported as such rather
        # than as a "zero basis".
        out["baseline_missing"] = (
            f"scale={scale}x data; 1x DuckDB basis not comparable"
            if scale > 1
            else missing
            if missing
            else f"baseline is sf={baseline.get('sf')}"
            if not same_sf
            else ("no queries ran" if not timings else "zero basis")
        )
        print(f"# WARNING: no ratios — baseline mismatch: {out['baseline_missing']}", file=sys.stderr)
    else:
        basis = round(sum(base_q[n] for n in timings), 3)
        out["baseline_duckdb_sec"] = basis
        out["ratio_raw"] = round(total / basis, 3)
        out["ratio_floor_normalized"] = round(total * floor_scale / basis, 3)
        # Outlier-robust suite ratio (VERDICT r9 item 2): drop the single
        # largest DuckDB-basis row from BOTH sides so the headline never
        # hinges on one oracle-hostile query (r9: dedup_cluster_canonical
        # was 69 % of the basis).
        if len(timings) > 1:
            top = max(timings, key=lambda n: base_q[n])
            basis1 = basis - base_q[top]
            total1 = total - timings[top]
            out["excl_top1"] = top
            out["ratio_raw_excl_top1"] = round(total1 / max(basis1, 1e-9), 3)
            out["ratio_floor_normalized_excl_top1"] = round(
                total1 * floor_scale / max(basis1, 1e-9), 3
            )
        # queries_prev retired round 14 as promised (dual-basis reporting
        # ran rounds 12-13; the r12 basis is the only one quoted now)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
