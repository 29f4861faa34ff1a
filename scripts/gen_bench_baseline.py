"""Re-measure the per-query DuckDB bench basis on the CURRENT host
(round 12, VERDICT r11 ask 8: bench_baseline.json documented rounds-5-9
host floors; re-measure min-of-5 on a clean floor and record both bases
side by side so ratio history stays interpretable).

For every query in bench.py's HEADLINE set, runs its registry ORACLE SQL
in an in-process DuckDB over the same sf parquet (views pre-registered),
min-of-N wall seconds, exactly the basis bench.py divides by. The previous
basis moves to ``queries_prev`` with its provenance string — bench.py keeps
reading ``queries``/``ref_calib``.

Run EXCLUSIVELY (no concurrent pytest/bench — a loaded box inflates both
engines ~50%): python scripts/gen_bench_baseline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(os.environ.get("BENCH_RUNS", "5"))


def main() -> None:
    import duckdb

    from bench import HEADLINE
    from duckdb_parachute_spark.workload import load_all

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    qs = load_all()
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "bench_baseline.json")
    old = json.load(open(path))
    new_q: dict[str, float] = {}
    for name in HEADLINE:
        oracle = qs[name].oracle
        if oracle is None:
            print(f"# {name}: NO ORACLE — keeping old basis row", file=sys.stderr)
            if name in old.get("queries", {}):
                new_q[name] = old["queries"][name]
            continue
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.sql(oracle).fetchall()
            best = min(best, time.perf_counter() - t0)
        new_q[name] = round(best, 3)
        print(f"# {name}: {new_q[name]:.3f}s", file=sys.stderr)
    out = {
        "sf": old["sf"],
        "source": (
            "DuckDB wheel in-process over the same sf0.1 parquet, min-of-"
            f"{RUNS} per query, re-measured round 12 on the current host "
            "(VERDICT r11 ask 8). Previous basis preserved in queries_prev."
        ),
        "ref_calib": old["ref_calib"],
        "queries": new_q,
        "queries_prev": old.get("queries", {}),
        "queries_prev_source": old.get("source", ""),
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    tot_new = sum(new_q.values())
    tot_old = sum(old["queries"].get(n, 0) for n in new_q)
    print(f"# total basis: old {tot_old:.3f}s -> new {tot_new:.3f}s", file=sys.stderr)
    print(json.dumps({"total_new": round(tot_new, 3), "total_old": round(tot_old, 3)}))


if __name__ == "__main__":
    main()
