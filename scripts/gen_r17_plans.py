"""Round-17 optimization evidence: .explain("formatted") snapshots.

Writes plans/r17/<query>_<phase>.txt for the queries this optimization
round measures/touches, where <phase> is "before" or "after" (argv[1],
default "before"). The bench session confs (scaled shuffle partitions,
data-scaled AQE) are mirrored so the snapshot is the plan the bench
actually times.

Usage: python scripts/gen_r17_plans.py [before|after] [sf_dir] [q1,q2,...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: The round-17 working set: every query named by VERDICT r16's "next round"
#: list plus any the round ends up touching. Headline queries keep their r16
#: snapshots as the before-evidence; these are the non-headline targets.
DEFAULT_QUERIES = [
    "dedup_semantic_probes",
    "dedup_semantic_pairs",
    "string_metric_suite",
    "dialect_holistic_agg",
    "dialect_holistic_approx",
    "tpcds_q34_bulk_order_customers",
    "tpcds_q83_return_share_triple",
]


def main() -> None:
    phase = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = (
        [s for s in sys.argv[3].split(",") if s]
        if len(sys.argv) > 3
        else DEFAULT_QUERIES
    )

    from duckdb_parachute_spark import get_session
    from duckdb_parachute_spark.plans import plan_stats
    from duckdb_parachute_spark.session import (
        scaled_adaptive,
        scaled_shuffle_partitions,
    )
    from duckdb_parachute_spark.workload import load_all

    spark = get_session(
        app_name="r17-plan-snapshot",
        shuffle_partitions=scaled_shuffle_partitions(sf_dir),
        extra_conf={"spark.sql.adaptive.enabled": scaled_adaptive(sf_dir)},
    )
    qs = load_all()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17"
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        s = plan_stats(qs[name].fn(spark, sf_dir))
        path = os.path.join(out_dir, f"{name}_{phase}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} — {phase} (round 17), sf_dir={sf_dir}\n"
                f"# shuffles={s.shuffles} broadcasts={s.broadcasts} "
                f"scans={s.scans} pushed_filters={s.pushed_filters} "
                f"read_columns={s.read_columns} codegen_spans={s.codegen_spans}\n\n"
            )
            f.write(s.text)
        print(f"{name}: shuffles={s.shuffles} broadcasts={s.broadcasts} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
