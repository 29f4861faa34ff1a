"""Hub-skew posture check for connected_components (round 17, VERDICT r16
next #5).

Round 16 rewrote the star steps' min-of-neighborhood from groupBy+join-back
to `min over (partition by u)` — one exchange instead of two, but the
window buffers each node's whole bidirected neighborhood in ONE WindowExec
partition with no map-side combine. A viral near-dup hub (one node in
millions of pairs) is the worst case: its neighborhood lands in one task.

This script measures exactly that: a single hub of degree N through
connected_components vs a uniform-degree edge set of the SAME size and the
same round count (disjoint 3-node paths — both converge in one star round
+ probe). Pass bar (VERDICT): hub within 2x of uniform.

Usage: python scripts/cc_skew_measure.py [hub_degree] (default 2_000_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000


def main() -> None:
    from pyspark.sql import functions as F

    from duckdb_parachute_spark import get_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_session(app_name="cc-skew", master=f"local[{cpus}]")
    # import AFTER the session exists: components.py builds a module-level
    # Window spec, which needs an active session
    from duckdb_parachute_spark.dedup.components import connected_components
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # hub: node 0 paired with N distinct larger ids -> one window partition
    # of N rows in the first large-star round (u=0's bidirected neighborhood)
    hub = spark.range(1, N + 1).select(
        F.lit(0).cast("long").alias("id1"), F.col("id").alias("id2")
    )
    # uniform: N/2 disjoint 3-node paths (3k, 3k+1), (3k+1, 3k+2) — same
    # total edge count, max degree 2, converges in one star round too
    k = spark.range(0, N // 2)
    uniform = (
        k.select((F.col("id") * 3).alias("id1"), (F.col("id") * 3 + 1).alias("id2"))
        .unionAll(
            k.select((F.col("id") * 3 + 1).alias("id1"), (F.col("id") * 3 + 2).alias("id2"))
        )
    )

    def timed(tag, pairs, expect_components):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            cc = connected_components(pairs, "id1", "id2")
            ncomp = cc.select("component").distinct().count()
            best = min(best, time.perf_counter() - t0)
            assert ncomp == expect_components, (tag, ncomp, expect_components)
        print(f"{tag}: best3={best:.3f}s components={ncomp}")
        return best

    t_uniform = timed("uniform (paths)", uniform, N // 2)
    t_hub = timed(f"hub (degree {N})", hub, 1)
    print(f"hub/uniform = {t_hub / t_uniform:.2f}x (pass bar: <= 2x)")


if __name__ == "__main__":
    main()
