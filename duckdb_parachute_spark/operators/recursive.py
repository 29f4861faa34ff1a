"""Recursive CTE: WITH RECURSIVE fixpoint evaluation.

Reference: PhysicalRecursiveCTE (src/execution/operator/set/
physical_recursive_cte.cpp — iterate the recursive half against the working
table until no new rows; UNION dedups against all prior rows, UNION ALL keeps
everything). Spark has no native recursion (SURVEY §2.8) → driver-side loop,
each iteration a distributed job; localCheckpoint() truncates the growing
lineage so plan size stays O(1) per iteration instead of O(iterations).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def recursive_cte(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    union_all: bool = False,
    max_iterations: int = 100,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Evaluate WITH RECURSIVE: base UNION [ALL] step(working) to fixpoint.

    `step` receives the previous iteration's *delta* (UNION semantics: only
    rows not seen before; UNION ALL: the full previous iteration output) and
    returns the next iteration's candidate rows. Terminates when an iteration
    yields no (new) rows; raises after max_iterations (the reference loops
    forever — a safeguard is strictly better at cluster scale).
    """
    acc = base
    working = base
    for i in range(max_iterations):
        nxt = step(working)
        if not union_all:
            # Two-stage dedup: most regenerated rows come from the previous
            # delta (a graph step's back-edges), so dedup against the SMALL
            # previous delta first — the expensive full-history exceptAll
            # then runs on a much smaller left side. The acc-wide pass stays
            # O(|acc|) per iteration (exact UNION semantics require it; the
            # reference pays the same via its working-table hash lookup),
            # with lineage bounded by the periodic checkpoint below.
            nxt = nxt.distinct().exceptAll(working).exceptAll(acc)
        # The delta is consumed three times (emptiness probe, accumulator
        # union, next step); an eager localCheckpoint materializes it once and
        # cuts the lineage — without it every iteration recomputes the whole
        # chain and the loop goes quadratic.
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            return acc if union_all else acc.distinct()
        acc = acc.unionAll(nxt)
        if (i + 1) % checkpoint_every == 0:
            # The accumulator's union tree also grows once per iteration;
            # truncate it periodically (it can be large, so not every round).
            acc = acc.localCheckpoint(eager=True)
        working = nxt
    raise RuntimeError(f"recursive_cte did not converge in {max_iterations} iterations")
