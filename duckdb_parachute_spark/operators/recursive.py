"""Recursive CTE: WITH RECURSIVE fixpoint evaluation.

Reference: PhysicalRecursiveCTE (src/execution/operator/set/
physical_recursive_cte.cpp — iterate the recursive half against the working
table until no new rows; UNION dedups against all prior rows, UNION ALL keeps
everything). Spark has no native recursion (SURVEY §2.8) → driver-side loop,
each iteration a distributed job; localCheckpoint() truncates the growing
lineage so plan size stays O(1) per iteration instead of O(iterations).

UNION-mode history check (round 6): exact UNION semantics need a
full-history membership test every iteration (the reference pays the same
via its working-table hash lookup), but the expensive part — shuffling the
whole accumulated history through exceptAll — is now gated behind a
row-hash SEMI-JOIN prefilter: the accumulator is first semi-joined to the
(delta-sized, usually broadcast) distinct xxhash64 set of this iteration's
candidates, so only history rows whose hash collides with a candidate ever
reach the exceptAll exchange. This is a runtime bloom expressed in
relational algebra — and unlike a real bloom it is EXACT: dropping history
rows with no candidate hash match cannot change the except result, so
correctness never depends on a false-positive rate. Per-iteration exchange
cost drops from O(|acc|) to O(|collisions|) ~= O(|delta|); the remaining
O(|acc|) work is a map-side scan. (Spark exposes no bloom_filter_agg in
the public function registry, so the semi-join is also the only
no-driver-collect spelling available.)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_hash(df: DataFrame) -> Column:
    """One xxhash64 per row over all columns — both the prefilter's build
    and probe sides hash the same way, so they can never disagree."""
    return F.xxhash64(F.struct(*[F.col(c) for c in df.columns]))


def _prefilter_history(acc: DataFrame, cand: DataFrame) -> DataFrame:
    """The history rows that can possibly affect ``cand.exceptAll(history)``:
    semi-join the accumulator to the candidates' distinct row-hash set.
    EXACT (not a bloom): a history row whose full-row hash matches no
    candidate hash cannot equal any candidate, so dropping it cannot change
    the except result. Output size is O(|hash collisions|) ~= O(|cand|)
    regardless of |acc| — the structural invariant pinned by
    test_recursive_prefilter_is_delta_sized.

    No forced broadcast hint: early iterations can carry a large delta, and
    AQE converts the semi-join to broadcast at runtime exactly when the hash
    set is actually small (the usual case in deep recursions) — the same
    gated posture as catalog.maybe_broadcast."""
    cand_hashes = cand.select(_row_hash(cand).alias("__rh")).distinct()
    return acc.join(cand_hashes, _row_hash(acc) == F.col("__rh"), "left_semi")


def recursive_cte(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    union_all: bool = False,
    max_iterations: int = 1000,
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
            # previous delta first. The full-history check then runs against
            # only the accumulator rows whose row-hash matches a candidate
            # (semi-join prefilter, see module docstring) — exact, and the
            # exceptAll exchange sees O(|delta|) rows instead of O(|acc|).
            cand = nxt.distinct().exceptAll(working)
            nxt = cand.exceptAll(_prefilter_history(acc, cand))
        # The delta is consumed several times (emptiness probe, accumulator
        # union, next step); a localCheckpoint materializes it once and cuts
        # the lineage — without it every iteration recomputes the whole chain
        # and the loop goes quadratic. LAZY checkpoint + count() probe
        # (round 8): the plan is truncated immediately, and the emptiness
        # probe is a count() whose single job materializes every checkpoint
        # partition as a side effect — one scheduled job per iteration
        # instead of two (eager-checkpoint + isEmpty), saving a driver
        # scheduling floor per iteration. count() (not isEmpty/take(1),
        # whose partition-escalation can schedule several jobs on sparse
        # deltas) guarantees full materialization in that one job.
        nxt = nxt.localCheckpoint(eager=False)
        if nxt.count() == 0:
            return acc if union_all else acc.distinct()
        acc = acc.unionAll(nxt)
        if (i + 1) % checkpoint_every == 0:
            # The accumulator's union tree also grows once per iteration;
            # truncate it periodically (it can be large, so not every round).
            # unionAll CONCATENATES partition lists, so acc's partition count
            # would also grow by |delta partitions| per iteration — coalesce
            # (narrow, no shuffle) before the checkpoint to keep every later
            # acc scan at a bounded task count.
            n_part = int(acc.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
            # Lazy for the same one-job-per-iteration reason as the delta
            # checkpoint above: the next iteration's prefilter semi-join is
            # the first consumer and materializes it in its own job.
            acc = acc.coalesce(n_part).localCheckpoint(eager=False)
        working = nxt
    raise RuntimeError(f"recursive_cte did not converge in {max_iterations} iterations")
