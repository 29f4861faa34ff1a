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


def _truncate(df: DataFrame, reliable: bool, eager: bool = False) -> DataFrame:
    """Cut lineage: localCheckpoint (fast, executor-local blocks) or, with
    ``reliable=True``, a real checkpoint() against the configured checkpoint
    dir. Tradeoff table:

    ==============  =====================  ================================
    mode            cost per truncation    failure behavior at cluster scale
    ==============  =====================  ================================
    local (default) memory/disk block      losing ONE executor loses its
                    write, no extra job    blocks — the job is unrecoverable
                                           (fine for interactive/local runs)
    reliable=True   full write to the      blocks live in shared storage;
                    checkpoint dir (HDFS/  executor loss just recomputes the
                    S3), one extra scan    lost TASKS — survives preemption
    ==============  =====================  ================================
    """
    if reliable:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise ValueError(
                "reliable=True needs a checkpoint dir: call "
                "spark.sparkContext.setCheckpointDir('<shared path>') first"
            )
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def recursive_cte(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    union_all: bool = False,
    max_iterations: int = 1000,
    checkpoint_every: int = 4,
    reliable: bool = False,
) -> DataFrame:
    """Evaluate WITH RECURSIVE: base UNION [ALL] step(working) to fixpoint.

    `step` receives the previous iteration's *delta* (UNION semantics: only
    rows not seen before; UNION ALL: the full previous iteration output) and
    returns the next iteration's candidate rows. Terminates when an iteration
    yields no (new) rows; raises after max_iterations steps (the reference
    loops forever — a safeguard is strictly better at cluster scale).

    ``reliable=True`` routes every lineage truncation through a real
    ``checkpoint()`` (shared-storage blocks, survives executor loss) instead
    of ``localCheckpoint()`` — see _truncate's tradeoff table. Default stays
    local: interactive/bench runs don't pay the storage round-trip.

    Round 9: the loop is UNROLLED two steps per driver round. Each recursion
    step is data-tiny but pays a fixed driver scheduling floor (job submit +
    result fetch); evaluating step(working) AND step(delta1) before a single
    combined emptiness probe (one tagged-union count job materializing both
    lazy checkpoints) halves the number of driver rounds — the dominant cost
    of deep recursions on every host (constant in data size, so this is pure
    floor elimination). UNION dedup is unaffected: each candidate batch is
    still checked against the full accumulated history (delta2's history =
    acc ∪ delta1, expressed as exceptAll(delta1) + the exact semi-join
    prefilter over acc). Fixpoint semantics are preserved exactly: if delta1
    is empty, delta2 — even if step() of an empty frame were to emit rows —
    is discarded, same as the rolled loop which never evaluates past an
    empty delta.
    """
    spark = base.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def _dedup(nxt: DataFrame, prev_delta: DataFrame, history: DataFrame) -> DataFrame:
        # Two-stage dedup: most regenerated rows come from the previous
        # delta (a graph step's back-edges), so dedup against the SMALL
        # previous delta first. The full-history check then runs against
        # only the history rows whose row-hash matches a candidate
        # (semi-join prefilter, see module docstring) — exact, and the
        # exceptAll exchange sees O(|delta|) rows instead of O(|acc|).
        cand = nxt.distinct().exceptAll(prev_delta)
        return cand.exceptAll(_prefilter_history(history, cand))

    def _finish(acc: DataFrame) -> DataFrame:
        return acc if union_all else acc.distinct()

    acc = base
    working = base
    steps_done = 0
    pairs_done = 0
    # Truncate the accumulator every ~checkpoint_every STEPS (unionAll
    # concatenates partition lists, so acc's partition count grows per step;
    # coalesce — narrow, no shuffle — bounds later scan task counts).
    acc_ckpt_pairs = max(1, checkpoint_every // 2)
    while steps_done < max_iterations:
        # Deltas are consumed several times (emptiness probe, accumulator
        # union, next step); a LAZY checkpoint truncates the plan immediately
        # and the probe job materializes the blocks as a side effect —
        # without truncation every round recomputes the whole chain and the
        # loop goes quadratic.
        nxt1 = step(working)
        d1 = nxt1 if union_all else _dedup(nxt1, working, acc)
        d1 = _truncate(d1, reliable)
        if steps_done + 1 >= max_iterations:
            # Odd tail: no budget for a second step — probe d1 alone.
            if d1.count() == 0:
                return _finish(acc)
            acc = acc.unionAll(d1)
            steps_done += 1
            working = d1
            continue  # while-guard fails → RuntimeError below
        nxt2 = step(d1)
        d2 = nxt2 if union_all else _dedup(nxt2, d1, acc)
        d2 = _truncate(d2, reliable)
        # ONE probe job for both deltas: a tagged union groupBy-count
        # computes every partition of both lazy checkpoints (count() — not
        # isEmpty/take(1), whose partition-escalation can schedule several
        # jobs on sparse deltas — guarantees full materialization).
        counts = {
            r["__t"]: r["count"]
            for r in d1.select(F.lit(1).alias("__t"))
            .unionAll(d2.select(F.lit(2).alias("__t")))
            .groupBy("__t")
            .count()
            .collect()
        }
        if counts.get(1, 0) == 0:
            return _finish(acc)
        if counts.get(2, 0) == 0:
            return _finish(acc.unionAll(d1))
        acc = acc.unionAll(d1).unionAll(d2)
        working = d2
        steps_done += 2
        pairs_done += 1
        if pairs_done % acc_ckpt_pairs == 0:
            # Lazy for the same one-job-per-round reason as the delta
            # checkpoints: the next round's prefilter semi-join is the
            # first consumer and materializes it in its own job.
            acc = _truncate(acc.coalesce(n_part), reliable)
    raise RuntimeError(f"recursive_cte did not converge in {max_iterations} iterations")
