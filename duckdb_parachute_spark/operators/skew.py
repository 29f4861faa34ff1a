"""Skew-handling join: key salting for hot keys (SURVEY §4.2 scale posture).

AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles moderate skew
at runtime; salting is the explicit, plan-level tool for pathological hot keys
(e.g. a null-ish default key holding 10% of 100 TB). Strategy: replicate the
small side's hot-key rows SALT ways, scatter the big side's hot-key rows with
a random salt in [0, SALT), then equi-join on (key, salt) — hot partitions
shrink by the salt factor while non-hot keys join on salt 0 with no overhead.

The reference has no counterpart (single-node shared-memory radix partitioning
does not suffer executor-level skew); this is Spark-native scale engineering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    hot_keys: list | None = None,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join `big` ⋈ `small` on column `on`, salting the given hot keys.

    hot_keys: the skewed key values (detected upstream, e.g. via an
    approx-frequency pass: big.groupBy(on).count() top-N). None salts every
    key (uniform scatter — correct, costs |small|·salt replication).
    Deterministic scatter: salt = pmod(hash(whole row id-ish cols), salt) —
    we use a random-free hash of all big-side columns so results stay
    reproducible run to run."""
    if hot_keys is None:
        hot = F.lit(True)
    else:
        hot = F.col(on).isin(hot_keys)

    big_salted = big.withColumn(
        "__salt",
        F.when(hot, F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt))).otherwise(F.lit(0)),
    )
    salts = F.when(hot, F.sequence(F.lit(0), F.lit(salt - 1))).otherwise(F.array(F.lit(0)))
    small_replicated = small.withColumn("__salt", F.explode(salts))
    out = big_salted.join(small_replicated, [on, "__salt"], how)
    return out.drop("__salt")
