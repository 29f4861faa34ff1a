"""Reproduce the CORRECTNESS_r01 failures locally, mimicking the driver:
sort rows on RAW cell values (crashes on ndarray cells) before hashing."""
import sys

sys.path.insert(0, "/root/repo")

from duckdb_parachute_spark.session import get_session as get_spark  # noqa: E402
from duckdb_parachute_spark.testkit import OracleSession, compare_frames  # noqa: E402
from duckdb_parachute_spark.workload import load_all  # noqa: E402

SF = "/root/testdata/sf0.01"
NAMES = sys.argv[1:] or [
    "agg_rollup",
    "agg_cube",
    "agg_list_collect",
    "dialect_exclude_brackets",
    "join_range_inequality",
    "dedup_simhash_clusters",
]

spark = get_spark()
qs = load_all()
oracle = OracleSession(SF)
for name in NAMES:
    qd = qs[name]
    spdf = qd.fn(spark, SF).toPandas()
    # driver-mimic: raw sort before normalize — crashes on ndarray cells
    for pdf, side in ((spdf, "spark"),):
        try:
            pdf[sorted(pdf.columns)].sort_values(by=sorted(pdf.columns), kind="mergesort")
        except Exception as e:  # noqa: BLE001
            print(f"[{name}] {side} RAW-SORT CRASH: {type(e).__name__}: {e}")
    if qd.oracle is None:
        print(f"[{name}] rows-only: spark={len(spdf)}")
        continue
    opdf = oracle.sql(qd.oracle)
    try:
        opdf[sorted(opdf.columns)].sort_values(by=sorted(opdf.columns), kind="mergesort")
    except Exception as e:  # noqa: BLE001
        print(f"[{name}] oracle RAW-SORT CRASH: {type(e).__name__}: {e}")
    print(compare_frames(name, spdf, opdf))
