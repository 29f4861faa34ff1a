"""Deletion-vector decode at its design point (round 14, VERDICT r13 next #3).

src_delta_scan_dv_colmap proves the DISTRIBUTED DV path correct at sf0.01;
this script measures it where it exists for: a deletion vector whose
cardinality exceeds what any driver should collect. It synthesizes a Delta
table whose files carry roaring DVs (the real on-disk format — CRC frames,
portable roaring64 — via sources.deltadv's writer), then times the full
scan (decode + anti-join + aggregate) at 1x and FACTOR x with the driver
path DISABLED (dv_driver_limit=0), so every timing is the executor-side
mapInPandas decode + shuffle anti-join.

    1x      : 1 M rows across 4 files, 300 K deleted
    FACTOR x: FACTOR M rows across 4*FACTOR files, FACTOR*0.3 M deleted
              (default FACTOR=100 -> 100 M rows, 30 M deleted — the
              multi-10M-row DV the driver limit exists for)

Per-file row counts stay constant (256 K) so the scale-up grows the FILE
COUNT and the TOTAL DV cardinality — exactly how bulk DELETEs on a 100 TB
training table scale — while each executor task stays one descriptor.

No DuckDB basis: the in-process duckdb wheel cannot LOAD the delta
extension offline, and the reference reads DVs through delta-kernel-rs;
the claim under test is OURS (wall grows ~linearly with data while the
driver holds only descriptors). Prints a markdown table for BASELINE.md.

Usage: python scripts/dv_scale_measure.py [FACTOR]   (default 100)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 100
BASE_FILES = 4
ROWS_PER_FILE = 256_000
DELETE_FRACTION = 0.3
OUT_ROOT = "/tmp/parachute_dv_scale"


def build_table(spark, root: str, n_files: int) -> int:
    """Delta table: n_files parquet files of ROWS_PER_FILE rows each, every
    file carrying an on-disk roaring DV deleting a strided 30% of its rows
    (strided, not contiguous — array AND bitmap containers both appear)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_parachute_spark.sources.deltadv import write_dv_file

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "_delta_log"))
    # deleted row indexes: every index with idx % 10 < 3 (known
    # arithmetically — no driver collect even at build time)
    local = np.arange(ROWS_PER_FILE, dtype=np.int64)
    deleted_local = local[local % 10 < 3]
    adds = []
    for i in range(n_files):
        base = i * ROWS_PER_FILE
        tbl = pa.table({
            "id": pa.array(local + base, type=pa.int64()),
            "val": pa.array(((local + base) % 997).astype("float64")),
        })
        rel = f"f{i:05d}.parquet"
        pq.write_table(tbl, os.path.join(root, rel))
        dv = write_dv_file(root, deleted_local.tolist(), prefix="ab")
        adds.append((rel, dv))
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"]}}) + "\n")
        f.write(json.dumps({"metaData": {"id": "dv-scale", "configuration": {
            "delta.enableDeletionVectors": "true"}}}) + "\n")
        for rel, dv in adds:
            f.write(json.dumps({"add": {
                "path": rel, "partitionValues": {}, "deletionVector": dv}}) + "\n")
    return len(deleted_local) * n_files


def time_scan(spark, root: str, runs: int = 3) -> tuple[float, int]:
    from pyspark.sql import functions as F

    from duckdb_parachute_spark.sources import delta_scan

    def force():
        df = delta_scan(spark, root, dv_driver_limit=0)
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("id", "val")).alias("h"),
        ).collect()[0]

    row = force()  # warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        force()
        best = min(best, time.perf_counter() - t0)
    return best, row["n"]


def main() -> None:
    from duckdb_parachute_spark import get_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_session(app_name="parachute-dv-scale", master=f"local[{cpus}]")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rows_out = []
    for tag, n_files in [("1x", BASE_FILES), (f"{FACTOR}x", BASE_FILES * FACTOR)]:
        root = os.path.join(OUT_ROOT, tag)
        t0 = time.perf_counter()
        n_deleted = build_table(spark, root, n_files)
        build_s = time.perf_counter() - t0
        total = n_files * ROWS_PER_FILE
        wall, surviving = time_scan(spark, root)
        expect = total - n_deleted
        ok = "OK" if surviving == expect else f"MISMATCH(expect {expect})"
        print(f"# {tag}: files={n_files} rows={total:,} dv_cardinality="
              f"{n_deleted:,} surviving={surviving:,} {ok} "
              f"(build {build_s:.1f}s)", file=sys.stderr)
        rows_out.append((tag, total, n_deleted, wall, surviving == expect))

    print("\n| scale | rows | DV cardinality | scan+decode wall | rows/s |")
    print("|---|---|---|---|---|")
    for tag, total, ndel, wall, ok in rows_out:
        flag = "" if ok else " **WRONG COUNT**"
        print(f"| {tag} | {total:,} | {ndel:,} | {wall:.3f}s{flag} "
              f"| {total / wall / 1e6:.1f} M/s |")
    (t1, n1, d1, w1, _), (tN, nN, dN, wN, _) = rows_out
    print(f"\nwall grows {wN / w1:.1f}x across {nN / n1:.0f}x data "
          f"({dN / d1:.0f}x DV cardinality); driver holds descriptors only "
          f"(dv_driver_limit=0 forces the executor mapInPandas decode).")
    spark.stop()


if __name__ == "__main__":
    main()
