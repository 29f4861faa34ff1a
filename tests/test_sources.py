"""Sources/sinks + multimodal plumbing + Relation API tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from duckdb_parachute_spark.catalog import load_table
from duckdb_parachute_spark.multimodal import decode_assets, frame_sample
from duckdb_parachute_spark.relation import Relation
from duckdb_parachute_spark.sources import (
    copy_to,
    read_blob,
    read_csv_auto,
    read_json_auto,
    read_text,
)

TMP = "/root/repo/.tmp"


@pytest.fixture(scope="module", autouse=True)
def tmpdir():
    os.makedirs(TMP, exist_ok=True)
    return TMP


def test_csv_roundtrip_with_inference(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    path = f"{TMP}/nation_csv"
    copy_to(nation, path, fmt="csv", header=True)
    back = read_csv_auto(spark, path)
    assert back.count() == nation.count()
    assert dict(back.dtypes)["n_nationkey"] == "int"  # inference worked


def test_csv_rejects_malformed(spark):
    path = f"{TMP}/bad.csv"
    with open(path, "w") as f:
        f.write("a,b\n1,2\nnot_an_int,3\n4,5\n")
    df = read_csv_auto(spark, path, schema="a int, b int, _rejected_record string", inferSchema=False)
    rows = df.collect()
    rejected = [r for r in rows if r["_rejected_record"] is not None]
    assert len(rejected) == 1 and "not_an_int" in rejected[0]["_rejected_record"]


def test_json_roundtrip(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").limit(100)
    path = f"{TMP}/events_json"
    copy_to(ev.withColumn("ts", F.col("ts").cast("string")), path, fmt="json")
    back = read_json_auto(spark, path)
    assert back.count() == 100
    assert "event_type" in back.columns


def test_partitioned_write_prunes(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    path = f"{TMP}/orders_part"
    copy_to(orders, path, fmt="parquet", partition_by=["o_orderstatus"])
    assert os.path.isdir(f"{path}/o_orderstatus=F")  # hive layout
    pruned = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    plan = pruned.explain_string() if hasattr(pruned, "explain_string") else pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == orders.where(F.col("o_orderstatus") == "F").count()


def test_read_text_and_blob(spark):
    path = f"{TMP}/blobdir"
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/f1.bin", "wb") as f:
        f.write(b"hello parachute")
    blobs = read_blob(spark, path)
    row = blobs.head()
    assert bytes(row["content"]) == b"hello parachute"
    txt = read_text(spark, f"{path}/f1.bin", whole_file=True)
    assert txt.head()["value"] == "hello parachute"


def test_multimodal_decode_plumbing(spark):
    path = f"{TMP}/assets"
    os.makedirs(path, exist_ok=True)
    for i in range(4):
        with open(f"{path}/img{i}.bin", "wb") as f:
            f.write(bytes([i * 7 % 251] * (100 + i)))
    decoded = decode_assets(read_blob(spark, path), modality="image")
    rows = decoded.collect()
    assert len(rows) == 4
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(r["n_bytes"] >= 100 for r in rows)
    sampled = frame_sample(decoded.withColumn("n_frames", F.lit(4)), every_nth=2)
    assert sampled.count() == 8  # 4 assets × frames {0, 2}


def test_relation_api_chain(spark, sf_dir):
    li = Relation(load_table(spark, sf_dir, "lineitem"))
    out = (
        li.filter("l_quantity > 10")
        .aggregate("count(*) AS n, round(sum(l_extendedprice), 2) AS total", "l_returnflag")
        .order("l_returnflag")
        .to_df()
    )
    assert list(out.columns) == ["l_returnflag", "n", "total"]
    assert out["n"].sum() > 0


def test_relation_join_and_shortcuts(spark, sf_dir):
    n = Relation(load_table(spark, sf_dir, "nation"))
    r = Relation(load_table(spark, sf_dir, "region"))
    joined = n.join(r, "n_regionkey = r_regionkey").value_counts("r_name")
    rows = joined.fetchall()
    assert sum(x["count"] for x in rows) == 25
    top = Relation(load_table(spark, sf_dir, "orders")).max("o_totalprice").fetchone()
    assert top["max_o_totalprice"] > 0


def test_relation_map_pandas(spark):
    rel = Relation(spark.range(10).withColumnRenamed("id", "x"))

    def double_batches(it):
        for pdf in it:
            pdf["x"] = pdf["x"] * 2
            yield pdf

    out = rel.map(double_batches, "x bigint").fetchall()
    assert sorted(r["x"] for r in out) == [i * 2 for i in range(10)]


def test_export_import_database_roundtrip(spark, sf_dir, tmpdir):
    from duckdb_parachute_spark.sources import export_database, import_database

    tables = {n: load_table(spark, sf_dir, n) for n in ["region", "nation"]}
    out = f"{TMP}/exported_db"
    export_database(spark, tables, out)
    back = import_database(spark, out)
    assert set(back) == {"region", "nation"}
    for n in back:
        assert back[n].schema == tables[n].schema
        assert back[n].count() == tables[n].count()
    assert spark.table("nation").count() == tables["nation"].count()


def test_dml_rewrites(spark, sf_dir):
    from duckdb_parachute_spark.operators.dml import delete_where, insert_into, update_set

    n = load_table(spark, sf_dir, "nation")
    deleted = delete_where(n, F.col("n_regionkey") == 0)
    assert deleted.where(F.col("n_regionkey") == 0).count() == 0
    assert deleted.count() == n.count() - n.where("n_regionkey = 0").count()

    updated = update_set(n, F.col("n_nationkey") == 3, {"n_name": F.lit("RENAMED")})
    assert updated.where("n_name = 'RENAMED'").count() == 1
    assert updated.count() == n.count()

    # SQL UPDATE is all-at-once: SET a=b, b=a must swap, every RHS reading
    # the pre-update row (reference physical_update.cpp binds before writing)
    swap = spark.createDataFrame([(10, 20)], "a int, b int")
    swapped = update_set(swap, F.lit(True), {"a": F.col("b"), "b": F.col("a")}).first()
    assert (swapped.a, swapped.b) == (20, 10)

    extra = spark.createDataFrame([(99, "X", 1)], "n_nationkey int, n_name string, n_regionkey int")
    assert insert_into(n.select("n_nationkey", "n_name", "n_regionkey"), extra).count() == n.count() + 1


def test_arrow_interchange_roundtrip(spark, sf_dir):
    # Arrow scan (reference src/function/table/arrow.cpp): pyarrow table ->
    # DataFrame -> pyarrow, values preserved (Arrow-backed conversion on).
    import pyarrow as pa

    nation = load_table(spark, sf_dir, "nation")
    tbl = pa.Table.from_pandas(nation.toPandas())
    df = spark.createDataFrame(tbl.to_pandas())
    assert df.count() == nation.count()
    back = pa.Table.from_pandas(df.toPandas())
    assert back.column("n_name").to_pylist() == tbl.column("n_name").to_pylist()


def test_sniff_csv(spark, tmp_path):
    from duckdb_parachute_spark.sources import sniff_csv

    p = str(tmp_path / "sniff.csv")
    with open(p, "w") as f:
        f.write("id;name;score\n1;alpha;1.5\n2;beta;2.25\n3;gamma;3.0\n")
    out = {r.column_name: r for r in sniff_csv(spark, p).collect()}
    assert set(out) == {"id", "name", "score"}
    assert all(r.delimiter == ";" and r.has_header for r in out.values())
    assert out["id"].column_type == "int"
    assert out["score"].column_type == "double"
    assert out["name"].column_type == "string"


def test_arrow_interchange_roundtrip(spark):
    import pyarrow as pa

    from duckdb_parachute_spark.sources import from_arrow, to_arrow

    t = pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "s": ["a", "b", None],
            "vec": pa.array([[1.0, 2.0], [3.0], None], pa.list_(pa.float32())),
        }
    )
    df = from_arrow(spark, t)
    assert dict(df.dtypes) == {"k": "bigint", "s": "string", "vec": "array<float>"}
    back = to_arrow(df.orderBy("k"))
    assert back.num_rows == 3
    assert back.column("k").to_pylist() == [1, 2, 3]
    assert back.column("s").to_pylist() == ["a", "b", None]
    assert back.column("vec").to_pylist()[0] == [1.0, 2.0]

    # RecordBatch / reader inputs bind too (arrow.cpp accepts all three)
    rb = t.to_batches()[0]
    assert from_arrow(spark, rb).count() == 3
    reader = pa.RecordBatchReader.from_batches(t.schema, t.to_batches())
    assert from_arrow(spark, reader).count() == 3


def test_copy_to_ordered_preserves_global_order(spark, tmp_path):
    from pyspark.sql import functions as F

    from duckdb_parachute_spark.sources import copy_to_ordered

    df = spark.range(0, 5000).select(
        (F.hash("id") % 10000).alias("k"), F.col("id").alias("payload")
    )
    out = str(tmp_path / "ordered_copy")
    copy_to_ordered(df, out, ["k", "payload"])

    back = spark.read.parquet(out).select(
        "k", "payload", F.input_file_name().alias("f")
    )
    rows = back.collect()
    # within each part file the rows are sorted, and the files hold disjoint
    # ranges in file-name order -> concatenation in name order is the global
    # sort (the reference's batch-index contract)
    by_file: dict[str, list] = {}
    for r in rows:
        by_file.setdefault(r.f, []).append((r.k, r.payload))
    names = sorted(by_file)
    concat = []
    for name in names:
        concat.extend(by_file[name])  # preserve within-file order? collect()
    # collect() does not guarantee within-file row order, so check the
    # invariants directly: each file internally covers a range disjoint from
    # and below the next file's range, and each file's rows sort-match
    prev_max = None
    for name in names:
        vals = by_file[name]
        lo, hi = min(vals), max(vals)
        if prev_max is not None:
            assert lo >= prev_max
        prev_max = hi
    # and the union equals the input exactly
    assert sorted(concat) == sorted((r.k, r.payload) for r in df.collect())


def test_attach_detach_database(spark, sf_dir):
    from duckdb_parachute_spark import sqlx
    from duckdb_parachute_spark.sources import detach_database

    got = sqlx.sql(spark, f"ATTACH '{sf_dir}' AS att_t")
    names = {r["attached_table"] for r in got.collect()}
    assert {"region", "nation", "customer"} <= names
    assert spark.sql("SELECT count(*) c FROM att_t.region").collect()[0]["c"] == 5
    # unmanaged: detach drops metadata, not files
    import os

    sqlx.sql(spark, "DETACH att_t")
    assert "att_t" not in [d.name for d in spark.catalog.listDatabases()]
    assert os.path.exists(os.path.join(sf_dir, "region.parquet"))
    detach_database(spark, "att_t")  # idempotent


def test_use_statement_with_attached_db(spark, sf_dir):
    from duckdb_parachute_spark import sqlx

    sqlx.sql(spark, f"ATTACH '{sf_dir}' AS use_db")
    try:
        sqlx.sql(spark, "USE use_db")
        assert spark.sql("SELECT count(*) c FROM region").collect()[0]["c"] == 5
    finally:
        spark.catalog.setCurrentDatabase("default")
        sqlx.sql(spark, "DETACH use_db")


def _delta_part(spark, df, root, rel):
    import glob as g
    import shutil
    import uuid as u

    tmp = os.path.join(root, ".tmp_" + u.uuid4().hex)
    df.coalesce(1).write.parquet(tmp)
    os.makedirs(os.path.dirname(os.path.join(root, rel)) or root, exist_ok=True)
    shutil.move(g.glob(os.path.join(tmp, "part-*.parquet"))[0], os.path.join(root, rel))
    shutil.rmtree(tmp)


def _delta_commit(root, version, actions):
    import json

    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def test_delta_scan_snapshot_and_time_travel(spark, tmp_path):
    from duckdb_parachute_spark.sources import delta_scan

    root = str(tmp_path / "dl")
    a = spark.range(0, 10).selectExpr("id", "id * 2 AS v")
    b = spark.range(10, 15).selectExpr("id", "id * 2 AS v")
    _delta_part(spark, a, root, "f1.parquet")
    _delta_part(spark, b, root, "f2.parquet")
    _delta_commit(root, 0, [
        {"protocol": {"minReaderVersion": 1}},
        {"metaData": {"id": "t"}},
        {"add": {"path": "f1.parquet", "partitionValues": {}, "dataChange": True}},
        {"add": {"path": "f2.parquet", "partitionValues": {}, "dataChange": True}},
    ])
    # v1: rewrite f1 without ids < 5 (a DELETE), classic remove+add
    a2 = a.where("id >= 5")
    _delta_part(spark, a2, root, "f1r.parquet")
    _delta_commit(root, 1, [
        {"remove": {"path": "f1.parquet", "dataChange": True}},
        {"add": {"path": "f1r.parquet", "partitionValues": {}, "dataChange": True}},
    ])
    assert sorted(r["id"] for r in delta_scan(spark, root).collect()) == list(range(5, 15))
    assert sorted(r["id"] for r in delta_scan(spark, root, version=0).collect()) == list(range(15))
    with pytest.raises(FileNotFoundError):
        delta_scan(spark, root, version=7)


def test_delta_scan_partitions_and_guards(spark, tmp_path):
    from duckdb_parachute_spark.sources import delta_scan

    root = str(tmp_path / "dlp")
    a = spark.range(3).selectExpr("id")
    _delta_part(spark, a, root, "y=2020/p1.parquet")
    _delta_part(spark, a, root, "y=2021/p2.parquet")
    _delta_commit(root, 0, [
        {"add": {"path": "y=2020/p1.parquet", "partitionValues": {"y": "2020"}}},
        {"add": {"path": "y=2021/p2.parquet", "partitionValues": {"y": "2021"}}},
    ])
    rows = delta_scan(spark, root).groupBy("y").count().collect()
    assert {(r["y"], r["count"]) for r in rows} == {("2020", 3), ("2021", 3)}
    # malformed v3 protocol (no readerFeatures list) stays rejected
    root2 = str(tmp_path / "dlv")
    _delta_part(spark, a, root2, "f.parquet")
    _delta_commit(root2, 0, [
        {"protocol": {"minReaderVersion": 3}},
        {"add": {"path": "f.parquet", "partitionValues": {}}},
    ])
    with pytest.raises(NotImplementedError, match="not supported"):
        delta_scan(spark, root2)


def test_delta_scan_tolerates_compaction_sidecars(spark, tmp_path):
    # review finding: compaction/v2-checkpoint .json files crashed int();
    # they must be ignored (plain commits alongside stay readable), and a
    # genuinely MISSING commit must raise the documented NotImplementedError
    from duckdb_parachute_spark.sources import delta_scan

    root = str(tmp_path / "dlc")
    a = spark.range(4).selectExpr("id")
    _delta_part(spark, a, root, "f.parquet")
    _delta_commit(root, 0, [{"add": {"path": "f.parquet", "partitionValues": {}}}])
    log = os.path.join(root, "_delta_log")
    open(os.path.join(log, "00000000000000000000.00000000000000000009.compacted.json"), "w").write("{}")
    open(os.path.join(log, "00000000000000000001.checkpoint.0000000001.json"), "w").write("{}")
    assert delta_scan(spark, root).count() == 4
    # gap: version 1 missing but version 2 present
    _delta_commit(root, 2, [{"add": {"path": "f.parquet", "partitionValues": {}}}])
    with pytest.raises(NotImplementedError, match="missing commits"):
        delta_scan(spark, root)


def _delta_checkpoint(spark, root, version, adds, n_parts=1, reader_version=1):
    """Write a classic checkpoint parquet: one row per action, nullable
    add/protocol/metaData struct columns (the public checkpoint schema
    subset delta_scan folds)."""
    import glob as g
    import shutil
    import uuid as u

    schema = (
        "add struct<path: string, partitionValues: map<string,string>, dataChange: boolean>, "
        "protocol struct<minReaderVersion: int>, "
        "metaData struct<id: string>"
    )
    rows = [((p, pv, True), None, None) for p, pv in adds]
    rows.append((None, (reader_version,), None))
    rows.append((None, None, ("cp-table",)))
    df = spark.createDataFrame(rows, schema)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    tmp = os.path.join(root, ".tmpcp_" + u.uuid4().hex)
    df.repartition(n_parts).write.parquet(tmp)
    parts = sorted(g.glob(os.path.join(tmp, "part-*.parquet")))
    if n_parts == 1:
        shutil.move(parts[0], os.path.join(log, f"{version:020d}.checkpoint.parquet"))
    else:
        for i, p in enumerate(parts, start=1):
            shutil.move(
                p,
                os.path.join(
                    log, f"{version:020d}.checkpoint.{i:010d}.{len(parts):010d}.parquet"
                ),
            )
    shutil.rmtree(tmp)


def test_delta_scan_reads_from_checkpoint(spark, tmp_path):
    """Checkpoint-compacted log (round 10): JSON commits 0..1 vacuumed away,
    classic checkpoint at v1 carries the reconciled state, commit 2 folds on
    top. Real Delta tables checkpoint every 10 commits, so this is the
    common shape in the wild."""
    from duckdb_parachute_spark.sources import delta_scan

    root = str(tmp_path / "dlcp")
    a = spark.range(0, 10).selectExpr("id", "id * 2 AS v")
    b = spark.range(10, 15).selectExpr("id", "id * 2 AS v")
    _delta_part(spark, a, root, "f1.parquet")
    _delta_part(spark, b, root, "f2.parquet")
    # checkpoint at v1: state = {f1, f2}; commits 0 and 1 do NOT exist
    _delta_checkpoint(
        spark, root, 1, [("f1.parquet", {}), ("f2.parquet", {})]
    )
    # commit 2: delete ids < 5 (remove f1, add rewritten f1r)
    a2 = a.where("id >= 5")
    _delta_part(spark, a2, root, "f1r.parquet")
    _delta_commit(root, 2, [
        {"remove": {"path": "f1.parquet", "dataChange": True}},
        {"add": {"path": "f1r.parquet", "partitionValues": {}, "dataChange": True}},
    ])
    assert sorted(r["id"] for r in delta_scan(spark, root).collect()) == list(range(5, 15))
    # time travel TO the checkpoint version itself (no JSON needed at all)
    assert sorted(r["id"] for r in delta_scan(spark, root, version=1).collect()) == list(range(15))
    # pre-checkpoint versions are gone entirely (neither commit JSON nor a
    # covering checkpoint exists): loud, not silently wrong
    with pytest.raises(FileNotFoundError, match="version 0"):
        delta_scan(spark, root, version=0)


def test_delta_scan_multipart_checkpoint_and_partitions(spark, tmp_path):
    from duckdb_parachute_spark.sources import delta_scan

    root = str(tmp_path / "dlcp2")
    a = spark.range(3).selectExpr("id")
    _delta_part(spark, a, root, "y=2020/p1.parquet")
    _delta_part(spark, a, root, "y=2021/p2.parquet")
    _delta_checkpoint(
        spark, root, 0,
        [("y=2020/p1.parquet", {"y": "2020"}), ("y=2021/p2.parquet", {"y": "2021"})],
        n_parts=2,
    )
    rows = delta_scan(spark, root).groupBy("y").count().collect()
    assert {(r["y"], r["count"]) for r in rows} == {("2020", 3), ("2021", 3)}


def test_delta_scan_checkpoint_protocol_guard(spark, tmp_path):
    from duckdb_parachute_spark.sources import delta_scan

    root = str(tmp_path / "dlcp3")
    a = spark.range(3).selectExpr("id")
    _delta_part(spark, a, root, "f.parquet")
    _delta_checkpoint(spark, root, 0, [("f.parquet", {})], reader_version=3)
    # v3 without a readerFeatures list is malformed: rejected via checkpoint too
    with pytest.raises(NotImplementedError, match="not supported"):
        delta_scan(spark, root)


def _delta_v2_checkpoint(
    spark, root, version, inline_adds, sidecars, reader_features=("v2Checkpoint",)
):
    """Write a v2/uuid checkpoint: N.checkpoint.<uuid>.parquet with protocol
    (minReaderVersion 3 + readerFeatures), optional INLINE adds, and
    `sidecar` actions naming parquet add-lists under _delta_log/_sidecars/
    (the public v2 checkpoint spec shape)."""
    import glob as g
    import shutil
    import uuid as u

    log = os.path.join(root, "_delta_log")
    scdir = os.path.join(log, "_sidecars")
    os.makedirs(scdir, exist_ok=True)

    def write_single(df, dest):
        tmp = os.path.join(root, ".tmpv2_" + u.uuid4().hex)
        df.coalesce(1).write.parquet(tmp)
        shutil.move(sorted(g.glob(os.path.join(tmp, "part-*.parquet")))[0], dest)
        shutil.rmtree(tmp)

    sc_schema = (
        "add struct<path: string, partitionValues: map<string,string>, dataChange: boolean>"
    )
    sidecar_names = []
    for adds in sidecars:
        name = u.uuid4().hex + ".parquet"
        write_single(
            spark.createDataFrame([((p, pv, True),) for p, pv in adds], sc_schema),
            os.path.join(scdir, name),
        )
        sidecar_names.append(name)
    cp_schema = (
        "add struct<path: string, partitionValues: map<string,string>, dataChange: boolean>, "
        "protocol struct<minReaderVersion: int, readerFeatures: array<string>>, "
        "metaData struct<id: string>, "
        "sidecar struct<path: string, sizeInBytes: bigint>, "
        "checkpointMetadata struct<version: bigint>"
    )
    rows = [((p, pv, True), None, None, None, None) for p, pv in inline_adds]
    rows.append((None, (3, list(reader_features)), None, None, None))
    rows.append((None, None, ("v2-table",), None, None))
    rows += [(None, None, None, (n, 1), None) for n in sidecar_names]
    rows.append((None, None, None, None, (version,)))
    write_single(
        spark.createDataFrame(rows, cp_schema),
        os.path.join(log, f"{version:020d}.checkpoint.{u.uuid4()}.parquet"),
    )


def test_delta_scan_v2_checkpoint_with_sidecars(spark, tmp_path):
    """Round 11 (VERDICT r10 item 4): v2/uuid checkpoint whose state is
    split across one inline add and two sidecar parquet files; a JSON
    commit folds on top. Pre-checkpoint JSON does not exist (vacuumed)."""
    from duckdb_parachute_spark.sources import delta_scan

    root = str(tmp_path / "dlv2")
    a = spark.range(0, 10).selectExpr("id", "id * 2 AS v")
    b = spark.range(10, 15).selectExpr("id", "id * 2 AS v")
    c = spark.range(15, 18).selectExpr("id", "id * 2 AS v")
    _delta_part(spark, a, root, "f1.parquet")
    _delta_part(spark, b, root, "f2.parquet")
    _delta_part(spark, c, root, "f3.parquet")
    _delta_v2_checkpoint(
        spark,
        root,
        1,
        inline_adds=[("f1.parquet", {})],
        sidecars=[[("f2.parquet", {})], [("f3.parquet", {})]],
    )
    # commit 2: delete ids < 5 (remove f1, add rewritten f1r)
    a2 = a.where("id >= 5")
    _delta_part(spark, a2, root, "f1r.parquet")
    _delta_commit(root, 2, [
        {"remove": {"path": "f1.parquet", "dataChange": True}},
        {"add": {"path": "f1r.parquet", "partitionValues": {}, "dataChange": True}},
    ])
    assert sorted(r["id"] for r in delta_scan(spark, root).collect()) == list(range(5, 18))
    # time travel TO the v2 checkpoint version itself
    assert sorted(r["id"] for r in delta_scan(spark, root, version=1).collect()) == list(range(18))
    with pytest.raises(FileNotFoundError, match="version 0"):
        delta_scan(spark, root, version=0)


def test_delta_scan_v2_checkpoint_dv_feature_accepted(spark, tmp_path):
    """Round 12: deletionVectors in readerFeatures is now SUPPORTED —
    accepted through a v2 checkpoint (no DV'd adds here: feature on, zero
    vectors, the common steady state of a modern table). Unknown features
    stay loudly rejected."""
    from duckdb_parachute_spark.sources import delta_scan

    root = str(tmp_path / "dlv2dv")
    a = spark.range(3).selectExpr("id")
    _delta_part(spark, a, root, "f.parquet")
    _delta_v2_checkpoint(
        spark,
        root,
        0,
        inline_adds=[("f.parquet", {})],
        sidecars=[],
        reader_features=("v2Checkpoint", "deletionVectors"),
    )
    assert delta_scan(spark, root).count() == 3
    root2 = str(tmp_path / "dlv2x")
    _delta_part(spark, a, root2, "f.parquet")
    _delta_v2_checkpoint(
        spark,
        root2,
        0,
        inline_adds=[("f.parquet", {})],
        sidecars=[],
        reader_features=("v2Checkpoint", "someFutureFeature"),
    )
    with pytest.raises(NotImplementedError, match="not supported"):
        delta_scan(spark, root2)


def test_delta_scan_malformed_deletion_vector_rejected(spark, tmp_path):
    """A DV descriptor that cannot be resolved (bogus Z85 path token) must
    raise loudly rather than silently scan the file unfiltered."""
    from duckdb_parachute_spark.sources import delta_scan

    root = str(tmp_path / "dladv")
    a = spark.range(3).selectExpr("id")
    _delta_part(spark, a, root, "f.parquet")
    _delta_commit(root, 0, [
        {"add": {"path": "f.parquet", "partitionValues": {},
                 "deletionVector": {"storageType": "u", "pathOrInlineDv": "x",
                                    "offset": 1, "sizeInBytes": 40, "cardinality": 2}}},
    ])
    with pytest.raises((ValueError, FileNotFoundError)):
        delta_scan(spark, root)


# ---------------------------------------------------------------------------
# round 12: Delta deletion vectors (VERDICT r11 missing #1)
# ---------------------------------------------------------------------------


def test_dv_codec_roundtrips():
    """Z85 / roaring64 / blob / file framing round-trips, including the
    >4096-per-container bitmap path and cross-bucket (>32-bit) indexes."""
    import random

    from duckdb_parachute_spark.sources import deltadv as dv

    # z85: arbitrary lengths pad to 4, decode truncates back
    for n in (0, 1, 3, 4, 5, 16, 33):
        b = bytes(range(n % 251)) * (n // max(n % 251, 1) + 1)
        b = b[:n]
        assert dv.z85_decode(dv.z85_encode(b), length=n) == b
    rng = random.Random(7)
    cases = [
        [],
        [0],
        [0, 1, 2, 3],
        list(range(70000)),                       # forces a bitmap container
        [2**33 + 5, 2**33 + 6, 12, 2**40],        # multiple high-32 buckets
        sorted(rng.sample(range(10**9), 5000)),
        [0xFFFFFFFFFFFFFFFF],
    ]
    for xs in cases:
        assert dv.deserialize_roaring64(dv.serialize_roaring64(xs)) == sorted(set(xs))
        assert dv.parse_dv_blob(dv.dv_blob(xs)) == sorted(set(xs))


def test_dv_reader_handles_run_containers_and_bad_frames(tmp_path):
    """The reader must accept run-format bitmaps (cookie 12347) that real
    writers emit after runOptimize — hand-built here byte-for-byte from the
    RoaringFormatSpec, since our writer never emits runs — and must reject
    corrupt frames loudly (CRC, magic, size)."""
    import struct

    import pytest

    from duckdb_parachute_spark.sources import deltadv as dv

    # one run container: values 10..19 and 50..51 => 2 runs
    runfmt = (
        struct.pack("<HH", 12347, 0)      # cookie, containers-1 = 0
        + b"\x01"                          # run flag bitset: container 0 is run
        + struct.pack("<HH", 0, 12 - 1)    # key 0, cardinality-1
        + struct.pack("<H", 2)             # 2 runs (< 4 containers: no offsets)
        + struct.pack("<HH", 10, 9)        # start 10, length-1 = 9
        + struct.pack("<HH", 50, 1)        # start 50, length-1 = 1
    )
    payload = struct.pack("<Q", 1) + struct.pack("<I", 0) + runfmt
    assert dv.deserialize_roaring64(payload) == list(range(10, 20)) + [50, 51]

    desc = dv.write_dv_file(str(tmp_path), [1, 5, 9], prefix="ab")
    assert desc["storageType"] == "u" and desc["cardinality"] == 3
    assert dv.read_dv_rows(str(tmp_path), desc) == [1, 5, 9]
    # corrupt one data byte -> CRC must catch it
    import glob

    fp = glob.glob(str(tmp_path / "ab" / "deletion_vector_*.bin"))[0]
    raw = bytearray(open(fp, "rb").read())
    raw[8] ^= 0xFF
    open(fp, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum|magic"):
        dv.read_dv_rows(str(tmp_path), desc)
    # inline descriptor honours sizeInBytes truncation
    inline = dv.inline_dv_descriptor([3, 4, 1 << 35])
    assert dv.read_dv_rows(str(tmp_path), inline) == [3, 4, 1 << 35]
    # wrong cardinality rejects
    inline["cardinality"] = 99
    with pytest.raises(ValueError, match="cardinality"):
        dv.read_dv_rows(str(tmp_path), inline)


def test_delta_scan_deletion_vectors_end_to_end(spark, tmp_path):
    """delta_scan applies DVs (round 12): an on-disk DV with a prefix, an
    inline DV, and a DV-on-rewrite (same file re-added with a bigger DV —
    the real UPDATE/DELETE shape) all anti-filter by row index; time travel
    back to the pre-DV version still sees every row; protocol v3 with
    readerFeatures [deletionVectors] is accepted."""
    from pyspark.sql import functions as F

    from duckdb_parachute_spark.sources import delta_scan
    from duckdb_parachute_spark.sources.deltadv import (
        inline_dv_descriptor,
        write_dv_file,
    )

    root = str(tmp_path / "dvt")
    a = spark.range(0, 10).select(F.col("id"))
    b = spark.range(100, 110).select(F.col("id"))
    _delta_part(spark, a, root, "fa.parquet")
    _delta_part(spark, b, root, "fb.parquet")
    _delta_commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "t", "schemaString": "{}", "configuration": {}}},
        {"add": {"path": "fa.parquet", "partitionValues": {}}},
        {"add": {"path": "fb.parquet", "partitionValues": {}}},
    ])
    # version 1: delete rows 0,3,7 of fa via an on-disk DV (random prefix),
    # rows 1,2 of fb via an inline DV
    dva = write_dv_file(root, [0, 3, 7], prefix="ab")
    dvb = inline_dv_descriptor([1, 2])
    _delta_commit(root, 1, [
        {"remove": {"path": "fa.parquet"}},
        {"add": {"path": "fa.parquet", "partitionValues": {}, "deletionVector": dva}},
        {"remove": {"path": "fb.parquet"}},
        {"add": {"path": "fb.parquet", "partitionValues": {}, "deletionVector": dvb}},
    ])
    got = sorted(r["id"] for r in delta_scan(spark, root).collect())
    assert got == [1, 2, 4, 5, 6, 8, 9] + [100, 103, 104, 105, 106, 107, 108, 109]
    # time travel: version 0 has no DVs
    assert len(delta_scan(spark, root, version=0).collect()) == 20
    # version 2: widen fa's DV (delete-on-deleted rewrite, superset bitmap)
    dva2 = write_dv_file(root, [0, 1, 3, 7])
    _delta_commit(root, 2, [
        {"remove": {"path": "fa.parquet"}},
        {"add": {"path": "fa.parquet", "partitionValues": {}, "deletionVector": dva2}},
    ])
    got2 = sorted(r["id"] for r in delta_scan(spark, root).collect())
    assert got2 == [2, 4, 5, 6, 8, 9] + [100, 103, 104, 105, 106, 107, 108, 109]


def test_delta_scan_dv_partitioned_and_checkpointed(spark, tmp_path):
    """DV descriptors survive the parquet-checkpoint fold (struct column)
    and compose with partition grouping: only the group containing the DV'd
    file gets the row-index anti-join."""
    from pyspark.sql import functions as F

    from duckdb_parachute_spark.sources import delta_scan
    from duckdb_parachute_spark.sources.deltadv import write_dv_file

    root = str(tmp_path / "dvcp")
    a = spark.range(0, 6).select(F.col("id"))
    b = spark.range(10, 16).select(F.col("id"))
    _delta_part(spark, a, root, "y=1/fa.parquet")
    _delta_part(spark, b, root, "y=2/fb.parquet")
    dva = write_dv_file(root, [0, 5])
    # checkpoint at version 1 carrying the DV struct; no JSON commits before
    cp = spark.createDataFrame(
        [
            (("y=1/fa.parquet", {"y": "1"}, True,
              (dva["storageType"], dva["pathOrInlineDv"], dva["offset"],
               dva["sizeInBytes"], dva["cardinality"])), None),
            (("y=2/fb.parquet", {"y": "2"}, True, None), None),
            (None, (3, ["deletionVectors"])),
        ],
        "add struct<path: string, partitionValues: map<string,string>, dataChange: boolean, "
        "deletionVector: struct<storageType: string, pathOrInlineDv: string, offset: int, "
        "sizeInBytes: int, cardinality: bigint>>, "
        "protocol struct<minReaderVersion: int, readerFeatures: array<string>>",
    )
    _delta_part(spark, cp, root, os.path.join("_delta_log", f"{1:020d}.checkpoint.parquet"))
    df = delta_scan(spark, root)
    got = sorted((r["id"], r["y"]) for r in df.collect())
    assert got == [(1, "1"), (2, "1"), (3, "1"), (4, "1")] + [(i, "2") for i in range(10, 16)]


def test_delta_scan_column_mapping_name_and_id(spark, tmp_path):
    """Column mapping (round 12): name mode renames physical col-<uuid>
    parquet columns to logical names (partitionValues keys are physical);
    id mode resolves through parquet field_ids written in the footer."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from duckdb_parachute_spark.sources import delta_scan

    schema_str = (
        '{"type":"struct","fields":['
        '{"name":"k","type":"long","nullable":true,"metadata":'
        '{"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-aaa"}},'
        '{"name":"v","type":"string","nullable":true,"metadata":'
        '{"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-bbb"}}]}'
    )
    # ---- name mode
    root = str(tmp_path / "cmname")
    df = spark.range(0, 5).select(
        F.col("id").alias("col-aaa"), F.concat(F.lit("x"), F.col("id")).alias("col-bbb")
    )
    _delta_part(spark, df, root, "f.parquet")
    _delta_commit(root, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "t", "schemaString": schema_str,
                      "configuration": {"delta.columnMapping.mode": "name"}}},
        {"add": {"path": "f.parquet", "partitionValues": {}}},
    ])
    out = delta_scan(spark, root)
    assert sorted(out.columns) == ["k", "v"]
    assert sorted(r["v"] for r in out.collect()) == ["x0", "x1", "x2", "x3", "x4"]
    # ---- id mode: physical parquet names are arbitrary, field_ids decide
    root2 = str(tmp_path / "cmid")
    os.makedirs(root2)
    t = pa.table({"anything": list(range(3)), "else_": ["a", "b", "c"]})
    t = t.cast(pa.schema([
        pa.field("anything", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
        pa.field("else_", pa.string(), metadata={b"PARQUET:field_id": b"2"}),
    ]))
    pq.write_table(t, os.path.join(root2, "g.parquet"))
    _delta_commit(root2, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "t2", "schemaString": schema_str,
                      "configuration": {"delta.columnMapping.mode": "id"}}},
        {"add": {"path": "g.parquet", "partitionValues": {}}},
    ])
    out2 = delta_scan(spark, root2)
    assert sorted(out2.columns) == ["k", "v"]
    assert sorted((r["k"], r["v"]) for r in out2.collect()) == [(0, "a"), (1, "b"), (2, "c")]


def test_delta_scan_timestamp_time_travel(spark, tmp_path):
    """Round 12: timestamp-based time travel — newest version whose
    commitInfo.timestamp <= target (file-mtime fallback); pre-oldest
    targets raise; version+timestamp together rejected."""
    from duckdb_parachute_spark.sources import delta_scan

    root = str(tmp_path / "dts")
    a = spark.range(0, 5).selectExpr("id")
    b = spark.range(5, 9).selectExpr("id")
    _delta_part(spark, a, root, "f0.parquet")
    _delta_part(spark, b, root, "f1.parquet")
    t0, t1 = 1700000000000, 1700000600000  # 10 min apart
    _delta_commit(root, 0, [
        {"commitInfo": {"timestamp": t0, "operation": "WRITE"}},
        {"add": {"path": "f0.parquet", "partitionValues": {}}},
    ])
    _delta_commit(root, 1, [
        {"commitInfo": {"timestamp": t1, "operation": "WRITE"}},
        {"remove": {"path": "f0.parquet"}},
        {"add": {"path": "f1.parquet", "partitionValues": {}}},
    ])
    # between the commits -> version 0; after both -> version 1
    mid = "2023-11-14T22:18:00+00:00"
    assert sorted(r["id"] for r in delta_scan(spark, root, timestamp=mid).collect()) == list(range(5))
    late = "2023-11-14T22:35:00+00:00"
    assert sorted(r["id"] for r in delta_scan(spark, root, timestamp=late).collect()) == [5, 6, 7, 8]
    with pytest.raises(ValueError, match="no commit at or before"):
        delta_scan(spark, root, timestamp="2020-01-01T00:00:00+00:00")
    with pytest.raises(ValueError, match="not both"):
        delta_scan(spark, root, version=0, timestamp=mid)


def test_delta_scan_timestamp_nonmonotonic_clamp(spark, tmp_path):
    """Round 13 (ADVICE): a skewed writer clock can stamp commit 1 EARLIER
    than commit 0 — the reference reader clamps it to commit0 + 1ms so a
    later version can never win an earlier target. Without the clamp,
    targeting just above commit 1's raw (earlier) time would resolve to
    version 1, i.e. newer data at an older timestamp."""
    from duckdb_parachute_spark.sources import delta_scan

    root = str(tmp_path / "dtnm")
    _delta_part(spark, spark.range(0, 5).selectExpr("id"), root, "f0.parquet")
    _delta_part(spark, spark.range(5, 9).selectExpr("id"), root, "f1.parquet")
    t0 = 1700000000000
    _delta_commit(root, 0, [
        {"commitInfo": {"timestamp": t0, "operation": "WRITE"}},
        {"add": {"path": "f0.parquet", "partitionValues": {}}},
    ])
    _delta_commit(root, 1, [
        {"commitInfo": {"timestamp": t0 - 600000, "operation": "WRITE"}},  # 10 min BEFORE commit 0
        {"remove": {"path": "f0.parquet"}},
        {"add": {"path": "f1.parquet", "partitionValues": {}}},
    ])
    # exactly commit 0's time -> version 0 (commit 1 clamps to t0+1ms)
    at_t0 = "2023-11-14T22:13:20+00:00"
    assert sorted(r["id"] for r in delta_scan(spark, root, timestamp=at_t0).collect()) == list(range(5))
    # 1 second later -> version 1 (the clamped t0+1ms is now eligible)
    assert sorted(r["id"] for r in delta_scan(spark, root, timestamp="2023-11-14T22:13:21+00:00").collect()) == [5, 6, 7, 8]


def test_delta_scan_dv_with_column_mapping(spark, tmp_path):
    """Round 13 (VERDICT r12 missing #2a): real writers produce deletion
    vectors AND column mapping on the SAME table — the DV anti-join runs
    on the physical-named scan (before the rename), so both features must
    compose. Name mode + an on-disk DV + an inline DV."""
    from pyspark.sql import functions as F

    from duckdb_parachute_spark.sources import delta_scan
    from duckdb_parachute_spark.sources.deltadv import (
        inline_dv_descriptor,
        write_dv_file,
    )

    root = str(tmp_path / "dvcm")
    schema_str = (
        '{"type":"struct","fields":['
        '{"name":"k","type":"long","nullable":true,"metadata":'
        '{"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-aaa"}},'
        '{"name":"v","type":"string","nullable":true,"metadata":'
        '{"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-bbb"}}]}'
    )
    a = spark.range(0, 8).select(
        F.col("id").alias("col-aaa"), F.concat(F.lit("x"), F.col("id")).alias("col-bbb")
    ).coalesce(1).sortWithinPartitions("col-aaa")
    b = spark.range(100, 105).select(
        F.col("id").alias("col-aaa"), F.concat(F.lit("y"), F.col("id")).alias("col-bbb")
    ).coalesce(1).sortWithinPartitions("col-aaa")
    _delta_part(spark, a, root, "fa.parquet")
    _delta_part(spark, b, root, "fb.parquet")
    dva = write_dv_file(root, [1, 4], prefix="ab")  # deletes k=1, k=4
    dvb = inline_dv_descriptor([0])  # deletes k=100
    _delta_commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors", "columnMapping"],
                      "writerFeatures": ["deletionVectors", "columnMapping"]}},
        {"metaData": {"id": "t", "schemaString": schema_str,
                      "configuration": {"delta.columnMapping.mode": "name"}}},
        {"add": {"path": "fa.parquet", "partitionValues": {}, "deletionVector": dva}},
        {"add": {"path": "fb.parquet", "partitionValues": {}, "deletionVector": dvb}},
    ])
    out = delta_scan(spark, root)
    assert sorted(out.columns) == ["k", "v"]
    got = sorted((r["k"], r["v"]) for r in out.collect())
    want = sorted(
        [(i, f"x{i}") for i in range(8) if i not in (1, 4)]
        + [(i, f"y{i}") for i in range(101, 105)]
    )
    assert got == want
    # the same table through the DISTRIBUTED decode path (descriptor
    # cardinality over the forced limit -> mapInPandas executor decode +
    # shuffle anti-join) must produce identical rows
    out2 = delta_scan(spark, root, dv_driver_limit=1)
    assert sorted((r["k"], r["v"]) for r in out2.collect()) == want
    # no driver collect in the distributed plan: the deleted side is a
    # mapInPandas stage, not a LocalTableScan of pre-collected rows
    plan = out2._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_delta_scan_dv_distributed_equivalence(spark, tmp_path):
    """Round 13 (VERDICT r12 missing #2b): past DV_DRIVER_LIMIT the decode
    ships to executors. Forcing the limit to 0 on the r12 DV fixture must
    reproduce the driver-path rows exactly (including the multi-frame
    on-disk DV and the zero-hit time travel)."""
    from pyspark.sql import functions as F

    from duckdb_parachute_spark.sources import delta_scan
    from duckdb_parachute_spark.sources.deltadv import (
        inline_dv_descriptor,
        write_dv_file,
    )

    root = str(tmp_path / "dvdist")
    a = spark.range(0, 10).select(F.col("id"))
    b = spark.range(100, 110).select(F.col("id"))
    _delta_part(spark, a, root, "fa.parquet")
    _delta_part(spark, b, root, "fb.parquet")
    dva = write_dv_file(root, [0, 3, 7], prefix="ab")
    dvb = inline_dv_descriptor([1, 2])
    _delta_commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "t", "schemaString": "{}", "configuration": {}}},
        {"add": {"path": "fa.parquet", "partitionValues": {}, "deletionVector": dva}},
        {"add": {"path": "fb.parquet", "partitionValues": {}, "deletionVector": dvb}},
    ])
    want = sorted(r["id"] for r in delta_scan(spark, root).collect())
    assert want == [1, 2, 4, 5, 6, 8, 9] + [100, 103, 104, 105, 106, 107, 108, 109]
    got = sorted(r["id"] for r in delta_scan(spark, root, dv_driver_limit=0).collect())
    assert got == want


def test_parquet_meta_tvfs_match_duckdb(spark):
    """Round 13: parquet_schema / parquet_metadata / parquet_file_metadata
    column-for-column against DuckDB over every fixture table — including
    the nested-LIST embeddings schema (group rows reconstructed from leaf
    paths), FLOAT stats at float32 precision, converted_type back-filled
    from logical types the way DuckDB's reader does, and read_parquet()
    binding in FROM position."""
    import duckdb

    from duckdb_parachute_spark import sqlx

    con = duckdb.connect()
    base = "/root/testdata/sf0.001"
    bad = []
    for t in ["orders", "lineitem", "events", "documents", "embeddings"]:
        f = f"{base}/{t}.parquet"
        for q in [
            f"SELECT name, type, repetition_type, converted_type, logical_type, num_children FROM parquet_schema('{f}') ORDER BY name NULLS FIRST, type NULLS FIRST",
            f"SELECT path_in_schema, type, stats_min_value, stats_max_value, stats_null_count, compression, encodings, num_values, total_compressed_size FROM parquet_metadata('{f}') ORDER BY column_id",
            f"SELECT num_rows, num_row_groups, format_version FROM parquet_file_metadata('{f}')",
        ]:
            dv = [tuple(r) for r in con.execute(q).fetchall()]
            sv = [tuple(r) for r in sqlx.sql(spark, q).collect()]
            if sv != dv:
                bad.append((t, q[:60], dv, sv))
    assert not bad, bad[:1]
    n = sqlx.sql(spark, f"SELECT count(*) AS n FROM read_parquet('{base}/region.parquet')").head()[0]
    assert n == 5
    # glob / read_text / read_blob FROM-position shapes (filename, content,
    # size, last_modified — whole files, scheme-free paths)
    for q in [
        f"SELECT count(*) AS n FROM glob('{base}/*.parquet')",
        f"SELECT file FROM glob('{base}/n*.parquet') ORDER BY file",
        "SELECT filename, size FROM read_text('/root/repo/README.md')",
        "SELECT filename, size, octet_length(content) AS blen FROM read_blob('/root/repo/README.md')",
    ]:
        dv = [tuple(r) for r in con.execute(q).fetchall()]
        sv = [tuple(r) for r in sqlx.sql(spark, q).collect()]
        assert sv == dv, (q, dv, sv)


def test_delta_scan_nested_column_mapping(spark, tmp_path):
    """Round 14 (VERDICT r13 missing #2): nested physicalName resolution —
    struct fields, array<struct> elements, map values, and a NULL struct
    row staying NULL through the rebuild."""
    import json

    from pyspark.sql import functions as F

    from duckdb_parachute_spark.sources import delta_scan

    schema_str = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-k"}},
        {"name": "s",
         "type": {"type": "struct", "fields": [
             {"name": "a", "type": "long", "nullable": True,
              "metadata": {"delta.columnMapping.id": 3,
                           "delta.columnMapping.physicalName": "col-sa"}},
             {"name": "b", "type": "string", "nullable": True,
              "metadata": {"delta.columnMapping.id": 4,
                           "delta.columnMapping.physicalName": "col-sb"}}]},
         "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-s"}},
        {"name": "arr",
         "type": {"type": "array", "containsNull": True,
                  "elementType": {"type": "struct", "fields": [
                      {"name": "n", "type": "long", "nullable": True,
                       "metadata": {"delta.columnMapping.id": 6,
                                    "delta.columnMapping.physicalName": "col-an"}}]}},
         "nullable": True,
         "metadata": {"delta.columnMapping.id": 5,
                      "delta.columnMapping.physicalName": "col-arr"}},
    ]})
    root = str(tmp_path / "cmnest")
    df = spark.range(0, 4).select(
        F.col("id").alias("col-k"),
        F.when(F.col("id") < 3, F.struct(
            (F.col("id") * 10).alias("col-sa"),
            F.concat(F.lit("v"), F.col("id")).alias("col-sb"),
        )).alias("col-s"),
        F.array(F.struct((F.col("id") + 100).alias("col-an"))).alias("col-arr"),
    )
    _delta_part(spark, df, root, "f.parquet")
    _delta_commit(root, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "tn", "schemaString": schema_str,
                      "configuration": {"delta.columnMapping.mode": "name"}}},
        {"add": {"path": "f.parquet", "partitionValues": {}}},
    ])
    out = delta_scan(spark, root)
    assert out.schema["s"].dataType.fieldNames() == ["a", "b"]
    assert out.schema["arr"].dataType.elementType.fieldNames() == ["n"]
    rows = {r["k"]: r for r in out.collect()}
    assert rows[0]["s"]["a"] == 0 and rows[0]["s"]["b"] == "v0"
    assert rows[2]["s"]["b"] == "v2"
    assert rows[3]["s"] is None  # NULL struct stays NULL
    assert rows[1]["arr"][0]["n"] == 101


def test_read_json_objects_round14(spark, tmp_path):
    """read_json_objects / read_ndjson_objects (round-14 TVF sweep): one
    row per ndjson value, RAW text verbatim in a single `json` column,
    blank lines dropped — compared against DuckDB over the same file."""
    import duckdb

    from duckdb_parachute_spark import sqlx

    p = str(tmp_path / "objs.ndjson")
    with open(p, "w") as f:
        f.write('{"a": 1, "b": "x"}\n\n{"a":2}\n{"c": [1,2]}\n')
    con = duckdb.connect()
    for fn in ("read_json_objects_auto", "read_ndjson_objects"):
        q = f"SELECT json FROM {fn}('{p}') ORDER BY json"
        a = [r[0] for r in sqlx.sql(spark, q).collect()]
        b = [r[0] for r in con.execute(q).fetchall()]
        assert a == b, (fn, a, b)
