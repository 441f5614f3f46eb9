"""Delta-layout table: log replay, MVCC, time travel, partitions,
checkpoints, copy-on-write delete, data skipping, Ray source/sink."""
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from georay import deltafmt as dl


def _table(n=40, start=0):
    i = np.arange(start, start + n)
    return pa.table({
        "id": pa.array(i.astype(np.int64)),
        "grp": pa.array((i % 3).astype(np.int32)),
        "score": pa.array(np.sin(i).astype(np.float64)),
        "name": pa.array([f"row-{k:05d}" if k % 7 else None for k in i]),
        "flag": pa.array((i % 2 == 0)),
        "day": pa.array((i % 1000).astype(np.int32)).cast(pa.date32()),
    })


def test_create_and_read_roundtrip(tmp_path):
    root = str(tmp_path / "t")
    t = _table(40)
    info = dl.write_delta(t, root)
    assert info["version"] == 0 and info["total_rows"] == 40
    back = dl.read_delta_table(root)
    assert back.sort_by("id").equals(t)
    # log file 0 exists and holds protocol + metaData + add lines
    log = open(os.path.join(root, "_delta_log",
                            "0" * 20 + ".json")).read().splitlines()
    acts = [json.loads(x) for x in log]
    assert "protocol" in acts[0] and "metaData" in acts[1]
    assert acts[1]["metaData"]["format"]["provider"] == "parquet"
    assert any("add" in a for a in acts[2:])


def test_schema_string_is_spark_json(tmp_path):
    root = str(tmp_path / "t")
    dl.write_delta(_table(5), root)
    snap = dl.delta_snapshot(root)
    s = json.loads(snap["metaData"]["schemaString"])
    assert s["type"] == "struct"
    by = {f["name"]: f["type"] for f in s["fields"]}
    assert by["id"] == "long" and by["grp"] == "integer"
    assert by["score"] == "double" and by["day"] == "date"
    assert snap["schema"].field("id").type == pa.int64()


def test_append_and_time_travel(tmp_path):
    root = str(tmp_path / "t")
    dl.write_delta(_table(10), root)
    dl.write_delta(_table(5, start=10), root, mode="append")
    assert dl.read_delta_table(root, version=0).num_rows == 10
    assert dl.read_delta_table(root, version=1).num_rows == 15
    assert dl.read_delta_table(root).num_rows == 15


def test_overwrite_replaces_but_keeps_history(tmp_path):
    root = str(tmp_path / "t")
    dl.write_delta(_table(10), root)
    dl.write_delta(_table(3, start=100), root, mode="overwrite")
    assert dl.read_delta_table(root).num_rows == 3
    assert dl.read_delta_table(root, version=0).num_rows == 10


def test_uncommitted_files_invisible(tmp_path):
    """MVCC: a parquet file without a committed add action does not
    exist — a killed write leaves the table unchanged."""
    root = str(tmp_path / "t")
    dl.write_delta(_table(10), root)
    pq.write_table(_table(99), os.path.join(root, "part-orphan.parquet"))
    assert dl.read_delta_table(root).num_rows == 10
    v = dl.vacuum_delta(root, dry_run=True)
    assert v["paths"] == ["part-orphan.parquet"]


def test_commit_is_put_if_absent(tmp_path):
    root = str(tmp_path / "t")
    dl.write_delta(_table(4), root)
    with pytest.raises(RuntimeError, match="concurrent commit"):
        dl._commit(root, 0, [{"commitInfo": {}}])


def test_partitioned_write_and_read(tmp_path):
    root = str(tmp_path / "t")
    t = _table(30)
    dl.write_delta(t, root, partition_cols=["grp"])
    # hive dirs exist; data files do NOT contain the partition column
    dirs = sorted(d for d in os.listdir(root) if d.startswith("grp="))
    assert dirs == ["grp=0", "grp=1", "grp=2"]
    snap = dl.delta_snapshot(root)
    f0 = snap["files"][0]
    raw = pq.read_table(os.path.join(root, f0["path"]))
    assert "grp" not in raw.column_names
    assert f0["partitionValues"]["grp"] in ("0", "1", "2")
    back = dl.read_delta_table(root).sort_by("id")
    assert back.select(t.column_names).equals(back.select(t.column_names))
    assert back.sort_by("id")["grp"].equals(t["grp"])
    assert back["score"].equals(t["score"])


def test_null_partition_value(tmp_path):
    root = str(tmp_path / "t")
    t = pa.table({"k": pa.array([1, None], pa.int64()),
                  "v": pa.array([1.0, 2.0])})
    dl.write_delta(t, root, partition_cols=["k"])
    assert os.path.isdir(os.path.join(
        root, "k=__HIVE_DEFAULT_PARTITION__"))
    back = dl.read_delta_table(root).sort_by("v")
    assert back["k"].to_pylist() == [1, None]


def test_delete_copy_on_write(tmp_path, ray_session):
    root = str(tmp_path / "t")
    dl.write_delta(_table(20), root)
    info = dl.delete_delta(
        root, lambda t: t["id"].to_numpy(zero_copy_only=False) % 5 == 0,
        columns=["id"])
    assert info["deleted_rows"] == 4
    back = dl.read_delta_table(root)
    assert back.num_rows == 16
    assert all(i % 5 for i in back["id"].to_pylist())
    # old version still reads everything (copy-on-write, not destructive)
    assert dl.read_delta_table(root, version=0).num_rows == 20
    # no-op delete commits nothing
    v = dl.delta_snapshot(root)["version"]
    info2 = dl.delete_delta(
        root, lambda t: np.zeros(t.num_rows, bool), columns=["id"])
    assert info2 == {"version": v, "deleted_rows": 0}


def test_checkpoint_replay(tmp_path):
    root = str(tmp_path / "t")
    dl.write_delta(_table(10), root)
    dl.write_delta(_table(5, start=10), root, mode="append")
    dl.checkpoint_delta(root)
    dl.write_delta(_table(2, start=20), root, mode="append")
    # snapshot == full-replay result
    assert dl.read_delta_table(root).num_rows == 17
    # remove the pre-checkpoint JSON logs: replay MUST come from the
    # checkpoint + tail
    for v in (0, 1):
        os.unlink(os.path.join(root, "_delta_log", f"{v:020d}.json"))
    assert dl.read_delta_table(root).num_rows == 17
    lc = json.load(open(os.path.join(root, "_delta_log",
                                     "_last_checkpoint")))
    assert lc["version"] == 1


def test_stats_and_pruning(tmp_path):
    root = str(tmp_path / "t")
    # 4 files of 25 ids each → prune to the one covering [30, 40]
    for k in range(4):
        dl.write_delta(_table(25, start=25 * k), root,
                       mode="append" if k else "create")
    snap = dl.delta_snapshot(root)
    st = json.loads(snap["files"][0]["stats"])
    assert st["numRecords"] == 25 and "id" in st["minValues"]
    assert st["nullCount"]["name"] > 0
    kept = dl._prune_files(snap["files"], "id", 30, 40)
    assert len(kept) == 1
    t = dl.read_delta_table(root, prune=("id", 30, 40))
    assert t.num_rows == 25  # file granularity: the whole matching file


def test_ray_dataset_roundtrip(tmp_path, ray_session):
    import ray.data as rd
    root = str(tmp_path / "t")
    t = _table(64)
    info = dl.write_delta(rd.from_arrow(t).repartition(4), root)
    assert info["num_files"] == 4 and info["total_rows"] == 64
    ds = dl.read_delta(root, columns=["id", "score"])
    back = pa.concat_tables(
        list(ds.iter_batches(batch_size=1 << 20,
                             batch_format="pyarrow"))).sort_by("id")
    assert back.column_names == ["id", "score"]
    assert back["id"].equals(t["id"])
    assert back["score"].equals(t["score"])


def test_ray_partitioned_read_injects_typed_columns(tmp_path,
                                                    ray_session):
    import ray.data as rd
    root = str(tmp_path / "t")
    t = _table(30)
    dl.write_delta(rd.from_arrow(t), root, partition_cols=["grp"])
    ds = dl.read_delta(root)
    back = pa.concat_tables(
        list(ds.iter_batches(batch_size=1 << 20,
                             batch_format="pyarrow"))).sort_by("id")
    assert back["grp"].type == pa.int32()
    assert back["grp"].equals(t["grp"])


def test_vacuum_removes_tombstoned_files(tmp_path, ray_session):
    root = str(tmp_path / "t")
    dl.write_delta(_table(10), root)
    dl.write_delta(_table(3, start=50), root, mode="overwrite")
    n_before = sum(f.endswith(".parquet")
                   for f in os.listdir(root))
    out = dl.vacuum_delta(root)
    assert out["removed"] >= 1
    assert dl.read_delta_table(root).num_rows == 3
    assert sum(f.endswith(".parquet") for f in os.listdir(root)) \
        == n_before - out["removed"]


def test_optimize_compacts_files(tmp_path, ray_session):
    import ray.data as rd
    root = str(tmp_path / "t")
    for k in range(5):
        dl.write_delta(_table(20, start=20 * k), root,
                       mode="append" if k else "create")
    assert len(dl.delta_snapshot(root)["files"]) == 5
    info = dl.optimize_delta(root, target_rows=1000)
    assert info["rewritten"] == 5 and info["new_files"] == 1
    back = dl.read_delta_table(root)
    assert back.num_rows == 100
    assert sorted(back["id"].to_pylist()) == list(range(100))
    # pre-optimize version still reads the old layout (time travel)
    assert dl.read_delta_table(
        root, version=info["version"] - 1).num_rows == 100


def test_optimize_zorder_improves_pruning(tmp_path, ray_session):
    """ZORDER clustering makes per-file min/max stats range-selective:
    a small lon/lat box prunes most files after OPTIMIZE ZORDER, while
    the row-order layout (random spatial placement per file) prunes
    none."""
    import ray.data as rd
    rng = np.random.RandomState(5)
    n = 8000
    t = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "lon": pa.array(rng.uniform(-180, 180, n)),
        "lat": pa.array(rng.uniform(-85, 85, n)),
    })
    root = str(tmp_path / "t")
    dl.write_delta(rd.from_arrow(t).repartition(8), root)
    snap0 = dl.delta_snapshot(root)
    pruned0 = dl._prune_files(snap0["files"], "lon", 10.0, 20.0)
    assert len(pruned0) == len(snap0["files"])   # random: nothing prunes
    info = dl.optimize_delta(root, target_rows=1000,
                             zorder=["lon", "lat"])
    snap1 = dl.delta_snapshot(root)
    assert len(snap1["files"]) >= 6
    pruned1 = dl._prune_files(snap1["files"], "lon", 10.0, 20.0)
    # a 10°-lon strip (2.8% of the domain) crosses several Hilbert
    # segments; half the files or fewer should survive the prune
    # (row-order layout: ALL survive)
    assert len(pruned1) <= len(snap1["files"]) // 2
    # correctness: same rows, any box query agrees with brute force
    back = dl.read_delta_table(root)
    assert back.num_rows == n
    box = dl.read_delta_table(root, prune=("lon", 10.0, 20.0))
    import pyarrow.compute as pc
    exact = t.filter(pc.and_(pc.greater_equal(t["lon"], 10.0),
                             pc.less_equal(t["lon"], 20.0)))
    got_ids = {i for i in box["id"].to_pylist()}
    assert got_ids >= set(exact["id"].to_pylist())


def test_optimize_adds_carry_datachange_false(tmp_path, ray_session):
    # Delta protocol: OPTIMIZE commits mark BOTH remove and add actions
    # dataChange=false so CDF consumers skip the rewrite (ADVICE r4).
    root = str(tmp_path / "t")
    for k in range(3):
        dl.write_delta(_table(10, start=10 * k), root,
                       mode="append" if k else "create")
    info = dl.optimize_delta(root, target_rows=1000)
    log = os.path.join(root, "_delta_log",
                       f"{info['version']:020d}.json")
    acts = [json.loads(line) for line in open(log)]
    assert acts, "empty commit"
    for a in acts:
        body = a.get("add") or a.get("remove")
        if body is not None:
            assert body["dataChange"] is False
