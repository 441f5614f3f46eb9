"""Iceberg-layout table: object-avro codec, metadata tree, snapshots,
bounds pruning, MVCC hints, Ray source/sink."""
import json
import os

import numpy as np
import pyarrow as pa
import pytest

from georay import icebergfmt as ice


def _table(n=40, start=0):
    i = np.arange(start, start + n)
    return pa.table({
        "id": pa.array(i.astype(np.int64)),
        "grp": pa.array((i % 3).astype(np.int32)),
        "score": pa.array(np.sin(i).astype(np.float64)),
        "name": pa.array([f"row-{k:05d}" if k % 7 else None for k in i]),
    })


def test_object_codec_roundtrip(tmp_path):
    schema = {"type": "record", "name": "t", "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": {"type": "array", "items": "int"}},
        {"name": "d", "type": {"type": "map", "values": "double"}},
        {"name": "e", "type": {"type": "record", "name": "sub",
                               "fields": [
                                   {"name": "x", "type": "boolean"},
                                   {"name": "y", "type": "bytes"}]}},
        {"name": "f", "type": ["null", {"type": "array", "items": {
            "type": "record", "name": "kv", "fields": [
                {"name": "key", "type": "int"},
                {"name": "value", "type": "bytes"}]}}]},
    ]}
    recs = [
        {"a": -3, "b": None, "c": [1, 2, 3], "d": {"p": 1.5},
         "e": {"x": True, "y": b"\x00\xff"},
         "f": [{"key": 1, "value": b"abc"}]},
        {"a": 2 ** 40, "b": "héllo", "c": [], "d": {},
         "e": {"x": False, "y": b""}, "f": None},
    ]
    p = str(tmp_path / "o.avro")
    ice.write_ocf_records(p, schema, recs)
    assert ice.read_ocf_records(p) == recs
    # empty file
    p2 = str(tmp_path / "e.avro")
    ice.write_ocf_records(p2, schema, [])
    assert ice.read_ocf_records(p2) == []


def test_create_and_read_roundtrip(tmp_path):
    root = str(tmp_path / "t")
    t = _table(40)
    info = ice.write_iceberg(t, root)
    assert info["version"] == 1 and info["total_rows"] == 40
    back = ice.read_iceberg_table(root)
    assert back.sort_by("id").equals(t)
    # metadata tree structure: hint + json + avro manifests
    mdir = os.path.join(root, "metadata")
    assert open(os.path.join(mdir, "version-hint.text")).read() == "1"
    md = json.load(open(os.path.join(mdir, "v1.metadata.json")))
    assert md["format-version"] == 2
    assert md["schemas"][0]["fields"][0] == {
        "id": 1, "name": "id", "required": False, "type": "long"}
    snap = md["snapshots"][-1]
    assert snap["manifest-list"].startswith("metadata/snap-")
    mf = ice.read_ocf_records(
        os.path.join(root, snap["manifest-list"]))
    assert mf[0]["added_rows_count"] == 40


def test_append_and_time_travel(tmp_path):
    root = str(tmp_path / "t")
    i1 = ice.write_iceberg(_table(10), root)
    i2 = ice.write_iceberg(_table(5, start=10), root, mode="append")
    assert ice.read_iceberg_table(root).num_rows == 15
    assert ice.read_iceberg_table(
        root, snapshot_id=i1["snapshot_id"]).num_rows == 10
    assert ice.read_iceberg_table(
        root, snapshot_id=i2["snapshot_id"]).num_rows == 15


def test_overwrite_keeps_old_snapshots(tmp_path):
    root = str(tmp_path / "t")
    i1 = ice.write_iceberg(_table(10), root)
    ice.write_iceberg(_table(3, start=50), root, mode="overwrite")
    assert ice.read_iceberg_table(root).num_rows == 3
    assert ice.read_iceberg_table(
        root, snapshot_id=i1["snapshot_id"]).num_rows == 10


def test_commit_is_put_if_absent(tmp_path):
    root = str(tmp_path / "t")
    ice.write_iceberg(_table(4), root)
    with pytest.raises(RuntimeError, match="concurrent commit"):
        ice._commit_metadata(root, 1, {"format-version": 2})


def test_orphan_data_file_invisible(tmp_path):
    import pyarrow.parquet as pq
    root = str(tmp_path / "t")
    ice.write_iceberg(_table(10), root)
    pq.write_table(_table(99), os.path.join(root, "data",
                                            "part-orphan.parquet"))
    assert ice.read_iceberg_table(root).num_rows == 10


def test_bounds_pruning(tmp_path):
    root = str(tmp_path / "t")
    for k in range(4):
        ice.write_iceberg(_table(25, start=25 * k), root,
                          mode="append" if k else "create")
    all_files = ice.iceberg_files(root)["files"]
    assert len(all_files) == 4
    kept = ice.iceberg_files(root, prune=("id", 30, 40))["files"]
    assert len(kept) == 1
    t = ice.read_iceberg_table(root, prune=("id", 30, 40))
    assert t.num_rows == 25
    # string bounds too
    kept2 = ice.iceberg_files(
        root, prune=("name", "row-00088", "row-00092"))["files"]
    assert len(kept2) == 1


def test_single_value_serialization():
    assert ice._single_value(7, "long") == b"\x07" + b"\x00" * 7
    assert ice._single_value_back(
        ice._single_value(-12345, "int"), "int") == -12345
    assert ice._single_value_back(
        ice._single_value(2.5, "double"), "double") == 2.5
    assert ice._single_value_back(
        ice._single_value("abc", "string"), "string") == "abc"


def test_delete_manifests_gated(tmp_path):
    root = str(tmp_path / "t")
    ice.write_iceberg(_table(5), root)
    md = ice.iceberg_metadata(root)["meta"]
    snap = md["snapshots"][-1]
    recs = ice.read_ocf_records(os.path.join(root,
                                             snap["manifest-list"]))
    recs[0]["content"] = 1      # pretend it's a delete manifest
    ice.write_ocf_records(os.path.join(root, snap["manifest-list"]),
                          ice._manifest_list_schema(), recs)
    with pytest.raises(NotImplementedError, match="delete"):
        ice.iceberg_files(root)


def test_ray_dataset_roundtrip(tmp_path, ray_session):
    import ray.data as rd
    root = str(tmp_path / "t")
    t = _table(64)
    info = ice.write_iceberg(rd.from_arrow(t).repartition(4), root)
    assert info["num_files"] == 4 and info["total_rows"] == 64
    ds = ice.read_iceberg(root, columns=["id", "score"])
    back = pa.concat_tables(
        list(ds.iter_batches(batch_size=1 << 20,
                             batch_format="pyarrow"))).sort_by("id")
    assert back.column_names == ["id", "score"]
    assert back["id"].equals(t["id"])
    assert back["score"].equals(t["score"])


def test_schema_resolved_by_schema_id_not_position(tmp_path, ray_session):
    # ADVICE r4: schemas must resolve via the entry's schema-id field,
    # not positional indexing — emulate externally evolved metadata
    # where the current schema is NOT at index current-schema-id.
    root = str(tmp_path / "t")
    ice.write_iceberg(_ds_from(_table(10)), root)
    mdir = os.path.join(root, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as f:
        v = int(f.read().strip())
    p = os.path.join(mdir, f"v{v}.metadata.json")
    md = json.load(open(p))
    real = md["schemas"][0]
    real["schema-id"] = 5
    dummy = {"type": "struct", "schema-id": 0, "fields": []}
    md["schemas"] = [dummy, real]
    md["current-schema-id"] = 5
    json.dump(md, open(p, "w"))
    out = ice.iceberg_files(root)
    assert len(out["schema"].names) == 4      # real schema, not dummy


def _ds_from(t):
    import ray.data as rd
    return rd.from_arrow(t)
