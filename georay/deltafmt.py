"""Delta-Lake-layout table: parquet data files + an ordered JSON
transaction log, as a Ray Data source/sink.

Complements georay/lancefmt.py on the table-format side of the engine:
lance = immutable column-chunked fragments + binary manifests +
tombstone-sidecar deletes (merge-on-read); delta = ordinary PARQUET
data files + a human-readable JSON action log + copy-on-write deletes.
Both give the same north-rule properties — MVCC commits (a data file
not named by a committed log entry does not exist; killed writes are
invisible and re-runnable), version time travel, fragment/file-parallel
Ray reads with column-projection pushdown, and file-skipping zone maps.

Layout (public Delta protocol, delta.io PROTOCOL.md):

    <root>/
      part-<uuid>.snappy.parquet          data files (plain parquet)
      <col>=<val>/part-<uuid>...parquet   hive-partitioned data files
      _delta_log/
        00000000000000000000.json         commit 0 (ndjson actions)
        00000000000000000001.json         commit 1 ...
        0000000000000000000N.checkpoint.parquet   replayed state ≤ N
        _last_checkpoint                  {"version": N, "size": rows}

Actions per line (the subset this engine reads AND writes):

  {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
  {"metaData": {"id", "format": {"provider": "parquet", "options": {}},
                "schemaString", "partitionColumns", "configuration",
                "createdTime"}}
  {"add":    {"path", "partitionValues", "size", "modificationTime",
              "dataChange", "stats"}}     stats = JSON {numRecords,
                                          minValues, maxValues,
                                          nullCount}
  {"remove": {"path", "deletionTimestamp", "dataChange"}}
  {"commitInfo": {...}}                   informational, ignored on read

Spec semantics implemented faithfully:

  * the table state at version V = replay of commits 0..V (or latest
    checkpoint ≤ V + the tail): files = adds minus later removes;
  * commits are PUT-IF-ABSENT — `_commit` hard-links the finished temp
    file to `<v>.json` (fails if the name exists), the local-FS analog
    of the spec's atomic object-store put, so two racing writers can
    never both win a version;
  * partition columns are NOT stored in the data files — they live in
    each add's `partitionValues` string map (null → JSON null) and are
    re-injected, cast to the schema type, on read;
  * `schemaString` is the Spark-SQL JSON schema the spec mandates;
  * DELETE is copy-on-write: rewrite each touched file without the
    matching rows, commit remove(old)+add(new) in ONE version — old
    versions still read the old files (time travel preserved);
  * checkpoints compact the replay: one parquet of the live state with
    nullable `add` / `metaData` / `protocol` struct columns, named by
    `_last_checkpoint`.

HONESTY (same framing as georay/lancefmt.py): no `deltalake`/Spark
wheel exists in this offline container, so cross-implementation reads
of our tables are untestable HERE; unlike lance's binary protos the
delta log is plain JSON transcribed from the published protocol text,
and every field this module emits is named in PROTOCOL.md.  Data files
are stock parquet written by pyarrow.

Reference scope: the reference engine reads tabular datasets via
per-format OGR drivers (e.g. ogr/ogrsf_frmts/parquet/); this driver
plays that role for Delta-layout tables on the Ray side.

Scale shape: the log/replay is driver-side METADATA ONLY (bytes
proportional to file count, never rows); data moves only inside Ray
read/write/delete tasks, one task per file.  The unpartitioned read
path is `ray.data.read_parquet` on the live file list — Ray's native
row-group splitting and streaming apply unchanged.
"""
from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = [
    "write_delta", "read_delta", "read_delta_table", "delta_snapshot",
    "delete_delta", "checkpoint_delta", "vacuum_delta", "optimize_delta",
]

_LOG = "_delta_log"

# ------------------------------------------------------- schema string

_ARROW_TO_SPARK = [
    (pa.types.is_int64, "long"), (pa.types.is_int32, "integer"),
    (pa.types.is_int16, "short"), (pa.types.is_int8, "byte"),
    (pa.types.is_float64, "double"), (pa.types.is_float32, "float"),
    (pa.types.is_string, "string"), (pa.types.is_large_string, "string"),
    (pa.types.is_binary, "binary"), (pa.types.is_large_binary, "binary"),
    (pa.types.is_boolean, "boolean"), (pa.types.is_date32, "date"),
]

_SPARK_TO_ARROW = {
    "long": pa.int64(), "integer": pa.int32(), "short": pa.int16(),
    "byte": pa.int8(), "double": pa.float64(), "float": pa.float32(),
    "string": pa.string(), "binary": pa.binary(), "boolean": pa.bool_(),
    "date": pa.date32(), "timestamp": pa.timestamp("us"),
}


def _spark_type(t: pa.DataType):
    for pred, name in _ARROW_TO_SPARK:
        if pred(t):
            return name
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_fixed_size_list(t) or pa.types.is_list(t) \
            or pa.types.is_large_list(t):
        return {"type": "array", "elementType": _spark_type(t.value_type),
                "containsNull": True}
    raise NotImplementedError(f"no Spark schema type for {t}")


def _arrow_type(s) -> pa.DataType:
    if isinstance(s, dict):
        if s.get("type") == "array":
            return pa.list_(_arrow_type(s["elementType"]))
        raise NotImplementedError(f"schemaString type {s!r}")
    return _SPARK_TO_ARROW[s]


def _schema_string(schema: pa.Schema) -> str:
    return json.dumps({"type": "struct", "fields": [
        {"name": f.name, "type": _spark_type(f.type),
         "nullable": bool(f.nullable), "metadata": {}}
        for f in schema]})


def _schema_from_string(s: str) -> pa.Schema:
    d = json.loads(s)
    return pa.schema([pa.field(f["name"], _arrow_type(f["type"]),
                               f.get("nullable", True))
                      for f in d["fields"]])


def _narrow(t: pa.Table) -> pa.Table:
    """large_string/large_binary/large_list → 32-bit offsets; f_s_l and
    timestamps normalized to what the schemaString can express."""
    cols = {}
    for f in t.schema:
        typ = f.type
        if pa.types.is_large_string(typ):
            typ = pa.string()
        elif pa.types.is_large_binary(typ):
            typ = pa.binary()
        elif pa.types.is_fixed_size_list(typ) or pa.types.is_large_list(typ):
            typ = pa.list_(typ.value_type)
        elif pa.types.is_timestamp(typ) and typ.unit != "us":
            typ = pa.timestamp("us")
        cols[f.name] = t[f.name].cast(typ) if typ != f.type else t[f.name]
    return pa.table(cols)

# ------------------------------------------------------------- commits


def _log_dir(root: str) -> str:
    return os.path.join(root, _LOG)


def _commit(root: str, version: int, actions: list[dict]):
    """Atomic put-if-absent of `<version>.json` (spec: exactly one
    writer can create each log entry).  os.link fails with EEXIST if a
    concurrent writer already committed this version."""
    ldir = _log_dir(root)
    os.makedirs(ldir, exist_ok=True)
    tmp = os.path.join(ldir, f".commit-{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a, separators=(",", ":")) + "\n")
    final = os.path.join(ldir, f"{version:020d}.json")
    try:
        os.link(tmp, final)
    except FileExistsError:
        os.unlink(tmp)
        raise RuntimeError(
            f"concurrent commit: version {version} already exists")
    os.unlink(tmp)


def _list_versions(root: str) -> list[int]:
    ldir = _log_dir(root)
    if not os.path.isdir(ldir):
        return []
    return sorted(int(p.split(".")[0]) for p in os.listdir(ldir)
                  if p.endswith(".json") and not p.startswith("."))


def _stats_json(t: pa.Table) -> str:
    """Per-file stats for data skipping: numRecords + min/max/nullCount
    of primitive columns (binary/list columns get nullCount only)."""
    mins, maxs, nulls = {}, {}, {}
    import pyarrow.compute as pc
    for f in t.schema:
        col = t[f.name]
        nulls[f.name] = int(col.null_count)
        if pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type) \
                or pa.types.is_nested(f.type):
            continue
        if t.num_rows == col.null_count:
            continue
        mn, mx = pc.min(col).as_py(), pc.max(col).as_py()
        if isinstance(mn, (bytes, bytearray)):
            continue
        for d, v in ((mins, mn), (maxs, mx)):
            if hasattr(v, "isoformat"):
                v = v.isoformat()
            d[f.name] = v
    return json.dumps({"numRecords": t.num_rows, "minValues": mins,
                       "maxValues": maxs, "nullCount": nulls},
                      separators=(",", ":"), default=str)


def _pv_str(v) -> str | None:
    """Partition value → its string form in `partitionValues` (spec:
    dates ISO, timestamps 'yyyy-MM-dd HH:mm:ss[.S]', null → null)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ") if hasattr(v, "hour") else v.isoformat()
    return str(v)


def _pv_cast(s: str | None, t: pa.DataType):
    if s is None:
        return None
    if pa.types.is_boolean(t):
        return s == "true"
    if pa.types.is_integer(t):
        return int(s)
    if pa.types.is_floating(t):
        return float(s)
    if pa.types.is_date32(t):
        import datetime
        return datetime.date.fromisoformat(s)
    if pa.types.is_timestamp(t):
        import datetime
        return datetime.datetime.fromisoformat(s)
    return s

# --------------------------------------------------------------- write


def _write_one(t: pa.Table, root: str, partition_cols) -> list[dict]:
    """One input block → one parquet file per distinct partition tuple
    (files land under hive-style dirs); returns add actions."""
    adds = []
    if partition_cols:
        grp = t.select(partition_cols).append_column(
            "__i", pa.array(np.arange(t.num_rows)))
        by = grp.group_by(partition_cols).aggregate([("__i", "list")])
        for row in range(by.num_rows):
            pv = {c: by[c][row].as_py() for c in partition_cols}
            take = pa.array(by["__i_list"][row].as_py(), pa.int64())
            sub = t.take(take).drop_columns(partition_cols)
            rel_dir = "/".join(
                f"{c}={'__HIVE_DEFAULT_PARTITION__' if pv[c] is None else _pv_str(pv[c])}"
                for c in partition_cols)
            os.makedirs(os.path.join(root, rel_dir), exist_ok=True)
            rel = f"{rel_dir}/part-{uuid.uuid4().hex}-c000.snappy.parquet"
            pq.write_table(sub, os.path.join(root, rel),
                           compression="snappy")
            adds.append({"add": {
                "path": rel,
                "partitionValues": {c: _pv_str(pv[c])
                                    for c in partition_cols},
                "size": os.path.getsize(os.path.join(root, rel)),
                "modificationTime": int(time.time() * 1000),
                "dataChange": True, "stats": _stats_json(sub)}})
    else:
        rel = f"part-{uuid.uuid4().hex}-c000.snappy.parquet"
        pq.write_table(t, os.path.join(root, rel), compression="snappy")
        adds.append({"add": {
            "path": rel, "partitionValues": {},
            "size": os.path.getsize(os.path.join(root, rel)),
            "modificationTime": int(time.time() * 1000),
            "dataChange": True, "stats": _stats_json(t)}})
    return adds


def write_delta(ds, root: str, *, mode: str = "create",
                partition_cols: list[str] | None = None,
                schema: pa.Schema | None = None) -> dict:
    """Ray Dataset | pa.Table → Delta-layout table.  One data file per
    input block (and per partition tuple within it), written inside the
    map tasks; the JSON commit lands LAST via put-if-absent, so a
    killed run leaves no visible table change and is re-runnable.

    mode: "create" (version 0, root must have no log), "append" (new
    adds only), "overwrite" (removes every live file + adds the new
    ones, in one version — the logical-replace commit of the spec)."""
    os.makedirs(root, exist_ok=True)
    versions = _list_versions(root)
    if mode == "create" and versions:
        raise ValueError(f"delta table already exists at {root}")
    if mode in ("append", "overwrite") and not versions:
        mode = "create"

    if isinstance(ds, pa.Table):
        t = _narrow(ds)
        out_schema = t.schema
        adds = _write_one(t, root, partition_cols)
    else:
        if schema is None:
            s = ds.schema()
            schema = getattr(s, "base_schema", s)
        out_schema = _narrow(
            pa.table({f.name: pa.array([], f.type) for f in schema})).schema
        schema_ser = out_schema.serialize().to_pybytes()
        pcols = list(partition_cols or [])
        rootv = root

        def sink(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"action": pa.array([], pa.string())})
            tgt = pa.ipc.read_schema(pa.py_buffer(schema_ser))
            batch = pa.table({f.name: batch[f.name].cast(f.type)
                              for f in tgt})
            acts = _write_one(batch, rootv, pcols)
            return pa.table({"action": pa.array(
                [json.dumps(a, separators=(",", ":"), default=str)
                 for a in acts])})

        # only the add-action JSON reaches the driver — data streams to
        # disk inside the tasks
        rows = ds.map_batches(sink, batch_format="pyarrow",
                              batch_size=None).take_all()
        adds = [json.loads(r["action"]) for r in rows]

    if mode == "create":
        version = 0
        actions = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {
                "id": uuid.uuid4().hex,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _schema_string(out_schema),
                "partitionColumns": list(partition_cols or []),
                "configuration": {},
                "createdTime": int(time.time() * 1000)}},
        ] + adds
    else:
        snap = delta_snapshot(root)
        if snap["schema"].names != out_schema.names:
            raise ValueError("append schema mismatch")
        version = snap["version"] + 1
        actions = list(adds)
        if mode == "overwrite":
            now = int(time.time() * 1000)
            actions = [{"remove": {"path": f["path"],
                                   "deletionTimestamp": now,
                                   "dataChange": True}}
                       for f in snap["files"]] + actions
    _commit(root, version, actions)
    return {"version": version, "num_files": len(adds),
            "total_rows": sum(json.loads(a["add"]["stats"])["numRecords"]
                              for a in adds)}

# ---------------------------------------------------------------- read


def _read_checkpoint(root: str, version: int) -> tuple[dict, dict, list]:
    """checkpoint parquet → (metaData, protocol, live add dicts)."""
    t = pq.read_table(os.path.join(
        _log_dir(root), f"{version:020d}.checkpoint.parquet"))
    meta = proto = None
    adds = []
    for row in t.to_pylist():
        if row.get("metaData"):
            m = row["metaData"]
            # parquet map<string,string> → list of (k, v) pairs
            m["configuration"] = dict(m.get("configuration") or [])
            m.setdefault("format", {"provider": "parquet"})
            m["format"]["options"] = dict(
                m["format"].get("options") or [])
            meta = m
        if row.get("protocol"):
            proto = row["protocol"]
        if row.get("add"):
            a = row["add"]
            a["partitionValues"] = dict(a.get("partitionValues") or [])
            adds.append(a)
    return meta, proto, adds


def delta_snapshot(root: str, version: int | None = None) -> dict:
    """Replay the log to ``version`` (default latest): returns
    {version, schema, partition_columns, files} where files are the
    LIVE add actions.  Metadata-only — no data file is opened."""
    versions = _list_versions(root)
    ckpts = sorted(
        int(p.split(".")[0]) for p in os.listdir(_log_dir(root))
        if p.endswith(".checkpoint.parquet")) \
        if os.path.isdir(_log_dir(root)) else []
    if version is None:
        if not versions and not ckpts:
            raise FileNotFoundError(f"no delta log at {root}")
        version = max(versions + ckpts)
    meta = None
    live: dict[str, dict] = {}
    start = 0
    usable = [c for c in ckpts if c <= version]
    if usable:
        ck = usable[-1]
        meta, _, adds = _read_checkpoint(root, ck)
        for a in adds:
            live[a["path"]] = a
        start = ck + 1
    for v in versions:
        if v < start or v > version:
            continue
        with open(os.path.join(_log_dir(root), f"{v:020d}.json")) as f:
            for line in f:
                if not line.strip():
                    continue
                act = json.loads(line)
                if "metaData" in act:
                    meta = act["metaData"]
                elif "add" in act:
                    live[act["add"]["path"]] = act["add"]
                elif "remove" in act:
                    live.pop(act["remove"]["path"], None)
    if meta is None:
        raise ValueError(f"no metaData action through version {version}")
    return {"version": version,
            "schema": _schema_from_string(meta["schemaString"]),
            "partition_columns": meta.get("partitionColumns", []),
            "metaData": meta,
            "files": list(live.values())}


def _prune_files(files: list[dict], col: str, lo, hi) -> list[dict]:
    """Data skipping on add.stats min/max; files without stats for the
    column are kept (safe)."""
    keep = []
    for f in files:
        st = json.loads(f.get("stats") or "{}")
        mn = st.get("minValues", {}).get(col)
        mx = st.get("maxValues", {}).get(col)
        if mn is None or mx is None:
            keep.append(f)
        elif not (mx < lo or mn > hi):
            keep.append(f)
    return keep


def read_delta(root: str, *, columns: list[str] | None = None,
               version: int | None = None, prune=None,
               concurrency: int | None = None):
    """Delta-layout table → ray.data.Dataset.

    Unpartitioned fast path: ``ray.data.read_parquet`` over the live
    file list (native row-group splitting / streaming).  Partitioned
    tables go file-per-task so each file's ``partitionValues`` can be
    re-injected as typed constant columns (spec: partition columns are
    not stored in the data files).  ``prune=(col, lo, hi)`` skips files
    by the add-action zone maps before any task is scheduled."""
    import ray

    snap = delta_snapshot(root, version)
    files = snap["files"]
    if prune is not None:
        files = _prune_files(files, *prune)
    schema, pcols = snap["schema"], snap["partition_columns"]
    want = columns or schema.names
    if not files:
        empty = pa.table({c: pa.array([], schema.field(c).type)
                          for c in want})
        return ray.data.from_arrow(empty)

    if not pcols:
        paths = [os.path.join(root, f["path"]) for f in files]
        kwargs = {}
        if columns is not None:
            kwargs["columns"] = columns
        return ray.data.read_parquet(paths, **kwargs)

    data_cols = [c for c in want if c not in pcols]
    schema_ser = schema.serialize().to_pybytes()
    items = [{"path": os.path.join(root, f["path"]),
              "pv": json.dumps(f["partitionValues"])} for f in files]

    def load(batch: pa.Table) -> pa.Table:
        sch = pa.ipc.read_schema(pa.py_buffer(schema_ser))
        out = []
        for p, pvs in zip(batch["path"].to_pylist(),
                          batch["pv"].to_pylist()):
            t = pq.read_table(p, columns=data_cols)
            pv = json.loads(pvs)
            cols = {}
            for c in want:
                if c in pcols:
                    ft = sch.field(c).type
                    v = _pv_cast(pv.get(c), ft)
                    cols[c] = pa.array([v] * t.num_rows, ft)
                else:
                    cols[c] = t[c]
            out.append(pa.table(cols))
        return pa.concat_tables(out)

    src = ray.data.from_items(items, override_num_blocks=len(items))
    kwargs = {"concurrency": concurrency} if concurrency else {}
    return src.map_batches(load, batch_format="pyarrow", batch_size=None,
                           **kwargs)


def read_delta_table(root: str, *, columns=None, version=None,
                     prune=None) -> pa.Table:
    """Driver-side read of a (small) Delta-layout table."""
    snap = delta_snapshot(root, version)
    files = snap["files"]
    if prune is not None:
        files = _prune_files(files, *prune)
    schema, pcols = snap["schema"], snap["partition_columns"]
    want = columns or schema.names
    data_cols = [c for c in want if c not in pcols]
    tabs = []
    for f in files:
        t = pq.read_table(os.path.join(root, f["path"]), columns=data_cols)
        cols = {}
        for c in want:
            if c in pcols:
                ft = schema.field(c).type
                v = _pv_cast(f["partitionValues"].get(c), ft)
                cols[c] = pa.array([v] * t.num_rows, ft)
            else:
                cols[c] = t[c]
        tabs.append(pa.table(cols))
    if not tabs:
        return pa.table({c: pa.array([], schema.field(c).type)
                         for c in want})
    return pa.concat_tables(tabs)

# -------------------------------------------------------------- delete


def delete_delta(root: str, predicate, *, columns=None,
                 concurrency: int | None = None) -> dict:
    """Copy-on-write DELETE (the spec's DML shape): each live file
    evaluates ``predicate`` (callable pa.Table → bool mask of rows to
    delete) in its own Ray task; touched files are rewritten without
    the matching rows and remove(old)+add(new) commit in ONE version.
    Untouched files are carried implicitly (no action).  ``columns``
    limits what the predicate reads (the rewrite always reads all)."""
    import ray

    snap = delta_snapshot(root)
    rootv = root

    def mark(batch: pa.Table) -> pa.Table:
        outs = []
        for p, pvs in zip(batch["path"].to_pylist(),
                          batch["pv"].to_pylist()):
            full = pq.read_table(os.path.join(rootv, p))
            probe = full.select(columns) if columns else full
            mask = np.asarray(predicate(probe), dtype=bool)
            ndel = int(mask.sum())
            if ndel == 0:
                outs.append(json.dumps({"keep": p}))
                continue
            acts = [{"remove": {"path": p,
                                "deletionTimestamp":
                                    int(time.time() * 1000),
                                "dataChange": True}}]
            if ndel < full.num_rows:
                sub = full.filter(pa.array(~mask))
                rel_dir = os.path.dirname(p)
                rel = (f"{rel_dir}/" if rel_dir else "") + \
                    f"part-{uuid.uuid4().hex}-c000.snappy.parquet"
                pq.write_table(sub, os.path.join(rootv, rel),
                               compression="snappy")
                acts.append({"add": {
                    "path": rel,
                    "partitionValues": json.loads(pvs),
                    "size": os.path.getsize(os.path.join(rootv, rel)),
                    "modificationTime": int(time.time() * 1000),
                    "dataChange": True, "stats": _stats_json(sub)}})
            outs.append(json.dumps({"acts": acts, "n": ndel},
                                   default=str))
        return pa.table({"out": pa.array(outs)})

    items = [{"path": f["path"],
              "pv": json.dumps(f["partitionValues"])}
             for f in snap["files"]]
    if not items:
        return {"version": snap["version"], "deleted_rows": 0}
    src = ray.data.from_items(items, override_num_blocks=len(items))
    kwargs = {"concurrency": concurrency} if concurrency else {}
    rows = src.map_batches(mark, batch_format="pyarrow", batch_size=None,
                           **kwargs).take_all()
    actions, deleted = [], 0
    for r in rows:
        d = json.loads(r["out"])
        if "acts" in d:
            actions.extend(d["acts"])
            deleted += d["n"]
    if not actions:
        return {"version": snap["version"], "deleted_rows": 0}
    version = snap["version"] + 1
    _commit(root, version, actions)
    return {"version": version, "deleted_rows": deleted}

# --------------------------------------------- checkpoints / vacuum


def checkpoint_delta(root: str) -> dict:
    """Write `<v>.checkpoint.parquet` of the current live state +
    `_last_checkpoint`, so replay starts from here (spec: checkpoints
    let readers skip unbounded JSON tails)."""
    snap = delta_snapshot(root)
    v = snap["version"]
    # explicit arrow types: the spec's checkpoint schema uses
    # map<string,string> for the string maps (an empty plain struct
    # cannot be written to parquet)
    mp = pa.map_(pa.string(), pa.string())
    proto_t = pa.struct([("minReaderVersion", pa.int32()),
                         ("minWriterVersion", pa.int32())])
    meta_t = pa.struct([("id", pa.string()),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", mp),
                        ("createdTime", pa.int64())])
    add_t = pa.struct([("path", pa.string()),
                       ("partitionValues", mp),
                       ("size", pa.int64()),
                       ("modificationTime", pa.int64()),
                       ("dataChange", pa.bool_()),
                       ("stats", pa.string())])
    md = snap["metaData"]
    n = 2 + len(snap["files"])
    proto_col = pa.array(
        [{"minReaderVersion": 1, "minWriterVersion": 2}]
        + [None] * (n - 1), proto_t)
    meta_col = pa.array(
        [None,
         {"id": md["id"], "schemaString": md["schemaString"],
          "partitionColumns": md.get("partitionColumns", []),
          "configuration": list((md.get("configuration") or {}).items()),
          "createdTime": md.get("createdTime")}]
        + [None] * (n - 2), meta_t)
    add_col = pa.array(
        [None, None]
        + [{"path": f["path"],
            "partitionValues": list(f["partitionValues"].items()),
            "size": f.get("size"),
            "modificationTime": f.get("modificationTime"),
            "dataChange": bool(f.get("dataChange", True)),
            "stats": f.get("stats")} for f in snap["files"]], add_t)
    t = pa.table({"protocol": proto_col, "metaData": meta_col,
                  "add": add_col})
    path = os.path.join(_log_dir(root), f"{v:020d}.checkpoint.parquet")
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    lc = os.path.join(_log_dir(root), "_last_checkpoint")
    tmp2 = lc + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp2, "w") as f:
        json.dump({"version": v, "size": n}, f)
    os.replace(tmp2, lc)
    return {"version": v, "num_files": len(snap["files"])}


def vacuum_delta(root: str, *, dry_run: bool = False) -> dict:
    """Remove data files no LATEST-version snapshot references (i.e.
    tombstoned by remove actions).  Destroys time travel to versions
    that needed them — exactly the spec's VACUUM trade-off (retention
    window = 0 here; tests only)."""
    snap = delta_snapshot(root)
    live = {f["path"] for f in snap["files"]}
    victims = []
    for dirpath, _, names in os.walk(root):
        if _LOG in dirpath:
            continue
        for n in names:
            if not n.endswith(".parquet"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, n), root)
            if rel not in live:
                victims.append(rel)
    if not dry_run:
        for rel in victims:
            os.unlink(os.path.join(root, rel))
    return {"removed": len(victims), "paths": sorted(victims)}

# ------------------------------------------------------------ optimize


def optimize_delta(root: str, *, target_rows: int = 1 << 20,
                   zorder: list[str] | None = None,
                   bits: int = 16) -> dict:
    """Delta ``OPTIMIZE [ZORDER BY]`` analog: bin-pack the snapshot's
    live files into ~``target_rows`` files, optionally CLUSTERING rows
    by a Hilbert space-filling key over ``zorder`` numeric columns
    (each quantized to ``bits`` bits over its global [min, max]) so
    per-file min/max stats become range-selective — the same curve the
    engine uses for GeoParquet SORT_BY_BBOX and the FlatGeobuf index
    (georay/rtree.py).  Commits remove(old)+add(new) in ONE version;
    old versions still read the old files.

    Scale shape: the bin-pack PLAN is metadata-only; the clustered
    rewrite is one distributed sort by the Hilbert key (Ray's range
    shuffle) with data files written inside the map tasks.  2-column
    zorder uses the exact Hilbert curve; other counts raise (the
    plain compaction path has no such limit)."""
    import ray
    from ray.data.aggregate import Max, Min

    snap = delta_snapshot(root)
    if snap["partition_columns"]:
        raise NotImplementedError(
            "optimize_delta on partitioned tables")
    files = snap["files"]
    if not files:
        return {"version": snap["version"], "rewritten": 0}
    now = int(time.time() * 1000)
    paths = [os.path.join(root, f["path"]) for f in files]
    ds = ray.data.read_parquet(paths)

    if zorder is not None:
        if len(zorder) != 2:
            raise NotImplementedError("zorder needs exactly 2 columns")
        from .rtree import hilbert_xy2d
        cx, cy = zorder
        # global extents: one tiny aggregate pass
        lo_hi = {}
        stats = ds.aggregate(Min(cx), Max(cx), Min(cy), Max(cy))
        lo_hi[cx] = (stats[f"min({cx})"], stats[f"max({cx})"])
        lo_hi[cy] = (stats[f"min({cy})"], stats[f"max({cy})"])
        side = (1 << bits) - 1
        xr = (lo_hi[cx][0], max(lo_hi[cx][1] - lo_hi[cx][0], 1e-300))
        yr = (lo_hi[cy][0], max(lo_hi[cy][1] - lo_hi[cy][0], 1e-300))

        def add_key(batch: pa.Table) -> pa.Table:
            x = batch[cx].to_numpy(zero_copy_only=False).astype(
                np.float64)
            y = batch[cy].to_numpy(zero_copy_only=False).astype(
                np.float64)
            qx = np.clip(((x - xr[0]) / xr[1] * side), 0,
                         side).astype(np.uint32)
            qy = np.clip(((y - yr[0]) / yr[1] * side), 0,
                         side).astype(np.uint32)
            return batch.append_column(
                "__zkey__",
                pa.array(hilbert_xy2d(bits, qx, qy).astype(np.int64)))

        ds = ds.map_batches(add_key, batch_format="pyarrow") \
            .sort("__zkey__")

        def strip(batch: pa.Table) -> pa.Table:
            return batch.drop_columns(["__zkey__"])

        ds = ds.map_batches(strip, batch_format="pyarrow")

    total = sum(json.loads(f.get("stats") or "{}")
                .get("numRecords", 0) for f in files)
    n_out = max(1, -(-total // target_rows)) if total else 1
    adds = []
    rootv = root

    def sink(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"action": pa.array([], pa.string())})
        acts = _write_one(batch, rootv, None)
        return pa.table({"action": pa.array(
            [json.dumps(a, separators=(",", ":"), default=str)
             for a in acts])})

    rows = ds.repartition(n_out).map_batches(
        sink, batch_format="pyarrow", batch_size=None).take_all()
    adds = [json.loads(r["action"]) for r in rows]
    # Delta protocol: OPTIMIZE/compaction commits carry dataChange=false
    # on BOTH sides so change-data-feed consumers skip the rewrite.
    for a in adds:
        a["add"]["dataChange"] = False
    actions = [{"remove": {"path": f["path"], "deletionTimestamp": now,
                           "dataChange": False}} for f in files] + adds
    version = snap["version"] + 1
    _commit(root, version, actions)
    return {"version": version, "rewritten": len(files),
            "new_files": len(adds)}
