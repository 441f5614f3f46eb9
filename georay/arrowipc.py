"""Arrow IPC (Feather v2) vector driver: record-batch-parallel source +
one-file-per-block sink.

Reference scope: ogr/ogrsf_frmts/arrow/ (the reference reads/writes
Arrow IPC streams and files as first-class OGR layers); on the Ray side
the format is native, so the driver's job is purely the PARALLELISM
contract: the IPC *file* format has a footer with per-batch offsets, so
reads fan out one task per (file, batch range) with random access —
no full-file scan per task — and writes land one ``.arrow`` file per
block (task-parallel, atomic rename, resumable like every other
partitioned sink here).
"""
from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.ipc as pipc

__all__ = ["write_arrow_ipc", "read_arrow_ipc", "read_arrow_ipc_table"]


def write_arrow_ipc(ds_or_table, path: str) -> str:
    """Dataset → ``path``/part-*.arrow (one per block); table → one
    file at ``path``."""
    if isinstance(ds_or_table, pa.Table):
        with pipc.new_file(path, ds_or_table.schema) as w:
            w.write_table(ds_or_table)
        return path
    os.makedirs(path, exist_ok=True)

    def sink(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        name = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
        tmp = name + ".tmp"
        with pipc.new_file(tmp, batch.schema) as w:
            w.write_table(batch)
        os.replace(tmp, name)
        return pa.table({"path": pa.array([name]),
                         "rows": pa.array([batch.num_rows], pa.int64())})

    ds_or_table.map_batches(sink, batch_format="pyarrow",
                            batch_size=None).materialize()
    return path


def _ipc_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(os.path.join(path, p) for p in os.listdir(path)
                      if p.endswith((".arrow", ".feather", ".ipc")))
    return [path]


def read_arrow_ipc(path: str, *, columns=None,
                   batches_per_task: int = 16):
    """Arrow IPC file(s) → ``ray.data.Dataset``: the footer's batch
    index makes (file, batch range) the scan unit — each task memory-
    maps its file and materializes ONLY its batch range (+ projected
    columns), so a single large file still reads wide."""
    import ray

    units = []
    for p in _ipc_files(path):
        with pa.memory_map(p) as mm:
            n = pipc.RecordBatchFileReader(mm).num_record_batches
        for a in range(0, max(n, 1), batches_per_task):
            units.append({"path": p, "start": a,
                          "stop": min(a + batches_per_task, n)})
    src = ray.data.from_items(units, override_num_blocks=max(1, len(units)))

    def load(batch: pa.Table) -> pa.Table:
        outs = []
        for i in range(batch.num_rows):
            p = batch["path"][i].as_py()
            a = int(batch["start"][i].as_py())
            b = int(batch["stop"][i].as_py())
            with pa.memory_map(p) as mm:
                r = pipc.RecordBatchFileReader(mm)
                tabs = [pa.Table.from_batches([r.get_batch(j)])
                        for j in range(a, min(b, r.num_record_batches))]
            if tabs:
                t = pa.concat_tables(tabs)
                outs.append(t.select(columns) if columns else t)
        if not outs:
            return pa.table({})
        return pa.concat_tables(outs)

    return src.map_batches(load, batch_format="pyarrow", batch_size=1)


def read_arrow_ipc_table(path: str, *, columns=None) -> pa.Table:
    """Driver-side read (small layers)."""
    tabs = []
    for p in _ipc_files(path):
        with pa.memory_map(p) as mm:
            t = pipc.RecordBatchFileReader(mm).read_all()
        tabs.append(t.select(columns) if columns else t)
    return pa.concat_tables(tabs)
