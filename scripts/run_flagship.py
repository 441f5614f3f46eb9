#!/usr/bin/env python
"""Flagship pipeline as a submittable job — the `ray job submit` entry
point of the north rule:

    ray job submit -- python scripts/run_flagship.py \
        --images /tmp/georay_bench_200000_u8192_rg --out /tmp/flagship_out

Runs the fused spatial-join + tile-assignment stage over the mandated
image table and writes RESUMABLE partitioned parquet with per-partition
lineage records: kill the job at any point and re-submitting it skips
every committed partition (anti-join against the manifest —
georay.checkpoint).  A summary JSON line goes to stdout on completion.

The script owns its Ray session (bench.py and the driver own theirs;
the georay library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable from any cwd: the repo root is this file's parent's parent
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True,
                    help="parquet directory of the image table")
    ap.add_argument("--out", required=True,
                    help="output directory (partitioned parquet + manifest)")
    ap.add_argument("--zoom", type=int, default=12)
    ap.add_argument("--polygons", type=int, default=500)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="ray.init num_cpus (default: autodetect)")
    args = ap.parse_args()

    from georay.util import tune_malloc
    tune_malloc()  # must precede ray.init (see util docstring)
    import ray
    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)

    from georay.pipelines import flagship_checkpointed
    t0 = time.perf_counter()
    status = flagship_checkpointed(args.images, args.out, zoom=args.zoom,
                                   n_polygons=args.polygons)
    parts = {"written": 0, "skipped": 0}
    rows = 0
    for b in status.iter_batches(batch_size=4096, batch_format="pyarrow"):
        rows += b.num_rows
        if "status" in b.schema.names:
            vals = b["status"].to_pylist()
            parts["written"] += sum(v == "written" for v in vals)
            parts["skipped"] += sum(v == "skipped" for v in vals)
    print(json.dumps({
        "job": "flagship_checkpointed", "out": args.out,
        "partitions": parts, "status_rows": rows,
        "sec": round(time.perf_counter() - t0, 3),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
