#!/usr/bin/env python
"""`ray job submit` entrypoint for the engine's production pipelines.

On a fixed-size multi-node cluster (the north-rule deployment shape):

    ray job submit --working-dir . -- \
        python tools/run_pipeline.py flagship \
            --input-glob '/data/shards/*.parquet' --out /data/joined

    ray job submit --working-dir . -- \
        python tools/run_pipeline.py terrain --n 8192 --tile 1024 \
            --out /data/terrain --checkpoint-dir /data/terrain_ck

Single node / sandbox (RAY_ADDRESS=local is preset here):

    python tools/run_pipeline.py flagship --docs 20000 --out /tmp/fj
    python tools/run_pipeline.py query events_type_hour_pivot \
        --sf-dir /root/testdata/sf0.001

The job owns the Ray session (`ray.init(address=...)`, `ray.shutdown()`);
the library never initializes Ray itself. Every run prints ONE final JSON
line (machine-readable: rows, partitions/tiles, wall seconds) and relies
on the lineage sink / round checkpoints for mid-run resume: re-submitting
the SAME command after a failure skips completed waves, partitions, and
terrain rounds instead of reprocessing them.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _init_ray():
    import ray

    if not ray.is_initialized():
        # inside a `ray job submit` job the right address is the cluster's
        # ("auto"); the sandbox presets RAY_ADDRESS=local
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"), include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_flagship(args) -> dict:
    from geospatialtools_ray import synth
    from geospatialtools_ray.pipelines import flagship

    if args.input_glob:
        files = sorted(glob.glob(args.input_glob))
        if not files:
            raise SystemExit(f"no input files match {args.input_glob!r}")
        stats, n_waves = flagship.run_waves(
            files, out_dir=args.out, wave_size=args.wave_size, n_polygons=args.n_polygons
        )
        rows = int(stats["rows_out"].sum()) if len(stats) else 0
        return {"pipeline": "flagship", "input_files": len(files), "waves_run": n_waves,
                "rows_out": rows, "out": args.out}
    ds = synth.docs_dataset(args.docs, override_num_blocks=max(8, args.docs // 2500))
    stats = flagship.run(ds, out_dir=args.out, n_polygons=args.n_polygons,
                         sink="fragments", resume=not args.no_resume)
    return {"pipeline": "flagship", "docs": args.docs,
            "rows_out": int(stats["rows_out"].sum()), "partitions": int(len(stats)),
            "out": args.out}


def cmd_terrain(args) -> dict:
    import numpy as np

    from geospatialtools_ray import synth
    from geospatialtools_ray.terrain import dist as D
    from geospatialtools_ray.terrain import tiles as T

    res = 30.0
    z, mask = synth.dem_grid(args.dem, args.n)
    z = np.where(mask, z, np.float32(-9999.0)).astype(np.float32)
    ds = T.make_tiles_dataset({"dem": z}, args.tile)
    ck = args.checkpoint_dir
    filled = D.fill_dist(ds, res, checkpoint_dir=os.path.join(ck, "fill") if ck else None)
    fdir = D.fdir_dist(filled, res, args.n, args.n)
    acc = D.acc_dist(fdir, args.tile, args.n, args.n,
                     checkpoint_dir=os.path.join(ck, "acc") if ck else None)
    os.makedirs(args.out, exist_ok=True)
    acc = acc.materialize()  # one execution: count() below is then metadata
    acc.write_parquet(args.out)
    return {"pipeline": "terrain", "n": args.n, "tile": args.tile,
            "tiles_out": acc.count(), "out": args.out}


def cmd_query(args) -> dict:
    import importlib.util

    import pandas as pd

    spec = importlib.util.spec_from_file_location(
        "ray_entry_job", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                      "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q = mod.queries()
    if args.name not in q:
        raise SystemExit(f"unknown query {args.name!r}; have: {sorted(q)}")
    res = q[args.name](args.sf_dir)
    if hasattr(res, "to_pandas") and not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    return {"pipeline": "query", "name": args.name, "rows": int(len(res)),
            "columns": list(map(str, res.columns))}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    fl = sub.add_parser("flagship", help="spatial-join + tile-assignment over interleaved docs")
    fl.add_argument("--input-glob", help="parquet shards of interleaved documents; omit to synthesize")
    fl.add_argument("--docs", type=int, default=20_000, help="synthetic corpus size when no --input-glob")
    fl.add_argument("--out", required=True)
    fl.add_argument("--n-polygons", type=int, default=500)
    fl.add_argument("--wave-size", type=int, default=8)
    fl.add_argument("--no-resume", action="store_true")
    fl.set_defaults(fn=cmd_flagship)

    tc = sub.add_parser("terrain", help="fill -> D8 fdir -> accumulation chain over a tiled DEM")
    tc.add_argument("--n", type=int, default=512)
    tc.add_argument("--tile", type=int, default=128)
    tc.add_argument("--dem", default="twovalley", help="synth DEM kind (twovalley|diagonal|...)")
    tc.add_argument("--out", required=True)
    tc.add_argument("--checkpoint-dir", help="round-checkpoint dir (resume on re-submit)")
    tc.set_defaults(fn=cmd_terrain)

    qr = sub.add_parser("query", help="run one registry query from __ray_entry__")
    qr.add_argument("name")
    qr.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    qr.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    ray = _init_ray()
    t0 = time.time()
    out = args.fn(args)
    out["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
