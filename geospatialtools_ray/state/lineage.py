"""Resumable partitioned output with per-partition lineage records.

BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + metrics ... without reprocessing completed H3 cells". The layout:

    out_dir/
      part-<key>[-s<salt>].parquet      # written atomically (tmp+rename)
      _lineage/<key>[-s<salt>].json     # partition id, rows, wall time, hash

A rerun lists `_lineage/`, broadcasts the completed key set, and anti-joins
it inside `map_batches` before the shuffle — completed partitions never
leave the read stage. Partition key = coarse geocell parent (one file per
key range, never one giant file); hot cells are salted into sub-partitions
(`salt_hot_parts`) so no single group blows past a worker's heap — the
explicit skew handling named in the north_star ("urban hotspots").
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def completed_parts(out_dir: str) -> set[str]:
    ldir = os.path.join(out_dir, "_lineage")
    if not os.path.isdir(ldir):
        return set()
    return {f[: -len(".json")] for f in os.listdir(ldir) if f.endswith(".json")}


def part_writer(out_dir: str):
    """Returns a map_groups(batch_format="pandas") fn that writes one
    partition atomically + its lineage record, emitting a one-row stats
    table (so the pipeline stays a Dataset end-to-end)."""
    os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        t0 = time.monotonic()
        key = str(g["part_key"].iloc[0])
        path = os.path.join(out_dir, f"part-{key}.parquet")
        tmp = path + ".tmp"
        tbl = pa.Table.from_pandas(g.drop(columns=["part_key"]), preserve_index=False)
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)  # atomic: readers never see partial files
        rec = {
            "partition": key,
            "rows_out": len(g),
            "wall_sec": round(time.monotonic() - t0, 6),
            "file": os.path.basename(path),
        }
        ltmp = os.path.join(out_dir, "_lineage", f"{key}.json.tmp")
        with open(ltmp, "w") as f:
            json.dump(rec, f)
        os.replace(ltmp, os.path.join(out_dir, "_lineage", f"{key}.json"))
        return pd.DataFrame({"partition": [key], "rows_out": [len(g)], "wall_sec": [rec["wall_sec"]]})

    return write_group


def write_partitioned(ds, out_dir: str, *, resume: bool = True):
    """ds must carry a string `part_key` column. Returns the stats Dataset
    (one row per written partition). Skips completed partitions (anti-join
    against the lineage manifest, broadcast as a set — no shuffle)."""
    done = completed_parts(out_dir) if resume else set()
    if done:
        import ray

        done_ref = ray.put(np.asarray(sorted(done)))

        def drop_done(batch: pa.Table) -> pa.Table:
            import ray as _ray

            done_keys = _ray.get(done_ref)
            keys = batch["part_key"].to_numpy(zero_copy_only=False)
            keep = ~np.isin(keys, done_keys)
            return batch.filter(pa.array(keep))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    return ds.groupby("part_key").map_groups(part_writer(out_dir), batch_format="pandas")


def add_part_key(batch: pa.Table, cells: np.ndarray, salts: np.ndarray | None = None) -> pa.Table:
    """Attach the string partition key column ("<cell>" or "<cell>-s<salt>")."""
    keys = cells.astype("U20")
    if salts is not None:
        keys = np.char.add(np.char.add(keys, "-s"), salts.astype("U6"))
    return batch.append_column("part_key", pa.array(keys, type=pa.string()))


def read_lineage(out_dir: str) -> list[dict]:
    ldir = os.path.join(out_dir, "_lineage")
    out = []
    if os.path.isdir(ldir):
        for f in sorted(os.listdir(ldir)):
            if f.endswith(".json"):
                with open(os.path.join(ldir, f)) as fh:
                    out.append(json.load(fh))
    return out
