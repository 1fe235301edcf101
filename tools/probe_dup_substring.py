"""Scale probe for stages/dedup.dup_substring_spans (hash128 payload).

Generates a deterministic synthetic corpus distributed (map_batches over a
range — nothing driver-side), with ~10% of docs embedding one of 1000
shared 64-char blocks (the planted duplicated substrings), runs the
duplicated-span detector end-to-end, and prints one JSON line.

Usage: RAY_GRAFT_CPUS=32 python tools/probe_dup_substring.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
WORDS_PER_DOC = 24
VOCAB = 50_000


def gen(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    parts = []
    for j in range(WORDS_PER_DOC):
        w = ((ids * (2 * j + 3) + 7 * j) % VOCAB).astype(np.int64)
        parts.append(pd.Series(w).map(lambda v, p=j: f"w{v}"))
    text = parts[0].str.cat(parts[1:], sep=" ")
    blk = ids % 1000
    planted = pd.Series(np.where(ids % 10 == 0,
                                 [f" BLK{b:04d}xBLK{b:04d}xBLK{b:04d}xBLK{b:04d}xBLK{b:04d}xBLK{b:04d}x" for b in blk],
                                 ""))
    text = text.str.cat(planted)
    return pa.table({"doc_id": pa.array(ids), "text": pa.array(text.to_numpy(dtype=object), type=pa.string())})


def main():
    import ray
    import ray.data as rd

    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from geospatialtools_ray.stages.dedup import dup_substring_spans

    blocks = max(cpus * 4, 64)
    docs = rd.range(N_DOCS, override_num_blocks=blocks).map_batches(gen, batch_format="pyarrow")
    t0 = time.time()
    out = dup_substring_spans(docs, min_len=20, num_buckets=max(cpus * 8, 256),
                              payload="hash128")
    n_spans = out.count()
    dt = time.time() - t0
    chars = N_DOCS * (WORDS_PER_DOC * 6 + 7)  # rough
    print(json.dumps({
        "probe": "dup_substring_spans", "n_docs": N_DOCS, "num_cpus": cpus,
        "payload": "hash128", "sec": round(dt, 2), "n_spans": n_spans,
        "docs_per_sec": round(N_DOCS / dt),
        "approx_chars": chars,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
