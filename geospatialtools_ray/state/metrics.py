"""Per-stage metrics emission (BASELINE.json north_rule: "every partition
emits lineage records and per-stage metrics").

Partition-level lineage lives in lineage.py; this module captures the
per-STAGE side: operator wall times and row counts parsed from the executed
Dataset's stats, written as a JSON sidecar next to the output (one record
per run, monotonically numbered, atomic rename)."""

from __future__ import annotations

import json
import os
import re
import time

_OP_RE = re.compile(r"Operator (\d+) (.+?): .*?in ([0-9.]+)s")
_ROWS_RE = re.compile(r"Output num rows per block: .* ([0-9]+) total")


def parse_stats(stats_text: str) -> list[dict]:
    """Extract (operator, wall seconds, output rows) from Dataset.stats()."""
    ops = []
    blocks = stats_text.split("Operator ")
    for b in blocks[1:]:
        header = "Operator " + b.split("\n", 1)[0]
        m = _OP_RE.match(header)
        rows = None
        rm = _ROWS_RE.search(b)
        if rm:
            rows = int(rm.group(1))
        if m:
            ops.append({"op": m.group(2), "wall_sec": float(m.group(3)), "rows_out": rows})
        else:
            name = b.split(":", 1)[0].split(" ", 1)[-1] if ":" in b else None
            em = re.search(r"executed in ([0-9.]+)s", b)
            if name and em:
                ops.append({"op": name, "wall_sec": float(em.group(1)), "rows_out": rows})
    return ops


def emit_stage_metrics(executed_ds, out_dir: str, run_name: str = "run") -> str | None:
    """Write the stage-metrics sidecar for an EXECUTED dataset (call after
    consumption). Returns the sidecar path."""
    try:
        stats_text = executed_ds.stats()
    except Exception:
        return None
    mdir = os.path.join(out_dir, "_metrics")
    os.makedirs(mdir, exist_ok=True)
    # claim the sequence number with O_EXCL: a file-count seq raced with
    # concurrent emitters (both list N files -> same name -> one record
    # silently lost under os.replace)
    seq = len([f for f in os.listdir(mdir) if f.endswith(".json")])
    while True:
        path = os.path.join(mdir, f"{run_name}-{seq:04d}.json")
        try:
            os.close(os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            break
        except FileExistsError:
            seq += 1
    rec = {
        "run": run_name,
        "seq": seq,
        "wall_clock_unix": time.time(),
        "stages": parse_stats(stats_text),
    }
    # content still lands atomically: replace the claimed (empty) file
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=1)
    os.replace(tmp, path)
    return path
