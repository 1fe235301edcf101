"""Benchmark harness (driver contract).

Headline: the flagship spatial-join + tile-assignment pipeline
(BASELINE.json metric: docs/sec over the interleaved corpus) — corpus
pre-written to parquet so the measured window is pure engine work (read ->
geo explode -> cell assign -> polygon join -> salted partition -> resumable
sink), plus a set of representative queries over $GRAFT_SF_DIR.

Prints ONE JSON line. `--scaling` runs the headline at num_cpus=8 and 32
in fresh processes on the same input — MEDIAN of 3 runs per level, raw
run lists included — and reports both throughputs, the scaling
efficiency, and same-session host CPU/DRAM ceilings (the sandbox
stand-in for N vs 4N nodes).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_POLYGONS = 2000


def corpus_docs_for(sf_dir: str) -> int:
    if os.environ.get("BENCH_N_DOCS"):
        return int(os.environ["BENCH_N_DOCS"])
    import pyarrow.parquet as pq

    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    return max(20_000, n_li // 3)


def ensure_corpus(n_docs: int) -> str:
    """Write the deterministic interleaved corpus once; reused across runs
    and parallelism levels so every measurement reads identical input.
    BENCH_GEO_FRAC > default marks a geo-heavy variant (scaling corpus)."""
    geo_frac = float(os.environ.get("BENCH_GEO_FRAC", "0.2"))
    tag = "" if geo_frac == 0.2 else f"_g{int(geo_frac * 100)}"
    path = f"/tmp/graft_corpus_{n_docs}{tag}"
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    from geospatialtools_ray import synth

    shutil.rmtree(path, ignore_errors=True)
    synth.docs_dataset(
        n_docs, override_num_blocks=max(64, n_docs // 12_500), geo_frac=geo_frac
    ).write_parquet(path)
    open(marker, "w").close()
    return path


def run_headline(corpus_path: str, n_docs: int) -> dict:
    import ray.data as rd

    from geospatialtools_ray.pipelines import flagship

    out_dir = f"/tmp/graft_bench_out_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    # warm page cache (untimed): one streaming pass over the input
    rd.read_parquet(corpus_path).count()
    # settle writeback debt (untimed): a prior run in this scaling batch
    # left ~GBs of dirty pages; without the sync their flush lands inside
    # the NEXT run's timed window (measured 80M 32-CPU spread 256-410 s)
    os.sync()
    t0 = time.monotonic()
    # skew pre-pass (measured, part of the pipeline): 2% hash-sample density
    # -> salt map so no partition group exceeds the target; without it the
    # hotspot cells serialize the shuffle and the writers (urban-hotspot
    # skew, BASELINE.json north_star)
    idx_ref = flagship.polygon_index_ref(N_POLYGONS)
    # file-level sample (docs are hash-distributed across files, so any
    # file subset is unbiased): reads ~1/40th of the corpus instead of all
    files = sorted(f for f in os.listdir(corpus_path) if f.endswith(".parquet"))
    sample_files = [os.path.join(corpus_path, f) for f in files[:: max(len(files) // 2, 1)]][:2] or [
        os.path.join(corpus_path, files[0])
    ]
    salts = flagship.estimate_salts_from_files(
        sample_files, flagship.DEFAULT_PART_RES,
        target_rows_per_part=1_000_000, sample_rate=len(sample_files) / max(len(files), 1),
        index_ref=idx_ref,
    )
    docs = rd.read_parquet(corpus_path)
    stats = flagship.run(
        docs, out_dir=out_dir, n_polygons=N_POLYGONS, resume=False, salt_map=salts, sink="fragments",
        key_mode=os.environ.get("BENCH_KEY_MODE", "u64"), index_ref=idx_ref,
        # BENCH_NARROW=1: f32 coords + u32 cell/part-key + i32/f32 join
        # payload through the whole fan-out (the round-5 DRAM-bound
        # ablation — see BASELINE.md scaling section)
        narrow=bool(os.environ.get("BENCH_NARROW")),
    )
    dt = time.monotonic() - t0
    return {"sec": dt, "docs_per_sec": n_docs / dt, "join_rows": int(stats["rows_out"].sum())}


def run_queries() -> dict[str, float]:
    import __ray_entry__ as entrymod

    picks = [
        "q1_pricing_summary",
        "q5_nation_revenue",
        "events_tumbling_hourly",
        "docs_exact_dedup",
        "docs_knn_stations",
        "ann_topk_cosine",
        "soil_pedotransfer",
    ]
    qs = entrymod.queries()
    out = {}
    for name in picks:
        if name not in qs:
            continue
        t0 = time.monotonic()
        qs[name](SF_DIR)
        out[name] = round(time.monotonic() - t0, 3)
    return out


def host_cpu_ceiling(lo: int, hi: int) -> float:
    """Measured upper bound on lo->hi process scaling for THIS host,
    completely outside Ray: identical pure-Python busy loops run in `lo`
    and `hi` concurrent processes; the per-task slowdown at `hi` is a
    property of the machine (vCPU throttling / host oversubscription /
    turbo), not of the engine. Efficiency values should be read against
    this ceiling."""
    import multiprocessing as mp

    def wall(nproc: int) -> float:
        with mp.Pool(nproc) as p:
            t0 = time.monotonic()
            p.map(_burn, range(nproc))
            return time.monotonic() - t0

    wall(2)  # warm pool fork paths
    t_lo, t_hi = wall(lo), wall(hi)
    # same per-process work at both levels: ideal wall is equal; the ratio
    # is the per-task slowdown, i.e. the max attainable efficiency
    return round(t_lo / t_hi, 3)


def _burn(_):
    x = 0
    for i in range(20_000_000):
        x += i * i
    return x


def host_mem_ceiling(lo: int, hi: int) -> float:
    """The memory-bandwidth twin of host_cpu_ceiling: identical numpy
    array-streaming loops (200 MB working set, far beyond LLC) in `lo` vs
    `hi` concurrent processes — no Ray. On this class of host DRAM saturates
    well below 32-way, so memory-traffic-heavy stages (the join fan-out,
    the sink encode) are bounded by THIS number, not the CPU ceiling.
    Separate cluster nodes each bring their own memory system, so the bound
    does not exist on the real N vs 4N criterion."""
    import multiprocessing as mp

    def wall(nproc: int) -> float:
        with mp.Pool(nproc) as p:
            t0 = time.monotonic()
            p.map(_burn_mem, range(nproc))
            return time.monotonic() - t0

    wall(2)
    return round(wall(lo) / wall(hi), 3)


def _burn_mem(_):
    import numpy as np

    a = np.arange(25_000_000, dtype=np.float64)
    s = 0.0
    for _ in range(12):
        s += float(a.sum())
        a *= 1.0000001
    return s


def run_minhash_probe(corpus_path: str) -> float:
    """Compute-bound scaling probe: MinHash signatures over doc text spans.
    The headline join is memory-bandwidth-heavy (string fan-out), which on a
    SINGLE box makes N vs 4N processes contend for the same DRAM — a
    confound that does not exist between separate nodes. This probe has
    ~40us of pure CPU per doc (vectorized sketch) and negligible memory
    traffic (the doc-text join is one Arrow kernel), isolating the
    executor's own scaling."""
    import pyarrow as pa
    import ray.data as rd

    from geospatialtools_ray.stages.dedup import minhash_signature_batch

    files = sorted(
        os.path.join(corpus_path, f) for f in os.listdir(corpus_path) if f.endswith(".parquet")
    )
    # full corpus at num_perm=256: after the round-3/4 sketch vectorization
    # the old half-corpus/64-perm probe finished in ~8 s at 8 CPUs — nearly
    # all fixed startup at 32 CPUs, measuring overhead instead of scaling.
    # This sizing lands ~21 s at 8 CPUs so the 32-CPU run is still
    # work-dominated.
    subset = files

    def sig(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        spans = batch["spans"].combine_chunks()
        # vectorized doc text: join each doc's span texts with one Arrow
        # kernel (the old per-doc Python " ".join dominated the probe and
        # made it memory-, not compute-, bound)
        txt_list = pa.ListArray.from_arrays(spans.offsets, spans.flatten().field("text"))
        texts = pc.binary_join(txt_list, " ")
        s = minhash_signature_batch(texts, num_perm=256, k=3)
        return pa.table({"h": pa.array(s[:, 0], type=pa.uint64())})

    t0 = time.monotonic()
    rd.read_parquet(subset).map_batches(sig, batch_format="pyarrow").count()
    return time.monotonic() - t0


def wait_for_quiet_host() -> dict:
    """Load-gate (VERDICT r3 #5): cross-round headline comparisons alias
    host noise when another job shares the box (r03's 4.63 s ran at load
    3.48 inside a 3.6-4.8 s band). Wait until 1-min load < BENCH_LOAD_GATE
    (default 1.0), polling every 20 s for up to BENCH_LOAD_WAIT_SEC
    (default 240) — then run regardless, recording what happened."""
    gate = float(os.environ.get("BENCH_LOAD_GATE", "1.0"))
    budget = float(os.environ.get("BENCH_LOAD_WAIT_SEC", "240"))
    waited, retries = 0.0, 0
    load = os.getloadavg()[0]
    while load >= gate and waited < budget:
        time.sleep(20)
        waited += 20
        retries += 1
        load = os.getloadavg()[0]
    return {
        "load_pre_run": round(load, 2),
        "load_gate": gate,
        "load_gate_retries": retries,
        "load_gated_ok": bool(load < gate),
    }


def main():
    import ray

    gate_info = wait_for_quiet_host()
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    n_docs = corpus_docs_for(SF_DIR)
    corpus = ensure_corpus(n_docs)
    head = run_headline(corpus, n_docs)
    queries = {} if os.environ.get("BENCH_HEADLINE_ONLY") else run_queries()
    rec = {
        "metric": "end-to-end spatial-join + tile-assignment (corpus read -> geo explode -> polygon join -> salted partition -> resumable sink)",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(SF_DIR.rstrip("/").split("sf")[-1]),
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "docs_per_sec": round(head["docs_per_sec"], 1),
        "join_rows": head["join_rows"],
        # 1-min load BEFORE this process's own work is indistinguishable
        # here, so this is load DURING the run: >~2 with nothing else of
        # ours running means external host contention (the numbers swing
        # 2x between quiet and noisy windows — see BASELINE.md)
        "load_avg_1m": round(os.getloadavg()[0], 2),
        **gate_info,
    }
    if os.environ.get("BENCH_MINHASH_PROBE"):
        rec["minhash_sec"] = round(run_minhash_probe(corpus), 3)
    print(json.dumps(rec))
    ray.shutdown()


def scaling():
    """Two parallelism levels in fresh processes (the sandbox stand-in for
    N vs 4N nodes). Uses a larger corpus than the plain bench so the job is
    compute-bound — at the default sf0.1 size the whole pipeline is ~30
    CPU-seconds and wall time is dominated by fixed startup, which measures
    overhead, not scaling."""
    lo, hi = 8, 32
    # median of >= 3 fresh runs per level (round-2 verdict item 5: the
    # 0.476-vs-0.659 spread on nominally identical runs says one run —
    # or a best-of — proves little)
    repeats = int(os.environ.get("BENCH_SCALING_REPEATS", "3"))

    def median(vals):
        s = sorted(vals)
        m = len(s) // 2
        return s[m] if len(s) % 2 else 0.5 * (s[m - 1] + s[m])

    res = {}
    for n in (lo, hi):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(n),
            BENCH_HEADLINE_ONLY="1",
            BENCH_MINHASH_PROBE="1",
            BENCH_N_DOCS=os.environ.get("BENCH_N_DOCS", "8000000"),
            BENCH_GEO_FRAC=os.environ.get("BENCH_GEO_FRAC", "0.8"),
            # no load-gating inside scaling children: the PREVIOUS run's own
            # decaying load would otherwise stall every repeat; the protocol
            # here is medians-of-3 + same-session ceilings instead
            BENCH_LOAD_WAIT_SEC="0",
        )
        recs = []
        for _ in range(repeats):
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")], env=env, capture_output=True, text=True, check=True
            ).stdout
            recs.append(json.loads(out.strip().splitlines()[-1]))
        agg = dict(recs[0])
        agg["value"] = round(median([r["value"] for r in recs]), 3)
        agg["docs_per_sec"] = round(agg["n_docs"] / agg["value"], 1)
        agg["runs_sec"] = [r["value"] for r in recs]
        if all("minhash_sec" in r for r in recs):
            agg["minhash_sec"] = round(median([r["minhash_sec"] for r in recs]), 3)
        res[n] = agg
    t_lo, t_hi = res[lo]["value"], res[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    rec = {
        "sec_8": t_lo,
        "sec_32": t_hi,
        "docs_per_sec_8": res[lo]["docs_per_sec"],
        "docs_per_sec_32": res[hi]["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "n_docs": res[lo]["n_docs"],
        "runs_sec_8": res[lo]["runs_sec"],
        "runs_sec_32": res[hi]["runs_sec"],
        "repeats": repeats,
        "aggregation": "median",
    }
    if "minhash_sec" in res[lo]:
        rec["minhash_sec_8"] = res[lo]["minhash_sec"]
        rec["minhash_sec_32"] = res[hi]["minhash_sec"]
        rec["minhash_scaling_efficiency"] = round((res[lo]["minhash_sec"] / res[hi]["minhash_sec"]) / (hi / lo), 3)
    rec["host_cpu_ceiling"] = host_cpu_ceiling(lo, hi)
    rec["host_mem_ceiling"] = host_mem_ceiling(lo, hi)
    print(json.dumps(rec))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
