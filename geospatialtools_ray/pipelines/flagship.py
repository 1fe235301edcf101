"""Flagship pipeline: interleaved corpus -> geometry extraction -> polygon
spatial join -> tile assignment -> resumable partitioned sink with lineage.

This is the workload BASELINE.json measures (docs/sec end-to-end): the
engine equivalent of the reference's `shapefile2raster` + point-sampling
flows (libraries/gdal_tools.py:170-192, :9-34) fused over the doc corpus.

Stages (all lazy; the streaming executor pipelines them):
  1. docs (read_parquet or stateless synthesis)           — source
  2. explode_geo_points + attach_cell                     — map_batches, Arrow
  3. SpatialJoin actor pool (broadcast polygon index)     — map_batches(Cls)
  4. salted partition key (skew-aware, density-estimated) — map_batches
  5. write_partitioned (+ per-partition lineage)          — groupby/map_groups
  6. tile stats (per-batch partial counts -> tiny groupby) — aggregate

The only shuffles are (5) keyed by the salted coarse cell and the tiny
pre-aggregated (6).
"""

from __future__ import annotations

import numpy as np

from .. import io
import pyarrow as pa
import pyarrow.compute as pc

from .. import geocell, synth
from ..stages.spans import attach_cell, explode_geo_points
from ..stages.spatial_join import PolygonIndex, SpatialJoin
from ..state import lineage

DEFAULT_RES = 6  # join/tile resolution (~2.8 deg cells)
DEFAULT_PART_RES = 3  # output partition resolution

# Fragment-sink parquet encoding for the flagship schema, measured by
# ablation at 8M docs / 111M join rows / 32 CPUs (round 4): dictionary on
# the low-cardinality keys + byte-stream-split on the coordinates cut the
# sink wall 25.2 s -> 13.2 s vs plain-snappy (zstd variants: 17.6-18.5 s;
# sink_batch_rows=2M serialized the writers at 140 s — do not coalesce).
DEFAULT_ENCODE = {
    "use_dictionary": ["cell", "poly_id", "field_value"],
    "use_byte_stream_split": ["lon", "lat"],
}


def polygon_index_ref(n_polygons: int, cover_res: int = DEFAULT_RES):
    """Build + broadcast the polygon index once (ray.put), so every join
    actor shares one copy through the object store."""
    import ray

    layer = synth.make_polygons(n_polygons, cover_res=cover_res)
    return ray.put(PolygonIndex.from_synth(layer, cover_res))


def geo_points(docs_ds, res: int = DEFAULT_RES, key_mode: str = "string",
               narrow: bool = False):
    """key_mode="u64" ships an 8-byte packed doc key through the join
    instead of the string id (see spans.doc_key_u64) — the scale default
    for the bench; "string" preserves the raw id column. narrow=True is
    the ablation/scale variant: f32 coords + u32 compact cell (~1 m
    coordinate quantization; see explode_geo_points)."""
    return docs_ds.map_batches(
        explode_geo_points, fn_kwargs={"key_mode": key_mode, "f32_coords": narrow},
        batch_format="pyarrow",
    ).map_batches(lambda b: attach_cell(b, res, compact=narrow), batch_format="pyarrow")


def estimate_salts(
    docs_ds, part_res: int, target_rows_per_part: int, sample_rate: float, res: int = DEFAULT_RES,
    index_ref=None, already_sampled: bool = False,
) -> dict[int, int]:
    """Cheap density pre-pass on a deterministic hash-sample of docs: per
    coarse cell estimated row count -> number of salts so no partition group
    exceeds ~target_rows_per_part. Returns {} when nothing is hot.

    Pass `index_ref` (broadcast PolygonIndex) to estimate JOIN-OUTPUT rows
    rather than geo points — hot cells are hot because polygons concentrate
    there too, so point density alone badly underestimates the skew."""
    import pyarrow as pa

    from ..hashing import text_hash_u64

    if sample_rate < 1.0 and not already_sampled:
        # row-level hash sample; when the caller can sample at the FILE /
        # shard level instead (already_sampled=True with docs_ds = a file
        # subset), the pre-pass avoids reading the whole corpus entirely
        denom = max(int(round(1.0 / sample_rate)), 1)

        def sample(batch: pa.Table) -> pa.Table:
            h = text_hash_u64(batch["doc_id"])
            return batch.filter(pa.array(h % np.uint64(denom) == 0))

        docs_ds = docs_ds.map_batches(sample, batch_format="pyarrow")
        sample_rate = 1.0 / denom
    pts = geo_points(docs_ds, res)
    if index_ref is not None:
        from ..stages.spatial_join import join_batch

        pts = pts.map_batches(join_batch, fn_kwargs={"index_ref": index_ref}, batch_format="pyarrow")

    def partial_counts(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        parents = geocell.parent(cells, part_res)
        u, c = np.unique(parents, return_counts=True)
        return pa.table({"part": pa.array(u, type=pa.uint64()), "n": pa.array(c, type=pa.int64())})

    # the partials are tiny (<= one row per COARSE cell per batch), so a
    # driver-side merge replaces the groupby: the pre-pass was paying a
    # full shuffle stage's startup (~1.5 s) to aggregate a few hundred
    # rows, which dominated the whole estimate at high parallelism
    partials = pts.map_batches(partial_counts, batch_format="pyarrow").take_all()
    merged: dict[int, int] = {}
    for row in partials:
        merged[int(row["part"])] = merged.get(int(row["part"]), 0) + int(row["n"])
    return _salts_from_counts(merged, sample_rate, target_rows_per_part)


def _salts_from_counts(merged: dict[int, int], sample_rate: float, target_rows_per_part: int) -> dict[int, int]:
    out: dict[int, int] = {}
    for part, n in merged.items():
        est = n / max(sample_rate, 1e-9)
        # clamp to the part_key encoding's salt space: cell*MAX_SALTS+salt
        # (lineage.add_part_key) — salt >= MAX_SALTS would alias into the
        # NEXT cell's key range and silently mix two coarse cells
        s = int(min(np.ceil(est / target_rows_per_part), lineage.MAX_SALTS))
        if s > 1:
            out[part] = s
    return out


# below this many sample bytes the pre-pass runs on the driver: one small
# pyarrow read + the same batch kernels, skipping a full Dataset
# execution's startup (~0.8 s — measured 40% of the sf0.1 headline). The
# Dataset path stays the default the moment samples are real data.
LOCAL_SALT_SAMPLE_BYTES = 64 << 20


def estimate_salts_from_files(
    sample_files: list[str], part_res: int, target_rows_per_part: int, sample_rate: float,
    res: int = DEFAULT_RES, index_ref=None,
) -> dict[int, int]:
    """File-level-sampled salt estimate (the caller guarantees the file
    subset is unbiased). Dispatches on total sample size: a few MB of
    sample parquet is processed driver-locally with the SAME batch kernels
    (explode -> cell -> join -> partial counts, vectorized, streamed one
    row-group at a time); larger samples go through the Dataset path."""
    import os

    import ray.data as rd

    total = sum(os.path.getsize(f) for f in sample_files)
    if total > LOCAL_SALT_SAMPLE_BYTES:
        return estimate_salts(
            rd.read_parquet(sample_files), part_res, target_rows_per_part,
            sample_rate, res=res, index_ref=index_ref, already_sampled=True,
        )
    import pyarrow.parquet as pq

    from ..stages.spatial_join import join_batch

    merged: dict[int, int] = {}
    for f in sample_files:
        pf = pq.ParquetFile(f)
        for rb in pf.iter_batches(columns=["doc_id", "spans"]):
            batch = pa.Table.from_batches([rb])
            pts = attach_cell(explode_geo_points(batch), res)
            if index_ref is not None:
                pts = join_batch(pts, index_ref=index_ref)
            parents = geocell.parent(pts["cell"].to_numpy(zero_copy_only=False), part_res)
            u, c = np.unique(parents, return_counts=True)
            for p, n in zip(u.tolist(), c.tolist()):
                merged[int(p)] = merged.get(int(p), 0) + int(n)
    return _salts_from_counts(merged, sample_rate, target_rows_per_part)


def run(
    docs_ds,
    *,
    out_dir: str,
    n_polygons: int = 500,
    res: int = DEFAULT_RES,
    part_res: int = DEFAULT_PART_RES,
    join_concurrency=None,
    salt_map: dict[int, int] | None = None,
    target_rows_per_part: int = 2_000_000,
    resume: bool = True,
    sink: str = "grouped",
    key_mode: str = "string",
    compression: str = "snappy",
    sink_batch_rows: int | None = None,
    wave: int | None = None,
    encode: dict | None = None,
    index_ref=None,
    narrow: bool = False,
):
    """Returns a per-partition stats DataFrame (small); the bulk join output
    lands under out_dir as partitioned parquet + lineage records.
    sink="grouped": one file per partition via a groupby shuffle (strict
    per-partition mid-run commits). sink="fragments": shuffle-free fragment
    directories with end-of-run commits (the high-throughput path)."""
    import ray

    from ..stages.spatial_join import join_batch

    # reuse a prebuilt broadcast index when the caller already has one
    # (the salt pre-pass needs the same index, and run_waves calls run()
    # once per wave) — each build+put is ~0.3 s of driver time
    idx_ref = index_ref if index_ref is not None else polygon_index_ref(n_polygons, cover_res=res)
    pts = geo_points(docs_ds, res, key_mode=key_mode, narrow=narrow)
    # stateless tasks + per-process index cache: elastic across every CPU
    # with no actor-pool startup tax (index fetched from the object store
    # once per worker process)
    joined = pts.map_batches(
        join_batch,
        fn_kwargs={"index_ref": idx_ref, "narrow": narrow},
        batch_format="pyarrow",
    )

    salt_ref = ray.put(salt_map or {})

    def add_key(batch: pa.Table) -> pa.Table:
        smap = ray.get(salt_ref)
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        if narrow:
            # compact u32 cells: packed parent for the salt-map lookup,
            # compact parent for the u32 part key (part_res cell count is
            # tiny, so compact_parent * MAX_SALTS + salt fits u32)
            parents, cparents = geocell.compact_parent(cells, res, part_res)
        else:
            parents = geocell.parent(cells, part_res)
        if smap:
            # vectorized lookup: resolve the salt count once per DISTINCT
            # parent cell, then broadcast via inverse indices
            uniq, inv = np.unique(parents, return_inverse=True)
            nsalt_u = np.asarray([smap.get(int(p), 1) for p in uniq], dtype=np.uint64)
            nsalt = nsalt_u[inv]
            if "doc_key" in batch.column_names:
                from ..hashing import h64

                doc_h = h64(batch["doc_key"].to_numpy(zero_copy_only=False))
            else:
                from ..hashing import text_hash_u64

                doc_h = text_hash_u64(batch["doc_id"])
            salts = (doc_h % np.maximum(nsalt, 1)).astype(np.int64)
            salts = np.where(nsalt > 1, salts, 0)
            if narrow:
                return lineage.add_part_key(batch, cparents, salts, u32=True)
            return lineage.add_part_key(batch, parents, salts)
        if narrow:
            return lineage.add_part_key(batch, cparents, u32=True)
        return lineage.add_part_key(batch, parents)

    keyed = joined.map_batches(add_key, batch_format="pyarrow")
    if sink == "count":
        # ablation mode: run the full transform chain but skip the sink —
        # isolates encode+disk cost from compute when tuning the fragment
        # encoding (VERDICT r3 ask 4)
        import pandas as pd

        return pd.DataFrame({"partition": [0], "rows_out": [keyed.count()]})
    if sink == "fragments":
        # shuffle-free fragment sink (the scale path; see lineage.py);
        # emits the per-stage metrics sidecar itself
        return lineage.write_partitioned_fragments(
            keyed, out_dir, resume=resume, compression=compression,
            sink_batch_rows=sink_batch_rows, wave=wave,
            encode=DEFAULT_ENCODE if encode is None else encode,
        )
    return lineage.write_partitioned(keyed, out_dir, resume=resume).to_pandas()


def run_waves(
    input_files: list[str],
    *,
    out_dir: str,
    wave_size: int = 8,
    n_polygons: int = 500,
    res: int = DEFAULT_RES,
    part_res: int = DEFAULT_PART_RES,
    salt_map: dict[int, int] | None = None,
    key_mode: str = "string",
    compression: str = "snappy",
):
    """Wave-driven flagship run: the input shard list is processed in waves
    of `wave_size` files, each wave committed atomically to the fragment
    sink (lineage.write_partitioned_fragments(wave=...)). A mid-run failure
    loses at most the wave in flight: committed waves are skipped at the
    INPUT level (their shards are never re-read), and the interrupted
    wave's partial fragments are wiped before it reruns. This is the
    100-TB default drive loop (VERDICT round 1, flagship audit note).

    Returns (stats_df, n_waves_run)."""
    import pandas as pd
    import ray.data as rd

    from ..state.lineage import clean_wave_fragments, wave_committed, write_partitioned_fragments

    waves = [input_files[i : i + wave_size] for i in range(0, len(input_files), wave_size)]
    all_stats = []
    n_run = 0
    idx_ref = polygon_index_ref(n_polygons, cover_res=res)  # once, not per wave
    for w, files in enumerate(waves):
        if wave_committed(out_dir, w):
            continue
        clean_wave_fragments(out_dir, w)
        stats = run(
            io.read_table(files),
            out_dir=out_dir,
            n_polygons=n_polygons,
            index_ref=idx_ref,
            res=res,
            part_res=part_res,
            salt_map=salt_map,
            resume=False,
            sink="fragments",
            key_mode=key_mode,
            compression=compression,
            wave=w,
        )
        all_stats.append(stats)
        n_run += 1
    return (pd.concat(all_stats, ignore_index=True) if all_stats else pd.DataFrame()), n_run


def tile_counts(out_dir: str):
    """Per-tile join counts, streamed from the written partitioned output
    (one pass over local parquet; per-batch partial counts -> a tiny global
    groupby — the pre-aggregate-before-shuffle pattern)."""
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        u, c = np.unique(cells, return_counts=True)
        return pa.table({"cell": pa.array(u, type=pa.uint64()), "n_hits": pa.array(c, type=pa.int64())})

    from .relational import sorted_group_agg

    ds = io.read_table(out_dir, columns=["cell"])
    # cell cardinality grows with coverage area at scale — sorted_group_agg
    # instead of Ray's per-group-Python aggregate finalize
    return sorted_group_agg(ds.map_batches(partial, batch_format="pyarrow"), "cell", {"n_hits": "sum"})
