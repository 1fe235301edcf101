"""End-to-end flagship pipeline on Ray: join counts vs oracle, span
invariant, resumable lineage, salted partitioning."""

import os

import numpy as np
import pyarrow as pa
import pytest

from geospatialtools_ray import geocell, synth, wkb
from geospatialtools_ray.pipelines import flagship
from geospatialtools_ray.stages import spans, spatial_join
from geospatialtools_ray.state import lineage

N_DOCS = 2000
N_POLY = 80


def oracle_join_count(n_docs, n_poly):
    t = pa.table(synth.make_docs_batch(np.arange(n_docs, dtype=np.uint64)))
    g = spans.explode_geo_points(t)
    lon = g["lon"].to_numpy()
    lat = g["lat"].to_numpy()
    layer = synth.make_polygons(n_poly, cover_res=flagship.DEFAULT_RES)
    total = 0
    for b in layer["geom_wkb"]:
        rings = wkb.parse_polygon(b)
        total += int(spatial_join.points_in_polygon(lon, lat, rings).sum())
    return total


def test_flagship_end_to_end(ray_session, tmp_path):
    docs = synth.docs_dataset(N_DOCS, override_num_blocks=8)
    out_dir = str(tmp_path / "flagship")
    stats = flagship.run(docs, out_dir=out_dir, n_polygons=N_POLY)
    assert stats["rows_out"].sum() == oracle_join_count(N_DOCS, N_POLY)
    recs = lineage.read_lineage(out_dir)
    assert len(recs) == len(stats)
    assert sum(r["rows_out"] for r in recs) == stats["rows_out"].sum()
    # tile counts stream from the written output and agree in total
    tc = flagship.tile_counts(out_dir).to_pandas()
    assert tc["n_hits"].sum() == stats["rows_out"].sum()
    # every parquet partition file exists and round-trips
    import pyarrow.parquet as pq

    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert len(files) == len(recs)
    one = pq.read_table(os.path.join(out_dir, files[0]))
    assert {"doc_id", "span_ord", "lon", "lat", "cell", "poly_id", "field_value"} <= set(one.column_names)


def test_flagship_resume_skips_completed(ray_session, tmp_path):
    docs = synth.docs_dataset(500, override_num_blocks=4)
    out_dir = str(tmp_path / "resume")
    s1 = flagship.run(docs, out_dir=out_dir, n_polygons=30)
    total1 = s1["rows_out"].sum()
    # delete one partition's data but keep its lineage -> rerun must NOT rewrite it
    recs = lineage.read_lineage(out_dir)
    victim = recs[0]
    os.remove(os.path.join(out_dir, victim["file"]))
    docs2 = synth.docs_dataset(500, override_num_blocks=4)
    s2 = flagship.run(docs2, out_dir=out_dir, n_polygons=30)
    # rerun wrote nothing (all partitions in lineage) -> stats empty or zero rows
    assert len(s2) == 0 or s2["rows_out"].sum() == 0
    assert not os.path.exists(os.path.join(out_dir, victim["file"]))
    # now drop the lineage record too -> rerun rewrites exactly that partition
    os.remove(os.path.join(out_dir, "_lineage", victim["partition"] + ".json"))
    docs3 = synth.docs_dataset(500, override_num_blocks=4)
    s3 = flagship.run(docs3, out_dir=out_dir, n_polygons=30)
    assert len(s3) == 1 and s3["partition"].iloc[0] == victim["partition"]
    assert s3["rows_out"].iloc[0] == victim["rows_out"]
    total2 = sum(r["rows_out"] for r in lineage.read_lineage(out_dir))
    assert total2 == total1


def test_flagship_salting_partitions_hot_cells(ray_session, tmp_path):
    docs = synth.docs_dataset(N_DOCS, override_num_blocks=8)
    sample = synth.docs_dataset(N_DOCS, override_num_blocks=8)
    salts = flagship.estimate_salts(sample, flagship.DEFAULT_PART_RES, target_rows_per_part=200, sample_rate=1.0)
    assert salts, "hotspot fixture should force salting at this target"
    out_dir = str(tmp_path / "salted")
    stats = flagship.run(docs, out_dir=out_dir, n_polygons=N_POLY, salt_map=salts)
    assert stats["rows_out"].sum() == oracle_join_count(N_DOCS, N_POLY)
    # hot partitions actually split into multiple salt files: several
    # part keys share the same parent cell (key // MAX_SALTS)
    from geospatialtools_ray.state.lineage import MAX_SALTS

    parents = stats["partition"].astype("uint64") // MAX_SALTS
    assert parents.duplicated().any()


def test_span_sequence_invariant_through_pipeline(ray_session):
    """input_hint invariant: spans survive a full map_batches chain that
    attaches and removes derived columns."""
    docs = synth.docs_dataset(300, override_num_blocks=4)
    sig_in = pa.concat_tables(
        [spans.span_signature(b) for b in docs.iter_batches(batch_format="pyarrow")]
    )

    def enrich(b: pa.Table) -> pa.Table:
        n = pa.array([len(x) for x in b["spans"].to_pylist()], type=pa.int32())
        return b.append_column("n_spans", n)

    out = synth.docs_dataset(300, override_num_blocks=4).map_batches(enrich, batch_format="pyarrow")
    out = out.select_columns(["doc_id", "spans"])
    sig_out = pa.concat_tables([spans.span_signature(b) for b in out.iter_batches(batch_format="pyarrow")])
    a = dict(zip(sig_in["doc_id"].to_pylist(), sig_in["span_sig"].to_pylist()))
    b = dict(zip(sig_out["doc_id"].to_pylist(), sig_out["span_sig"].to_pylist()))
    assert a == b


def test_wave_sink_resume_after_midwave_interrupt(ray_session, tmp_path):
    """Wave-driven sink: a run interrupted mid-wave loses only that wave.
    The on-disk state a kill -9 leaves is exactly (committed wave manifests
    + partial fragments of the wave in flight + maybe a .tmp) because every
    fragment write is tmp+rename and the wave manifest is written last —
    synthesize that state and assert resume semantics."""
    import ray.data as rd

    corpus_dir = str(tmp_path / "corpus")
    synth.docs_dataset(N_DOCS, override_num_blocks=6).write_parquet(corpus_dir)
    files = sorted(
        os.path.join(corpus_dir, f) for f in os.listdir(corpus_dir) if f.endswith(".parquet")
    )
    files = files[:6]
    assert len(files) == 6

    # reference: uninterrupted wave run
    ref_dir = str(tmp_path / "ref")
    ref_stats, n_ref = flagship.run_waves(files, out_dir=ref_dir, wave_size=2, n_polygons=N_POLY)
    assert n_ref == 3
    ref_total = int(ref_stats["rows_out"].sum())
    assert ref_total > 0

    # interrupted run: wave 0 committed, wave 1 died mid-flight
    out_dir = str(tmp_path / "out")
    flagship.run_waves(files[:2], out_dir=out_dir, wave_size=2, n_polygons=N_POLY)
    assert lineage.wave_committed(out_dir, 0)
    part_dirs = [d for d in os.listdir(out_dir) if d.startswith("part-")]
    junk = os.path.join(out_dir, part_dirs[0], "frag-w1-deadbeef.parquet")
    open(junk, "wb").write(b"partial")
    open(junk + ".tmp", "wb").write(b"torn")
    wave0_frags = {
        (d, f): os.path.getmtime(os.path.join(out_dir, d, f))
        for d in part_dirs
        for f in os.listdir(os.path.join(out_dir, d))
        if f.startswith("frag-w0-")
    }

    # resume: full input; wave 0 must be skipped, wave 1 junk wiped
    stats2, n_run = flagship.run_waves(files, out_dir=out_dir, wave_size=2, n_polygons=N_POLY)
    assert n_run == 2  # only waves 1 and 2 ran
    assert not os.path.exists(junk)
    for (d, f), mtime in wave0_frags.items():
        p = os.path.join(out_dir, d, f)
        assert os.path.exists(p) and os.path.getmtime(p) == mtime, "wave 0 reprocessed"

    # totals match the uninterrupted run (count rows on disk, frag files only)
    def disk_rows(root):
        ds = rd.read_parquet(
            [os.path.join(root, d, f)
             for d in os.listdir(root) if d.startswith("part-")
             for f in os.listdir(os.path.join(root, d)) if f.endswith(".parquet")]
        )
        return ds.count()

    assert disk_rows(out_dir) == disk_rows(ref_dir) == ref_total


def test_estimate_salts_local_matches_dataset_path(ray_session, tmp_path):
    """estimate_salts_from_files: the driver-local small-sample fast path
    and the Dataset path produce IDENTICAL salt maps (same batch kernels,
    same merge math), and the size dispatch picks the Dataset path when
    the sample exceeds the local-bytes budget."""
    import ray.data as rd

    corpus = str(tmp_path / "corpus")
    synth.docs_dataset(N_DOCS, override_num_blocks=4).write_parquet(corpus)
    files = sorted(
        os.path.join(corpus, f) for f in os.listdir(corpus) if f.endswith(".parquet")
    )[:2]
    rate = len(files) / 4
    idx = flagship.polygon_index_ref(N_POLY)
    via_ds = flagship.estimate_salts(
        rd.read_parquet(files), flagship.DEFAULT_PART_RES,
        target_rows_per_part=100, sample_rate=rate, index_ref=idx, already_sampled=True,
    )
    assert via_ds, "fixture should force a non-empty salt map"
    local = flagship.estimate_salts_from_files(
        files, flagship.DEFAULT_PART_RES,
        target_rows_per_part=100, sample_rate=rate, index_ref=idx,
    )
    assert local == via_ds
    old = flagship.LOCAL_SALT_SAMPLE_BYTES
    try:
        flagship.LOCAL_SALT_SAMPLE_BYTES = 0  # force the Dataset dispatch
        assert flagship.estimate_salts_from_files(
            files, flagship.DEFAULT_PART_RES,
            target_rows_per_part=100, sample_rate=rate, index_ref=idx,
        ) == via_ds
    finally:
        flagship.LOCAL_SALT_SAMPLE_BYTES = old


def test_fragment_sink_resume_after_midrun_interrupt(ray_session, tmp_path):
    """wave=None fragment sink, round-5 per-FRAGMENT durability: a run
    killed before the driver's partition commit leaves (committed
    fragments + maybe a .tmp + no lineage). Resume must (a) wipe .tmp,
    (b) SKIP re-encoding fragments that already landed (content-hash
    names -> byte-identical), (c) prune orphan fragments the new
    manifest doesn't list at commit time, (d) reproduce the
    uninterrupted run's rows exactly."""
    import time

    import pandas as pd
    import ray.data as rd

    def make_ds():
        df = pd.DataFrame(
            {
                "part_key": np.repeat(np.arange(4, dtype=np.uint64), 250),
                "payload": np.arange(1000, dtype=np.int64),
            }
        )
        return rd.from_pandas(df, override_num_blocks=5)

    ref_dir = str(tmp_path / "ref")
    ref = lineage.write_partitioned_fragments(make_ds(), ref_dir, resume=False)
    ref_total = int(ref["rows_out"].sum())
    assert ref_total == 1000

    out_dir = str(tmp_path / "out")
    lineage.write_partitioned_fragments(make_ds(), out_dir, resume=False)
    # simulate the kill: no partition was committed, one partition lost a
    # fragment mid-flight, one stale orphan + one torn .tmp remain
    for f in os.listdir(os.path.join(out_dir, "_lineage")):
        os.unlink(os.path.join(out_dir, "_lineage", f))
    pdirs = sorted(d for d in os.listdir(out_dir) if d.startswith("part-"))
    victim_dir = os.path.join(out_dir, pdirs[0])
    victim_frag = [f for f in os.listdir(victim_dir) if f.endswith(".parquet")][0]
    os.unlink(os.path.join(victim_dir, victim_frag))
    junk = os.path.join(out_dir, pdirs[1], "frag-deadbeef.parquet")
    open(junk, "wb").write(b"orphan")
    torn = os.path.join(out_dir, pdirs[1], "frag-torn.parquet.tmp")
    open(torn, "wb").write(b"torn")
    survivors = {
        (d, f): os.path.getmtime(os.path.join(out_dir, d, f))
        for d in pdirs
        for f in os.listdir(os.path.join(out_dir, d))
        if f.endswith(".parquet") and f != "frag-deadbeef.parquet"
    }
    assert survivors

    time.sleep(0.05)  # make any rewrite visible as an mtime bump
    s2 = lineage.write_partitioned_fragments(make_ds(), out_dir, resume=True)
    assert int(s2["rows_out"].sum()) == ref_total
    assert not os.path.exists(torn), ".tmp must be wiped at resume entry"
    assert not os.path.exists(junk), "orphan fragment must be pruned at commit"
    for (d, f), mtime in survivors.items():
        p = os.path.join(out_dir, d, f)
        assert os.path.exists(p), f"committed fragment lost: {d}/{f}"
        assert os.path.getmtime(p) == mtime, f"committed fragment re-encoded: {d}/{f}"
    # the victim partition's missing fragment was rewritten
    assert any(f.endswith(".parquet") for f in os.listdir(victim_dir))

    def disk_rows(root):
        files = [
            os.path.join(root, d, f)
            for d in os.listdir(root) if d.startswith("part-")
            for f in os.listdir(os.path.join(root, d)) if f.endswith(".parquet")
        ]
        return rd.read_parquet(files).count()

    assert disk_rows(out_dir) == disk_rows(ref_dir) == ref_total
    # every partition has a lineage record whose file list matches disk
    for rec in lineage.read_lineage(out_dir):
        pdir = os.path.join(out_dir, f"part-{rec['partition']}")
        assert sorted(os.listdir(pdir)) == rec["files"]


def test_grouped_sink_streams_without_pin(ray_session, tmp_path):
    """write_partitioned defaults to NO materialize before the groupby
    (the whole-dataset pin is opt-in via pin_before_shuffle for small
    outputs); both modes produce identical partitions."""
    import pandas as pd
    import ray.data as rd

    def make_ds():
        df = pd.DataFrame(
            {
                "part_key": np.repeat(np.arange(3, dtype=np.uint64), 100),
                "v": np.arange(300, dtype=np.int64),
            }
        )
        return rd.from_pandas(df, override_num_blocks=4)

    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    sa = lineage.write_partitioned(make_ds(), a_dir, resume=False).to_pandas()
    sb = lineage.write_partitioned(
        make_ds(), b_dir, resume=False, pin_before_shuffle=True
    ).to_pandas()
    key = ["partition", "rows_out"]
    pd.testing.assert_frame_equal(
        sa[key].sort_values("partition").reset_index(drop=True),
        sb[key].sort_values("partition").reset_index(drop=True),
    )
    import pyarrow.parquet as pq

    for d in (a_dir, b_dir):
        got = sum(
            pq.read_metadata(os.path.join(d, f)).num_rows
            for f in os.listdir(d) if f.endswith(".parquet")
        )
        assert got == 300
