"""Storage-backend seam tests: all table IO routes through
geospatialtools_ray.io and the backend is swappable (VERDICT r2 item 7)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geospatialtools_ray import io


@pytest.fixture(autouse=True)
def _restore_backend():
    prev = io.backend()
    yield
    io.set_backend(prev)


def test_default_backend_parquet_roundtrip(ray_session, tmp_path):
    assert io.backend() == "parquet"
    df = pd.DataFrame({"a": np.arange(10, dtype=np.int64), "b": np.arange(10) * 0.5})
    import ray.data as rd

    io.write_table(rd.from_pandas(df), str(tmp_path / "t"))
    got = io.read_table(str(tmp_path / "t")).to_pandas().sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, df)
    # column pruning reaches the format layer
    only_a = io.read_table(str(tmp_path / "t"), columns=["a"])
    assert only_a.schema().names == ["a"]


def test_named_table_path_follows_backend():
    assert io.table_path("/d", "documents").endswith("documents.parquet")
    io.set_backend("lance")
    assert io.table_path("/d", "documents").endswith("documents.lance")


def test_lance_backend_declared_seam(tmp_path):
    """No lance wheel in this sandbox: the switch must fail loudly with an
    actionable message, not silently fall back."""
    try:
        import lance  # noqa: F401

        pytest.skip("lance is installed here; the real path is covered by test_lance_backend_real_roundtrip")
    except ImportError:
        pass
    io.set_backend("lance")
    with pytest.raises(ImportError, match="pylance"):
        io.read_table(str(tmp_path / "x.lance"))
    with pytest.raises(ImportError, match="pylance"):
        io.write_fragment(pa.table({"a": [1]}), str(tmp_path / "f.lance"))


def test_lance_backend_real_roundtrip(ray_session, tmp_path):
    """Optional-dependency test (VERDICT r3 ask 6): executes the REAL
    read_lance/write_lance seam end-to-end when the `lance` package is
    importable; skips cleanly in this sandbox (package absent)."""
    pytest.importorskip("lance")
    io.set_backend("lance")
    import ray.data as rd

    df = pd.DataFrame({"a": np.arange(32, dtype=np.int64), "b": np.arange(32) * 0.25})
    dest = str(tmp_path / "t.lance")
    io.write_table(rd.from_pandas(df), dest)
    got = io.read_table(dest).to_pandas().sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, df)
    only_a = io.read_table(dest, columns=["a"])
    assert only_a.schema().names == ["a"]

    # fragment + atomic-commit contract (resumable sink's unit)
    tmp = str(tmp_path / "frag.tmp")
    final = str(tmp_path / f"part-0.{io.table_ext()}")
    io.write_fragment(pa.table({"a": [1, 2, 3]}), tmp)
    io.commit_fragment(tmp, final)
    assert io.read_table(final).to_pandas()["a"].tolist() == [1, 2, 3]
    # re-commit of an identical retry fragment is a no-op win for the first
    io.write_fragment(pa.table({"a": [1, 2, 3]}), tmp)
    io.commit_fragment(tmp, final)
    assert io.read_table(final).to_pandas()["a"].tolist() == [1, 2, 3]


def test_invalid_backend_rejected():
    with pytest.raises(ValueError):
        io.set_backend("orc")


def test_fragment_write_is_parquet_on_default_backend(tmp_path):
    p = str(tmp_path / "frag.parquet")
    io.write_fragment(pa.table({"a": [1, 2, 3]}), p)
    import pyarrow.parquet as pq

    assert pq.read_table(p)["a"].to_pylist() == [1, 2, 3]


def test_fake_lance_backend_sink_conformance(ray_session, tmp_path, monkeypatch):
    """CI-style conformance drive of the FULL sink contract through the
    io.py seam with a minimal fake `lance` module (VERDICT r4 ask 7): the
    lance wheel is absent in this sandbox, so the directory-fragment
    semantics (write_dataset -> DIRECTORY, atomic dir promote, lost-race
    drop, tmp/orphan cleanup on directories, table_ext naming,
    completed_parts) would otherwise rot unexercised."""
    import os
    import sys
    import types

    import pyarrow.parquet as pq
    import ray.data as rd

    from geospatialtools_ray.state import lineage

    fake = types.ModuleType("lance")

    class _FakeDataset:
        def __init__(self, path):
            self._p = os.path.join(path, "data.parquet")

        def to_table(self, columns=None):
            return pq.read_table(self._p, columns=columns)

        def count_rows(self):
            return pq.read_metadata(self._p).num_rows

    def write_dataset(tbl, path, **kw):
        assert not any(k in kw for k in ("write_statistics", "use_dictionary",
                                         "compression", "use_byte_stream_split")), \
            "parquet-only encoder knobs must not reach the lance writer"
        os.makedirs(path, exist_ok=True)
        pq.write_table(tbl, os.path.join(path, "data.parquet"))

    fake.write_dataset = write_dataset
    fake.dataset = _FakeDataset
    monkeypatch.setitem(sys.modules, "lance", fake)
    io.set_backend("lance")
    assert io.table_ext() == "lance"

    # fragment unit: write -> atomic dir promote; lost race drops the tmp
    t = pa.table({"x": pa.array([1, 2, 3], type=pa.int64())})
    tmp = str(tmp_path / "frag.lance.tmp")
    final = str(tmp_path / "frag.lance")
    io.write_fragment(t, tmp, write_statistics=False, use_dictionary=False,
                      compression="snappy")
    io.commit_fragment(tmp, final)
    assert os.path.isdir(final) and not os.path.exists(tmp)
    io.write_fragment(t, tmp)
    io.commit_fragment(tmp, final)  # destination exists: benign lost race
    assert os.path.isdir(final) and not os.path.exists(tmp)
    assert _FakeDataset(final).count_rows() == 3

    # full fragment sink + per-fragment resume semantics on DIRECTORY
    # fragments (tmp wipe, skip-if-committed, orphan prune, lineage).
    # Ray workers re-import io and re-resolve GRAFT_IO_BACKEND from THEIR
    # environment, so the sink must use the driver-captured
    # fragment_format() — monkeypatch that seam with a picklable fake
    # (cloudpickle ships test-module classes by value to the workers).
    class _FakeLanceFormat:
        ext = "lance"

        def write(self, tbl, path, **kw):
            # the sink passes parquet encoder knobs; a non-parquet format
            # filters them itself (LanceFragmentFormat drops _PQ_ONLY)
            os.makedirs(path, exist_ok=True)
            pq.write_table(tbl, os.path.join(path, "data.parquet"))

        def commit(self, tmp, final):
            import shutil

            if os.path.exists(final):
                shutil.rmtree(tmp, ignore_errors=True)
                return
            os.replace(tmp, final)

    monkeypatch.setattr(io, "fragment_format", lambda: _FakeLanceFormat())

    def make_ds():
        df = pd.DataFrame(
            {"part_key": np.repeat(np.arange(3, dtype=np.uint64), 40),
             "v": np.arange(120, dtype=np.int64)}
        )
        return rd.from_pandas(df, override_num_blocks=4)

    out_dir = str(tmp_path / "sink")
    s1 = lineage.write_partitioned_fragments(make_ds(), out_dir, resume=False)
    assert int(s1["rows_out"].sum()) == 120
    done = lineage.completed_parts(out_dir)
    assert done == {0, 1, 2}

    # simulate a mid-run kill: lineage gone, one orphan dir + one torn tmp dir
    for f in os.listdir(os.path.join(out_dir, "_lineage")):
        os.unlink(os.path.join(out_dir, "_lineage", f))
    pdir = os.path.join(out_dir, "part-1")
    os.makedirs(os.path.join(pdir, "frag-orphan.lance"))
    os.makedirs(os.path.join(pdir, "frag-torn.lance.tmp"))
    s2 = lineage.write_partitioned_fragments(make_ds(), out_dir, resume=True)
    assert int(s2["rows_out"].sum()) == 120
    assert not os.path.exists(os.path.join(pdir, "frag-torn.lance.tmp"))
    assert not os.path.exists(os.path.join(pdir, "frag-orphan.lance"))
    # read every committed fragment back through the fake backend and
    # reconcile with lineage
    total = 0
    for rec in lineage.read_lineage(out_dir):
        d = os.path.join(out_dir, f"part-{rec['partition']}")
        assert sorted(os.listdir(d)) == rec["files"]
        for f in rec["files"]:
            assert f.endswith(".lance")
            total += _FakeDataset(os.path.join(d, f)).count_rows()
    assert total == 120
