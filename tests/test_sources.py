"""File ingestion seams: baseline GeoTIFF + raw-grid raster readers into
the tile Dataset, and WKB polygon layers into the flagship spatial join."""

import numpy as np
import pytest

from geospatialtools_ray import synth, wkb
from geospatialtools_ray.sources import raster as SR
from geospatialtools_ray.sources import vector as SV


def test_geotiff_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    data = rng.normal(10, 3, size=(33, 47)).astype(np.float32)
    gt = (-120.0, 0.01, 0.0, 45.0, 0.0, -0.01)
    p = str(tmp_path / "grid.tif")
    SR.write_geotiff(p, data, gt=gt, nodata=-9999.0)
    back, meta = SR.read_geotiff(p)
    assert np.array_equal(back, data)
    assert meta["nx"] == 47 and meta["ny"] == 33
    assert np.allclose(meta["gt"], gt)
    assert meta["nodata"] == -9999.0


def test_geotiff_unsupported_features_are_explicit(tmp_path):
    p = str(tmp_path / "weird.tif")
    import struct

    # compression tag = 5 (LZW): the seam must refuse loudly, not misread
    data = np.zeros((2, 2), dtype=np.float32)
    SR.write_geotiff(p, data)
    buf = bytearray(open(p, "rb").read())
    # patch the compression entry value (tag 259) to 5
    import re

    (ifd_off,) = struct.unpack("<I", buf[4:8])
    (n,) = struct.unpack("<H", buf[ifd_off : ifd_off + 2])
    for e in range(n):
        off = ifd_off + 2 + e * 12
        (tag,) = struct.unpack("<H", buf[off : off + 2])
        if tag == 259:
            buf[off + 8 : off + 12] = struct.pack("<HH", 5, 0)
    open(p, "wb").write(bytes(buf))
    with pytest.raises(NotImplementedError):
        SR.read_geotiff(p)


def test_binary_grid_roundtrip(tmp_path):
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = str(tmp_path / "grid.bin")
    SR.write_binary_grid(p, data, gt=(0, 1, 0, 3, 0, -1), nodata=-1.0)
    back, meta = SR.read_binary_grid(p)
    assert np.array_equal(back, data)
    assert meta["gt"] == (0, 1, 0, 3, 0, -1)


def test_raster_file_to_tiles_through_terrain(ray_session, tmp_path):
    """A DEM ingested from a GeoTIFF on disk runs the distributed terrain
    chain identically to the in-memory grid."""
    from geospatialtools_ray.terrain import dist as D
    from geospatialtools_ray.terrain import kernels as K
    from geospatialtools_ray.terrain import tiles as T

    N, RES = 32, 30.0
    dem, _ = synth.dem_grid("pit", N)
    p = str(tmp_path / "dem.tif")
    SR.write_geotiff(p, dem.astype(np.float32), gt=(0.0, RES, 0.0, 0.0, 0.0, -RES))
    ds, meta = SR.raster_file_to_tiles(p, tile=16)
    assert meta["nx"] == N
    filled = D.fill_dist(ds, RES)
    got = T.collect_grid(filled, "demns", dtype=np.float32)
    want = K.fill_pits(dem.astype(np.float32), RES)
    assert np.array_equal(got, want)


def test_polygon_layer_file_through_flagship_join(ray_session, tmp_path):
    """A polygon layer read from a parquet file on disk joins identically
    to the synthesized layer."""
    import ray

    from geospatialtools_ray.pipelines import flagship
    from geospatialtools_ray.stages.spatial_join import PolygonIndex, join_batch

    layer = synth.make_polygons(60, cover_res=flagship.DEFAULT_RES)
    p = str(tmp_path / "layer.parquet")
    SV.write_polygon_layer(p, layer)
    loaded = SV.read_polygon_layer(p, cover_res=flagship.DEFAULT_RES)
    assert np.array_equal(loaded["poly_id"], layer["poly_id"])
    assert np.allclose(loaded["bbox"], layer["bbox"])

    docs = synth.docs_dataset(1000, override_num_blocks=4)
    pts = flagship.geo_points(docs)
    ref_idx = ray.put(PolygonIndex.from_synth(layer, flagship.DEFAULT_RES))
    file_idx = ray.put(PolygonIndex.from_synth(loaded, flagship.DEFAULT_RES))
    a = pts.map_batches(join_batch, fn_kwargs={"index_ref": ref_idx}, batch_format="pyarrow").to_pandas()
    b = pts.map_batches(join_batch, fn_kwargs={"index_ref": file_idx}, batch_format="pyarrow").to_pandas()
    key = ["doc_id", "span_ord", "poly_id"]
    assert a.sort_values(key).reset_index(drop=True).equals(b.sort_values(key).reset_index(drop=True))


def test_json_polygon_layer(tmp_path):
    import json

    layer = synth.make_polygons(5, cover_res=6)
    recs = [
        {"poly_id": int(i), "field_value": float(v), "wkb_hex": bytes(b).hex()}
        for i, v, b in zip(layer["poly_id"], layer["field_value"], layer["geom_wkb"])
    ]
    p = str(tmp_path / "layer.json")
    json.dump(recs, open(p, "w"))
    loaded = SV.read_polygon_layer(p)
    assert np.allclose(loaded["bbox"], layer["bbox"])


def test_shapefile_seam_is_explicit(tmp_path):
    p = str(tmp_path / "x.shp")
    open(p, "w").close()
    with pytest.raises(NotImplementedError):
        SV.read_polygon_layer(p)
