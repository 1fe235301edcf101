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

    # compression tag = 7 (JPEG): the seam must refuse loudly, not misread
    data = np.zeros((2, 2), dtype=np.float32)
    SR.write_geotiff(p, data)
    buf = bytearray(open(p, "rb").read())
    # patch the compression entry value (tag 259) to 7
    (ifd_off,) = struct.unpack("<I", buf[4:8])
    (n,) = struct.unpack("<H", buf[ifd_off : ifd_off + 2])
    for e in range(n):
        off = ifd_off + 2 + e * 12
        (tag,) = struct.unpack("<H", buf[off : off + 2])
        if tag == 259:
            buf[off + 8 : off + 12] = struct.pack("<HH", 7, 0)
    open(p, "wb").write(bytes(buf))
    with pytest.raises(NotImplementedError):
        SR.read_geotiff(p)


@pytest.mark.parametrize("compression", ["none", "deflate", "packbits"])
@pytest.mark.parametrize("layout", ["strips", "tiles"])
def test_geotiff_compressed_layouts_roundtrip(tmp_path, compression, layout):
    """ROUND 4: deflate/PackBits x strip/tile layouts round-trip exactly."""
    rng = np.random.default_rng(11)
    # mix smooth (compressible) and rough regions, ragged dims
    data = (np.cumsum(rng.normal(0, 1, size=(37, 53)), axis=1)).astype(np.float32)
    data[5:9, 7:30] = -9999.0
    kw = {"tile": 16} if layout == "tiles" else {"rows_per_strip": 10}
    p = str(tmp_path / f"{compression}_{layout}.tif")
    SR.write_geotiff(p, data, gt=(-10.0, 0.5, 0, 20.0, 0, -0.5), nodata=-9999.0, compression=compression, **kw)
    back, meta = SR.read_geotiff(p)
    assert np.array_equal(back, data)
    assert meta["nodata"] == -9999.0 and meta["nx"] == 53 and meta["ny"] == 37


@pytest.mark.parametrize("predictor,dtype", [(2, np.int32), (2, np.uint16), (3, np.float32), (3, np.float64)])
def test_geotiff_predictors_roundtrip(tmp_path, predictor, dtype):
    rng = np.random.default_rng(13)
    if np.issubdtype(dtype, np.integer):
        data = rng.integers(-500 if np.issubdtype(dtype, np.signedinteger) else 0, 500, size=(21, 33)).astype(dtype)
    else:
        data = np.cumsum(rng.normal(0, 1, size=(21, 33)), axis=1).astype(dtype)
    p = str(tmp_path / "pred.tif")
    SR.write_geotiff(p, data, compression="deflate", predictor=predictor, rows_per_strip=6)
    back, _ = SR.read_geotiff(p)
    assert back.dtype == dtype and np.array_equal(back, data)


def test_geotiff_multiband_chunky(tmp_path):
    rng = np.random.default_rng(17)
    data = rng.normal(0, 1, size=(14, 19, 3)).astype(np.float32)
    p = str(tmp_path / "mb.tif")
    SR.write_geotiff(p, data, compression="deflate", tile=16)
    for b in range(3):
        back, meta = SR.read_geotiff(p, band=b + 1)
        assert np.array_equal(back, data[:, :, b])
    with pytest.raises(ValueError, match="band"):
        SR.read_geotiff(p, band=4)


def test_tiff_lzw_decoder():
    """The LZW decoder against an independent spec-side encoder (MSB-first
    9..12-bit codes, Clear=256/EOI=257, early change) on adversarial data:
    long runs (code-width growth), random bytes, and table-overflow sizes."""
    from geospatialtools_ray.sources.raster import _lzw_decode

    def lzw_encode(raw: bytes) -> bytes:
        CLEAR, EOI = 256, 257
        out_bits = []
        width = [9]

        def emit(code):
            out_bits.append((code, width[0]))

        table = {bytes([i]): i for i in range(256)}
        nxt = [258]
        emit(CLEAR)
        w = b""
        for c in raw:
            wc = w + bytes([c])
            if wc in table:
                w = wc
                continue
            emit(table[w])
            table[wc] = nxt[0]
            nxt[0] += 1
            # early change: encoder bumps width when the NEXT code to add
            # would not fit (spec: at 511/1023/2047 with early change)
            if nxt[0] == (1 << width[0]) - 1:
                if width[0] < 12:
                    width[0] += 1
                else:
                    emit(CLEAR)
                    table = {bytes([i]): i for i in range(256)}
                    nxt[0] = 258
                    width[0] = 9
            w = bytes([c])
        if w:
            emit(table[w])
        emit(EOI)
        buf = bytearray()
        bitacc, nbits = 0, 0
        for code, wd in out_bits:
            bitacc = (bitacc << wd) | code
            nbits += wd
            while nbits >= 8:
                buf.append((bitacc >> (nbits - 8)) & 0xFF)
                nbits -= 8
        if nbits:
            buf.append((bitacc << (8 - nbits)) & 0xFF)
        return bytes(buf)

    rng = np.random.default_rng(7)
    cases = [
        b"",
        b"ABABABABABABABAB" * 3,
        bytes(rng.integers(0, 256, size=5000).astype(np.uint8)),  # forces width growth
        bytes(np.repeat(rng.integers(0, 8, size=2000), 5).astype(np.uint8)),
        bytes(rng.integers(0, 256, size=30000).astype(np.uint8)),  # forces table reset
    ]
    for raw in cases:
        assert _lzw_decode(lzw_encode(raw)) == raw


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


def test_shapefile_roundtrip(tmp_path):
    """Native .shp/.shx/.dbf write -> read: rings (simple, hole, disjoint
    multipart) and typed attributes survive byte-exact / value-exact."""
    sq = lambda x0, y0, s: np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], dtype=float)
    polys = [
        [sq(0, 0, 10)],
        [sq(20, 20, 10), sq(23, 23, 2)],  # hole
        [sq(-50, -10, 5), sq(40, 40, 5)],  # disjoint multipart
    ]
    attrs = [
        {"value": 3.5, "name": "a", "count": 7, "ok": True},
        {"value": -1.25, "name": "b", "count": 0, "ok": False},
        {"value": 9.0, "name": "c", "count": 12, "ok": True},
    ]
    p = SV.write_shapefile(str(tmp_path / "t.shp"), polys, attrs)
    recs, fields = SV.read_shapefile(p)
    assert [f[0] for f in fields] == ["value", "name", "count", "ok"]
    assert len(recs) == 3
    for r, want_polys, want_attrs in zip(recs, polys, attrs):
        assert r["shape_type"] == 5 and len(r["rings"]) == len(want_polys)
        for got, want in zip(r["rings"], want_polys):
            # rings come back closed
            assert np.allclose(got[:-1], want) and np.allclose(got[-1], want[0])
        assert r["attrs"] == want_attrs


def test_shapefile_polygon_layer_through_flagship_join(ray_session, tmp_path):
    """A synthetic polygon layer exported to a REAL shapefile and re-read
    through read_polygon_layer joins identically to the in-memory layer —
    the reference's shapefile2raster input path (gdal_tools.py:170-192)
    with no OGR anywhere."""
    import ray

    from geospatialtools_ray.pipelines import flagship
    from geospatialtools_ray.stages.spatial_join import PolygonIndex, join_batch

    layer = synth.make_polygons(40, cover_res=flagship.DEFAULT_RES)
    polys = [wkb.parse_polygon(b) for b in layer["geom_wkb"]]
    attrs = [{"value": float(v)} for v in layer["field_value"]]
    p = SV.write_shapefile(str(tmp_path / "layer.shp"), polys, attrs)
    loaded = SV.read_polygon_layer(p, cover_res=flagship.DEFAULT_RES, field="value")
    assert np.array_equal(loaded["poly_id"], np.arange(40))
    assert np.allclose(loaded["field_value"], layer["field_value"])
    assert np.allclose(loaded["bbox"], layer["bbox"])

    docs = synth.docs_dataset(800, override_num_blocks=4)
    pts = flagship.geo_points(docs)
    ref_idx = ray.put(PolygonIndex.from_synth(layer, flagship.DEFAULT_RES))
    shp_idx = ray.put(PolygonIndex.from_synth(loaded, flagship.DEFAULT_RES))
    a = pts.map_batches(join_batch, fn_kwargs={"index_ref": ref_idx}, batch_format="pyarrow").to_pandas()
    b = pts.map_batches(join_batch, fn_kwargs={"index_ref": shp_idx}, batch_format="pyarrow").to_pandas()
    key = ["doc_id", "span_ord", "poly_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    # poly_id in the synth layer == fid order in the file
    assert a[key].equals(b[key]) and np.allclose(a["field_value"], b["field_value"])


def test_shapefile_bad_magic_and_gpkg_seam(tmp_path):
    p = str(tmp_path / "x.shp")
    open(p, "wb").write(b"\x00" * 100)
    with pytest.raises(ValueError, match="9994"):
        SV.read_polygon_layer(p)
    # a sqlite db that is not a GeoPackage fails loudly on the gpkg tables
    import sqlite3

    g = str(tmp_path / "x.gpkg")
    con = sqlite3.connect(g)
    con.execute("CREATE TABLE t (a INT)")
    con.commit()
    con.close()
    with pytest.raises(sqlite3.OperationalError, match="gpkg_contents"):
        SV.read_polygon_layer(g)


def test_geopackage_roundtrip_and_layer(tmp_path):
    """ROUND 4: GeoPackage (stdlib sqlite3 + GPB blobs) round-trips and
    feeds read_polygon_layer; MultiPolygon GPB blobs flatten to multi-ring
    polygons."""
    import sqlite3
    import struct

    sq = lambda x0, y0, s: np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], dtype=float)
    polys = [[sq(0, 0, 10)], [sq(20, 20, 10), sq(23, 23, 2)]]
    p = SV.write_geopackage(str(tmp_path / "t.gpkg"), polys, [2.5, -1.0])
    fids, vals, wkbs = SV.read_geopackage(p)
    assert fids == [0, 1] and vals == [2.5, -1.0]
    for b, want in zip(wkbs, polys):
        rings = wkb.parse_polygon(b)
        assert len(rings) == len(want)
        for got, w in zip(rings, want):
            assert np.allclose(got[:-1], w)
    layer = SV.read_polygon_layer(p, field="value")
    assert np.allclose(layer["field_value"], [2.5, -1.0])
    assert np.allclose(layer["bbox"][1], [20, 20, 30, 30])

    # MultiPolygon GPB: two disjoint squares in ONE feature
    def poly_wkb(ring):
        ring = np.vstack([ring, ring[:1]]).astype("<f8")
        return struct.pack("<BII", 1, 3, 1) + struct.pack("<I", len(ring)) + ring.tobytes()

    mp = struct.pack("<BII", 1, 6, 2) + poly_wkb(sq(0, 0, 5)) + poly_wkb(sq(50, 50, 5))
    con = sqlite3.connect(p)
    gpb = b"GP\x00\x01" + struct.pack("<i", 4326) + mp
    con.execute('INSERT INTO "layer" VALUES (2, ?, 7.0)', (gpb,))
    con.commit()
    con.close()
    fids, vals, wkbs = SV.read_geopackage(p)
    assert fids[-1] == 2 and vals[-1] == 7.0
    rings = wkb.parse_polygon(wkbs[-1])
    assert len(rings) == 2 and np.allclose(rings[1][0], [50, 50])


def test_geotiff_spec_defaults_and_edge_tags(tmp_path):
    """Round-4 review regressions: SampleFormat defaults to UNSIGNED (spec),
    RATIONAL tags are skipped not KeyError'd, predictor-3 decodes correctly
    from BOTH byte orders, and a south-up geotransform is rejected."""
    import struct

    from geospatialtools_ray.sources.raster import _decode_chunk, read_geotiff, write_geotiff

    # uint32 strip TIFF with NO SampleFormat tag (libtiff/GDAL omit it)
    data = (np.arange(6, dtype="<u4") * 1000).reshape(2, 3)
    raw = data.tobytes()
    entries = []

    def e(tag, typ, cnt, val):
        entries.append(struct.pack("<HHI4s", tag, typ, cnt, val))

    n = 10
    off_rat = 8 + 2 + n * 12 + 4
    off_data = off_rat + 8
    e(256, 3, 1, struct.pack("<HH", 3, 0))
    e(257, 3, 1, struct.pack("<HH", 2, 0))
    e(258, 3, 1, struct.pack("<HH", 32, 0))
    e(259, 3, 1, struct.pack("<HH", 1, 0))
    e(262, 3, 1, struct.pack("<HH", 1, 0))
    e(273, 4, 1, struct.pack("<I", off_data))
    e(277, 3, 1, struct.pack("<HH", 1, 0))
    e(278, 3, 1, struct.pack("<HH", 2, 0))
    e(279, 4, 1, struct.pack("<I", len(raw)))
    e(282, 5, 1, struct.pack("<I", off_rat))  # XResolution: RATIONAL
    entries.sort(key=lambda b: struct.unpack("<H", b[:2])[0])
    p = str(tmp_path / "u32.tif")
    with open(p, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", 8))
        f.write(struct.pack("<H", n) + b"".join(entries) + struct.pack("<I", 0))
        f.write(struct.pack("<II", 72, 1))
        f.write(raw)
    d, _ = read_geotiff(p)
    assert d.dtype == np.uint32 and np.array_equal(d, np.asarray(data))

    # predictor-3 byte-plane decode is byte-order independent
    rows, cols, spp, itemsize = 2, 3, 1, 4
    vals = np.array([[0.25, 1.75, 3.25], [4.5, -2.5, 8.0]], dtype=np.float32)
    be = vals.reshape(rows, cols).astype(">f4")
    b = be.view(np.uint8).reshape(rows, cols, itemsize)
    planes = np.transpose(b, (0, 2, 1)).reshape(rows, itemsize * cols).astype(np.int16)
    dlt = planes.copy()
    dlt[:, 1:] = planes[:, 1:] - planes[:, :-1]
    enc = (dlt % 256).astype(np.uint8).tobytes()
    for wire in (">f4", "<f4"):
        out = _decode_chunk(enc, np.dtype(wire), np.float32, (rows, cols, spp), 3, itemsize, "t")
        assert np.allclose(out.reshape(rows, cols), vals), wire

    # south-up geotransform cannot be encoded -> loud rejection
    with pytest.raises(ValueError, match="north-up"):
        write_geotiff(str(tmp_path / "s.tif"), np.zeros((2, 2), np.float32), gt=(100.0, 0.5, 0, 20.0, 0, 0.5))
