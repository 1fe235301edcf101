"""Raster file ingestion — the engine's twin of the reference's GDAL reads
(`read_raster` / `raster_data.read_data`, libraries/gdal_tools.py:36-51,
:68-115), feeding `terrain.tiles.make_tiles_dataset`.

Seam design (same pattern as stages/multimodal.py): the container has no
GDAL/rasterio, so
- `read_geotiff` parses BASELINE TIFF itself (pure numpy: little/big
  endian, single band, uncompressed strips, float32/int32, GeoTIFF
  ModelPixelScale + ModelTiepoint -> geotransform). Anything beyond that
  subset (compression, tiling, multi-band) raises NotImplementedError with
  the reason — the honest boundary, not a silent wrong answer.
- `read_binary_grid` reads a raw array + JSON sidecar (ny/nx/dtype/gt/
  nodata) — the deterministic interchange format for tests and pipelines.
- `write_geotiff` emits the same baseline subset so ingestion round-trips
  inside this sandbox.

All readers return (data[ny,nx], meta) with meta carrying the reference's
metadata dict shape (gt, nx, ny, nodata — gdal_tools.py:211-233), and
`*_to_tiles` lifts a file straight into the tiled raster Dataset.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

# TIFF tag ids (baseline + GeoTIFF)
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_STRIP_OFFSETS = 273
_T_SAMPLES_PER_PIXEL = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_BYTES = 279
_T_SAMPLE_FORMAT = 339
_T_MODEL_PIXEL_SCALE = 33550
_T_MODEL_TIEPOINT = 33922
_T_GDAL_NODATA = 42113

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 11: "f", 12: "d"}


def _read_ifd_values(buf, bo, vtype, count, value_field):
    size = _TYPE_SIZE.get(vtype)
    if size is None:
        return None
    total = size * count
    if total <= 4:
        raw = value_field[:total]
    else:
        (off,) = struct.unpack(bo + "I", value_field)
        raw = buf[off : off + total]
    if vtype == 2:  # ASCII
        return raw.split(b"\0")[0].decode("ascii", "replace")
    fmt = _TYPE_FMT[vtype]
    return list(struct.unpack(bo + fmt * count, raw))


def read_geotiff(path: str):
    """Baseline-TIFF reader (see module docstring). Returns (data, meta)."""
    buf = open(path, "rb").read()
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError(f"{path}: not a TIFF (bad byte-order mark)")
    (magic,) = struct.unpack(bo + "H", buf[2:4])
    if magic != 42:
        raise NotImplementedError(f"{path}: TIFF magic {magic} (BigTIFF?) not supported — install GDAL/rasterio")
    (ifd_off,) = struct.unpack(bo + "I", buf[4:8])
    (n_entries,) = struct.unpack(bo + "H", buf[ifd_off : ifd_off + 2])
    tags = {}
    for e in range(n_entries):
        off = ifd_off + 2 + e * 12
        tag, vtype, count = struct.unpack(bo + "HHI", buf[off : off + 8])
        tags[tag] = _read_ifd_values(buf, bo, vtype, count, buf[off + 8 : off + 12])
    nx = int(tags[_T_WIDTH][0])
    ny = int(tags[_T_LENGTH][0])
    comp = int(tags.get(_T_COMPRESSION, [1])[0])
    if comp != 1:
        raise NotImplementedError(f"{path}: TIFF compression {comp} not supported in-sandbox — install GDAL/rasterio")
    spp = int(tags.get(_T_SAMPLES_PER_PIXEL, [1])[0])
    if spp != 1:
        raise NotImplementedError(f"{path}: {spp}-band TIFF not supported (band 1 semantics need GDAL)")
    bits = int(tags.get(_T_BITS, [32])[0])
    sfmt = int(tags.get(_T_SAMPLE_FORMAT, [3])[0])
    dtype = {(3, 32): np.float32, (3, 64): np.float64, (2, 32): np.int32, (1, 32): np.uint32, (2, 16): np.int16}.get(
        (sfmt, bits)
    )
    if dtype is None:
        raise NotImplementedError(f"{path}: sample format {sfmt}/{bits} bits not supported")
    offsets = [int(v) for v in tags[_T_STRIP_OFFSETS]]
    counts = [int(v) for v in tags[_T_STRIP_BYTES]]
    raw = b"".join(buf[o : o + c] for o, c in zip(offsets, counts))
    data = np.frombuffer(raw, dtype=np.dtype(dtype).newbyteorder(bo)).reshape(ny, nx).astype(dtype)
    gt = None
    if _T_MODEL_PIXEL_SCALE in tags and _T_MODEL_TIEPOINT in tags:
        sx, sy = tags[_T_MODEL_PIXEL_SCALE][0], tags[_T_MODEL_PIXEL_SCALE][1]
        tp = tags[_T_MODEL_TIEPOINT]
        # tiepoint (i, j, k, x, y, z): raster (i,j) -> model (x,y)
        gt = (tp[3] - tp[0] * sx, sx, 0.0, tp[4] + tp[1] * sy, 0.0, -sy)
    nodata = None
    if _T_GDAL_NODATA in tags:
        try:
            nodata = float(tags[_T_GDAL_NODATA])
        except (TypeError, ValueError):
            nodata = None
    meta = {"nx": nx, "ny": ny, "gt": gt, "nodata": nodata}
    return data, meta


def write_geotiff(path: str, data: np.ndarray, gt=None, nodata: float | None = None):
    """Write the baseline subset `read_geotiff` parses (uncompressed single
    strip, little-endian), with GeoTIFF scale/tiepoint tags from `gt`."""
    data = np.ascontiguousarray(data)
    ny, nx = data.shape
    sfmt, bits = {"f": (3, data.itemsize * 8), "i": (2, data.itemsize * 8), "u": (1, data.itemsize * 8)}[
        data.dtype.kind
    ]
    body = data.astype(data.dtype.newbyteorder("<")).tobytes()
    entries = []  # (tag, vtype, count, packed_value_or_payload)
    extra: list[bytes] = []

    def add(tag, vtype, values):
        entries.append([tag, vtype, values])

    add(_T_WIDTH, 4, [nx])
    add(_T_LENGTH, 4, [ny])
    add(_T_BITS, 3, [bits])
    add(_T_COMPRESSION, 3, [1])
    add(262, 3, [1])  # photometric: BlackIsZero
    add(_T_STRIP_OFFSETS, 4, [8])  # data starts right after the header
    add(_T_SAMPLES_PER_PIXEL, 3, [1])
    add(_T_ROWS_PER_STRIP, 4, [ny])
    add(_T_STRIP_BYTES, 4, [len(body)])
    add(_T_SAMPLE_FORMAT, 3, [sfmt])
    if gt is not None:
        add(_T_MODEL_PIXEL_SCALE, 12, [abs(gt[1]), abs(gt[5]), 0.0])
        add(_T_MODEL_TIEPOINT, 12, [0.0, 0.0, 0.0, gt[0], gt[3], 0.0])
    if nodata is not None:
        txt = f"{nodata}".encode("ascii") + b"\0"
        add(_T_GDAL_NODATA, 2, txt)
    entries.sort(key=lambda e: e[0])
    ifd_off = 8 + len(body)
    n = len(entries)
    after_ifd = ifd_off + 2 + n * 12 + 4
    out_entries = b""
    for tag, vtype, values in entries:
        if vtype == 2:
            raw = bytes(values)
            count = len(raw)
        else:
            fmt = _TYPE_FMT[vtype]
            raw = struct.pack("<" + fmt * len(values), *values)
            count = len(values)
        if len(raw) <= 4:
            val = raw + b"\0" * (4 - len(raw))
        else:
            val = struct.pack("<I", after_ifd + sum(len(x) for x in extra))
            extra.append(raw)
        out_entries += struct.pack("<HHI", tag, vtype, count) + val
    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<H", 42) + struct.pack("<I", ifd_off))
        f.write(body)
        f.write(struct.pack("<H", n) + out_entries + struct.pack("<I", 0))
        for raw in extra:
            f.write(raw)
    return path


def read_binary_grid(path: str):
    """Raw array + JSON sidecar (`<path>.json`: ny, nx, dtype, gt, nodata)."""
    with open(path + ".json") as f:
        meta = json.load(f)
    data = np.fromfile(path, dtype=np.dtype(meta.get("dtype", "float32"))).reshape(meta["ny"], meta["nx"])
    return data, {"nx": meta["nx"], "ny": meta["ny"], "gt": tuple(meta.get("gt") or ()) or None, "nodata": meta.get("nodata")}


def write_binary_grid(path: str, data: np.ndarray, gt=None, nodata=None):
    data = np.ascontiguousarray(data)
    data.tofile(path)
    with open(path + ".json", "w") as f:
        json.dump(
            {"ny": data.shape[0], "nx": data.shape[1], "dtype": str(data.dtype), "gt": list(gt) if gt else None, "nodata": nodata},
            f,
        )
    return path


def raster_file_to_tiles(path: str, tile: int, col: str = "dem", parallelism: int | None = None):
    """File -> tiled raster Dataset (the ingest twin of synth-based tiles).
    Dispatches on extension: .tif/.tiff via the baseline parser, everything
    else as raw grid + sidecar. Sentinel nodata (if declared) is preserved
    as -9999 per the engine convention."""
    from ..terrain import tiles as T

    ext = os.path.splitext(path)[1].lower()
    if ext in (".tif", ".tiff"):
        data, meta = read_geotiff(path)
    else:
        data, meta = read_binary_grid(path)
    grid = data.astype(np.float32)
    if meta.get("nodata") is not None and meta["nodata"] != -9999.0:
        grid = np.where(grid == np.float32(meta["nodata"]), np.float32(-9999.0), grid)
    return T.make_tiles_dataset({col: grid}, tile, parallelism=parallelism), meta
