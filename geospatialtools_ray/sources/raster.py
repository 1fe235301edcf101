"""Raster file ingestion — the engine's twin of the reference's GDAL reads
(`read_raster` / `raster_data.read_data`, libraries/gdal_tools.py:36-51,
:68-115), feeding `terrain.tiles.make_tiles_dataset`.

Seam design (same pattern as stages/multimodal.py): the container has no
GDAL/rasterio, so
- `read_geotiff` parses TIFF itself (pure numpy: little/big endian, strip
  AND tile layouts, none/deflate/LZW/PackBits compression, horizontal +
  floating-point predictors, multi-band chunky with a `band` selector,
  GeoTIFF ModelPixelScale + ModelTiepoint -> geotransform — ROUND 4
  closed the compression/tiling/multiband gaps). Anything beyond that
  subset (BigTIFF, JPEG/ZSTD codecs, planar config 2) raises
  NotImplementedError with the reason — the honest boundary, not a
  silent wrong answer.
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
_T_PLANAR_CONFIG = 284
_T_PREDICTOR = 317
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_BYTES = 325
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
    fmt = _TYPE_FMT.get(vtype)
    if fmt is None:
        # types we don't decode (e.g. 5 RATIONAL — XResolution etc. from
        # PIL/ImageMagick): skip the tag like other unsupported types
        # instead of KeyError-ing the whole read
        return None
    return list(struct.unpack(bo + fmt * count, raw))


def _packbits_decode(raw: bytes) -> bytes:
    """TIFF PackBits (compression 32773): byte-oriented RLE."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        i += 1
        if c < 128:
            out += raw[i : i + c + 1]
            i += c + 1
        elif c > 128:
            out += raw[i : i + 1] * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out)


def _lzw_decode(raw: bytes) -> bytes:
    """TIFF LZW (compression 5): MSB-first variable-width codes 9..12 bits,
    ClearCode 256 / EOI 257, early code-width change per the TIFF 6 spec."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width, nxt = 9, 258
    bitbuf = nbits = 0
    prev = None
    for byte in raw:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == EOI:
                return bytes(out)
            if code == CLEAR:
                table = list(base)
                width, nxt = 9, 258
                prev = None
                continue
            if prev is None:
                entry = table[code]
            else:
                entry = table[code] if code < nxt else prev + prev[:1]
                table.append(prev + entry[:1])
                nxt += 1
            out += entry
            prev = entry
            # TIFF early change: the decoder's table trails the encoder's
            # by one entry, so it must widen at 510/1022/2046 — one entry
            # before the encoder's 511/1023/2047 — to stay bit-aligned
            if nxt == (1 << width) - 2 and width < 12:
                width += 1
    return bytes(out)


def _decompress(raw: bytes, comp: int, path: str) -> bytes:
    if comp == 1:
        return raw
    if comp in (8, 32946):  # deflate / old-style deflate
        import zlib

        return zlib.decompress(raw)
    if comp == 5:
        return _lzw_decode(raw)
    if comp == 32773:
        return _packbits_decode(raw)
    raise NotImplementedError(f"{path}: TIFF compression {comp} not supported (deflate/LZW/PackBits/none are)")


def _unpredict(chunk: np.ndarray, predictor: int, itemsize: int, path: str) -> np.ndarray:
    """Undo TIFF predictors on a decoded (rows, cols, spp) chunk.
    2 = horizontal differencing (integers); 3 = floating-point byte-split
    differencing (TIFF Technical Note 3, GDAL's float default)."""
    if predictor == 1:
        return chunk
    if predictor == 2:
        view = chunk.view(np.dtype(f"u{itemsize}"))
        np.cumsum(view, axis=1, dtype=view.dtype, out=view)
        return chunk
    if predictor == 3:
        rows, cols, spp = chunk.shape
        b = chunk.view(np.uint8).reshape(rows, cols * spp * itemsize)
        np.cumsum(b, axis=1, dtype=np.uint8, out=b)
        # bytes are stored plane-split big-endian: all byte-0s, all byte-1s…
        split = b.reshape(rows, itemsize, cols * spp)
        joined = np.ascontiguousarray(np.transpose(split, (0, 2, 1)))
        flat = joined.reshape(rows, cols, spp, itemsize).view(chunk.dtype.newbyteorder(">"))
        return flat.reshape(rows, cols, spp).astype(chunk.dtype)
    raise NotImplementedError(f"{path}: TIFF predictor {predictor} not supported")


def _decode_chunk(dec, wire, dtype, shape, predictor, itemsize, path):
    """Decompressed bytes -> native-dtype (rows, cols, spp) chunk.

    Predictor 3 MUST see the raw byte-plane stream: converting wire->native
    first (.astype on a big-endian file) reorders bytes within each group
    and silently corrupts the data, so the un-predict runs on the wire view
    and the value conversion happens after. Predictors 1/2 operate on
    VALUES, so those convert first (predictor 2's cumsum needs native ints).
    """
    rows, cols, spp = shape
    n = rows * cols * spp
    raw = np.frombuffer(dec, dtype=wire, count=n).reshape(rows, cols, spp)
    if predictor == 3:
        return _unpredict(raw.copy(), predictor, itemsize, path).astype(dtype)
    return _unpredict(raw.astype(dtype), predictor, itemsize, path)


def read_geotiff(path: str, band: int = 1):
    """GeoTIFF reader (see module docstring). Returns (data, meta).

    ROUND 4 coverage: strip AND tile layouts; none/deflate/LZW/PackBits
    compression; horizontal (2) and floating-point (3) predictors;
    multi-band chunky files via ``band`` (1-based, the reference's
    GetRasterBand semantics, gdal_tools.py:39). Planar-configuration-2
    multi-band and BigTIFF remain explicit NotImplementedError seams."""
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
    spp = int(tags.get(_T_SAMPLES_PER_PIXEL, [1])[0])
    planar = int(tags.get(_T_PLANAR_CONFIG, [1])[0])
    predictor = int(tags.get(_T_PREDICTOR, [1])[0])
    if spp > 1 and planar != 1:
        raise NotImplementedError(f"{path}: planar-configuration-{planar} multi-band TIFF not supported")
    if not (1 <= band <= spp):
        raise ValueError(f"{path}: band {band} out of range (file has {spp})")
    # TIFF-spec defaults: BitsPerSample=1, SampleFormat=1 (UNSIGNED int —
    # libtiff/GDAL omit the tag for unsigned). Defaulting to float here
    # silently decoded valid integer TIFFs as denormal garbage.
    bits = int(tags.get(_T_BITS, [1])[0])
    sfmt = int(tags.get(_T_SAMPLE_FORMAT, [1])[0])
    dtype = {
        (3, 32): np.float32, (3, 64): np.float64,
        (2, 32): np.int32, (2, 16): np.int16, (2, 8): np.int8,
        (1, 32): np.uint32, (1, 16): np.uint16, (1, 8): np.uint8,
    }.get((sfmt, bits))
    if dtype is None:
        raise NotImplementedError(f"{path}: sample format {sfmt}/{bits} bits not supported")
    itemsize = np.dtype(dtype).itemsize
    wire = np.dtype(dtype).newbyteorder(bo)

    full = np.empty((ny, nx, spp), dtype=dtype)
    if _T_TILE_OFFSETS in tags:
        tw = int(tags[_T_TILE_WIDTH][0])
        th = int(tags[_T_TILE_LENGTH][0])
        offsets = [int(v) for v in tags[_T_TILE_OFFSETS]]
        counts = [int(v) for v in tags[_T_TILE_BYTES]]
        ntx = (nx + tw - 1) // tw
        for i, (o, c) in enumerate(zip(offsets, counts)):
            ty, tx = divmod(i, ntx)
            dec = _decompress(buf[o : o + c], comp, path)
            chunk = _decode_chunk(dec, wire, dtype, (th, tw, spp), predictor, itemsize, path)
            y0, x0 = ty * th, tx * tw
            h, w = min(th, ny - y0), min(tw, nx - x0)
            full[y0 : y0 + h, x0 : x0 + w] = chunk[:h, :w]
    else:
        offsets = [int(v) for v in tags[_T_STRIP_OFFSETS]]
        counts = [int(v) for v in tags[_T_STRIP_BYTES]]
        rps = int(tags.get(_T_ROWS_PER_STRIP, [ny])[0])
        y0 = 0
        for o, c in zip(offsets, counts):
            rows = min(rps, ny - y0)
            dec = _decompress(buf[o : o + c], comp, path)
            chunk = _decode_chunk(dec, wire, dtype, (rows, nx, spp), predictor, itemsize, path)
            full[y0 : y0 + rows] = chunk
            y0 += rows
    data = np.ascontiguousarray(full[:, :, band - 1])
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


def _packbits_encode(raw: bytes) -> bytes:
    """PackBits encoder (runs >= 3 become repeats; literals otherwise)."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        run = 1
        while i + run < n and run < 128 and raw[i + run] == raw[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run]) + raw[i : i + 1]
            i += run
        else:
            j = i
            while j < n and j - i < 128:
                r = 1
                while j + r < n and r < 3 and raw[j + r] == raw[j]:
                    r += 1
                if r >= 3:
                    break
                j += 1
            out += bytes([j - i - 1]) + raw[i:j]
            i = j
    return bytes(out)


def _predict_encode(chunk: np.ndarray, predictor: int, itemsize: int) -> bytes:
    """Forward TIFF predictor on a (rows, cols, spp) chunk -> wire bytes
    (little-endian for 1/2; TechNote-3 big-endian byte-split for 3)."""
    if predictor == 1:
        return chunk.astype(chunk.dtype.newbyteorder("<")).tobytes()
    if predictor == 2:
        d = chunk.copy()
        view = d.view(np.dtype(f"u{itemsize}"))
        view[:, 1:] -= view[:, :-1].copy()
        return d.astype(d.dtype.newbyteorder("<")).tobytes()
    if predictor == 3:
        rows, cols, spp = chunk.shape
        be = chunk.astype(chunk.dtype.newbyteorder(">"))
        b = be.view(np.uint8).reshape(rows, cols * spp, itemsize)
        planes = np.ascontiguousarray(np.transpose(b, (0, 2, 1))).reshape(rows, itemsize * cols * spp)
        out = planes.copy()
        out[:, 1:] -= planes[:, :-1]
        return out.tobytes()
    raise NotImplementedError(f"predictor {predictor} not supported")


_COMP_CODES = {"none": 1, "deflate": 8, "packbits": 32773}


def write_geotiff(
    path: str,
    data: np.ndarray,
    gt=None,
    nodata: float | None = None,
    compression: str = "none",
    predictor: int = 1,
    tile: int | None = None,
    rows_per_strip: int | None = None,
):
    """Write a GeoTIFF `read_geotiff` (and GDAL) parses: little-endian,
    single- or multi-band chunky (data (ny,nx) or (ny,nx,spp)), strip or
    tile layout, none/deflate/PackBits compression, predictors 1/2/3 —
    the in-sandbox round-trip twin of the extended reader."""
    data = np.ascontiguousarray(data)
    if data.ndim == 2:
        data = data[:, :, None]
    ny, nx, spp = data.shape
    itemsize = data.dtype.itemsize
    sfmt, bits = {"f": (3, itemsize * 8), "i": (2, itemsize * 8), "u": (1, itemsize * 8)}[data.dtype.kind]
    comp_code = _COMP_CODES[compression]

    def enc(chunk: np.ndarray) -> bytes:
        raw = _predict_encode(chunk, predictor, itemsize)
        if compression == "deflate":
            import zlib

            return zlib.compress(raw)
        if compression == "packbits":
            return _packbits_encode(raw)
        return raw

    chunks: list[bytes] = []
    if tile is not None:
        if tile % 16:
            raise ValueError("TIFF tile size must be a multiple of 16")
        ntx, nty = (nx + tile - 1) // tile, (ny + tile - 1) // tile
        padded = np.zeros((nty * tile, ntx * tile, spp), dtype=data.dtype)
        padded[:ny, :nx] = data
        for ty in range(nty):
            for tx in range(ntx):
                chunks.append(enc(padded[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile]))
    else:
        rps = rows_per_strip or ny
        for y0 in range(0, ny, rps):
            chunks.append(enc(data[y0 : y0 + rps]))

    body = b"".join(chunks)
    offs, pos = [], 8
    for c in chunks:
        offs.append(pos)
        pos += len(c)
    entries = []  # (tag, vtype, count, packed_value_or_payload)
    extra: list[bytes] = []

    def add(tag, vtype, values):
        entries.append([tag, vtype, values])

    add(_T_WIDTH, 4, [nx])
    add(_T_LENGTH, 4, [ny])
    add(_T_BITS, 3, [bits] * spp)
    add(_T_COMPRESSION, 3, [comp_code])
    add(262, 3, [1])  # photometric: BlackIsZero
    add(_T_SAMPLES_PER_PIXEL, 3, [spp])
    if tile is not None:
        add(_T_TILE_WIDTH, 4, [tile])
        add(_T_TILE_LENGTH, 4, [tile])
        add(_T_TILE_OFFSETS, 4, offs)
        add(_T_TILE_BYTES, 4, [len(c) for c in chunks])
    else:
        add(_T_STRIP_OFFSETS, 4, offs)
        add(_T_ROWS_PER_STRIP, 4, [rows_per_strip or ny])
        add(_T_STRIP_BYTES, 4, [len(c) for c in chunks])
    if spp > 1:
        add(_T_PLANAR_CONFIG, 3, [1])
    if predictor != 1:
        add(_T_PREDICTOR, 3, [predictor])
    add(_T_SAMPLE_FORMAT, 3, [sfmt] * spp)
    if gt is not None:
        # the PixelScale+Tiepoint encoding can only express north-up
        # (gt[5] < 0, gt[1] > 0, no rotation) — reject anything else
        # instead of silently flipping the sign on round-trip
        if gt[5] > 0 or gt[1] < 0 or gt[2] != 0 or gt[4] != 0:
            raise ValueError(
                f"write_geotiff: geotransform {gt} is not north-up/unrotated; "
                "PixelScale+ModelTiepoint cannot encode it"
            )
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
        nod = meta["nodata"]
        # NaN nodata (GDAL_NODATA 'nan') never matches ==; match by isnan
        # so NaNs don't leak past the -9999 sentinel into terrain kernels
        m = np.isnan(grid) if (isinstance(nod, float) and np.isnan(nod)) else (grid == np.float32(nod))
        grid = np.where(m, np.float32(-9999.0), grid)
    return T.make_tiles_dataset({col: grid}, tile, parallelism=parallelism), meta
