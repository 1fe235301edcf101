"""Vector layer ingestion — the engine's twin of the reference's shapefile
path (libraries/gdal_tools.py:170-192, which shells out to ogr2ogr).

In-engine a polygon layer is a table (poly_id, field_value, geom_wkb) —
SURVEY.md section 1.2. Readers here accept:
- parquet with those columns (the interchange format; any shapefile can be
  converted offline with standard tools),
- a JSON file [{"poly_id", "field_value", "wkb_hex"}, ...] for tests,
- a NATIVE ESRI shapefile (.shp + .dbf) — parsed directly from the public
  ESRI whitepaper format with struct/numpy (ROUND 4; no OGR needed):
  Point/PolyLine/Polygon/MultiPoint plus their Z/M variants (XY parsed,
  Z/M ignored), multipart rings, and dBase III attributes. A matching
  `write_shapefile` emits .shp/.shx/.dbf so the seam round-trips
  in-sandbox.

`read_polygon_layer` returns the layer dict `PolygonIndex.from_synth`
consumes (bbox + geocell cover computed here from the rings), so a file
layer — including a real .shp — drops straight into the flagship spatial
join (the reference's shapefile2raster input, gdal_tools.py:170-192)."""

from __future__ import annotations

import json
import os
import struct

import numpy as np

from .. import geocell, wkb


def _layer_from_columns(poly_ids, field_values, wkbs, cover_res: int) -> dict:
    bboxes = [wkb.polygon_bbox(b) for b in wkbs]
    covers = [geocell.cover_bbox(b[0], b[1], b[2], b[3], cover_res) for b in bboxes]
    return {
        "poly_id": np.asarray(poly_ids, dtype=np.int64),
        "field_value": np.asarray(field_values, dtype=np.float64),
        "geom_wkb": list(wkbs),
        "bbox": np.asarray(bboxes, dtype=np.float64).reshape(len(bboxes), 4),
        "cell_cover": covers,
    }


def read_polygon_layer(path: str, cover_res: int = 6, field: str | None = None) -> dict:
    """Polygon layer file -> layer dict (see module docstring). For .shp,
    ``field`` picks the .dbf attribute burned as field_value (the
    reference's gdal_rasterize -a <field>, gdal_tools.py:186); default =
    first numeric field, 1.0 when none."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".parquet", ".pq"):
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["poly_id", "field_value", "geom_wkb"])
        return _layer_from_columns(
            t["poly_id"].to_numpy(zero_copy_only=False),
            t["field_value"].to_numpy(zero_copy_only=False),
            [bytes(x) for x in t["geom_wkb"].to_pylist()],
            cover_res,
        )
    if ext == ".json":
        recs = json.load(open(path))
        return _layer_from_columns(
            [r["poly_id"] for r in recs],
            [r["field_value"] for r in recs],
            [bytes.fromhex(r["wkb_hex"]) for r in recs],
            cover_res,
        )
    if ext == ".shp":
        recs, fields = read_shapefile(path)
        num_fields = [f[0] for f in fields if f[1] in "NF"]
        fld = field if field is not None else (num_fields[0] if num_fields else None)
        poly_ids, field_values, wkbs = [], [], []
        for r in recs:
            if not r["rings"]:
                continue
            poly_ids.append(r["fid"])
            v = r["attrs"].get(fld) if fld else None
            field_values.append(float(v) if v is not None else 1.0)
            wkbs.append(wkb.polygon_wkb(r["rings"]))
        return _layer_from_columns(poly_ids, field_values, wkbs, cover_res)
    if ext == ".gpkg":
        raise NotImplementedError(
            f"{path}: geopackage parsing not implemented — convert to "
            "shapefile or parquet (poly_id, field_value, geom_wkb) offline"
        )
    raise ValueError(f"{path}: unknown polygon layer format {ext!r}")


# -- native ESRI shapefile (.shp/.shx/.dbf) ----------------------------------
# Format: the public ESRI Shapefile Technical Description (July 1998
# whitepaper) + dBase III. The reference reads these through OGR
# (gdal_tools.py:170-192); this is a direct pure-numpy parse of the same
# bytes. Shape types: 1 point, 3 polyline, 5 polygon, 8 multipoint; +10 for
# Z variants, +20 for M variants (the XY block is identical — Z/M arrays
# trail it and are ignored here).

_SHP_XY_TYPES = {1: "point", 3: "poly", 5: "poly", 8: "multipoint"}


def _shp_kind(stype: int) -> str | None:
    base = stype % 10 if stype in (11, 13, 15, 18, 21, 23, 25, 28) else stype
    return _SHP_XY_TYPES.get(base)


def read_shapefile(path: str, load_attrs: bool = True):
    """Parse .shp (+ sidecar .dbf when present) -> (records, dbf_fields).

    records: [{"fid", "shape_type", "rings": [ndarray(n,2)], "attrs": {}}]
    — for point/multipoint shapes "rings" holds one (n,2) array of the
    points; null shapes yield rings=[]. dbf_fields: [(name, type, len,
    dec)] in file order ([] when no .dbf)."""
    buf = open(path, "rb").read()
    (magic,) = struct.unpack(">i", buf[:4])
    if magic != 9994:
        raise ValueError(f"{path}: not a shapefile (magic {magic} != 9994)")
    (flen_words,) = struct.unpack(">i", buf[24:28])
    end = flen_words * 2
    records = []
    off = 100
    while off + 8 <= min(end, len(buf)):
        recno, clen = struct.unpack(">ii", buf[off : off + 8])
        content = buf[off + 8 : off + 8 + clen * 2]
        off += 8 + clen * 2
        (stype,) = struct.unpack("<i", content[:4])
        rings: list[np.ndarray] = []
        kind = _shp_kind(stype)
        if stype == 0 or not content[4:]:
            pass  # null shape
        elif kind == "point":
            x, y = struct.unpack_from("<dd", content, 4)
            rings = [np.array([[x, y]], dtype=np.float64)]
        elif kind == "multipoint":
            (npts,) = struct.unpack_from("<i", content, 36)
            pts = np.frombuffer(content, dtype="<f8", count=npts * 2, offset=40).reshape(npts, 2)
            rings = [pts.copy()]
        elif kind == "poly":
            nparts, npoints = struct.unpack_from("<ii", content, 36)
            parts = np.frombuffer(content, dtype="<i4", count=nparts, offset=44)
            pts_off = 44 + nparts * 4
            pts = np.frombuffer(content, dtype="<f8", count=npoints * 2, offset=pts_off).reshape(npoints, 2)
            bounds = np.r_[parts, npoints]
            rings = [pts[a:b].copy() for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
        elif kind is None:
            raise NotImplementedError(f"{path}: shape type {stype} not supported")
        records.append({"fid": recno - 1, "shape_type": stype, "rings": rings, "attrs": {}})

    fields: list[tuple] = []
    dbf = os.path.splitext(path)[0] + ".dbf"
    if load_attrs and os.path.exists(dbf):
        attrs, fields = _read_dbf(dbf)
        for r, a in zip(records, attrs):
            r["attrs"] = a
    return records, fields


def _read_dbf(path: str):
    """dBase III parse -> (list of {field: value}, [(name, type, len, dec)]).
    N/F fields -> int/float, L -> bool, D/C -> str; blanks -> None."""
    buf = open(path, "rb").read()
    (nrec,) = struct.unpack("<I", buf[4:8])
    hsize, rsize = struct.unpack("<HH", buf[8:12])
    fields = []
    off = 32
    while off < hsize and buf[off] != 0x0D:
        name = buf[off : off + 11].split(b"\0")[0].decode("ascii", "replace")
        ftype = chr(buf[off + 11])
        fields.append((name, ftype, buf[off + 16], buf[off + 17]))
        off += 32
    out = []
    for i in range(nrec):
        ro = hsize + i * rsize
        pos = ro + 1  # skip deletion flag
        vals = {}
        for name, ftype, flen, fdec in fields:
            s = buf[pos : pos + flen].decode("ascii", "replace").strip()
            pos += flen
            if not s or set(s) == {"*"}:
                vals[name] = None
            elif ftype in "NF":
                vals[name] = float(s) if (fdec > 0 or "." in s or "e" in s.lower()) else int(s)
            elif ftype == "L":
                vals[name] = s in "YyTt"
            else:
                vals[name] = s
        out.append(vals)
    return out, fields


def write_shapefile(path: str, polygons: list[list[np.ndarray]], attrs: list[dict] | None = None) -> str:
    """Emit a polygon shapefile (.shp + .shx + .dbf) that `read_shapefile`
    and OGR both parse — rings are closed on write; attribute types are
    inferred (int -> N, float -> N with 6 decimals, else C)."""
    shp_recs, shx, pos = [], [], 100
    gxmin, gymin, gxmax, gymax = np.inf, np.inf, -np.inf, -np.inf
    for i, rings in enumerate(polygons):
        closed = []
        for ring in rings:
            ring = np.asarray(ring, dtype="<f8")
            if not np.array_equal(ring[0], ring[-1]):
                ring = np.vstack([ring, ring[:1]])
            closed.append(ring)
        allpts = np.vstack(closed)
        xmin, ymin = allpts.min(axis=0)
        xmax, ymax = allpts.max(axis=0)
        gxmin, gymin = min(gxmin, xmin), min(gymin, ymin)
        gxmax, gymax = max(gxmax, xmax), max(gymax, ymax)
        parts = np.cumsum([0] + [len(r) for r in closed[:-1]]).astype("<i4")
        content = struct.pack("<idddd", 5, xmin, ymin, xmax, ymax)
        content += struct.pack("<ii", len(closed), int(sum(len(r) for r in closed)))
        content += parts.tobytes() + b"".join(r.tobytes() for r in closed)
        shp_recs.append(struct.pack(">ii", i + 1, len(content) // 2) + content)
        shx.append(struct.pack(">ii", pos // 2, len(content) // 2))
        pos += 8 + len(content)

    def header(total_bytes):
        h = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_bytes // 2)
        h += struct.pack("<ii", 1000, 5)
        h += struct.pack("<dddd", gxmin, gymin, gxmax, gymax) + b"\x00" * 32
        return h

    with open(path, "wb") as f:
        f.write(header(pos) + b"".join(shp_recs))
    with open(os.path.splitext(path)[0] + ".shx", "wb") as f:
        f.write(header(100 + 8 * len(shx)) + b"".join(shx))

    attrs = attrs if attrs is not None else [{} for _ in polygons]
    names = list(dict.fromkeys(k for a in attrs for k in a))
    fdefs = []
    for n in names:
        v = next((a[n] for a in attrs if a.get(n) is not None), None)
        if isinstance(v, bool):
            fdefs.append((n[:10], "L", 1, 0))
        elif isinstance(v, int):
            fdefs.append((n[:10], "N", 18, 0))
        elif isinstance(v, float):
            fdefs.append((n[:10], "N", 18, 6))
        else:
            fdefs.append((n[:10], "C", 32, 0))
    rsize = 1 + sum(f[2] for f in fdefs)
    hsize = 32 + 32 * len(fdefs) + 1
    with open(os.path.splitext(path)[0] + ".dbf", "wb") as f:
        f.write(struct.pack("<B3BIHH20x", 3, 95, 7, 26, len(attrs), hsize, rsize))
        for (n, t, ln, dec), orig in zip(fdefs, names):
            f.write(n.encode("ascii", "replace").ljust(11, b"\0") + t.encode() + b"\0" * 4 + bytes([ln, dec]) + b"\0" * 14)
        f.write(b"\x0d")
        for a in attrs:
            row = b" "
            for (n, t, ln, dec), orig in zip(fdefs, names):
                v = a.get(orig)
                if v is None:
                    s = " " * ln
                elif t == "L":
                    s = "T" if v else "F"
                elif t == "N" and dec:
                    s = f"{float(v):>{ln}.{dec}f}"
                elif t == "N":
                    s = f"{int(v):>{ln}d}"
                else:
                    s = str(v)[:ln].ljust(ln)
                row += s.encode("ascii", "replace")[:ln].rjust(ln) if t == "N" else s.encode("ascii", "replace")[:ln].ljust(ln)
            f.write(row)
        f.write(b"\x1a")
    return path


def write_polygon_layer(path: str, layer: dict) -> str:
    """Layer dict -> parquet interchange file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "poly_id": pa.array(np.asarray(layer["poly_id"], dtype=np.int64)),
            "field_value": pa.array(np.asarray(layer["field_value"], dtype=np.float64)),
            "geom_wkb": pa.array([bytes(b) for b in layer["geom_wkb"]], type=pa.binary()),
        }
    )
    pq.write_table(t, path)
    return path
