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
        if field is not None:
            # an explicit field must exist and be numeric — a misspelled
            # name silently burning 1.0 everywhere matches nothing the
            # user asked for (gdal_rasterize -a errors here too)
            names = [f[0] for f in fields]
            if field not in names:
                raise ValueError(f"{path}: field {field!r} not in .dbf columns {names}")
            if field not in num_fields:
                ftype = next(f[1] for f in fields if f[0] == field)
                raise ValueError(f"{path}: field {field!r} has dbf type {ftype!r}, not numeric (N/F)")
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
        fids, vals, wkbs = read_geopackage(path, field=field)
        return _layer_from_columns(fids, vals, wkbs, cover_res)
    raise ValueError(f"{path}: unknown polygon layer format {ext!r}")


# -- GeoPackage (.gpkg) via stdlib sqlite3 -----------------------------------
# Format: OGC GeoPackage 1.x (public spec) — a SQLite container whose
# feature tables store geometries as GPB blobs: b"GP" + version + flags
# (bit 0 header byte order, bits 1-3 envelope indicator) + srs_id +
# optional envelope + standard WKB. stdlib sqlite3 reads the container;
# the WKB codec is ours.

_GPB_ENV_SIZE = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}


def _gpb_to_wkb(blob: bytes) -> bytes:
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob (missing GP magic)")
    flags = blob[3]
    if flags & 0x20:  # ExtendedGeoPackageBinary: vendor payload precedes the WKB
        raise NotImplementedError("ExtendedGeoPackageBinary (GPB flags bit 5) not supported")
    if flags & 0x10:  # empty-geometry flag
        return b""
    env = (flags >> 1) & 0x07
    if env not in _GPB_ENV_SIZE:
        raise ValueError(f"invalid GPB envelope indicator {env}")
    return blob[8 + _GPB_ENV_SIZE[env] :]


def _wkb_polygons(buf: bytes) -> list[np.ndarray]:
    """WKB Polygon or MultiPolygon -> flat ring list (little-endian)."""
    if buf[0] != 1:  # byte-order byte: 1=NDR little-endian, 0=XDR big-endian
        raise NotImplementedError("big-endian (XDR) WKB not supported; re-export little-endian")
    (gtype,) = struct.unpack_from("<I", buf, 1)
    if gtype % 1000 == 3:  # Polygon (incl. Z/M variants are rejected below)
        if gtype != 3:
            raise NotImplementedError(f"WKB geometry type {gtype} (Z/M) not supported")
        return wkb.parse_polygon(buf)
    if gtype == 6:  # MultiPolygon: count + nested full polygon WKBs
        (n,) = struct.unpack_from("<I", buf, 5)
        rings, off = [], 9
        for _ in range(n):
            (nrings,) = struct.unpack_from("<I", buf, off + 5)
            end = off + 9
            for _ in range(nrings):
                (npts,) = struct.unpack_from("<I", buf, end)
                end += 4 + npts * 16
            rings.extend(wkb.parse_polygon(buf[off:end]))
            off = end
        return rings
    raise NotImplementedError(f"WKB geometry type {gtype} not supported (Polygon/MultiPolygon are)")


def read_geopackage(path: str, table: str | None = None, field: str | None = None):
    """GeoPackage feature table -> (fids, field_values, polygon_wkbs).
    ``table`` defaults to the first 'features' row of gpkg_contents;
    ``field`` picks the numeric attribute used as field_value (default:
    first numeric non-fid column; 1.0 when none). Multi-polygon features
    are flattened to one multi-ring polygon (even-odd PIP semantics)."""
    import sqlite3

    con = sqlite3.connect(path)
    try:
        if table is None:
            row = con.execute(
                "SELECT table_name FROM gpkg_contents WHERE data_type='features' ORDER BY table_name LIMIT 1"
            ).fetchone()
            if row is None:
                raise ValueError(f"{path}: no 'features' table in gpkg_contents")
            table = row[0]
        (gcol,) = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name=?", (table,)
        ).fetchone()
        info = list(con.execute(f'PRAGMA table_info("{table}")'))
        cols = [(r[1], (r[2] or "").upper()) for r in info]
        # the spec mandates an INTEGER primary key but NOT the name 'fid' —
        # take it from the pk flag (r[5]) instead of hardcoding
        pk = next((r[1] for r in info if r[5]), "fid")
        num_cols = [
            n for n, t in cols
            if n not in (pk, gcol) and any(k in t for k in ("INT", "REAL", "FLOAT", "DOUBLE", "NUM"))
        ]
        if field is not None and field not in [n for n, _ in cols]:
            raise ValueError(f"{path}: field {field!r} not in table {table!r} columns {[n for n, _ in cols]}")
        fld = field if field is not None else (num_cols[0] if num_cols else None)
        sel = f'SELECT "{pk}", "{gcol}"' + (f', "{fld}"' if fld else "") + f' FROM "{table}" ORDER BY "{pk}"'
        fids, vals, wkbs = [], [], []
        for row in con.execute(sel):
            raw = _gpb_to_wkb(row[1])
            if not raw:
                continue
            fids.append(int(row[0]))
            vals.append(float(row[2]) if fld and row[2] is not None else 1.0)
            wkbs.append(wkb.polygon_wkb(_wkb_polygons(raw)))
        return fids, vals, wkbs
    finally:
        con.close()


def write_geopackage(path: str, polygons: list[list[np.ndarray]], values: list[float], table: str = "layer") -> str:
    """Emit a minimal spec-conforming GeoPackage (gpkg_contents +
    gpkg_geometry_columns + gpkg_spatial_ref_sys + one feature table with a
    REAL `value` column) — the in-sandbox round-trip twin of
    read_geopackage."""
    import sqlite3

    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA application_id = 1196444487")  # 'GPKG'
        con.execute(
            "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,"
            " organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,"
            " definition TEXT NOT NULL, description TEXT)"
        )
        con.execute(
            "INSERT INTO gpkg_spatial_ref_sys VALUES ('WGS 84', 4326, 'EPSG', 4326, 'GEOGCS[...]', NULL)"
        )
        con.execute(
            "CREATE TABLE gpkg_contents (table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,"
            " identifier TEXT, description TEXT, last_change TEXT, min_x DOUBLE, min_y DOUBLE,"
            " max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"
        )
        con.execute(
            "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, column_name TEXT NOT NULL,"
            " geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, z TINYINT NOT NULL,"
            " m TINYINT NOT NULL, PRIMARY KEY (table_name, column_name))"
        )
        con.execute(f'CREATE TABLE "{table}" (fid INTEGER PRIMARY KEY, geom BLOB, value REAL)')
        con.execute(
            "INSERT INTO gpkg_contents VALUES (?, 'features', ?, NULL, '2026-01-01T00:00:00Z',"
            " NULL, NULL, NULL, NULL, 4326)",
            (table, table),
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', 'POLYGON', 4326, 0, 0)", (table,)
        )
        for i, (rings, v) in enumerate(zip(polygons, values)):
            gpb = b"GP\x00\x01" + struct.pack("<i", 4326) + wkb.polygon_wkb(rings)
            con.execute(f'INSERT INTO "{table}" VALUES (?, ?, ?)', (i, gpb, float(v)))
        con.commit()
    finally:
        con.close()
    return path


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
            # size the column from the data (dbf stores width in one byte);
            # the fixed historical 18 silently truncated wider ints
            w = max(18, max((len(f"{int(a[n]):d}") for a in attrs if a.get(n) is not None), default=1))
            if w > 255:
                raise ValueError(f"write_shapefile: integer field {n!r} needs {w} chars (dbf max 255)")
            fdefs.append((n[:10], "N", w, 0))
        elif isinstance(v, float):
            w = max(18, max((len(f"{float(a[n]):.6f}") for a in attrs if a.get(n) is not None), default=1))
            if w > 255:
                raise ValueError(f"write_shapefile: float field {n!r} needs {w} chars (dbf max 255)")
            fdefs.append((n[:10], "N", w, 6))
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
                    if len(s) > ln:
                        raise ValueError(
                            f"write_shapefile: {v!r} in field {orig!r} needs {len(s)} chars "
                            f"(field width {ln}) — would truncate"
                        )
                elif t == "N":
                    if isinstance(v, float) and not float(v).is_integer():
                        raise ValueError(
                            f"write_shapefile: non-integer {v!r} in integer field {orig!r} "
                            "(field type inferred from the first non-null value)"
                        )
                    s = f"{int(v):>{ln}d}"
                    if len(s) > ln:
                        raise ValueError(
                            f"write_shapefile: {v!r} in field {orig!r} needs {len(s)} chars "
                            f"(field width {ln}) — would truncate"
                        )
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
