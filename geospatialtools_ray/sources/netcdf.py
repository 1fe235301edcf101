"""GrADS / NetCDF interchange (reference parity:
libraries/netcdf_tools.py:10-22,72-131 Create_NETCDF_File,
:133-146 Update_Control_File, :148-160 Update_Control_File_Binary,
libraries/grads_tools.py:23-35 date conversions).

The sandbox ships no netCDF4/HDF library, so this module emits the
**NetCDF-3 classic** container (CDF-1) directly with numpy — a fully
specified, self-describing public format — reproducing the reference
writer's layout: double `lon`/`lat` coordinate variables with
units/long_name/res attributes (including the reference's +res/2
cell-center offset), float data variables with `_FillValue` and
`long_name`, and an optional leading `t` dimension with
"hours since ..." units. `t` can be written fixed-length or as a true
UNLIMITED record dimension (``unlimited=True`` — the reference's layout,
netcdf_tools.py:84), in which case :func:`append_netcdf3_records` grows
the file in place like the reference's open-handle per-timestep writes.

The engine's native bulk sink remains partitioned parquet through
``io.py`` (NetCDF-3 is a single contiguous file and cannot be written
shard-parallel without seek coordination); this writer is the
interchange path for consumers of the reference's .nc outputs.
"""

from __future__ import annotations

import datetime
import os
import struct

import numpy as np

# -- GrADS date strings (grads_tools.py:23-35) ------------------------------

_MONTHS = ["jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec"]


def datetime2gradstime(date: datetime.datetime) -> str:
    """'%HZ%d%b%Y' with locale-independent month names (the reference
    relies on the C locale; we hard-code it so results never drift)."""
    return f"{date.hour:02d}Z{date.day:02d}{_MONTHS[date.month - 1]}{date.year:04d}"


def gradstime2datetime(s: str) -> datetime.datetime:
    hour = int(s[0:2])
    day = int(s[3:5])
    mon = _MONTHS.index(s[5:8].lower()) + 1
    year = int(s[8:12])
    return datetime.datetime(year, mon, day, hour)


# -- GrADS control files (netcdf_tools.py:133-160) --------------------------

def write_control_file(idate: datetime.datetime, nt: int, tstep: str, file_template: str, ctl_file: str) -> None:
    """The reference's Update_Control_File(type='nc')."""
    with open(ctl_file, "w") as fp:
        fp.write(f"dset {file_template}\n")
        fp.write("options template\n")
        fp.write("dtype netcdf\n")
        fp.write(f"tdef t {nt} linear {datetime2gradstime(idate)} {tstep}\n")


def write_control_file_binary(
    idate: datetime.datetime, dims: dict, nt: int, tstep: str, file_template: str, ctl_file: str, variables: list[str]
) -> None:
    """The reference's Update_Control_File_Binary(type='bin_all')."""
    with open(ctl_file, "w") as fp:
        fp.write(f"dset {file_template}\n")
        fp.write(f"title {file_template}\n")
        fp.write(f"undef {dims['undef']:f}\n")
        fp.write(f"xdef {dims['nlon']} linear {dims['minlon']:f} {dims['res']:f}\n")
        fp.write(f"ydef {dims['nlat']} linear {dims['minlat']:f} {dims['res']:f}\n")
        fp.write("zdef 1 levels 0\n")
        fp.write(f"tdef {nt} linear {datetime2gradstime(idate)} {tstep}\n")
        fp.write(f"vars {len(variables)}\n")
        for v in variables:
            fp.write(f"{v} 0 99 {v}\n")
        fp.write("endvars\n")


# -- NetCDF-3 classic writer ------------------------------------------------

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C
_NC_CHAR, _NC_INT, _NC_FLOAT, _NC_DOUBLE = 2, 4, 5, 6
_TYPE_SIZE = {_NC_CHAR: 1, _NC_INT: 4, _NC_FLOAT: 4, _NC_DOUBLE: 8}
_TYPE_NP = {_NC_CHAR: None, _NC_INT: ">i4", _NC_FLOAT: ">f4", _NC_DOUBLE: ">f8"}


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + _pad4(b)


def _attrs(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)  # ABSENT
    out = struct.pack(">ii", _NC_ATTRIBUTE, len(attrs))
    for k, v in attrs.items():
        out += _name(k)
        if isinstance(v, str):
            vb = v.encode()
            out += struct.pack(">ii", _NC_CHAR, len(vb)) + _pad4(vb)
        elif isinstance(v, (float, np.floating)) and not isinstance(v, np.float32):
            out += struct.pack(">ii", _NC_DOUBLE, 1) + struct.pack(">d", float(v))
        elif isinstance(v, np.float32):
            out += struct.pack(">ii", _NC_FLOAT, 1) + struct.pack(">f", float(v))
        else:
            out += struct.pack(">ii", _NC_INT, 1) + struct.pack(">i", int(v))
    return out


def write_netcdf3(path: str, dims: list[tuple[str, int]], variables: list[dict], unlimited: str | None = None) -> None:
    """Emit a CDF-1 classic file. ``dims``: ordered (name, length);
    ``variables``: dicts with name, dims (names), nc_type, attrs, data
    (numpy array, row-major in the declared dim order).

    ``unlimited`` names the record (UNLIMITED) dimension, matching the
    reference's ``createDimension('t', ...)`` record layout
    (netcdf_tools.py:84): that dim is written with header length 0, the
    file's ``numrecs`` carries the current record count (taken from the
    named dim's entry in ``dims``), and record variables (first dim ==
    record dim) are stored interleaved per record after the fixed
    section — so :func:`append_netcdf3_records` can grow the file
    in place. All nc types here are 4/8-byte, so per-record slabs are
    naturally 4-aligned (the classic format's one-record-var padding
    special case never applies)."""
    dim_index = {n: i for i, (n, _) in enumerate(dims)}
    nrecs = 0
    if unlimited is not None:
        if unlimited not in dim_index:
            raise ValueError(f"unlimited dim {unlimited!r} not declared")
        nrecs = dims[dim_index[unlimited]][1]
    header = b"CDF\x01" + struct.pack(">i", nrecs)
    header += struct.pack(">ii", _NC_DIMENSION, len(dims))
    for n, ln in dims:
        header += _name(n) + struct.pack(">i", 0 if n == unlimited else ln)
    header += struct.pack(">ii", 0, 0)  # no global attrs

    def is_record(v):
        return unlimited is not None and v["dims"] and v["dims"][0] == unlimited

    # first pass: per-var header bytes with placeholder offsets
    def var_header(v, begin):
        out = _name(v["name"])
        out += struct.pack(">i", len(v["dims"]))
        for dn in v["dims"]:
            out += struct.pack(">i", dim_index[dn])
        out += _attrs(v.get("attrs", {}))
        nelem = 1
        for dn in v["dims"]:
            if not (is_record(v) and dn == unlimited):
                nelem *= dims[dim_index[dn]][1]
        vsize = nelem * _TYPE_SIZE[v["nc_type"]]
        vsize += -vsize % 4
        out += struct.pack(">iii", v["nc_type"], vsize, begin)
        return out, vsize

    # compute header size with dummy offsets, then fix up (classic layout:
    # all fixed variables first, then the interleaved record section)
    body = struct.pack(">ii", _NC_VARIABLE, len(variables))
    sizes = []
    for v in variables:
        hb, vsize = var_header(v, 0)
        body += hb
        sizes.append(vsize)
    data_start = len(header) + len(body)
    begins, off = [], data_start
    for v, s in zip(variables, sizes):
        if not is_record(v):
            begins.append(off)
            off += s
        else:
            begins.append(None)
    rec_start = off
    for i, (v, s) in enumerate(zip(variables, sizes)):
        if is_record(v):
            begins[i] = off
            off += s
    body = struct.pack(">ii", _NC_VARIABLE, len(variables))
    for v, b in zip(variables, begins):
        hb, _ = var_header(v, b)
        body += hb

    rec_vars = [(v, s) for v, s in zip(variables, sizes) if is_record(v)]
    with open(path, "wb") as fp:
        fp.write(header + body)
        for v, s in zip(variables, sizes):
            if is_record(v):
                continue
            arr = np.ascontiguousarray(v["data"]).astype(_TYPE_NP[v["nc_type"]])
            raw = arr.tobytes()
            fp.write(raw + b"\x00" * (s - len(raw)))
        assert fp.tell() == rec_start
        for r in range(nrecs):
            for v, s in rec_vars:
                arr = np.ascontiguousarray(v["data"][r]).astype(_TYPE_NP[v["nc_type"]])
                raw = arr.tobytes()
                fp.write(raw + b"\x00" * (s - len(raw)))


def append_netcdf3_records(path: str, grids: dict[str, np.ndarray]) -> int:
    """Append records along the UNLIMITED dimension of a file written by
    :func:`write_netcdf3` (the reference's open-handle ``fp.variables[var]
    [itime] = data`` append pattern, netcdf_tools.py:84,120-131, as an
    explicit batch append). ``grids`` maps every record-variable name to an
    array of shape (k, *per_record_shape); the coordinate record variable
    (e.g. ``t``) must be included. Returns the new record count."""
    meta = _parse_header(path, header_only=True)
    rec_vars = [v for v in meta["var_meta"] if v["record"]]
    if not rec_vars:
        raise ValueError("file has no UNLIMITED dimension")
    missing = [v["name"] for v in rec_vars if v["name"] not in grids]
    if missing:
        raise ValueError(f"append must supply every record variable; missing {missing}")
    ks = {v["name"]: np.asarray(grids[v["name"]]).shape[0] for v in rec_vars}
    if len(set(ks.values())) != 1:
        raise ValueError(f"inconsistent record counts across variables: {ks}")
    k = next(iter(ks.values()))
    arrs = {}
    for v in rec_vars:
        a = np.asarray(grids[v["name"]]).astype(_TYPE_NP[v["nc_type"]], order="C")
        if a.shape[1:] != tuple(v["rec_shape"]):
            raise ValueError(f"{v['name']}: record shape {a.shape[1:]} != declared {tuple(v['rec_shape'])}")
        arrs[v["name"]] = a
    with open(path, "r+b") as fp:
        fp.seek(0, 2)
        for r in range(k):
            for v in rec_vars:
                # r:r+1 (not [r]) so a 1-d var's slab stays an ndarray —
                # numpy scalars drop the big-endian byte order in tobytes()
                raw = arrs[v["name"]][r : r + 1].tobytes()
                fp.write(raw + b"\x00" * (v["vsize"] - len(raw)))
        fp.seek(4)
        fp.write(struct.pack(">i", meta["numrecs"] + k))
    return meta["numrecs"] + k


def create_netcdf_file(md: dict, grids: dict[str, np.ndarray], path: str | None = None, unlimited: bool = False) -> str:
    """Reference Create_NETCDF_File (netcdf_tools.py:72-131) as a writer:
    takes the same metadata dict (nlat, nlon, res, minlon, minlat, undef,
    vars, optional vars_info, optional nt/tstep/tinitial/tinitial_all) plus
    the actual data arrays — (nlat, nlon) or (nt, nlat, nlon) per var —
    and writes the complete file in one call (the reference returns an
    open handle the caller fills; a one-shot writer plus
    :func:`append_netcdf3_records` is the honest equivalent without an
    HDF library). ``unlimited=True`` writes `t` as the record (UNLIMITED)
    dimension like the reference (netcdf_tools.py:84), so later timesteps
    can be appended in place."""
    nlat, nlon, res = md["nlat"], md["nlon"], float(md["res"])
    minlon = float(md["minlon"]) + res / 2
    minlat = float(md["minlat"]) + res / 2
    undef = np.float32(md["undef"])
    nt = int(md.get("nt", 0))
    var_names = list(md["vars"])
    vars_info = list(md.get("vars_info", var_names))
    path = path or md["file"]

    dims = [("lon", nlon), ("lat", nlat)]
    variables = [
        {
            "name": "lon",
            "dims": ["lon"],
            "nc_type": _NC_DOUBLE,
            "attrs": {"units": "degrees_east", "long_name": "Longitude", "res": res},
            "data": np.linspace(minlon, minlon + res * (nlon - 1), nlon),
        },
        {
            "name": "lat",
            "dims": ["lat"],
            "nc_type": _NC_DOUBLE,
            "attrs": {"units": "degrees_north", "long_name": "Latitude", "res": res},
            "data": np.linspace(minlat, minlat + res * (nlat - 1), nlat),
        },
    ]
    data_dims = ["lat", "lon"]
    if nt > 0:
        tinitial, tinitial_all = md["tinitial"], md["tinitial_all"]
        it = int((tinitial - tinitial_all).total_seconds() / 3600.0)
        dims.insert(0, ("t", nt))
        variables.insert(
            0,
            {
                "name": "t",
                "dims": ["t"],
                "nc_type": _NC_DOUBLE,
                "attrs": {
                    "units": "hours since %04d-%02d-%02d %02d:00:00.0"
                    % (tinitial_all.year, tinitial_all.month, tinitial_all.day, tinitial_all.hour),
                    "long_name": "Time",
                },
                "data": np.arange(it, nt + it, dtype=np.float64),
            },
        )
        data_dims = ["t", "lat", "lon"]
    for name, info in zip(var_names, vars_info):
        arr = np.asarray(grids[name], dtype=np.float32)
        want = tuple(dict(dims)[d] for d in data_dims)
        if arr.shape != want:
            raise ValueError(f"{name}: shape {arr.shape} != declared dims {want}")
        variables.append(
            {
                "name": name,
                "dims": data_dims,
                "nc_type": _NC_FLOAT,
                "attrs": {"long_name": info, "_FillValue": undef},
                "data": arr,
            }
        )
    write_netcdf3(path, dims, variables, unlimited="t" if (unlimited and nt > 0) else None)
    return path


# -- minimal reader (round-trip validation; same subset we write) -----------

class _HeaderTruncated(Exception):
    """Internal: header parse ran past the bytes read so far."""


def _parse_header(path: str, header_only: bool = False) -> dict:
    """Parse a CDF-1 header: dims (with the record dim's length 0 kept as
    written), numrecs, and per-variable metadata including the record flag
    and per-record shape — shared by :func:`read_netcdf3` and
    :func:`append_netcdf3_records`. With ``header_only`` the file is read
    in bounded chunks (64 KiB, ×4 on truncation) instead of wholesale —
    an append to a multi-GB record file must not load the data section."""
    size = os.path.getsize(path)
    chunk = min(size, 1 << 16) if header_only else size
    while True:
        with open(path, "rb") as fp:
            buf = fp.read(chunk)
        try:
            return _parse_header_buf(buf)
        except _HeaderTruncated:
            if chunk >= size:
                raise ValueError(f"{path}: truncated NetCDF-3 header")
            chunk = min(size, chunk * 4)


def _parse_header_buf(buf: bytes) -> dict:
    if buf[:4] != b"CDF\x01":
        raise ValueError("not a NetCDF-3 classic (CDF-1) file")
    pos = 4

    def need(n):
        if pos + n > len(buf):
            raise _HeaderTruncated

    def i4():
        nonlocal pos
        need(4)
        v = struct.unpack_from(">i", buf, pos)[0]
        pos += 4
        return v

    def name():
        nonlocal pos
        ln = i4()
        need(ln)
        s = buf[pos : pos + ln].decode()
        pos += ln + (-ln % 4)
        return s

    def attrs():
        nonlocal pos
        tag, n = i4(), i4()
        out = {}
        for _ in range(n if tag == _NC_ATTRIBUTE else 0):
            k = name()
            t, ne = i4(), i4()
            if t == _NC_CHAR:
                need(ne)
                out[k] = buf[pos : pos + ne].decode()
                pos += ne + (-ne % 4)
            else:
                sz = _TYPE_SIZE[t]
                need(ne * sz)
                vals = np.frombuffer(buf, dtype=_TYPE_NP[t], count=ne, offset=pos)
                pos += ne * sz + (-(ne * sz) % 4)
                out[k] = vals[0] if ne == 1 else vals
        return out

    numrecs = i4()
    tag, ndims = i4(), i4()
    dims = [(name(), i4()) for _ in range(ndims if tag == _NC_DIMENSION else 0)]
    attrs()  # global (ignored)
    tag, nvars = i4(), i4()
    var_meta = []
    for _ in range(nvars if tag == _NC_VARIABLE else 0):
        vn = name()
        nd = i4()
        dix = [i4() for _ in range(nd)]
        va = attrs()
        t, vsize, begin = i4(), i4(), i4()
        record = bool(dix) and dims[dix[0]][1] == 0
        rec_shape = tuple(dims[i][1] for i in dix[1:]) if record else None
        var_meta.append(
            {
                "name": vn,
                "dims": [dims[i][0] for i in dix],
                "shape": tuple(dims[i][1] for i in dix),
                "attrs": va,
                "nc_type": t,
                "vsize": vsize,
                "begin": begin,
                "record": record,
                "rec_shape": rec_shape,
            }
        )
    recsize = sum(v["vsize"] for v in var_meta if v["record"])
    return {"buf": buf, "dims": dims, "numrecs": numrecs, "var_meta": var_meta, "recsize": recsize}


def read_netcdf3(path: str) -> dict:
    """Parse a CDF-1 classic file (the subset write_netcdf3 emits plus any
    spec-conforming file, including an UNLIMITED record dimension): returns
    {dims, variables: {name: {dims, attrs, data}}}. A record dim's length-0
    header entry is resolved to numrecs in both dims and variable shapes."""
    meta = _parse_header(path)
    buf, numrecs, recsize = meta["buf"], meta["numrecs"], meta["recsize"]
    out = {"dims": [(n, numrecs if ln == 0 else ln) for n, ln in meta["dims"]], "variables": {}}
    for v in meta["var_meta"]:
        if v["record"]:
            per = int(np.prod(v["rec_shape"])) if v["rec_shape"] else 1
            sz = _TYPE_SIZE[v["nc_type"]]
            recs = [
                np.frombuffer(buf, dtype=_TYPE_NP[v["nc_type"]], count=per, offset=v["begin"] + r * recsize)
                for r in range(numrecs)
            ]
            data = (
                np.stack(recs).reshape((numrecs,) + v["rec_shape"])
                if recs
                else np.empty((0,) + v["rec_shape"], dtype=_TYPE_NP[v["nc_type"]])
            )
        else:
            cnt = int(np.prod(v["shape"])) if v["shape"] else 1
            data = np.frombuffer(buf, dtype=_TYPE_NP[v["nc_type"]], count=cnt, offset=v["begin"]).reshape(v["shape"])
        out["variables"][v["name"]] = {"dims": v["dims"], "attrs": v["attrs"], "data": data}
    return out
