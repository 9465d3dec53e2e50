"""WKT / WKB codecs — pure numpy/python, no GDAL or shapely.

Internal geometry representation (the engine's analog of the reference's
shapely objects, see SURVEY.md §1.2):

    Geom = (gtype: str, parts)
      gtype 'Point'            parts = (2,) ndarray [lon, lat]
      gtype 'LineString'       parts = (m, 2) ndarray
      gtype 'Polygon'          parts = [ring0, ring1, ...]  (each (m, 2))
      gtype 'MultiPoint'       parts = [Point parts, ...]
      gtype 'MultiLineString'  parts = [LineString parts, ...]
      gtype 'MultiPolygon'     parts = [Polygon parts, ...]
      gtype 'GeometryCollection' parts = [Geom, ...]

Polygon interior membership uses the even-odd rule over *all* rings, so
holes need no exterior association (geometry/kernels.py).

The reference reads geometries through GDAL/shapely
(``/root/reference/vector2dggs/common.py:586-616``); our sources carry
WKT in document spans (BASELINE.json input_hint) and WKB between engine
stages (compact, Arrow-friendly), per SURVEY.md §1.1/F4.
"""
from __future__ import annotations

import re
import struct

import numpy as np

_TYPES = {
    "POINT": "Point",
    "LINESTRING": "LineString",
    "POLYGON": "Polygon",
    "MULTIPOINT": "MultiPoint",
    "MULTILINESTRING": "MultiLineString",
    "MULTIPOLYGON": "MultiPolygon",
    "GEOMETRYCOLLECTION": "GeometryCollection",
}
_WKB_CODE = {
    "Point": 1,
    "LineString": 2,
    "Polygon": 3,
    "MultiPoint": 4,
    "MultiLineString": 5,
    "MultiPolygon": 6,
    "GeometryCollection": 7,
}
_WKB_NAME = {v: k for k, v in _WKB_CODE.items()}


# ---------------------------------------------------------------- WKT parse
def _parse_coords(body: str) -> np.ndarray:
    pts = [p.split() for p in body.split(",")]
    return np.array([[float(a), float(b)] for a, b, *_ in pts], dtype=np.float64)


def _split_top(body: str) -> list[str]:
    """Split on top-level commas (commas at paren depth 0)."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(body[start:i])
            start = i + 1
    out.append(body[start:])
    return out


def _strip_parens(s: str) -> str:
    s = s.strip()
    if not (s.startswith("(") and s.endswith(")")):
        raise ValueError(f"malformed WKT fragment: {s[:40]!r}")
    return s[1:-1]


_HEAD_RE = re.compile(r"^\s*([A-Za-z]+)\s*(EMPTY|\(.*\))\s*$", re.S)


def parse_wkt(text: str):
    """WKT string -> Geom tuple, or None for EMPTY / unparseable input."""
    if text is None:
        return None
    m = _HEAD_RE.match(text)
    if not m:
        return None
    kind = _TYPES.get(m.group(1).upper())
    if kind is None:
        return None
    body = m.group(2)
    if body == "EMPTY":
        return None
    body = _strip_parens(body)
    if kind == "Point":
        return ("Point", _parse_coords(body)[0])
    if kind == "LineString":
        return ("LineString", _parse_coords(body))
    if kind == "Polygon":
        return ("Polygon", [_parse_coords(_strip_parens(r)) for r in _split_top(body)])
    if kind == "MultiPoint":
        pts = []
        for frag in _split_top(body):
            frag = frag.strip()
            pts.append(_parse_coords(_strip_parens(frag) if frag.startswith("(") else frag)[0])
        return ("MultiPoint", pts)
    if kind == "MultiLineString":
        return ("MultiLineString", [_parse_coords(_strip_parens(r)) for r in _split_top(body)])
    if kind == "MultiPolygon":
        polys = []
        for frag in _split_top(body):
            pbody = _strip_parens(frag.strip())
            polys.append([_parse_coords(_strip_parens(r)) for r in _split_top(pbody)])
        return ("MultiPolygon", polys)
    if kind == "GeometryCollection":
        return ("GeometryCollection", [parse_wkt(frag) for frag in _split_top(body)])
    return None


# ---------------------------------------------------------------- WKT write
def _fmt(v: float) -> str:
    return format(v, ".10g")


def to_wkt(geom) -> str:
    gtype, parts = geom
    if gtype == "Point":
        return f"POINT ({_fmt(parts[0])} {_fmt(parts[1])})"
    if gtype == "LineString":
        return "LINESTRING (" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in parts) + ")"
    if gtype == "Polygon":
        rings = ", ".join(
            "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in r) + ")" for r in parts
        )
        return f"POLYGON ({rings})"
    if gtype == "MultiPolygon":
        ps = ", ".join(
            "("
            + ", ".join("(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in r) + ")" for r in poly)
            + ")"
            for poly in parts
        )
        return f"MULTIPOLYGON ({ps})"
    if gtype == "MultiLineString":
        ls = ", ".join("(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in r) + ")" for r in parts)
        return f"MULTILINESTRING ({ls})"
    if gtype == "MultiPoint":
        return "MULTIPOINT (" + ", ".join(f"({_fmt(p[0])} {_fmt(p[1])})" for p in parts) + ")"
    if gtype == "GeometryCollection":
        return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(g) for g in parts) + ")"
    raise ValueError(gtype)


# ---------------------------------------------------------------- WKB
def to_wkb(geom) -> bytes:
    """Little-endian ISO WKB (2D)."""
    gtype, parts = geom
    code = _WKB_CODE[gtype]
    head = struct.pack("<BI", 1, code)
    if gtype == "Point":
        return head + struct.pack("<2d", float(parts[0]), float(parts[1]))
    if gtype == "LineString":
        arr = np.ascontiguousarray(parts, dtype="<f8")
        return head + struct.pack("<I", len(parts)) + arr.tobytes()
    if gtype == "Polygon":
        out = [head, struct.pack("<I", len(parts))]
        for r in parts:
            out.append(struct.pack("<I", len(r)))
            out.append(np.ascontiguousarray(r, dtype="<f8").tobytes())
        return b"".join(out)
    if gtype in ("MultiPoint", "MultiLineString", "MultiPolygon"):
        sub = {"MultiPoint": "Point", "MultiLineString": "LineString", "MultiPolygon": "Polygon"}[
            gtype
        ]
        out = [head, struct.pack("<I", len(parts))]
        for p in parts:
            out.append(to_wkb((sub, p)))
        return b"".join(out)
    if gtype == "GeometryCollection":
        out = [head, struct.pack("<I", len(parts))]
        for g in parts:
            out.append(to_wkb(g))
        return b"".join(out)
    raise ValueError(gtype)


def from_wkb(buf: bytes):
    geom, _ = _read_wkb(memoryview(buf), 0)
    return geom


def _read_wkb(mv: memoryview, off: int):
    byte_order = mv[off]
    fmt = "<" if byte_order == 1 else ">"
    (code,) = struct.unpack_from(fmt + "I", mv, off + 1)
    code &= 0xFF  # strip any SRID/dimension flags
    gtype = _WKB_NAME[code]
    off += 5
    if gtype == "Point":
        x, y = struct.unpack_from(fmt + "2d", mv, off)
        return ("Point", np.array([x, y])), off + 16
    if gtype == "LineString":
        (n,) = struct.unpack_from(fmt + "I", mv, off)
        off += 4
        arr = np.frombuffer(mv, dtype=fmt + "f8", count=2 * n, offset=off).reshape(n, 2).copy()
        return ("LineString", arr), off + 16 * n
    if gtype == "Polygon":
        (nr,) = struct.unpack_from(fmt + "I", mv, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(fmt + "I", mv, off)
            off += 4
            rings.append(
                np.frombuffer(mv, dtype=fmt + "f8", count=2 * n, offset=off).reshape(n, 2).copy()
            )
            off += 16 * n
        return ("Polygon", rings), off
    if gtype in ("MultiPoint", "MultiLineString", "MultiPolygon", "GeometryCollection"):
        (n,) = struct.unpack_from(fmt + "I", mv, off)
        off += 4
        subs = []
        for _ in range(n):
            g, off = _read_wkb(mv, off)
            subs.append(g)
        if gtype == "GeometryCollection":
            return ("GeometryCollection", subs), off
        return (gtype, [p for _, p in subs]), off
    raise ValueError(gtype)
