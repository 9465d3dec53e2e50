"""Property-based tests (hypothesis) over the cell-math kernels —
a layer the reference's unittest suite lacks (SURVEY.md §5)."""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vector2dggs_spark.dggs import geohash as gh
from vector2dggs_spark.dggs import h3core as H
from vector2dggs_spark.dggs import rhp
from vector2dggs_spark.dggs import s2 as S
from vector2dggs_spark.geometry import wkt as gw

lat_s = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False, width=64)
lon_s = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False, width=64)
res_s = st.integers(min_value=1, max_value=11)


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lon=lon_s, p=res_s)
def test_geohash_cell_contains_point(lat, lon, p):
    cell = gh.encode([lat], [lon], p)[0]
    minlat, minlon, maxlat, maxlon = gh.decode_bbox([cell], p)
    # 1e-12 absolute tolerance: points within one ulp of a cell boundary
    # may quantize to either side (inherent to float quantization)
    assert minlat[0] - 1e-12 <= lat <= maxlat[0] + 1e-12
    assert minlon[0] - 1e-12 <= lon <= maxlon[0] + 1e-12
    # parent prefix property
    if p > 1:
        assert gh.encode([lat], [lon], p - 1)[0] == cell[: p - 1]


@settings(max_examples=150, deadline=None)
@given(lat=lat_s, lon=lon_s, res=st.integers(min_value=0, max_value=12))
def test_h3_roundtrip_and_token(lat, lon, res):
    c = H.latlng_to_cell([lat], [lon], res)
    tok = H.to_token(c)
    assert np.array_equal(H.from_token(tok), c)
    clat, clon = H.cell_to_latlng(c)
    assert H.latlng_to_cell(clat, clon, res)[0] == c[0]
    assert int(H.get_resolution(c)[0]) == res


@settings(max_examples=150, deadline=None)
@given(lat=lat_s, lon=lon_s, res=st.integers(min_value=0, max_value=10))
def test_rhp_roundtrip_and_prefix(lat, lon, res):
    c = rhp.point_to_cell([lat], [lon], res)[0]
    assert len(c) == res + 1 and c[0] in "NOPQRS"
    clat, clon = rhp.cell_center([c])
    assert rhp.point_to_cell(clat, clon, res)[0] == c
    if res > 0:
        assert rhp.point_to_cell([lat], [lon], res - 1)[0] == c[:res]


@settings(max_examples=150, deadline=None)
@given(lat=lat_s, lon=lon_s, lv=st.integers(min_value=0, max_value=24))
def test_s2_roundtrip_and_nesting(lat, lon, lv):
    c = S.latlng_to_cell([lat], [lon], lv)
    assert int(S.get_level(c)[0]) == lv
    clat, clon = S.cell_to_latlng(c)
    assert S.latlng_to_cell(clat, clon, lv)[0] == c[0]
    if lv > 0:
        assert S.parent(c, lv - 1)[0] == S.latlng_to_cell([lat], [lon], lv - 1)[0]
    tok = S.to_token(c)
    assert S.from_token(tok)[0] == c[0]


coord_s = st.floats(min_value=-179.0, max_value=179.0, allow_nan=False, width=64)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord_s, st.floats(-89, 89, allow_nan=False, width=64)),
                min_size=2, max_size=12))
def test_wkt_wkb_roundtrip_linestring(coords):
    arr = np.array(coords, dtype=np.float64)
    g = ("LineString", arr)
    g2 = gw.from_wkb(gw.to_wkb(g))
    assert g2[0] == "LineString"
    assert np.allclose(g2[1], arr)
    g3 = gw.parse_wkt(gw.to_wkt(g))
    assert np.allclose(g3[1], arr, atol=1e-7)


@settings(max_examples=150, deadline=None)
@given(lat=lat_s, lon=lon_s, res=st.integers(min_value=0, max_value=24))
def test_a5_roundtrip_and_nesting(lat, lon, res):
    from vector2dggs_spark.dggs import a5 as A

    c = A.lonlat_to_cell([lat], [lon], res)
    assert int(A.get_resolution(c)[0]) == res
    lo, la = A.cell_to_lonlat(c)
    assert A.lonlat_to_cell(la, lo, res)[0] == c[0]
    # aperture-4 nesting is exact: encoding coarser must equal the parent
    if res >= 1:
        assert A.cell_to_parent(c, res - 1)[0] == A.lonlat_to_cell([lat], [lon], res - 1)[0]
    tok = A.to_token(c)[0]
    assert len(tok) == 16 and A.from_token([tok])[0] == c[0]


@settings(max_examples=150, deadline=None)
@given(
    lat=st.floats(min_value=-80.0, max_value=84.0),
    lon=st.floats(min_value=-180.0, max_value=180.0),
    code=st.sampled_from([3857, 2193, 32701, 32733, 32760, 32601]),
)
def test_crs_roundtrip(lat, lon, code):
    """forward∘inverse identity for every supported CRS family, global
    inputs (TM far from the central meridian included — the Krüger
    series stays a bijection; accuracy degrades gracefully)."""
    import numpy as np

    from vector2dggs_spark.geometry import crs

    p = crs.get_crs(code)
    if code == 3857:
        tol = 1e-9
    else:
        # TM: tight near the zone, loose at antipodal longitudes
        lon0 = {2193: 173.0}.get(code, (code % 100) * 6 - 183)
        d = abs((lon - lon0 + 180) % 360 - 180)
        if d > 40:
            # out of the projection's domain of validity: forward may
            # land outside the inverse's clamped domain, where inverse
            # now raises a clean ValueError instead of NaN-propagating
            x, y = p.forward(np.array([lon]), np.array([lat]))
            try:
                p.inverse(x, y)
            except ValueError as e:
                assert "out of the projection domain" in str(e)
            return
        tol = 1e-7 if d < 10 else 1e-3
    x, y = p.forward(np.array([lon]), np.array([lat]))
    lo, la = p.inverse(x, y)
    assert abs(((lo[0] - lon + 180) % 360) - 180) < tol
    assert abs(la[0] - lat) < tol


@settings(max_examples=150, deadline=None)
@given(
    pent=st.sampled_from([4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117]),
    ang=st.floats(min_value=0.0, max_value=6.283),
    rad=st.floats(min_value=0.01, max_value=8.0),
    res=st.integers(min_value=1, max_value=9),
)
def test_h3_pentagon_area_roundtrip(pent, ang, rad, res):
    """Points around every icosahedron vertex: encode→center→re-encode
    identity and canonical form (no leading K digit) — the round-2
    pentagon guarantee, property-tested."""
    import numpy as np

    from vector2dggs_spark.dggs import h3core as H

    clat, clon = H.T.BASE_CENTER_GEO[pent]
    rr = np.radians(rad)
    sla = np.arcsin(np.clip(np.sin(clat) * np.cos(rr) + np.cos(clat) * np.sin(rr) * np.cos(ang), -1, 1))
    slo = clon + np.arctan2(np.sin(ang) * np.sin(rr) * np.cos(clat), np.cos(rr) - np.sin(clat) * np.sin(sla))
    cell = H.latlng_to_cell(np.degrees([sla]), np.degrees([slo]), res)
    la, lo = H.cell_to_latlng(cell)
    assert H.latlng_to_cell(la, lo, res)[0] == cell[0]
    if H.T.IS_PENTAGON[int(H.base_cell(cell)[0])]:
        assert int(H._leading_nonzero_digit(cell, res)[0]) != 1
