"""CRS support (SURVEY G1): numpy transform kernels + the reference's
antimeridian projected-square scenario (tests/classes/antimeridian.py:
a 200km×200km AEQD square centred on the antimeridian must split into
two polygons of ~3.25 deg² total and index on both sides of ±180)."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from vector2dggs_spark.geometry import crs


def test_tm_inverse_rejects_out_of_domain():
    """ADVICE r02: extreme out-of-zone coordinates must raise a clean
    ValueError instead of overflowing through sinh into NaN (asserted
    warning-free via errstate raise)."""
    nz = crs.get_crs(2193)
    with np.errstate(over="raise", invalid="raise"):
        # in-domain roundtrip still clean under raised errstate
        lo, la = nz.inverse(*nz.forward(np.array([174.0]), np.array([-41.0])))
        assert abs(lo[0] - 174.0) < 1e-9
        with pytest.raises(ValueError, match="out of the projection domain"):
            nz.inverse(np.array([1e9]), np.array([5e6]))
        with pytest.raises(ValueError, match="out of the projection domain"):
            nz.inverse(np.array([1.7e6]), np.array([1e9]))
        with pytest.raises(ValueError, match="out of the projection domain"):
            nz.inverse(np.array([np.nan]), np.array([5e6]))


def test_tm_roundtrip_and_anchors():
    nz = crs.get_crs(2193)
    rng = np.random.default_rng(5)
    lon = rng.uniform(166, 179, 500)
    lat = rng.uniform(-47.5, -34, 500)
    lo, la = nz.inverse(*nz.forward(lon, lat))
    assert np.abs(lo - lon).max() < 1e-9 and np.abs(la - lat).max() < 1e-9
    # central-meridian anchor: (lon0, lat0) -> (FE, FN)
    E, N = nz.forward(np.array([173.0]), np.array([0.0]))
    assert abs(E[0] - 1_600_000) < 1e-6 and abs(N[0] - 10_000_000) < 1e-6
    # UTM 60S anchor
    u = crs.get_crs("EPSG:32760")
    E, N = u.forward(np.array([177.0]), np.array([0.0]))
    assert abs(E[0] - 500_000) < 1e-6 and abs(N[0] - 10_000_000) < 1e-6
    # scale on the central meridian is k0 (meridional curvature radius
    # at the equator: M = a(1-e²) for WGS84)
    E1, N1 = u.forward(np.array([177.0, 177.0]), np.array([0.0, 0.001]))
    M_eq = 6378137.0 * (1 - 0.00669437999014)
    arc = 0.001 * np.pi / 180 * M_eq
    assert abs((N1[1] - N1[0]) / arc - 0.9996) < 1e-4


def test_webmercator_known_values():
    w = crs.get_crs(3857)
    x, y = w.forward(np.array([180.0, 0.0]), np.array([0.0, 0.0]))
    assert abs(x[0] - 20037508.342789244) < 1e-6 and abs(x[1]) < 1e-9
    lo, la = w.inverse(*w.forward(np.array([12.5]), np.array([41.9])))
    assert abs(lo[0] - 12.5) < 1e-12 and abs(la[0] - 41.9) < 1e-12


def test_unsupported_crs_raises():
    with pytest.raises(ValueError, match="unsupported CRS"):
        crs.get_crs(27700)


def _aeqd_square(side_m=200_000.0):
    """The reference fixture: a square in AEQD centred at (0, 180)."""
    h = side_m / 2
    ring = np.array([[-h, -h], [h, -h], [h, h], [-h, h], [-h, -h]])
    return crs.AzimuthalEquidistant(lon0_deg=180.0, lat0_deg=0.0), ring


def test_aeqd_roundtrip():
    p, ring = _aeqd_square()
    lon, lat = p.inverse(ring[:, 0], ring[:, 1])
    x, y = p.forward(lon, lat)
    assert np.abs(x - ring[:, 0]).max() < 1e-6
    assert np.abs(y - ring[:, 1]).max() < 1e-6
    # corners land on both sides of the antimeridian
    assert (lon > 179).any() and (lon < -179).any()


def test_antimeridian_projected_square_pipeline(spark):
    """Reference scenario end-to-end: projected square -> source_crs
    reprojection -> antimeridian split -> geohash cells on BOTH sides;
    split area ≈ 3.25 deg² (reference asserts 3.25 ± 0.05)."""
    from vector2dggs_spark import index
    from vector2dggs_spark.operators.prepare import prepare
    from vector2dggs_spark.sources.documents import extract_geometries
    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.geometry import wkt as gw

    p, ring = _aeqd_square()
    # densify edges so the projected edge curvature survives reprojection
    dense = []
    for a, b in zip(ring[:-1], ring[1:]):
        t = np.linspace(0, 1, 33)[:-1]
        dense.append(a[None, :] + t[:, None] * (b - a)[None, :])
    dense = np.concatenate(dense + [ring[:1]])
    wkt = "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in dense) + "))"
    docs = spark.createDataFrame(
        [("am1", [{"kind": "geometry", "text": wkt, "media_ref": None, "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    # the prepared pieces must be split at ±180 (2+ polygons, all finite)
    geoms = extract_geometries(docs)
    prep = prepare(geoms, get_backend("geohash"), None, source_crs=p).toPandas()
    assert len(prep) >= 2
    def shoelace(r):
        x, y = r[:, 0], r[:, 1]
        return 0.5 * abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))

    area = 0.0
    for wkb in prep["wkb"]:
        g = gw.from_wkb(bytes(wkb))
        assert g[0] == "Polygon"
        area += shoelace(np.asarray(g[1][0]))
    assert abs(area - 3.25) < 0.1, area  # reference: ~3.25 deg²

    r = index(spark, docs, dggs="geohash", resolution=4, parent_res=2, source_crs=p)
    cells = [row["geohash_04"] for row in r.cells.collect()]
    assert len(cells) > 10
    b = get_backend("geohash")
    lat_c, lon_c = b.cell_center(np.array(cells, dtype=str), 4)
    assert (lon_c > 170).any() and (lon_c < -170).any()  # both sides


def test_projected_cut_crs_katana(spark):
    """Cutting in a projected CRS (reference --cut_crs): threshold in m²
    yields multiple pieces whose union covers the same cells as uncut."""
    from vector2dggs_spark import index

    wkt = "POLYGON ((174 -38, 175 -38, 175 -37, 174 -37, 174 -38))"
    docs = spark.createDataFrame(
        [("cut1", [{"kind": "geometry", "text": wkt, "media_ref": None, "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    r_cut = index(
        spark, docs, dggs="geohash", resolution=5, parent_res=2,
        cut_crs=2193, cut_threshold_units2=(30_000.0**2),
    )
    r_plain = index(spark, docs, dggs="geohash", resolution=5, parent_res=2,
                    cut_threshold_deg2=0)
    got = {row["geohash_05"] for row in r_cut.cells.collect()}
    want = {row["geohash_05"] for row in r_plain.cells.collect()}
    # projected-space cuts are not axis-aligned in degrees: centers near
    # the cut seams may flip, but coverage must agree almost everywhere
    assert len(got ^ want) <= max(2, len(want) // 50), (len(got), len(want))
