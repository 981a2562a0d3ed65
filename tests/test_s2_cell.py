"""S2 cell kernel validation.

The fast vectorized path (4-bit lookup Hilbert interleave) is checked
against an independent bit-at-a-time implementation, plus geometric
invariants (round-trip through cell centers, hierarchy containment,
face selection)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_poi_cloud_spark.functions import s2_cell as s2


@settings(max_examples=300, deadline=None)
@given(
    lat=st.floats(min_value=-89.99, max_value=89.99, allow_nan=False),
    lng=st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
)
def test_fast_matches_slow(lat, lng):
    face, i, j = s2.latlng_to_face_ij([lat], [lng])
    fast = int(s2.face_ij_to_cell_id(face, i, j)[0])
    slow = s2._slow_face_ij_to_cell_id(int(face[0]), int(i[0]), int(j[0]))
    assert fast == slow


def test_face_selection():
    # axis points land on their faces
    cases = [
        (0.0, 0.0, 0),     # +x
        (0.0, 90.0, 1),    # +y
        (90.0, 0.0, 2),    # +z (north pole)
        (0.0, 180.0, 3),   # -x
        (0.0, -90.0, 4),   # -y
        (-90.0, 0.0, 5),   # -z (south pole)
    ]
    lats = [c[0] for c in cases]
    lngs = [c[1] for c in cases]
    face, u, v = s2.latlng_to_face_uv(lats, lngs)
    assert list(face) == [c[2] for c in cases]
    np.testing.assert_allclose(u, 0.0, atol=1e-12)
    np.testing.assert_allclose(v, 0.0, atol=1e-12)


def test_leaf_structure():
    ids = s2.latlng_to_cell_id([37.7753, -33.9, 51.5], [-122.4183, 151.2, -0.12])
    # leaf ids are odd, level 30
    assert all(int(v) & 1 == 1 for v in ids)
    assert list(s2.cell_level(ids)) == [30, 30, 30]


def test_parent_hierarchy():
    leaf = s2.latlng_to_cell_id([37.7753], [-122.4183])
    prev = leaf
    for level in range(29, -1, -1):
        p = s2.cell_parent(leaf, level)
        assert int(s2.cell_level(p)[0]) == level
        # parent range contains the child: range = [id - (lsb-1), id + (lsb-1)]
        lsb = int(s2.lsb_for_level(level))
        assert int(p[0]) - (lsb - 1) <= int(prev[0]) <= int(p[0]) + (lsb - 1)
        prev = p


@settings(max_examples=200, deadline=None)
@given(
    lat=st.floats(min_value=-85.0, max_value=85.0, allow_nan=False),
    lng=st.floats(min_value=-179.99, max_value=179.99, allow_nan=False),
    level=st.integers(min_value=0, max_value=24),
)
def test_center_roundtrip(lat, lng, level):
    """The center of a cell re-encodes to the same cell at that level."""
    cell = s2.latlng_to_cell_id([lat], [lng], level)
    clat, clng = s2.cell_id_to_center_latlng(cell)
    again = s2.latlng_to_cell_id(clat, clng, level)
    assert int(cell[0]) == int(again[0])


def test_face_ij_roundtrip():
    rng = np.random.RandomState(7)
    lat = rng.uniform(-89, 89, 500)
    lng = rng.uniform(-180, 180, 500)
    face, i, j = s2.latlng_to_face_ij(lat, lng)
    ids = s2.face_ij_to_cell_id(face, i, j)
    f2, i2, j2, _ = s2.cell_id_to_face_ij(ids)
    assert (face == f2).all()
    assert (i == i2).all()
    assert (j == j2).all()


def test_tokens():
    tok = s2.cell_id_to_token(s2.cell_parent(s2.latlng_to_cell_id([0.1], [0.1]), 12))
    assert isinstance(tok[0], str)
    assert 1 <= len(tok[0]) <= 16
    # level-12 token has 16 - (2*(30-12))//4 = 7 hex digits
    assert len(tok[0]) == 7


def test_level12_locality():
    """Nearby points share a level-12 cell; distant points don't."""
    base = s2.latlng_to_cell_id([40.7128, 40.71281, 41.5], [-74.0060, -74.00601, -74.0], 12)
    assert int(base[0]) == int(base[1])
    assert int(base[0]) != int(base[2])
