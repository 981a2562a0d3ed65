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


def test_hilbert_tables_match_published_s2_constants():
    """Pin POS_TO_IJ / POS_TO_ORIENTATION against freshly re-declared
    literals from the published s2geometry source (s2coords.cc
    kPosToIJ / kPosToOrientation). The module's fast and slow paths
    share these tables, so a transcription error there would be
    self-consistent (r1 advice #5) — this test is the external pin."""
    K_SWAP, K_INVERT = 1, 2
    k_pos_to_orientation = (K_SWAP, 0, 0, K_INVERT + K_SWAP)
    k_pos_to_ij = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
    assert tuple(s2.POS_TO_ORIENTATION) == k_pos_to_orientation
    assert tuple(tuple(r) for r in s2.POS_TO_IJ) == k_pos_to_ij
    assert (s2.SWAP_MASK, s2.INVERT_MASK, s2.MAX_LEVEL) == (K_SWAP, K_INVERT, 30)


def test_known_good_cell_tokens():
    """Hand-derived anchor tokens, computed OUTSIDE the code base from
    the published S2 cell-id layout (id = face<<61 | pos<<(61-2L) |
    1<<(60-2L)) and the canonical Hilbert tables — independent of every
    constant in functions/s2_cell.py.

    Level 0: the six cardinal directions land on faces 0..5, whose
    level-0 ids are face*2^61 + 2^60 -> tokens 1,3,5,7,9,b.

    Level 1 (face 0, start orientation 0, kPosToIJ[0]=(0,1,3,2)):
      quadrant (i,j) -> Hilbert pos: (0,0)->0, (0,1)->1, (1,1)->2,
      (1,0)->3; id = pos<<59 | 1<<58.
      lng<0 -> u<0 -> i=0; lat>0 -> v>0 -> j=1, etc.

    Level 2 (face 0): first step into (0,0) is pos 0 and XORs
    orientation to SWAP (kPosToOrientation[0]); second step uses
    kPosToIJ[1]=(0,2,3,1), so sub-quadrant (i=1,j=0)=2 -> pos 1;
    id = ((0<<2)|1)<<57 | 1<<56 = 0x0300... -> token "03". The chosen
    point (lat=-34.5, lng=-11.3) has u=tan(-11.3 deg)=-0.1998 ->
    s=0.2876 in [0.25,0.5) (i bits 0,1) and v=tan(lat)/cos(lng)=-0.7004
    -> t=0.2139 in [0,0.25) (j bits 0,0)."""
    cases = [
        # (lat, lng, level, expected token)
        (0.0, 0.0, 0, "1"),
        (0.0, 90.0, 0, "3"),
        (90.0, 0.0, 0, "5"),
        (0.0, 180.0, 0, "7"),
        (0.0, -90.0, 0, "9"),
        (-90.0, 0.0, 0, "b"),
        # face 0 level-1 quadrants
        (10.0, -10.0, 1, "0c"),   # (i=0,j=1) -> pos 1
        (10.0, 10.0, 1, "14"),    # (i=1,j=1) -> pos 2
        (-10.0, -10.0, 1, "04"),  # (i=0,j=0) -> pos 0
        (-10.0, 10.0, 1, "1c"),   # (i=1,j=0) -> pos 3
        # face 2 level-1: lat 89, lng 1 -> u=-x/z<0, v=-y/z<0 -> (0,0) -> pos 0
        (89.0, 1.0, 1, "44"),
        # face 0 level-2 with an orientation change on the first step
        (-34.5, -11.3, 2, "03"),
    ]
    for lat, lng, level, tok in cases:
        got = s2.cell_id_to_token(s2.latlng_to_cell_id([lat], [lng], level))[0]
        assert got == tok, f"({lat},{lng}) level {level}: {got} != {tok}"


def test_level12_locality():
    """Nearby points share a level-12 cell; distant points don't."""
    base = s2.latlng_to_cell_id([40.7128, 40.71281, 41.5], [-74.0060, -74.00601, -74.0], 12)
    assert int(base[0]) == int(base[1])
    assert int(base[0]) != int(base[2])
