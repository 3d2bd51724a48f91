"""Polytope-engine tests.

Oracle strategy: build polytopes from halfspaces {x : z.x >= -1}
(origin interior) through the cone_polar transform and compare vertex
sets against scipy.spatial.HalfspaceIntersection; validate the four
structural invariants of the reference checker (poly__polyck,
bslv_poly.c:940-990) via PolytopePair.check().
"""

import numpy as np
import pytest
from scipy.spatial import ConvexHull, HalfspaceIntersection

from bensolve_tpu.poly.polytope import PolytopePair, cone_polar_v2h


def build_pair(normals, dim):
    """Feed halfspaces z.x >= -1 (rows of ``normals``) into a pair."""
    pair = PolytopePair(dim)
    # neutralize the initial lower-image direction vertex, as the
    # reference does for plain vertex enumeration (bslv_algs.c:338-339):
    # it becomes the trivial halfspace 0.x >= -1
    pair.dual.ideal[0] = False
    pair.dual.data[0, dim - 1] = 0.0
    for z in normals:
        pair.add_vertex(np.asarray(z, float), ideal=False)
    ok = pair.initial_approx()
    return pair, ok


def live_vertices(pair, ideal=False):
    P = pair.primal
    idx = [i for i in P.live() if bool(P.ideal[i]) == ideal]
    return P.data[idx]


def match_sets(got, want, tol=1e-7):
    """Unordered vertex-set comparison within tolerance."""
    got = np.asarray(got)
    want = np.asarray(want)
    assert got.shape[0] == want.shape[0], (got, want)
    used = np.zeros(want.shape[0], bool)
    for g in got:
        d = np.linalg.norm(want - g, axis=1)
        d[used] = np.inf
        j = int(np.argmin(d))
        assert d[j] < tol, (g, want)
        used[j] = True


def test_square():
    normals = [[1, 0], [0, 1], [-1, 0], [0, -1]]
    pair, ok = build_pair(normals, 2)
    assert ok
    match_sets(live_vertices(pair),
               [[1, 1], [1, -1], [-1, 1], [-1, -1]])
    assert live_vertices(pair, ideal=True).shape[0] == 0
    assert pair.check() == []
    # facet-vertex incidence: every facet of a square has 2 vertices
    D = pair.dual
    fs = [f for f in D.live() if not D.ideal[f]]
    assert sorted(len(D.inc[f]) for f in fs) == [2, 2, 2, 2]


def test_cube_3d():
    normals = [v for i in range(3) for v in
               (np.eye(3)[i], -np.eye(3)[i])]
    pair, ok = build_pair(normals, 3)
    assert ok
    want = [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
            for sz in (-1, 1)]
    match_sets(live_vertices(pair), want)
    assert pair.check() == []
    # each cube vertex has 3 neighbours
    P = pair.primal
    for v in P.live():
        assert len(set(P.adj[v])) == 3


def test_redundant_halfspace_rejected():
    pair, ok = build_pair([[1, 0], [0, 1], [-1, 0], [0, -1]], 2)
    assert ok
    # x >= -2 is implied by x >= -1
    assert pair.add_vertex(np.array([0.5, 0.0]), ideal=False) is False
    match_sets(live_vertices(pair),
               [[1, 1], [1, -1], [-1, 1], [-1, -1]])


def test_unbounded_keeps_directions():
    # only lower bounds: x >= -1, y >= -1 -> vertex (-1,-1) plus
    # extreme directions e_x, e_y
    pair, ok = build_pair([[1, 0], [0, 1]], 2)
    assert ok
    match_sets(live_vertices(pair), [[-1, -1]])
    dirs = live_vertices(pair, ideal=True)
    match_sets(dirs / np.linalg.norm(dirs, axis=1, keepdims=True),
               [[1, 0], [0, 1]])
    assert pair.check() == []


def test_near_duplicate_halfspace_projection_band():
    # a halfspace within the projection band of an existing facet must
    # not create spurious far-away vertices
    base = [[1, 0], [0, 1], [-1, 0], [0, -1]]
    pair, ok = build_pair(base, 2)
    assert ok
    pair.add_vertex(np.array([1.0 + 2e-10, 0.0]), ideal=False)
    got = live_vertices(pair)
    assert got.shape[0] == 4
    match_sets(got, [[1, 1], [1, -1], [-1, 1], [-1, -1]], tol=1e-6)
    assert pair.check() == []


@pytest.mark.parametrize("dim,seed", [(2, 0), (2, 1), (3, 2), (3, 3),
                                      (4, 4), (3, 5), (2, 6), (4, 7)])
def test_random_vs_scipy(dim, seed):
    rng = np.random.default_rng(seed)
    k = rng.integers(dim + 2, 3 * dim + 4)
    normals = rng.standard_normal((k, dim))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    # ensure boundedness: add +-e_i boxes
    normals = np.concatenate([normals, np.eye(dim), -np.eye(dim)])

    pair, ok = build_pair(normals, dim)
    assert ok
    got = live_vertices(pair)

    # scipy oracle: halfspace form A x + b <= 0 with A = -z, b = -1
    hs = np.concatenate([-normals, -np.ones((normals.shape[0], 1))], axis=1)
    inter = HalfspaceIntersection(hs, np.zeros(dim))
    want = ConvexHull(inter.intersections).points[
        np.unique(ConvexHull(inter.intersections).vertices)]
    match_sets(got, want, tol=1e-6)
    assert pair.check() == []


def test_incremental_matches_batch():
    # adding halfspaces after initialisation gives the same polytope as
    # queueing everything upfront
    rng = np.random.default_rng(42)
    normals = rng.standard_normal((10, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    normals = np.concatenate([normals, np.eye(3), -np.eye(3)])

    pair_all, ok = build_pair(normals, 3)
    assert ok

    pair_inc = PolytopePair(3)
    for z in normals[:4]:
        pair_inc.add_vertex(z, ideal=False)
    assert pair_inc.initial_approx()
    for z in normals[4:]:
        pair_inc.add_vertex(z, ideal=False)

    match_sets(live_vertices(pair_inc), live_vertices(pair_all), tol=1e-7)
    assert pair_inc.check() == []
