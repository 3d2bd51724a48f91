"""Instance-level DP: solve_many lockstep engine vs the per-instance
driver (BASELINE.json config #5)."""

import numpy as np
import pytest

import jax

from bensolve_tpu.algs.driver import solve
from bensolve_tpu.algs.many import solve_many
from bensolve_tpu.algs.solution import SolStatus
from bensolve_tpu.vlp.options import Options
from bensolve_tpu.vlp.problem import VLPProblem


def random_bounded_vlps(n, q=2, m=4, nn=6, seed=0):
    """Random box-constrained (hence C-bounded) minimization VLPs."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        P = rng.standard_normal((q, nn))
        A = rng.standard_normal((m, nn))
        x0 = rng.random(nn)
        a = A @ x0 + 0.5 + rng.random(m)
        out.append(VLPProblem.from_arrays(
            P=P, A=A, b=a, l=np.zeros(nn), s=np.full(nn, 2.0)))
    return out


def _vset(r):
    return sorted(map(tuple, np.round(r.primal_points, 7)))


def test_solve_many_matches_serial():
    vlps = random_bounded_vlps(24)
    opt = Options(bounded=True)
    batch = solve_many(vlps, opt)
    for vlp, rb in zip(vlps, batch):
        rs = solve(vlp, Options(bounded=True))
        assert rb.status is rs.status
        if rs.status is SolStatus.OPTIMAL:
            assert _vset(rb) == _vset(rs)


def test_solve_many_mesh_sharded():
    """The merged LP batch lays its instance axis over a device mesh
    (8 virtual CPU devices from conftest) — results must be identical
    to the unsharded lockstep run."""
    from jax.sharding import Mesh

    vlps = random_bounded_vlps(16, seed=3)
    opt = Options(bounded=True)
    plain = solve_many(vlps, opt)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("dp",))
    sharded = solve_many(vlps, opt, mesh=mesh)
    for a, b in zip(plain, sharded):
        assert a.status is b.status
        if a.status is SolStatus.OPTIMAL:
            assert _vset(a) == _vset(b)


def test_solve_many_unbounded_fallback():
    """Non-bounded opt falls back to the full per-instance pipeline."""
    vlps = random_bounded_vlps(3, seed=5)
    res = solve_many(vlps, Options())
    for r in res:
        assert r.status is SolStatus.OPTIMAL


def test_solve_many_scale_smoke():
    """A few hundred instances in lockstep stay correct (statuses) and
    reuse a handful of compiled shapes."""
    vlps = random_bounded_vlps(200, seed=7)
    res = solve_many(vlps, Options(bounded=True))
    assert sum(r.status is SolStatus.OPTIMAL for r in res) == 200
    # spot-check a few against the serial driver
    for i in (0, 99, 199):
        rs = solve(vlps[i], Options(bounded=True))
        assert _vset(res[i]) == _vset(rs)


def test_solve_many_heterogeneous_groups_ep():
    """EP analogue (SURVEY.md section 2.2): instances of DIFFERENT
    shapes form separate lockstep groups that advance concurrently
    (per-group threads, round-robin device placement); every result
    must match the serial per-instance driver."""
    from bensolve_tpu.examples import random_vlp

    vlps = []
    for s in range(4):
        vlps.append(random_vlp(q=2, m=6, n=5, seed=s))
        vlps.append(random_vlp(q=3, m=10, n=8, seed=100 + s))
        vlps.append(random_vlp(q=2, m=4, n=9, seed=200 + s))
    res = solve_many(vlps, Options(bounded=True))
    assert all(r.status is SolStatus.OPTIMAL for r in res)
    for i in (0, 1, 2, 9, 10, 11):
        rs = solve(vlps[i], Options(bounded=True))
        assert _vset(res[i]) == _vset(rs)


def test_solve_many_heterogeneous_with_mesh():
    from jax.sharding import Mesh

    from bensolve_tpu.examples import random_vlp

    vlps = [random_vlp(q=2, m=6, n=5, seed=s) for s in range(4)] + \
        [random_vlp(q=3, m=10, n=8, seed=50 + s) for s in range(4)]
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("dp",))
    res = solve_many(vlps, Options(bounded=True), mesh=mesh)
    assert all(r.status is SolStatus.OPTIMAL for r in res)
    ref = solve_many(vlps, Options(bounded=True))
    for a, b in zip(res, ref):
        assert _vset(a) == _vset(b)
