"""Batched dual simplex (lp/dual_simplex.py) vs the primal solver and
the scipy oracle; dual->primal fallback semantics (bslv_lp.c:190-259)."""

import numpy as np

from bensolve_tpu.lp import dual_simplex as dx
from bensolve_tpu.lp import simplex as sx
from tests.test_revised import _random_instances
from tests.test_simplex import scipy_solve


def test_dual_cold_start_falls_back_to_primal():
    """From the all-slack basis with mixed-sign objectives the dual
    start is usually lost; the fallback must still produce the primal
    solver's answers."""
    A, c, rlb, rub, clb, cub = _random_instances(0, 8, 24, 8)
    ref = sx.solve_batch(A, c, rlb, rub, clb, cub)
    got = dx.solve_batch_dual(A, c, rlb, rub, clb, cub)
    np.testing.assert_array_equal(ref.status, got.status)
    ok = ref.status == sx.OPTIMAL
    np.testing.assert_allclose(got.obj[ok], ref.obj[ok], rtol=1e-8,
                               atol=1e-8)
    np.testing.assert_allclose(got.row_dual[ok], ref.row_dual[ok],
                               rtol=1e-7, atol=1e-8)


def test_dual_warm_start_after_row_bound_change():
    """The Benson P2 re-solve pattern: only ROW bounds change, so the
    previous optimal basis stays dual feasible — the dual simplex must
    re-optimize in few pivots without losing dual feasibility."""
    A, c, rlb, rub, clb, cub = _random_instances(1, 8, 24, 8)
    cold = sx.solve_batch(A, c, rlb, rub, clb, cub)
    ok = cold.status == sx.OPTIMAL
    assert ok.all()
    # tighten every row upper bound a bit: primal feasibility breaks,
    # dual feasibility survives
    rub2 = rub * 0.9
    warm = dx.solve_batch_dual(A, c, rlb, rub2, clb, cub,
                               start_basis=(cold.basis, cold.at_upper))
    pri = sx.solve_batch(A, c, rlb, rub2, clb, cub)
    np.testing.assert_array_equal(warm.status, pri.status)
    good = pri.status == sx.OPTIMAL
    np.testing.assert_allclose(warm.obj[good], pri.obj[good], rtol=1e-8,
                               atol=1e-8)
    # no instance lost dual feasibility, and warm dual re-solves pivot
    # less than cold primal solves
    assert warm.iters[good].sum() < pri.iters[good].sum()
    for i in np.flatnonzero(good)[:4]:
        st, obj, _ = scipy_solve(A, c[i], rlb[i], rub2[i], clb[i], cub[i])
        assert st == sx.OPTIMAL
        np.testing.assert_allclose(warm.obj[i], obj, rtol=1e-8, atol=1e-8)


def test_dual_detects_infeasible():
    """Crossing row bounds after a warm start: the dual simplex proves
    primal infeasibility (dual unbounded)."""
    A = np.array([[1.0, 1.0]])
    c = np.array([[1.0, 1.0]])
    rlb = np.array([[3.0]])
    rub = np.array([[np.inf]])
    clb = np.zeros((1, 2))
    cub = np.full((1, 2), 1.0)   # x1+x2 <= 2 < 3: infeasible
    got = dx.solve_batch_dual(A, c, rlb, rub, clb, cub)
    assert list(got.status) == [sx.INFEASIBLE]


def test_dual_pure_no_retry_flags_lost():
    A, c, rlb, rub, clb, cub = _random_instances(2, 6, 18, 4)
    c = np.abs(c) * -1.0   # negative costs: slack basis is dual infeasible
    got = dx.solve_batch_dual(A, c, rlb, rub, clb, cub,
                              retry_primal=False)
    assert (got.status == sx.DUAL_LOST).any()


def test_state_warm_chain_matches_basis_warm():
    """Kept-device-tableau warm chain (simplex.KeptState): gather-based
    re-solves must produce the same solution as basis-warm re-solves,
    including with a permuted parent mapping (children of different
    parents)."""
    from tests.test_ipm import random_lp

    A, c, rlb, rub, clb, cub = random_lp(20, 24, 6, seed=9)
    cold = sx.solve_batch(A, c, rlb, rub, clb, cub)
    rub2 = rub * 0.99
    res2, kept = dx.solve_batch_dual(A, c, rlb, rub2, clb, cub,
                                  start_basis=(cold.basis, cold.at_upper),
                                  keep_state=True)
    assert kept is not None
    rub3 = rub2 * 0.995
    res3, kept3 = dx.solve_batch_dual(A, c, rlb, rub3, clb, cub,
                                   start_state=(kept, np.arange(6)),
                                   keep_state=True)
    ref3 = dx.solve_batch_dual(A, c, rlb, rub3, clb, cub,
                            start_basis=(res2.basis, res2.at_upper))
    np.testing.assert_allclose(res3.obj, ref3.obj, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(res3.x, ref3.x, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(res3.row_dual, ref3.row_dual,
                               rtol=1e-7, atol=1e-9)
    assert kept3 is not None and kept3.age >= kept.age
    # permuted parent mapping
    perm = np.array([1, 0, 3, 2, 5, 4])
    res4, _ = dx.solve_batch_dual(A, c[perm], rlb[perm], rub3[perm],
                               clb[perm], cub[perm],
                               start_state=(kept3, perm),
                               keep_state=True)
    ref4 = dx.solve_batch_dual(A, c[perm], rlb[perm], rub3[perm],
                            clb[perm], cub[perm])
    np.testing.assert_allclose(res4.obj, ref4.obj, rtol=1e-9, atol=1e-9)


def test_state_warm_disabled_env(monkeypatch):
    """BENSOLVE_NO_STATE_WARM=1 must give identical e2e results (the
    chain is a pure performance feature)."""
    from tests.test_e2e import run

    base = run("ex05", write_files=False)
    monkeypatch.setenv("BENSOLVE_NO_STATE_WARM", "1")
    off = run("ex05", write_files=False)
    a = np.asarray(base.primal_points)
    b = np.asarray(off.primal_points)
    assert a.shape == b.shape
    for row in a:
        assert np.min(np.abs(b - row).sum(axis=1)) < 1e-9
