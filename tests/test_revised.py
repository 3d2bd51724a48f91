"""Tests for the batched revised simplex (lp/revised.py): must be
result-interchangeable with the tableau solver (lp/simplex.py) and match
the scipy/HiGHS oracle on random instances."""

import numpy as np
import pytest

from bensolve_tpu.lp import revised as rv
from bensolve_tpu.lp import simplex as sx
from tests.test_simplex import scipy_solve


def _random_instances(seed, M, N, B):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((M, N)) / np.sqrt(N)
    x0 = rng.random((B, N))
    c = rng.standard_normal((B, N))
    row_ub = x0 @ A.T + 0.3 + rng.random((B, M))
    row_lb = np.full((B, M), -np.inf)
    col_lb = np.zeros((B, N))
    col_ub = np.full((B, N), 5.0)
    return A, c, row_lb, row_ub, col_lb, col_ub


@pytest.mark.parametrize("seed,M,N", [(0, 6, 30), (1, 10, 50), (2, 4, 40)])
def test_revised_matches_scipy(seed, M, N):
    B = 8
    A, c, rlb, rub, clb, cub = _random_instances(seed, M, N, B)
    res = rv.solve_batch_revised(A, c, rlb, rub, clb, cub)
    for i in range(B):
        st, obj, _ = scipy_solve(A, c[i], rlb[i], rub[i], clb[i], cub[i])
        assert res.status[i] == st
        if st == sx.OPTIMAL:
            np.testing.assert_allclose(res.obj[i], obj, rtol=1e-8,
                                       atol=1e-8)


def test_revised_matches_tableau_duals():
    A, c, rlb, rub, clb, cub = _random_instances(3, 8, 24, 8)
    r1 = rv.solve_batch_revised(A, c, rlb, rub, clb, cub)
    r2 = sx.solve_batch(A, c, rlb, rub, clb, cub)
    np.testing.assert_array_equal(r1.status, r2.status)
    np.testing.assert_allclose(r1.obj, r2.obj, rtol=1e-9, atol=1e-9)
    # duals may differ between optimal bases only at degeneracy; random
    # dense instances are nondegenerate w.p. 1
    np.testing.assert_allclose(r1.row_dual, r2.row_dual, rtol=1e-7,
                               atol=1e-8)
    np.testing.assert_allclose(r1.x, r2.x, rtol=1e-7, atol=1e-8)


def test_revised_statuses_mixed():
    A = np.array([[1.0, 1.0], [1.0, -1.0]])
    c = np.array([[1.0, 1.0], [1.0, 1.0], [-1.0, -1.0]])
    rlb = np.array([[-np.inf] * 2, [3.0, 3.0], [-np.inf] * 2])
    rub = np.array([[2.0, 2.0], [np.inf] * 2, [np.inf] * 2])
    clb = np.zeros((3, 2))
    cub = np.array([[1.0, 1.0], [1.0, 1.0], [np.inf] * 2])
    res = rv.solve_batch_revised(A, c, rlb, rub, clb, cub)
    assert list(res.status) == [sx.OPTIMAL, sx.INFEASIBLE, sx.UNBOUNDED]


def test_revised_warm_start():
    A, c, rlb, rub, clb, cub = _random_instances(5, 8, 32, 8)
    cold = rv.solve_batch_revised(A, c, rlb, rub, clb, cub)
    i0 = int(np.flatnonzero(cold.status == sx.OPTIMAL)[0])
    warm = rv.solve_batch_revised(
        A, c, rlb, rub, clb, cub,
        start_basis=(cold.basis[i0], cold.at_upper[i0]))
    np.testing.assert_array_equal(warm.status, cold.status)
    np.testing.assert_allclose(warm.obj, cold.obj, rtol=1e-9, atol=1e-9)
    assert warm.iters[i0] <= cold.iters[i0]


def test_long_pivot_chain_refactorization_f32():
    """float32 pivot chains long enough to cross several periodic
    refactorizations must still match the float64 oracle."""
    A, c, rlb, rub, clb, cub = _random_instances(11, 48, 320, 4)
    res = rv.solve_batch_revised(A, c, rlb, rub, clb, cub,
                                 dtype=np.float32)
    assert res.iters.max() > rv.REFACTOR_EVERY_F32
    for i in range(4):
        st, obj, _ = scipy_solve(A, c[i], rlb[i], rub[i], clb[i], cub[i])
        assert res.status[i] == st
        if st == sx.OPTIMAL:
            np.testing.assert_allclose(res.obj[i], obj, rtol=1e-3,
                                       atol=1e-3)


def test_per_instance_warm_start():
    """(B, M) warm starts: each instance restarts from ITS OWN optimal
    basis and must re-verify optimality in zero pivots (both solvers)."""
    A, c, rlb, rub, clb, cub = _random_instances(7, 8, 32, 8)
    for solver in (rv.solve_batch_revised, sx.solve_batch):
        cold = solver(A, c, rlb, rub, clb, cub)
        warm = solver(A, c, rlb, rub, clb, cub,
                      start_basis=(cold.basis, cold.at_upper))
        np.testing.assert_array_equal(warm.status, cold.status)
        np.testing.assert_allclose(warm.obj, cold.obj, rtol=1e-9, atol=1e-9)
        opt = cold.status == sx.OPTIMAL
        assert opt.any() and (warm.iters[opt] == 0).all()


def test_per_instance_warm_start_chunked():
    """Per-instance warm starts survive batch chunking (_slice_warm)."""
    A, c, rlb, rub, clb, cub = _random_instances(8, 6, 24, 20)
    cold = sx.solve_batch(A, c, rlb, rub, clb, cub, max_chunk=8)
    warm = sx.solve_batch(A, c, rlb, rub, clb, cub, max_chunk=8,
                          start_basis=(cold.basis, cold.at_upper))
    np.testing.assert_array_equal(warm.status, cold.status)
    np.testing.assert_allclose(warm.obj, cold.obj, rtol=1e-9, atol=1e-9)
    opt = cold.status == sx.OPTIMAL
    assert opt.any() and (warm.iters[opt] == 0).all()


def test_solve_auto_routes_tall():
    from bensolve_tpu.lp import solve_batch_auto

    A, c, rlb, rub, clb, cub = _random_instances(6, 4, 40, 8)
    res = solve_batch_auto(A, c, rlb, rub, clb, cub)
    for i in range(4):
        st, obj, _ = scipy_solve(A, c[i], rlb[i], rub[i], clb[i], cub[i])
        assert res.status[i] == st
        if st == sx.OPTIMAL:
            np.testing.assert_allclose(res.obj[i], obj, rtol=1e-8, atol=1e-8)
