import numpy as np
import pytest
from scipy.optimize import linprog

from bensolve_tpu.lp import simplex as sx


def scipy_solve(A, c, rlb, rub, clb, cub):
    """Oracle: same LP via scipy (HiGHS).  Returns (status, obj, x)."""
    m, n = A.shape
    A_ub, b_ub, A_eq, b_eq = [], [], [], []
    for i in range(m):
        lo, hi = rlb[i], rub[i]
        if np.isfinite(lo) and np.isfinite(hi) and lo == hi:
            A_eq.append(A[i]); b_eq.append(lo)
        else:
            if np.isfinite(hi):
                A_ub.append(A[i]); b_ub.append(hi)
            if np.isfinite(lo):
                A_ub.append(-A[i]); b_ub.append(-lo)
    kw = {}
    if A_ub:
        kw["A_ub"] = np.array(A_ub); kw["b_ub"] = np.array(b_ub)
    if A_eq:
        kw["A_eq"] = np.array(A_eq); kw["b_eq"] = np.array(b_eq)
    res = linprog(c, bounds=list(zip(clb, cub)), method="highs", **kw)
    if res.status == 0:
        return sx.OPTIMAL, res.fun, res.x
    if res.status == 2:
        return sx.INFEASIBLE, None, None
    if res.status == 3:
        return sx.UNBOUNDED, None, None
    return None, None, None


def run_one(A, c, rlb, rub, clb, cub):
    return sx.solve_batch(
        A, c[None], rlb[None], rub[None], clb[None], cub[None]
    )


def test_tiny_known():
    # min -x1 - 2 x2  s.t. x1 + x2 <= 4, x2 <= 3, x >= 0
    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    r = run_one(
        A,
        np.array([-1.0, -2.0]),
        np.array([-np.inf, -np.inf]),
        np.array([4.0, 3.0]),
        np.zeros(2),
        np.full(2, np.inf),
    )
    assert r.status[0] == sx.OPTIMAL
    np.testing.assert_allclose(r.obj[0], -7.0, atol=1e-9)
    np.testing.assert_allclose(r.x[0], [1.0, 3.0], atol=1e-9)


def test_row_dual_sign_convention():
    # min x s.t. x >= 3  ->  row dual = dObj/d(lb) = +1 (GLPK sign)
    A = np.array([[1.0]])
    r = run_one(A, np.array([1.0]), np.array([3.0]), np.array([np.inf]),
                np.array([-np.inf]), np.array([np.inf]))
    assert r.status[0] == sx.OPTIMAL
    np.testing.assert_allclose(r.obj[0], 3.0, atol=1e-10)
    np.testing.assert_allclose(r.row_dual[0], [1.0], atol=1e-10)

    # max x (= min -x) s.t. x <= 5: dual of upper-bounded binding row = -(-1)?
    r = run_one(A, np.array([-1.0]), np.array([-np.inf]), np.array([5.0]),
                np.array([-np.inf]), np.array([np.inf]))
    assert r.status[0] == sx.OPTIMAL
    # GLPK: lambda = dObj/d(ub) = -1 for min -x
    np.testing.assert_allclose(r.row_dual[0], [-1.0], atol=1e-10)


def test_infeasible():
    A = np.array([[1.0], [1.0]])
    r = run_one(A, np.array([0.0]), np.array([3.0, -np.inf]),
                np.array([np.inf, 1.0]), np.array([-np.inf]),
                np.array([np.inf]))
    assert r.status[0] == sx.INFEASIBLE


def test_unbounded():
    A = np.array([[1.0]])
    r = run_one(A, np.array([-1.0]), np.array([0.0]), np.array([np.inf]),
                np.array([-np.inf]), np.array([np.inf]))
    assert r.status[0] == sx.UNBOUNDED


def test_fixed_and_free_vars():
    # min x2 s.t. x1 + x2 = 2 (fixed row), x1 fixed at 0.5, x2 free
    A = np.array([[1.0, 1.0]])
    r = run_one(A, np.array([0.0, 1.0]), np.array([2.0]), np.array([2.0]),
                np.array([0.5, -np.inf]), np.array([0.5, np.inf]))
    assert r.status[0] == sx.OPTIMAL
    np.testing.assert_allclose(r.x[0], [0.5, 1.5], atol=1e-10)


@pytest.mark.parametrize("seed", range(12))
def test_random_vs_scipy(seed):
    rng = np.random.default_rng(seed)
    m, n = rng.integers(2, 9), rng.integers(2, 9)
    A = rng.standard_normal((m, n))
    c = rng.standard_normal(n)
    # mix of bound types
    kinds_r = rng.integers(0, 5, m)
    kinds_c = rng.integers(0, 5, n)

    def mk(kind, k):
        lo = rng.standard_normal(k) - 2
        hi = lo + np.abs(rng.standard_normal(k)) + 0.5
        lb = np.where(kind == 0, -np.inf, lo)          # f
        lb = np.where(kind == 2, -np.inf, lb)          # u
        ub = np.where(kind == 0, np.inf, hi)
        ub = np.where(kind == 1, np.inf, ub)           # l
        ub = np.where(kind == 4, lb, ub)               # s fixed
        return lb, ub

    rlb, rub = mk(kinds_r, m)
    clb, cub = mk(kinds_c, n)
    want_status, want_obj, _ = scipy_solve(A, c, rlb, rub, clb, cub)
    if want_status is None:
        pytest.skip("oracle undecided")
    got = run_one(A, c, rlb, rub, clb, cub)
    assert got.status[0] == want_status, f"seed={seed}"
    if want_status == sx.OPTIMAL:
        np.testing.assert_allclose(got.obj[0], want_obj, rtol=1e-8, atol=1e-8)
        # check primal feasibility and duals via strong duality/KKT
        x = got.x[0]
        s = A @ x
        assert np.all(s >= rlb - 1e-7) and np.all(s <= rub + 1e-7)
        assert np.all(x >= clb - 1e-9) and np.all(x <= cub + 1e-9)
        lam = got.row_dual[0]
        mu = got.col_dual[0]
        # stationarity: c = A' lam + mu
        np.testing.assert_allclose(c, A.T @ lam + mu, atol=1e-7)
        # complementary slackness-ish: dual signs at active bounds
        for i in range(m):
            if lam[i] > 1e-7:
                assert s[i] <= rlb[i] + 1e-6
            if lam[i] < -1e-7:
                assert s[i] >= rub[i] - 1e-6


def test_batched_mixed_statuses():
    # one batch containing optimal, infeasible and unbounded instances
    A = np.array([[1.0, 0.0], [0.0, 1.0]])
    c = np.array([[1.0, 1.0], [0.0, 0.0], [-1.0, 0.0]])
    rlb = np.array([[0.0, 0.0], [3.0, -np.inf], [0.0, 0.0]])
    rub = np.array([[np.inf, np.inf], [1.0, np.inf], [np.inf, np.inf]])
    clb = np.array([[0.0, 0.0], [-np.inf, 0.0], [-np.inf, 0.0]])
    cub = np.full((3, 2), np.inf)
    # batch 1 is infeasible: row1 requires x1>=3 and x1<=1
    rub[1, 0] = 1.0
    r = sx.solve_batch(A, c, rlb, rub, clb, cub)
    assert list(r.status) == [sx.OPTIMAL, sx.INFEASIBLE, sx.UNBOUNDED]
    np.testing.assert_allclose(r.obj[0], 0.0, atol=1e-10)


def test_degenerate_cycling_guard():
    # classic Beale cycling example (degenerate); Bland fallback must finish
    A = np.array([
        [0.25, -60.0, -0.04, 9.0],
        [0.5, -90.0, -0.02, 3.0],
        [0.0, 0.0, 1.0, 0.0],
    ])
    c = np.array([-0.75, 150.0, -0.02, 6.0])
    rlb = np.array([-np.inf, -np.inf, -np.inf])
    rub = np.array([0.0, 0.0, 1.0])
    clb = np.zeros(4)
    cub = np.full(4, np.inf)
    r = run_one(A, c, rlb, rub, clb, cub)
    assert r.status[0] == sx.OPTIMAL
    np.testing.assert_allclose(r.obj[0], -0.05, atol=1e-9)
