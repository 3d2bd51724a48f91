"""Pallas per-LP simplex kernel vs the XLA lockstep batch (interpret
mode on CPU; the same kernel compiles for TPU)."""

import numpy as np
import pytest

from bensolve_tpu.lp import simplex as sx
from bensolve_tpu.lp.pallas_simplex import lp_batch_pallas


def make(M, N, B, seed=0):
    rng = np.random.default_rng(seed)
    A = (rng.standard_normal((M, N)) / np.sqrt(N)).astype(np.float32)
    x0 = rng.random((B, N)).astype(np.float32)
    b = (x0 @ A.T + 0.5 + rng.random((B, M))).astype(np.float32)
    c = rng.standard_normal((B, N)).astype(np.float32)
    rlb = np.full((B, M), -np.inf, np.float32)
    clb = np.zeros((B, N), np.float32)
    cub = np.full((B, N), 10.0, np.float32)
    return A, c, rlb, b, clb, cub


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_xla_batch(seed):
    args = make(16, 16, 8, seed)
    ref = sx.solve_batch(*args, dtype=np.float32)
    got = lp_batch_pallas(*args)
    np.testing.assert_array_equal(ref.status, got.status)
    np.testing.assert_allclose(ref.obj, got.obj, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ref.x, got.x, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ref.row_dual, got.row_dual,
                               rtol=1e-5, atol=1e-5)
    # the kernel prices with devex, the XLA solver with Dantzig, so the
    # pivot PATHS differ; the kernel must still terminate in a sane
    # pivot budget (solutions above are the semantic contract)
    assert (got.iters <= 2 * ref.iters + 8).all()


def test_warm_start_shared_basis():
    """A shared warm basis (previous solve's optimum of instance 0)
    must keep results identical and cut pivots for that instance."""
    args = make(16, 16, 8, seed=2)
    cold = lp_batch_pallas(*args)
    i0 = int(np.flatnonzero(cold.status == sx.OPTIMAL)[0])
    warm = lp_batch_pallas(
        *args, start_basis=(cold.basis[i0], cold.at_upper[i0]))
    np.testing.assert_array_equal(cold.status, warm.status)
    np.testing.assert_allclose(cold.obj, warm.obj, rtol=1e-5, atol=1e-5)
    assert warm.iters[i0] == 0
    assert warm.iters[i0] < cold.iters[i0]


def test_try_solve_batch_rejects_per_instance_warm():
    from bensolve_tpu.lp.pallas_simplex import try_solve_batch

    args = make(16, 16, 8, seed=3)
    cold = lp_batch_pallas(*args)
    assert try_solve_batch(
        *args, start_basis=(cold.basis, cold.at_upper)) is None


def test_statuses():
    # optimal, infeasible (crossed row bounds), unbounded in one batch
    A = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    c = np.array([[1, 1], [0, 0], [-1, 0]], np.float32)
    rlb = np.array([[0, 0], [3, 0], [0, 0]], np.float32)
    rub = np.array([[np.inf] * 2, [1, np.inf], [np.inf] * 2], np.float32)
    clb = np.array([[0, 0], [0, 0], [-np.inf, 0]], np.float32)
    cub = np.full((3, 2), np.inf, np.float32)
    r = lp_batch_pallas(A, c, rlb, rub, clb, cub)
    assert list(r.status) == [sx.OPTIMAL, sx.INFEASIBLE, sx.UNBOUNDED]
